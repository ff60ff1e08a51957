"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the pattern that scales: bytes stay columnar in Parquet, metadata prunes
(format/size/duration predicates push down), and decode runs distributed in
Arrow-batched ``mapInPandas``.

Three REAL pure-python codecs ship: ``ppm`` (binary P6 netpbm images —
header parse, raster decode, nearest-neighbor resize), ``wav`` (RIFF
PCM16 audio — chunk walk, sample decode), and ``png`` (r11 — the first
COMPRESSED format: stdlib zlib IDAT inflate, CRC-validated chunk walk,
all five scanline filters unfiltered, 8-bit RGB/RGBA).  Remaining
compressed formats (JPEG/MP3/MP4) stay an honest registration seam
behind :data:`_DECODERS` /
:func:`register_decoder` — those libraries are not in this container —
and the deterministic ``fake`` decoder stays for plumbing tests:
everything Spark-side (schemas, batch iteration, partition behavior,
feature shapes) behaves identically whichever codec is plugged in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# payload + typed metadata: the schema every media table shares
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("size_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

N_FEATURES = 16


def attach_media_metadata(df: DataFrame, payload_col: str = "payload", fmt: str = "bin") -> DataFrame:
    """Derive the metadata struct from a raw binary column (size is real;
    format is caller-supplied; dimensions unknown until decode)."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(p).cast("long").alias("size_bytes"),
        ),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 16 floats in [0,1) from
    sha256(payload).  Replace with a real codec (PIL/librosa/ffmpeg) when
    available — the Spark plumbing does not change."""
    if payload is None:
        return [0.0] * N_FEATURES
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:N_FEATURES]]


# -- real codecs: P6 PPM (image) and RIFF PCM16 WAV (audio) -----------------
#
# Pure python, no external libraries — parsing follows the published
# formats (netpbm P6; RIFF/WAVE PCM): header/chunk walk, raster/sample
# decode.  Feature vectors are EXACT small integers carried as float32
# (all sums bounded far below 2^24), so oracles can derive them in
# closed form.


def decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary P6 PPM: returns (width, height, maxval, rgb_raster).
    Handles the netpbm header grammar — whitespace-separated tokens with
    ``#`` comments — and validates raster length."""
    if payload is None or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte separating header from raster
    width, height, maxval = tokens
    if not 0 < maxval < 256:
        # maxval >= 256 means TWO bytes per sample (big-endian) — slicing
        # 3*w*h single bytes would silently decode garbage features
        raise ValueError(
            f"P6 maxval {maxval} unsupported: only 1-byte-per-sample "
            "(maxval < 256) rasters decode here"
        )
    raster = payload[pos : pos + 3 * width * height]
    if len(raster) != 3 * width * height:
        raise ValueError(
            f"P6 raster truncated: expected {3 * width * height} bytes, "
            f"got {len(raster)}"
        )
    return width, height, maxval, raster


def encode_ppm(width: int, height: int, rgb: bytes, maxval: int = 255) -> bytes:
    """Binary P6 PPM from a raw interleaved-RGB raster."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb raster length must be 3*width*height")
    return b"P6\n%d %d\n%d\n" % (width, height, maxval) + bytes(rgb)


def _ppm_features(payload: bytes) -> list[float]:
    """Feature vector from a REAL P6 decode: [width, height, maxval,
    sum_r, sum_g, sum_b, n_pixels] — exact integers, closed-form
    derivable by an oracle that knows the pixel generator."""
    if payload is None:
        return []
    w, h, maxval, raster = decode_ppm(payload)
    return [
        float(w),
        float(h),
        float(maxval),
        float(sum(raster[0::3])),
        float(sum(raster[1::3])),
        float(sum(raster[2::3])),
        float(w * h),
    ]


def resize_ppm_nearest(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a P6 PPM: destination pixel
    (x, y) copies source pixel (x*src_w // width, y*src_h // height) —
    the standard floor mapping — and re-encodes as P6."""
    if payload is None:
        return None
    sw, sh, maxval, raster = decode_ppm(payload)
    out = bytearray()
    for y in range(height):
        sy = y * sh // height
        for x in range(width):
            sx = x * sw // width
            p = 3 * (sy * sw + sx)
            out += raster[p : p + 3]
    return encode_ppm(width, height, bytes(out), maxval)


# -- PNG codec (pure python, RFC 2083 / W3C PNG spec) ------------------------
#
# stdlib ``zlib`` covers IDAT inflate/deflate; the rest is the published
# format: 8-byte signature, length/type/data/CRC32 chunk walk
# (IHDR → IDAT* → IEND), one filter byte per scanline (types 0–4:
# None/Sub/Up/Average/Paeth) undone against the prior unfiltered
# scanline.  Scope: 8-bit truecolor (color type 2, RGB) and
# truecolor+alpha (type 6, RGBA), non-interlaced — the shapes a
# training-data pipeline actually stores.  Palette/greyscale/16-bit/Adam7
# refuse loudly rather than mis-decode.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """(type, data) chunk walk with length + CRC validation."""
    import struct
    import zlib

    if payload is None or not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"PNG chunk {ctype!r} truncated")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + length
    raise ValueError("PNG missing IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG filter type 4): nearest of left/up/upper-left
    to the linear estimate a + b − c, ties broken left → up → upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse an 8-bit RGB/RGBA non-interlaced PNG: returns
    (width, height, channels, raster) with the raster unfiltered to raw
    interleaved samples.  All five scanline filter types decode."""
    import struct
    import zlib

    ihdr = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None:
        raise ValueError("PNG missing IHDR chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (2, 6):
        raise ValueError(
            f"PNG bit depth {depth} / color type {color} unsupported: only "
            "8-bit truecolor (2) and truecolor+alpha (6) decode here"
        )
    if comp != 0 or filt != 0:
        raise ValueError("PNG compression/filter method must be 0")
    if interlace != 0:
        raise ValueError("PNG Adam7 interlacing unsupported")
    ch = 3 if color == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG raster size mismatch: expected {h * (stride + 1)} "
            f"filtered bytes, got {len(raw)}"
        )
    out = bytearray(h * stride)
    prev = bytes(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub: + left
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up: + above
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average: + floor((left + above) / 2)
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"PNG scanline filter type {f} invalid")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return w, h, ch, bytes(out)


def encode_png(
    width: int,
    height: int,
    raster: bytes,
    channels: int = 3,
    filters=None,
) -> bytes:
    """8-bit RGB/RGBA non-interlaced PNG from a raw interleaved raster.
    ``filters`` optionally pins the per-scanline filter type (int or
    per-row list, default 0/None) — the forward transform of the same
    five filters the decoder undoes, so tests can exercise every
    unfilter path against exact expected rasters."""
    import struct
    import zlib

    if channels not in (3, 4):
        raise ValueError("encode_png supports RGB (3) or RGBA (4) channels")
    stride = width * channels
    if len(raster) != height * stride:
        raise ValueError("raster length must be height*width*channels")
    if filters is None:
        rowf = [0] * height
    elif isinstance(filters, int):
        rowf = [filters] * height
    else:
        rowf = list(filters)
        if len(rowf) != height:
            raise ValueError("filters list must have one entry per row")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        f = rowf[y]
        line = raster[y * stride : (y + 1) * stride]
        raw.append(f)
        if f == 0:
            raw += line
        elif f == 1:
            raw += bytes(
                (line[i] - (line[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:
            raw += bytes(
                (
                    line[i]
                    - ((line[i - channels] if i >= channels else 0) + prev[i])
                    // 2
                )
                & 0xFF
                for i in range(stride)
            )
        elif f == 4:
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    color = 2 if channels == 3 else 6
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_features(payload: bytes) -> list[float]:
    """Feature vector from a REAL PNG decode: [width, height, channels,
    sum_r, sum_g, sum_b, sum_a, n_pixels] — exact integers (sum_a = 0
    for RGB), closed-form derivable by an oracle that knows the pixel
    generator."""
    if payload is None:
        return []
    w, h, ch, raster = decode_png(payload)
    sums = [float(sum(raster[c::ch])) for c in range(ch)]
    if ch == 3:
        sums.append(0.0)
    return [float(w), float(h), float(ch), *sums, float(w * h)]


def resize_png_nearest(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of an 8-bit RGB/RGBA PNG —
    destination (x, y) copies source (x*src_w // width, y*src_h //
    height), the same floor mapping as the PPM resizer — re-encoded as
    an unfiltered PNG."""
    if payload is None:
        return None
    sw, sh, ch, raster = decode_png(payload)
    out = bytearray()
    for y in range(height):
        sy = y * sh // height
        for x in range(width):
            sx = x * sw // width
            p = ch * (sy * sw + sx)
            out += raster[p : p + ch]
    return encode_png(width, height, bytes(out), channels=ch)


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM16 payload: chunk walk (fmt  + data, other
    chunks skipped), little-endian int16 samples.  Returns
    {sample_rate, n_channels, samples} with samples interleaved."""
    import struct

    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 WAV is supported (fmt={audio_fmt}, bits={bits})"
                )
            fmt = (n_ch, rate)
        elif cid == b"data":
            if len(body) != size:
                # a payload cut off mid-chunk would otherwise "decode"
                # with however many samples remain — wrong features with
                # no error, unlike every other malformed-payload path
                raise ValueError(
                    f"WAV data chunk truncated: declared {size} bytes, "
                    f"got {len(body)}"
                )
            samples = list(struct.unpack(f"<{size // 2}h", body[: size // 2 * 2]))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    return {"sample_rate": fmt[1], "n_channels": fmt[0], "samples": samples}


def encode_wav(sample_rate: int, n_channels: int, samples: list[int]) -> bytes:
    """Minimal RIFF/WAVE PCM16 encoder (interleaved samples)."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_features(payload: bytes) -> list[float]:
    """Feature vector from a REAL WAV decode: [sample_rate, n_channels,
    n_samples, sum_abs, max_abs, duration_ms] — exact integers."""
    if payload is None:
        return []
    d = decode_wav(payload)
    s = d["samples"]
    frames = len(s) // d["n_channels"] if d["n_channels"] else 0
    return [
        float(d["sample_rate"]),
        float(d["n_channels"]),
        float(len(s)),
        float(sum(abs(x) for x in s)),
        float(max((abs(x) for x in s), default=0)),
        float(frames * 1000 // d["sample_rate"]) if d["sample_rate"] else 0.0,
    ]


_DECODERS = {
    "fake": _fake_decode,
    "ppm": _ppm_features,
    "png": _png_features,
    "wav": _wav_features,
}


def register_decoder(name: str, fn) -> None:
    """Plug in a real codec (e.g. PIL image decode) without touching the
    Spark plan below."""
    _DECODERS[name] = fn


def decode_media_batch(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Distributed decode via ``mapInPandas``: Arrow batches in, one feature
    vector per media row out.  Raises NotImplementedError for codecs that
    are not registered (real image/audio decode is stubbed here)."""
    if decoder not in _DECODERS:
        raise NotImplementedError(
            f"decoder {decoder!r} not available in this environment; "
            f"register one via register_decoder() (stub: image/audio libs "
            f"are not installed in this container)"
        )
    fn = _DECODERS[decoder]
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": [fn(p) for p in pdf["payload"]],
                }
            )

    return df.select("media_id", "payload").mapInPandas(_decode, out_schema)


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """decode + join features back onto the media table (feature extraction
    keeps the payload column out of the shuffle: only (id, features) moves)."""
    feats = decode_media_batch(df, decoder=decoder)
    return df.drop("payload").join(feats, "media_id")


# -- resize / frame-sample plumbing -----------------------------------------
#
# Same contract as decode: the Spark side (mapInPandas batch iteration,
# output schemas, deterministic behavior) is real; the pixel/codec work is
# behind registerable transformer functions with deterministic fakes.


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Stand-in for a real image resize (PIL etc.): deterministic bytes of
    the requested 'size' derived from sha256(payload || dims)."""
    if payload is None:
        return None
    seed = hashlib.sha256(payload + f"|{width}x{height}".encode()).digest()
    n = max(1, (width * height) // 64)  # token 'pixel buffer', bounded
    out = bytearray()
    block = seed
    while len(out) < n:
        block = hashlib.sha256(block).digest()
        out.extend(block)
    return bytes(out[:n])


_RESIZERS = {
    "fake": _fake_resize,
    "ppm": resize_ppm_nearest,
    "png": resize_png_nearest,
}


def register_resizer(name: str, fn) -> None:
    _RESIZERS[name] = fn


def resize_media(
    df: DataFrame, width: int, height: int, resizer: str = "fake"
) -> DataFrame:
    """Distributed resize via ``mapInPandas``: (media_id, payload, meta) in,
    same schema out with the payload replaced and meta dims updated.
    Partitioning is preserved — no shuffle; one Arrow batch at a time keeps
    peak memory at batch_size × payload_size."""
    if resizer not in _RESIZERS:
        raise NotImplementedError(
            f"resizer {resizer!r} not available in this environment; "
            "register one via register_resizer() (image libs are stubbed)"
        )
    fn = _RESIZERS[resizer]
    out_schema = df.schema

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [fn(p, width, height) for p in pdf["payload"]]
            metas = []
            for m in pdf["meta"]:
                m = dict(m) if m is not None else {}
                m["width"], m["height"] = width, height
                metas.append(m)
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(_resize, out_schema)


def _fake_frame_extract(payload: bytes, frame_index: int) -> bytes:
    """Stand-in for video frame extraction at ``frame_index``."""
    if payload is None:
        return None
    return hashlib.sha256(payload + frame_index.to_bytes(4, "big")).digest()


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    frame_ms: int = 40,
    max_frames: int = 32,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame, count derived from
    ``meta.duration_ms`` (every ``every_ms``, capped at ``max_frames``).
    Runs in ``mapInPandas`` so a 2-hour video and a 2-second clip in the
    same batch each emit their own row count — no skew from per-row
    explode of a python list."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                duration = (meta or {}).get("duration_ms") or frame_ms
                n = min(max_frames, max(1, int(duration // every_ms) + 1))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(_fake_frame_extract(payload, i))
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    return df.select("media_id", "payload", "meta").mapInPandas(_frames, FRAME_SCHEMA)


def dedup_frames(frames: DataFrame, mode: str = "consecutive") -> DataFrame:
    """Frame-level dedup over a :data:`FRAME_SCHEMA` frame table — the
    video-corpus step after :func:`sample_frames`:

    - ``consecutive``: drop frames identical to the PREVIOUS frame of the
      same media (static scenes sample into runs of identical frames; one
      lag window per media keeps scene boundaries only).
    - ``global``: corpus-wide exact frame dedup — one survivor per
      distinct frame payload, smallest (media_id, frame_index) wins (the
      cross-video intro/outro/logo-card collapse).

    Both key on an md5 of the frame BYTES, so the shuffle moves 16-byte
    digests, not frames; null frames (undecodable media) pass through
    untouched.  No Python in the path — windows over digests only."""
    from iceberg_ruby_spark.errors import InvalidDataError
    from pyspark.sql import Window

    nulls = frames.filter(F.col("frame").isNull())
    body = frames.filter(F.col("frame").isNotNull()).withColumn(
        "__h", F.md5(F.col("frame"))
    )
    if mode == "consecutive":
        w = Window.partitionBy("media_id").orderBy("frame_index")
        kept = (
            body.withColumn("__p", F.lag("__h").over(w))
            .filter(F.col("__p").isNull() | (F.col("__h") != F.col("__p")))
            .drop("__h", "__p")
        )
    elif mode == "global":
        w = Window.partitionBy("__h").orderBy("media_id", "frame_index")
        kept = (
            body.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__h", "__rn")
        )
    else:
        raise InvalidDataError(
            f"dedup_frames mode={mode!r}: expected 'consecutive' or 'global'"
        )
    return kept.unionByName(nulls)

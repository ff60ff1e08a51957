"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the pattern that scales: bytes stay columnar in Parquet, metadata prunes
(format/size/duration predicates push down), and decode runs distributed in
Arrow-batched ``mapInPandas``.

The actual codecs are STUBBED — image/audio libraries are not in this
container — behind :data:`_DECODERS`; everything Spark-side (schemas,
batch iteration, partition behavior, feature shapes) is real and tested.
A deterministic fake decoder stands in so pipelines are end-to-end
verifiable: features are derived from sha256(payload), so they are stable
across runs and machines.
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


_DECODERS = {"fake": _fake_decode}


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


_RESIZERS = {"fake": _fake_resize}


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

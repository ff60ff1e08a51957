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

"""Similarity search over embedding columns (array<float>).

Absent from the reference (SURVEY.md §2 Tier C).  Two tiers:

- :func:`cosine_topk` — brute-force exact top-k.  The query set is
  broadcast; the corpus is scanned exactly once; the dot product is a
  JVM-side ``zip_with`` + ``aggregate`` (no Python per row).  This is the
  correctness baseline and is the right plan whenever
  |queries| × |corpus| work fits the cluster (corpus read dominates).
- :func:`lsh_ann_topk` — random-hyperplane LSH: bucket by sign-bit
  signature, probe the query's bucket(s), exact re-rank inside.  At 100 TB
  this touches only matching buckets instead of the full corpus per query.
  Hyperplanes are derived deterministically from a seed so plans are
  reproducible run to run.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    """JVM-side dot product of two array columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def vector_norms(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append an ``l2_norm`` column (JVM-side)."""
    return df.withColumn("l2_norm", _norm(F.col(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding self-matches by id).

    Output: (query_id, vec_id, cosine, rank).  Ordering is deterministic —
    ties in (rounded) cosine break on corpus id.

    Plan: broadcast(queries) × corpus → one pass over the corpus, ranking
    via a per-query window.  At 1000 executors the corpus stays partitioned;
    only the (small) query set is replicated."""
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__qv"), F.col("__cv"))
                / (_norm(F.col("__qv")) * _norm(F.col("__cv"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (seeded; no runtime
    randomness so results are stable across runs/retries)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return planes.tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit LSH bucket id (long) for an array column: bit i is the sign
    of the projection onto plane i — all JVM-side arithmetic."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket + F.when(
            proj >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH bucketing + exact
    re-rank within the query's bucket.

    Scale path: the corpus is bucketed once (can be persisted /
    hidden-partitioned by bucket); each query joins only its bucket —
    a hash-equality join on a long key instead of a full scan per query.
    Recall is tunable via ``n_planes`` (fewer planes → bigger buckets →
    higher recall, more compute)."""
    query_id_col = query_id_col or id_col
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cv")).withColumn(
        "__bucket", lsh_bucket(F.col("__cv"), planes)
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__bucket", lsh_bucket(F.col("__qv"), planes))
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__qv"), F.col("__cv"))
                / (_norm(F.col("__qv")) * _norm(F.col("__cv"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )

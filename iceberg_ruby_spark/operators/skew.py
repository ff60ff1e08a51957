"""Skew-mitigation operators: salted joins and salted heavy-key
aggregation.

AQE's runtime skew-join split (``spark.sql.adaptive.skewJoin``) handles
most skew transparently, but it only splits SORT-MERGE join partitions
after a shuffle has already materialized the skewed blocks, and it never
helps aggregations whose per-key state is itself the problem (a
``collect_list`` over a bot user).  These operators apply the classic
pre-shuffle fix — spread a hot key over ``salt`` sub-keys, replicate the
other side — as explicit, testable plan shapes:

- :func:`salted_join` — big-skewed × too-big-to-broadcast equi-join.
  The skewed side salts each row deterministically; the other side is
  replicated ``salt``× (an in-row ``explode`` of a literal range, NOT a
  shuffle) and the join key becomes ``(key, salt)``, so one hot key's
  rows land on ``salt`` different reducers.  Row-identical to the plain
  join by construction.
- :func:`salted_count_distinct` — per-key COUNT(DISTINCT x) where one
  key dominates: pre-aggregate on ``(key, hash(x) % salt)`` so the
  distinct set of a hot key is built on ``salt`` reducers, then sum the
  per-salt-distinct counts (bucket-disjoint sets make the sum exact).

At 100 TB the salt factor trades ``salt``× replication of the smaller
side against eliminating the straggler reducer; with the smaller side
already shuffled by key, replication cost is bounded by
``salt × |small|`` — pick ``salt ≈ hot-key rows / healthy-partition
rows``.  Salting is deterministic (``xxhash64`` of the row), never
``rand()``, so results are stable and oracle-checkable.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_ruby_spark.errors import InvalidDataError


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Union[str, Sequence[str]],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` with the skewed side's hot keys
    spread over ``salt`` sub-keys.

    ``skewed`` gets ``__salt = pmod(xxhash64(all columns), salt)`` — a
    deterministic per-row spread, so duplicate-key rows (the skew)
    scatter while results stay reproducible; ``other`` is replicated
    ``salt``× by exploding a literal salt array in-row (map-side — the
    replication itself never shuffles).  The join key ``(on…, __salt)``
    then hash-partitions one hot key across ``salt`` reducers instead of
    one straggler.  ``how`` supports the join types where per-row
    replication cannot double-count: inner / left / left_semi /
    left_anti (for semi/anti the salted probe matches iff the unsalted
    one does, bucket-for-bucket).  Right/full/outer shapes would emit
    ``salt`` copies of unmatched ``other`` rows — refused."""
    if salt <= 1:
        raise InvalidDataError(f"salted_join salt must be > 1: {salt}")
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise InvalidDataError(
            f"salted_join does not support how={how!r}: replicating the "
            "right side salt× would duplicate its unmatched rows in "
            "right/full joins — salt the other side instead"
        )
    keys = [on] if isinstance(on, str) else list(on)
    overlap = set(skewed.columns) & set(other.columns) - set(keys)
    if overlap:
        raise InvalidDataError(
            f"salted_join: non-key columns appear on both sides: "
            f"{sorted(overlap)}; rename or drop before joining"
        )
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    # merge hint (r13): left to its stats, Spark broadcasts the
    # salt×-replicated build — every executor hashes salt copies of every
    # `other` row, single-threaded per broadcast, and the (key, salt)
    # join key does nothing under a broadcast (salting exists to spread a
    # SHUFFLE's hot key).  The operator's contract is "both sides too big
    # to broadcast", so the shuffle shape is pinned.  A shuffle_hash
    # build on the replicated side was used earlier in r13 (0.73 s vs
    # 1.93 s broadcast at sf0.1) and then FALSIFIED by the 100×-tier
    # probe: the hash build holds salt × |other| / partitions rows and
    # cannot spill — at tmp/sf10 that is ~3.7M rows (~450 MB) per task,
    # which hard-OOMed the bench session
    # (SparkOutOfMemoryError "not enough memory to build hash map" in
    # ShuffledHashJoinExec.buildHashedRelation).  Sort-merge spills
    # gracefully at any scale and is the join AQE's skew-split handles
    # best; measured stage-level cost vs SHJ at sf0.1 was 0.80 s vs
    # 0.73 s — noise at query level, bought with an OOM-free build.
    joined = s.join(o.hint("merge"), keys + ["__salt"], how)
    return joined.drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    key_cols: Union[str, Sequence[str]],
    distinct_col: str,
    salt: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Per-key COUNT(DISTINCT distinct_col) that survives a hot key.

    Plain ``groupBy(key).agg(countDistinct(x))`` expands to a two-level
    aggregate whose first level still keys on ``(key, x)`` — fine — but
    the FINAL count of a hot key's distinct set lands on one reducer
    holding the whole set.  Salting the first level by ``hash(x) %
    salt`` makes the buckets disjoint BY VALUE, so the per-bucket
    distinct counts sum exactly: the hot key's set is built on ``salt``
    reducers and the merge is an integer sum, never a set union."""
    if salt <= 1:
        raise InvalidDataError(f"salted_count_distinct salt must be > 1: {salt}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    per_bucket = (
        df.withColumn("__salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt)))
        .groupBy(*keys, "__salt")
        .agg(F.count_distinct(F.col(distinct_col)).alias("__nd"))
    )
    return (
        per_bucket.groupBy(*keys)
        .agg(F.sum("__nd").alias(out_col))
    )

"""Scale-adaptive input spreading for explode/per-row-heavy operators.

The problem (optimization guide §2.5, "input skew"): Spark sizes scan
parallelism by INPUT BYTES (``maxPartitionBytes`` splits, bounded below
by row-group granularity), but operators like MinHash shingling explode
a compact corpus into 100-1000× the per-row work — a 0.6 MB single-row-
group parquet file becomes ONE task computing 1.5M shingle hashes × 64
mins while 31 cores idle (measured: the whole minhash signature stage ran
1-task at sf0.1, 3.0 → 1.6 s query wall from this fix alone).

The fix is the guide's own remedy — "repartition immediately after the
read" — applied ONLY when it can help: when the frame's planned
parallelism is far below the session's shuffle parallelism.  At 100 TB a
corpus scan is thousands of splits and the gate never fires (the
repartition would be a full corpus shuffle bought for nothing); it fires
exactly in the under-split regime (few splits ≪ cores), where the
shuffled payload is by construction at most a few scan splits' worth of
bytes.

``keys`` should be the downstream aggregation/join key when there is one:
hash-partitioning by that key lets a following ``groupBy(key)`` reuse the
exchange instead of adding a second one (guide §2.4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

def _factor() -> int:
    # spread only when planned parallelism * FACTOR <= shuffle parallelism
    # — i.e. the shuffle buys at least FACTOR× more cores on the heavy
    # stage.  Read per call (sub-µs) so 0 can kill the behavior at runtime
    # for A/B measurement and debugging.
    try:
        return int(os.environ.get("SPARK_GRAFT_SPREAD_FACTOR", "4"))
    except ValueError:
        return 4


def spread_small_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition ``df`` up to the session's shuffle parallelism when its
    planned parallelism is at least ``_factor()``× below it; identity
    otherwise.  Row values are untouched (hash repartition on ``keys``, or
    deterministic round-robin without); only the physical layout changes.
    Any planning surprise (non-file frames, remote IO) falls back to the
    unspread frame."""
    factor = _factor()
    if factor <= 0:
        return df
    try:
        spark = df.sparkSession
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
        n = df.rdd.getNumPartitions()
        if n > 0 and n * factor <= target:
            return df.repartition(target, *keys) if keys else df.repartition(target)
    except Exception:
        pass
    return df

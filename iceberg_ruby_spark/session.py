"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` (single JVM); the configuration below is
chosen to also be the right *shape* for a 1000-executor cluster at ~100 TB:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast conversion) — the primary scale lever.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real cluster
  AQE coalesces from a high initial number, so we set a high
  ``initialPartitionNum`` only when AQE is enabled.
- Arrow enabled for every pandas/Arrow interchange (our Pandas-UDF operators
  depend on it).
- Session timezone pinned to UTC so timestamp semantics match the
  reference's UTC normalization (``ext/iceberg/src/table.rs:365-375``) and
  the DuckDB oracle.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "iceberg_ruby_spark", cpus: Optional[int] = None) -> SparkSession:
    """Create (or reuse) the engine SparkSession."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        # driver testdata events.parquet uses INT64 TIMESTAMP(NANOS); Spark
        # has no ns timestamp — read as long, converted to µs by the loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

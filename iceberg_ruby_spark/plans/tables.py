"""Test-data table loader shared by every declared query.

``events.parquet`` carries INT64 TIMESTAMP(NANOS) which Spark cannot read
natively; with ``spark.sql.legacy.parquet.nanosAsLong`` (set in session.py)
it arrives as a long that we truncate to µs — matching DuckDB's ns→µs
truncation, so both engines see identical timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Every declared query funnels through here, so pin the runtime confs
    # the query library is written against even when the session is not
    # ours (e.g. the correctness driver builds a bare SparkSession):
    # ANSI off (Spark 4 defaults it ON; the MinHash affine hashes rely on
    # wrapping long arithmetic) and UTC timestamps (matches the DuckDB
    # oracle).  All are runtime-settable SQL confs.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet stores INT64 TIMESTAMP(NANOS); Spark has no ns
        # timestamp — read as long, truncated to µs below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — double division loses precision on ~1.7e18 ns
        # epoch values (> 2^53) and rounds the last µs digit
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Temp views for queries expressed through the SQL surface."""
    for n in names or TABLES:
        load(spark, sf_dir, n).createOrReplaceTempView(n)

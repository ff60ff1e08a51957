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

# Schema memo keyed on the full parquet path (r13, guide §1.2: don't
# compute things twice).  ``spark.read.parquet`` without a schema infers
# it from the file footer on EVERY call — measured ~290 ms per load at
# sf0.1 vs ~21 ms with an explicit schema — and every query build pays
# it per table, inside bench.py's timed region.  This memoizes METADATA
# only (a StructType — the declared-schema pattern every production
# catalog uses); all row data is still read from parquet at execution,
# every run.  Keyed on the full path so sf dirs never cross; the events
# inference runs under nanosAsLong (set below before the first read), so
# the memoized schema is exactly what inference yields.
_SCHEMA_MEMO: dict = {}


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
    path = f"{sf_dir}/{name}.parquet"
    memo = _SCHEMA_MEMO.get(path)
    df = (spark.read if memo is None else spark.read.schema(memo)).parquet(path)
    if memo is None:
        _SCHEMA_MEMO[path] = df.schema
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — double division loses precision on ~1.7e18 ns
        # epoch values (> 2^53) and rounds the last µs digit
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Temp views for queries expressed through the SQL surface."""
    for n in names or TABLES:
        load(spark, sf_dir, n).createOrReplaceTempView(n)

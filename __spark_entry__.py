"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The query library lives in ``iceberg_ruby_spark/plans/`` (one module per
operator family); this file just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style filter → groupBy → agg) on sf0.001."""
    from iceberg_ruby_spark.plans.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from iceberg_ruby_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins — since round 5, EVERY registered query has
    one: hash-based operators run engine-neutral md5 derivations the
    oracle rebuilds bit-for-bit, ANN queries run at configurations whose
    candidate sets provably cover the exact top-k, and the HLL sketch is
    checked through its accuracy envelope."""
    from iceberg_ruby_spark.plans import ORACLES

    return dict(ORACLES)

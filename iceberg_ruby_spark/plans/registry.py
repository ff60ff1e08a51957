"""Query/oracle registry used by ``__spark_entry__.py`` and ``bench.py``."""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
BENCH_SET: list[str] = []  # headline queries timed by bench.py


def query(name: str, oracle: Optional[str] = None, bench: bool = False):
    """Register a query; ``oracle`` is the DuckDB-SQL twin (omit for
    non-SQL-expressible ops → driver runs a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if bench:
            BENCH_SET.append(name)
        return fn

    return deco

"""plans — the declared query library.

Every query in SURVEY.md §2's operator inventory gets one entry here:
a ``(spark, sf_dir) -> DataFrame`` callable registered in
:data:`registry.QUERIES` plus (where SQL-expressible) a DuckDB oracle twin
in :data:`registry.ORACLES`.  ``__spark_entry__.py`` re-exports both; the
driver runs them side-by-side at sf=0.01 and hash-compares results.

Determinism rules applied throughout (both sides, always):

- every computed column is aliased identically in Spark and oracle SQL;
- double SUM/AVG go through exact ``DECIMAL(18,6)`` accumulation then cast
  back to double — float summation order differs between engines, decimal
  addition does not;
- int-typed scalar results are cast so Spark/DuckDB widths agree
  (DuckDB ``length()``/``year()``/``row_number()`` return BIGINT, Spark INT);
- top-k and window orderings always carry a unique tie-break key.
"""

from iceberg_ruby_spark.plans.registry import ORACLES, QUERIES

# importing the modules registers their queries
from iceberg_ruby_spark.plans import relational  # noqa: E402,F401
from iceberg_ruby_spark.plans import llm  # noqa: E402,F401
from iceberg_ruby_spark.plans import engine  # noqa: E402,F401
from iceberg_ruby_spark.plans import streaming  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES"]

"""iceberg_ruby_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ankane/iceberg-ruby (reference studied at
/root/reference, v0.12.0), re-expressed Spark-first.

The reference is a Ruby *client* for Apache Iceberg: catalog DDL, metadata
introspection, snapshot-pinned scans, fast-append writes, and a delegated SQL
surface (DataFusion).  This package provides the same user-facing surface on
top of Spark:

- :class:`Catalog` — namespace/table DDL + ``sql()`` (reference
  ``lib/iceberg/catalog.rb``), backed by a filesystem warehouse with an
  Iceberg-style snapshot/metadata log (no Iceberg runtime jar needed).
- :class:`Table` / :class:`TableScan` / :class:`StaticTable` — metadata
  accessors, time travel, append/overwrite/delete (reference
  ``lib/iceberg/table.rb``, ``lib/iceberg/table_scan.rb``).
- :class:`TableDefinition` + type classes — Rails-migration-style schema DSL
  (reference ``lib/iceberg/table_definition.rb``, ``lib/iceberg/types.rb``).
- ``operators/`` — large-scale extension operators (dedup, similarity search,
  as-of joins, text analysis, multimodal columns) designed for 100 TB.
- ``plans/`` — the declared query library (TPC-H-ish analytics over the
  driver testdata) with DuckDB oracle SQL twins.
- ``streaming/`` — Structured Streaming surface for the events table.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

import os as _os

# Pin BLAS to one thread per process BEFORE numpy can load (optimization
# guide §4.5 / measured this round): this host's OpenBLAS build
# (MAX_THREADS=2, DYNAMIC_ARCH) pays a pathological thread-sync cost on the
# skinny matmuls our operators run — a 4096×8 @ 8×512 dgemm measured 69 ms
# threaded vs 5 ms single-threaded (14×), and kmeans/PQ-encode/ADC are all
# built from exactly that shape.  Single-thread results are bit-identical
# (each output element is one thread's dot product either way — verified by
# hashing both).  One thread per process is also the right shape under
# Spark: 32 concurrent tasks × N BLAS threads oversubscribes the host, and
# executor Python workers inherit this env from the driver in local mode
# (session.py additionally sets spark.executorEnv for cluster deployments).
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")

# errors stay eager: zero-cost (stdlib-only module) and the exception
# types must be identical objects however they are reached
from iceberg_ruby_spark.errors import (
    Error,
    InvalidDataError,
    NamespaceAlreadyExistsError,
    NoSuchNamespaceError,
    NoSuchTableError,
    TableAlreadyExistsError,
    Todo,
    UnsupportedFeatureError,
)

# Everything else resolves lazily on first attribute access (PEP 562,
# optimization guide §1.2 fixed costs): every forked Python worker that
# unpickles an engine class (streaming source runners, sink committers,
# executor UDF workers) runs this __init__ before its first task, and the
# eager import chain (table/catalog/rest/sql_catalog/...) measured ~0.16 s
# per fork with the pyspark daemon's modules already loaded.  Public API
# is unchanged: ``from iceberg_ruby_spark import X`` and ``ice.X`` hit
# ``__getattr__`` once and are then cached on the package.
_LAZY = {
    "get_spark": "iceberg_ruby_spark.session",
    "stop_spark": "iceberg_ruby_spark.session",
    "Result": "iceberg_ruby_spark.result",
    "TableDefinition": "iceberg_ruby_spark.table_definition",
    "Catalog": "iceberg_ruby_spark.catalog",
    "MemoryCatalog": "iceberg_ruby_spark.catalog",
    "GlueCatalog": "iceberg_ruby_spark.aws",
    "S3TablesCatalog": "iceberg_ruby_spark.aws",
    "RestCatalog": "iceberg_ruby_spark.rest",
    "SqlCatalog": "iceberg_ruby_spark.sql_catalog",
    "MaterializedAggregate": "iceberg_ruby_spark.materialized",
    "Table": "iceberg_ruby_spark.table",
    "TableScan": "iceberg_ruby_spark.table",
    "Transaction": "iceberg_ruby_spark.table",
    "UpdateSchema": "iceberg_ruby_spark.table",
    "StaticTable": "iceberg_ruby_spark.static_table",
    "register_functions": "iceberg_ruby_spark.functions",
}
for _t in (
    "BinaryType",
    "BooleanType",
    "DateType",
    "DecimalType",
    "DoubleType",
    "FixedType",
    "FloatType",
    "IntType",
    "ListType",
    "LongType",
    "MapType",
    "NestedField",
    "Schema",
    "StringType",
    "StructType",
    "TimeType",
    "TimestampType",
    "TimestampTzType",
    "UuidType",
):
    _LAZY[_t] = "iceberg_ruby_spark.types"
for _t in (
    "BucketTransform",
    "DayTransform",
    "HourTransform",
    "IdentityTransform",
    "MonthTransform",
    "TruncateTransform",
    "UnknownTransform",
    "VoidTransform",
    "YearTransform",
):
    _LAZY[_t] = "iceberg_ruby_spark.transforms"

from iceberg_ruby_spark._lazy import lazy_attrs as _lazy_attrs

__getattr__, __dir__ = _lazy_attrs(__name__, _LAZY)

__version__ = "0.1.0"

__all__ = [
    "Catalog",
    "MemoryCatalog",
    "GlueCatalog",
    "RestCatalog",
    "S3TablesCatalog",
    "SqlCatalog",
    "Table",
    "TableScan",
    "Transaction",
    "UpdateSchema",
    "StaticTable",
    "register_functions",
    "TableDefinition",
    "Result",
    "Schema",
    "NestedField",
    "get_spark",
    "stop_spark",
    # errors
    "Error",
    "Todo",
    "UnsupportedFeatureError",
    "InvalidDataError",
    "NamespaceAlreadyExistsError",
    "NoSuchNamespaceError",
    "NoSuchTableError",
    "TableAlreadyExistsError",
    # types
    "BooleanType",
    "IntType",
    "LongType",
    "FloatType",
    "DoubleType",
    "DecimalType",
    "DateType",
    "TimeType",
    "TimestampType",
    "TimestampTzType",
    "StringType",
    "UuidType",
    "FixedType",
    "BinaryType",
    "StructType",
    "ListType",
    "MapType",
    # transforms
    "IdentityTransform",
    "BucketTransform",
    "TruncateTransform",
    "YearTransform",
    "MonthTransform",
    "DayTransform",
    "HourTransform",
    "VoidTransform",
    "UnknownTransform",
]

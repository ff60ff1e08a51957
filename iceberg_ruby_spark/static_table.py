"""StaticTable — read-only table loaded straight from a metadata path, no
catalog (reference ``lib/iceberg/static_table.rb:2-8``,
``ext/iceberg/src/table.rs:133-146``; behavior pinned by
``test/static_table_test.rb:4-24`` over ``test/support/metadata.json``).

Two accepted shapes, matching the reference's "load THE file" contract:

- a ``metadata.json`` file path (any filename, any directory layout,
  ``file://`` URI or plain path): the file itself is parsed as spec
  ``TableMetadata``; manifest-list / data paths resolve against its
  ``location`` field; the version-hint protocol is never consulted.
- a table LOCATION directory: falls back to the engine's own
  ``metadata/version-hint.text`` layout (convenience, superset of the
  reference).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

from iceberg_ruby_spark.session import get_spark
from iceberg_ruby_spark.table import StaticTableOps, Table, _local_path


class StaticTable(Table):
    def __init__(self, metadata_location: str, spark: Optional[SparkSession] = None):
        if metadata_location.endswith(".json"):
            ops = StaticTableOps(metadata_location)
            super().__init__(
                spark or get_spark(), ops.location, read_only=True, ops=ops
            )
        else:
            super().__init__(
                spark or get_spark(), _local_path(metadata_location), read_only=True
            )

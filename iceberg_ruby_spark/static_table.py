"""StaticTable — read-only table loaded straight from a metadata path, no
catalog (reference ``lib/iceberg/static_table.rb:2-8``,
``ext/iceberg/src/table.rs:133-146``)."""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

from iceberg_ruby_spark.session import get_spark
from iceberg_ruby_spark.table import Table


class StaticTable(Table):
    def __init__(self, metadata_location: str, spark: Optional[SparkSession] = None):
        loc = metadata_location
        if loc.endswith(".json"):
            loc = os.path.dirname(os.path.dirname(loc))
        super().__init__(spark or get_spark(), loc, read_only=True)

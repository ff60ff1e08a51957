"""Rails-migration-style schema DSL.

Reference: ``lib/iceberg/table_definition.rb`` — ``create_table`` yields a
definition object with one method per type name (plus aliases ``integer`` →
int, ``bigint`` → long), each taking ``(name, required:, doc:, default:)``.

Python rendition::

    t = TableDefinition()
    t.long("id", required=True)
    t.string("name", doc="display name")
    t.decimal("balance", precision=18, scale=2)
    t.list("tags", StringType())
    t.map("props", StringType(), DoubleType())
    t.struct("address", {"city": StringType(), "zip": StringType()})
    schema = t.schema()

or the hash form accepted by ``Catalog.create_table(schema={"id": "long"})``.
"""

from __future__ import annotations

from typing import Any, Optional, Union

from iceberg_ruby_spark import types as ice_t
from iceberg_ruby_spark.errors import InvalidDataError

# type-name → zero/low-arg constructor, incl. aliases
# (reference lib/iceberg/table_definition.rb:3-12)
_TYPE_NAMES: dict[str, Any] = {
    "boolean": ice_t.BooleanType,
    "int": ice_t.IntType,
    "integer": ice_t.IntType,
    "long": ice_t.LongType,
    "bigint": ice_t.LongType,
    "float": ice_t.FloatType,
    "double": ice_t.DoubleType,
    "decimal": ice_t.DecimalType,
    "date": ice_t.DateType,
    "time": ice_t.TimeType,
    "timestamp": ice_t.TimestampType,
    "timestamptz": ice_t.TimestampTzType,
    "timestamp_nano": ice_t.TimestampNanoType,
    "timestamptz_nano": ice_t.TimestampTzNanoType,
    "string": ice_t.StringType,
    "text": ice_t.StringType,
    "uuid": ice_t.UuidType,
    "fixed": ice_t.FixedType,
    "binary": ice_t.BinaryType,
    "variant": ice_t.VariantType,  # v3 — create_table gates on format-version
    "unknown": ice_t.UnknownType,  # v3 — always optional, values never stored
}


def parse_type(spec: Union[str, ice_t.Type]) -> ice_t.Type:
    """``"decimal(18,2)"`` / ``"long"`` / a Type instance → Type."""
    if isinstance(spec, ice_t.Type):
        return spec
    s = spec.strip().lower()
    if "(" in s and s.endswith(")"):
        name, _, rest = s.partition("(")
        args = [a.strip() for a in rest[:-1].split(",") if a.strip()]
        cls = _TYPE_NAMES.get(name.strip())
        if cls is None:
            raise InvalidDataError(f"unknown type: {name}")
        return cls(*[int(a) for a in args])
    cls = _TYPE_NAMES.get(s)
    if cls is None:
        raise InvalidDataError(f"unknown type: {spec}")
    return cls()


class TableDefinition:
    """Collects NestedFields with auto-assigned stable field ids."""

    def __init__(self) -> None:
        self._fields: list[ice_t.NestedField] = []
        self._next_id = 1

    # -- generic column ----------------------------------------------------
    def column(
        self,
        name: str,
        type_spec: Union[str, ice_t.Type],
        required: bool = False,
        doc: Optional[str] = None,
        default: Any = None,
        null: Optional[bool] = None,
        comment: Optional[str] = None,
    ) -> "TableDefinition":
        """``null=False`` and ``comment=`` are the reference DSL's spellings
        of required/doc (``test/create_table_test.rb:4-20``); ``default``
        sets the WRITE default only — initial-default stays unset, matching
        the reference (create_table_test.rb:17-18)."""
        if any(f.name == name for f in self._fields):
            raise InvalidDataError(f"duplicate column: {name}")
        if null is not None:
            required = not null
        if comment is not None:
            doc = comment
        fid = self._next_id
        self._next_id += 1
        self._fields.append(
            ice_t.NestedField(
                fid,
                name,
                parse_type(type_spec),
                required=required,
                doc=doc,
                write_default=default,
                initial_default=None,
            )
        )
        return self

    # -- typed helpers (one per reference DSL method) ----------------------
    def boolean(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.BooleanType(), **kw)

    def int(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.IntType(), **kw)

    integer = int

    def long(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.LongType(), **kw)

    bigint = long

    def float(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.FloatType(), **kw)

    def double(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.DoubleType(), **kw)

    def decimal(
        self, name: str, precision: int = 38, scale: int = 8, **kw: Any
    ) -> "TableDefinition":
        return self.column(name, ice_t.DecimalType(precision, scale), **kw)

    def date(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.DateType(), **kw)

    def time(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.TimeType(), **kw)

    def timestamp(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.TimestampType(), **kw)

    def timestamptz(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.TimestampTzType(), **kw)

    def timestamp_nano(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.TimestampNanoType(), **kw)

    def timestamptz_nano(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.TimestampTzNanoType(), **kw)

    def string(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.StringType(), **kw)

    text = string

    def uuid(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.UuidType(), **kw)

    def fixed(self, name: str, length: int, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.FixedType(length), **kw)

    def binary(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.BinaryType(), **kw)

    def variant(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.VariantType(), **kw)

    def unknown(self, name: str, **kw: Any) -> "TableDefinition":
        return self.column(name, ice_t.UnknownType(), **kw)

    # -- nested ------------------------------------------------------------
    def list(self, name: str, element: Union[str, ice_t.Type], element_required: bool = False, **kw: Any) -> "TableDefinition":
        elem_id = self._next_id
        self._next_id += 1
        elem = ice_t.NestedField(elem_id, "element", parse_type(element), required=element_required)
        return self.column(name, ice_t.ListType(elem), **kw)

    def map(
        self,
        name: str,
        key: Union[str, ice_t.Type],
        value: Union[str, ice_t.Type],
        value_required: bool = False,
        **kw: Any,
    ) -> "TableDefinition":
        kid, vid = self._next_id, self._next_id + 1
        self._next_id += 2
        kf = ice_t.NestedField(kid, "key", parse_type(key), required=True)
        vf = ice_t.NestedField(vid, "value", parse_type(value), required=value_required)
        return self.column(name, ice_t.MapType(kf, vf), **kw)

    def struct(
        self, name: str, fields: dict[str, Union[str, ice_t.Type]], **kw: Any
    ) -> "TableDefinition":
        nested = []
        for fname, ftype in fields.items():
            fid = self._next_id
            self._next_id += 1
            nested.append(ice_t.NestedField(fid, fname, parse_type(ftype)))
        return self.column(name, ice_t.StructType(nested), **kw)

    # -- output ------------------------------------------------------------
    def schema(self, schema_id: int = 0) -> ice_t.Schema:
        return ice_t.Schema(fields=list(self._fields), schema_id=schema_id)


def schema_from_any(spec: Any) -> ice_t.Schema:
    """Accept the reference's create_table schema forms: a Schema, a
    TableDefinition, a ``{name: type}`` hash, a Spark StructType, a pyarrow
    Schema/Table/RecordBatch (the reference infers from any
    Arrow-schema-bearing object, ``lib/iceberg/catalog.rb:57-58``,
    ``ext/iceberg/src/schema.rs:27-44``), or a callable DSL block
    ``lambda t: t.long("id")`` (reference ``lib/iceberg/catalog.rb:46-70``)."""
    from pyspark.sql import types as T

    if isinstance(spec, ice_t.Schema):
        return spec
    if isinstance(spec, TableDefinition):
        return spec.schema()
    if isinstance(spec, T.StructType):
        return ice_t.Schema.from_spark(spec)
    try:
        import pyarrow as pa

        if isinstance(spec, (pa.Table, pa.RecordBatch)):
            spec = spec.schema
        if isinstance(spec, pa.Schema):
            return ice_t.Schema.from_spark(_arrow_to_spark_struct(spec))
    except ImportError:  # pragma: no cover
        pass
    if isinstance(spec, dict):
        td = TableDefinition()
        for name, type_spec in spec.items():
            td.column(name, type_spec)
        return td.schema()
    if callable(spec):
        td = TableDefinition()
        spec(td)
        return td.schema()
    raise InvalidDataError(f"cannot build a schema from {type(spec).__name__}")


def _arrow_to_spark_struct(arrow_schema: Any):
    """pyarrow Schema → Spark StructType (auto-assigned field ids follow via
    Schema.from_spark, matching the reference's
    ``arrow_schema_to_schema_auto_assign_ids``)."""
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(arrow_schema)

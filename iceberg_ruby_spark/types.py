"""Iceberg-style type system mapped onto Spark SQL types.

Reference: type classes ``lib/iceberg/types.rb:14-136`` and the Ruby→Rust
mapping ``ext/iceberg/src/schema.rs:100-181``.  Documented lossy mappings
(no exact Spark equivalent):

- ``time``          → ``LongType`` carrying microseconds-since-midnight
- ``uuid``          → ``StringType`` (canonical hex form)
- ``fixed(L)``      → ``BinaryType`` with a write-side length check
- ``timestamp_nano``/``timestamptz_nano`` → µs-precision Spark timestamps
  (nanosecond truncation; Spark is µs-precision)

Unlike the reference's Rust binding — which raises ``Todo`` for several
append/scan types (``ext/iceberg/src/batch.rs:29-45``) — every type here is
fully readable and writable, because Spark handles them natively.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import types as T


class Type:
    """Base Iceberg-style type."""

    #: canonical iceberg type name, overridden per class
    name: str = ""

    def to_spark(self) -> T.DataType:
        raise NotImplementedError

    def __repr__(self) -> str:  # pragma: no cover - debugging nicety
        return f"{type(self).__name__}()"

    def __eq__(self, other: object) -> bool:
        return type(self) is type(other) and self.__dict__ == getattr(other, "__dict__", None)

    def __hash__(self) -> int:
        return hash((type(self).__name__, tuple(sorted(self.__dict__.items()))))


class BooleanType(Type):
    name = "boolean"

    def to_spark(self) -> T.DataType:
        return T.BooleanType()


class IntType(Type):
    name = "int"

    def to_spark(self) -> T.DataType:
        return T.IntegerType()


class LongType(Type):
    name = "long"

    def to_spark(self) -> T.DataType:
        return T.LongType()


class FloatType(Type):
    name = "float"

    def to_spark(self) -> T.DataType:
        return T.FloatType()


class DoubleType(Type):
    name = "double"

    def to_spark(self) -> T.DataType:
        return T.DoubleType()


class DecimalType(Type):
    """decimal(precision, scale) — reference ``lib/iceberg/types.rb:29-44``."""

    name = "decimal"

    def __init__(self, precision: int = 38, scale: int = 8):
        if not (0 < precision <= 38):
            raise ValueError(f"invalid decimal precision: {precision}")
        if not (0 <= scale <= precision):
            raise ValueError(f"invalid decimal scale: {scale}")
        self.precision = precision
        self.scale = scale

    def to_spark(self) -> T.DataType:
        return T.DecimalType(self.precision, self.scale)

    def __repr__(self) -> str:
        return f"DecimalType({self.precision}, {self.scale})"


class DateType(Type):
    name = "date"

    def to_spark(self) -> T.DataType:
        return T.DateType()


class TimeType(Type):
    """Microsecond time-of-day.  Spark has no TIME type; documented mapping is
    ``LongType`` microseconds since midnight."""

    name = "time"

    def to_spark(self) -> T.DataType:
        return T.LongType()


class TimestampType(Type):
    """µs, no zone — Spark ``TimestampNTZType``."""

    name = "timestamp"

    def to_spark(self) -> T.DataType:
        return T.TimestampNTZType()


class TimestampTzType(Type):
    """µs, UTC-normalized — Spark ``TimestampType`` with session TZ pinned to
    UTC (reference normalizes zoned ts to +00:00, ``ext/iceberg/src/table.rs:365-375``)."""

    name = "timestamptz"

    def to_spark(self) -> T.DataType:
        return T.TimestampType()


class TimestampNanoType(TimestampType):
    """Iceberg V3 ns timestamp; stored at Spark µs precision (documented
    truncation)."""

    name = "timestamp_nano"


class TimestampTzNanoType(TimestampTzType):
    name = "timestamptz_nano"


class StringType(Type):
    name = "string"

    def to_spark(self) -> T.DataType:
        return T.StringType()


class UuidType(Type):
    """No Spark UUID type; canonical-form string."""

    name = "uuid"

    def to_spark(self) -> T.DataType:
        return T.StringType()


class FixedType(Type):
    """fixed(L) — reference ``lib/iceberg/types.rb:70-84``; binary + length."""

    name = "fixed"

    def __init__(self, length: int):
        if length <= 0:
            raise ValueError(f"invalid fixed length: {length}")
        self.length = length

    def to_spark(self) -> T.DataType:
        return T.BinaryType()

    def __repr__(self) -> str:
        return f"FixedType({self.length})"


class BinaryType(Type):
    name = "binary"

    def to_spark(self) -> T.DataType:
        return T.BinaryType()


class VariantType(Type):
    """Iceberg v3 ``variant`` — semi-structured values.  Maps to Spark 4's
    native ``VariantType`` (same binary encoding family the v3 spec
    adopts), so reads/writes, ``parse_json``/``variant_get`` and parquet
    round-trips are all JVM-native.  The spec allows no bounds, no
    transforms, and no identifier fields on variant — the engine's stats
    allowlist and partition validation enforce those declines."""

    name = "variant"

    def to_spark(self) -> T.DataType:
        return T.VariantType()


class UnknownType(Type):
    """Iceberg v3 ``unknown`` — a column whose type is not (yet) known:
    always optional, every value is null, values are NOT stored in data
    files (writers drop the column; readers project a null literal), and
    the type may later be promoted to ANY other type (the v3 spec's only
    universal promotion).  Maps to Spark's ``NullType`` for in-plan
    representation."""

    name = "unknown"

    def to_spark(self) -> T.DataType:
        return T.NullType()


def type_v3_only(t: "Type") -> Optional[str]:
    """Name of the v3-only type ``t`` is or nests (``variant`` /
    ``unknown``), else None — the format-version gate walks
    struct/list/map nesting (a ``struct<v: variant>`` column is just as
    v3-only as a top-level one)."""
    if isinstance(t, VariantType):
        return "variant"
    if isinstance(t, UnknownType):
        return "unknown"
    if isinstance(t, StructType):
        for f in t.fields:
            r = type_v3_only(f.field_type)
            if r:
                return r
        return None
    if isinstance(t, ListType):
        return type_v3_only(t.element_field.field_type)
    if isinstance(t, MapType):
        return type_v3_only(t.key_field.field_type) or type_v3_only(
            t.value_field.field_type
        )
    return None


def schema_v3_only(schema: "Schema") -> Optional[str]:
    for f in schema.fields:
        r = type_v3_only(f.field_type)
        if r:
            return r
    return None


def _nests_unknown(t: "Type") -> bool:
    """True when ``t`` contains an UnknownType anywhere BELOW itself —
    i.e. a nested unknown (a top-level UnknownType column is fine)."""
    if isinstance(t, StructType):
        return any(
            isinstance(f.field_type, UnknownType) or _nests_unknown(f.field_type)
            for f in t.fields
        )
    if isinstance(t, ListType):
        ef = t.element_field.field_type
        return isinstance(ef, UnknownType) or _nests_unknown(ef)
    if isinstance(t, MapType):
        kt, vt = t.key_field.field_type, t.value_field.field_type
        return (
            isinstance(kt, UnknownType)
            or isinstance(vt, UnknownType)
            or _nests_unknown(kt)
            or _nests_unknown(vt)
        )
    return False


def validate_field_types(fields, fv: int) -> None:
    """Shared v3 type-rule validation for a field list — used by
    create_table, CREATE OR REPLACE, and schema evolution so no entry
    path skips a gate:

    - variant/unknown (including nested) require format-version 3;
    - a top-level unknown column must be optional (every value is null);
    - unknown below the top level is an engine decline: parquet has no
      void encoding and the data-file writer drops only top-level
      columns, so a nested unknown would make the table un-writable.
    """
    from iceberg_ruby_spark.errors import InvalidDataError

    for f in fields:
        name = type_v3_only(f.field_type)
        if name and fv < 3:
            raise InvalidDataError(
                f"{name} columns require format-version 3 "
                f"(Iceberg v3 spec: {name} is a v3 type)"
            )
        if isinstance(f.field_type, UnknownType) and f.required:
            raise InvalidDataError(
                f"unknown-typed column {f.name} must be optional "
                "(v3 spec: every value of unknown type is null)"
            )
        if _nests_unknown(f.field_type):
            raise InvalidDataError(
                f"column {f.name}: unknown type is supported as a "
                "top-level column only (parquet cannot represent a "
                "nested void; promote the nested field to a real type)"
            )


@dataclass
class NestedField:
    """A schema field with a stable id — reference ``ext/iceberg/src/schema.rs:16-24``."""

    field_id: int
    name: str
    field_type: "Type"
    required: bool = False
    doc: Optional[str] = None
    initial_default: Any = None
    write_default: Any = None

    def to_spark(self) -> T.StructField:
        # "parquet.field.id" is Spark's ParquetUtils.FIELD_ID_METADATA_KEY:
        # with spark.sql.parquet.fieldId.write.enabled the parquet writer
        # stamps it as the column's field_id, making data files column-
        # mappable by external Iceberg readers after renames (the reference
        # inherits this from iceberg-rust's writers, schema.rs:100-181)
        metadata: dict[str, Any] = {
            "iceberg.field-id": self.field_id,
            "parquet.field.id": self.field_id,
        }
        if self.doc is not None:
            metadata["comment"] = self.doc
        if self.write_default is not None:
            metadata["iceberg.write-default"] = self.write_default
        if self.initial_default is not None:
            metadata["iceberg.initial-default"] = self.initial_default
        return T.StructField(
            self.name, self.field_type.to_spark(), nullable=not self.required, metadata=metadata
        )


class StructType(Type):
    """struct<fields> — reference ``lib/iceberg/types.rb:89-103``."""

    name = "struct"

    def __init__(self, fields: list[NestedField]):
        self.fields = list(fields)

    def to_spark(self) -> T.DataType:
        return T.StructType([f.to_spark() for f in self.fields])

    def __repr__(self) -> str:
        return f"StructType({self.fields!r})"


class ListType(Type):
    """list<element_field> — element is a full NestedField (id, required)."""

    name = "list"

    def __init__(self, element_field: NestedField):
        self.element_field = element_field

    def to_spark(self) -> T.DataType:
        return T.ArrayType(
            self.element_field.field_type.to_spark(),
            containsNull=not self.element_field.required,
        )


class MapType(Type):
    """map<key_field, value_field>."""

    name = "map"

    def __init__(self, key_field: NestedField, value_field: NestedField):
        self.key_field = key_field
        self.value_field = value_field

    def to_spark(self) -> T.DataType:
        return T.MapType(
            self.key_field.field_type.to_spark(),
            self.value_field.field_type.to_spark(),
            valueContainsNull=not self.value_field.required,
        )


@dataclass
class Schema:
    """Ordered fields + schema_id + identifier fields — reference
    ``ext/iceberg/src/schema.rs:100-181``."""

    fields: list[NestedField] = field(default_factory=list)
    schema_id: int = 0
    identifier_field_ids: list[int] = field(default_factory=list)

    @property
    def highest_field_id(self) -> int:
        top = [f.field_id for f in self.fields] or [0]
        return max(top)

    def to_spark(self) -> T.StructType:
        return T.StructType([f.to_spark() for f in self.fields])

    def field_by_name(self, name: str) -> Optional[NestedField]:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    def field_by_id(self, field_id: int) -> Optional[NestedField]:
        for f in self.fields:
            if f.field_id == field_id:
                return f
        return None

    @staticmethod
    def from_spark(st: T.StructType, schema_id: int = 0) -> "Schema":
        """Infer an Iceberg-style schema from a Spark StructType, auto-assigning
        field ids (analog of ``arrow_schema_to_schema_auto_assign_ids``,
        reference ``ext/iceberg/src/schema.rs:27-44``)."""
        counter = [0]

        def next_id() -> int:
            counter[0] += 1
            return counter[0]

        def conv(dt: T.DataType) -> Type:
            if isinstance(dt, T.BooleanType):
                return BooleanType()
            if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
                return IntType()
            if isinstance(dt, T.LongType):
                return LongType()
            if isinstance(dt, T.FloatType):
                return FloatType()
            if isinstance(dt, T.DoubleType):
                return DoubleType()
            if isinstance(dt, T.DecimalType):
                return DecimalType(dt.precision, dt.scale)
            if isinstance(dt, T.DateType):
                return DateType()
            if isinstance(dt, T.TimestampNTZType):
                return TimestampType()
            if isinstance(dt, T.TimestampType):
                return TimestampTzType()
            if isinstance(dt, T.StringType):
                return StringType()
            if isinstance(dt, T.BinaryType):
                return BinaryType()
            if isinstance(dt, T.VariantType):
                return VariantType()
            if isinstance(dt, T.ArrayType):
                elem = NestedField(next_id(), "element", conv(dt.elementType), not dt.containsNull)
                return ListType(elem)
            if isinstance(dt, T.MapType):
                k = NestedField(next_id(), "key", conv(dt.keyType), True)
                v = NestedField(next_id(), "value", conv(dt.valueType), not dt.valueContainsNull)
                return MapType(k, v)
            if isinstance(dt, T.StructType):
                return StructType(
                    [
                        NestedField(next_id(), f.name, conv(f.dataType), not f.nullable)
                        for f in dt.fields
                    ]
                )
            raise ValueError(f"cannot map Spark type {dt} to an iceberg type")

        fields = [
            NestedField(next_id(), f.name, conv(f.dataType), not f.nullable, doc=None)
            for f in st.fields
        ]
        return Schema(fields=fields, schema_id=schema_id)

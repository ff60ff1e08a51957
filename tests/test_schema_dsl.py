"""Schema DSL + complex types + schema introspection — mirrors reference
``test/create_table_test.rb``, ``test/types_test.rb``, ``test/schema_test.rb``."""

import pytest

from iceberg_ruby_spark import types as ice_t
from iceberg_ruby_spark.errors import InvalidDataError
from iceberg_ruby_spark.table_definition import TableDefinition, parse_type


def test_dsl_block_semantics(catalog):
    # reference test_block: field ids, types, required via null:, write
    # defaults (initial_default stays unset), docs via comment:
    def block(t):
        t.integer("a", default=1)
        t.bigint("b", null=False, comment="Hello")
        t.string("c", default="Test", comment="World")

    table = catalog.create_table("events_dsl", schema=block)
    fields = table.schema.fields
    assert [f.field_id for f in fields] == [1, 2, 3]
    assert [f.name for f in fields] == ["a", "b", "c"]
    assert [type(f.field_type) for f in fields] == [
        ice_t.IntType,
        ice_t.LongType,
        ice_t.StringType,
    ]
    assert [f.required for f in fields] == [False, True, False]
    assert [f.initial_default for f in fields] == [None, None, None]
    assert [f.write_default for f in fields] == [1, None, "Test"]
    assert [f.doc for f in fields] == [None, "Hello", "World"]


def test_dsl_write_default_applied_on_append(catalog):
    def block(t):
        t.int("a")
        t.string("c", default="fallback")

    t = catalog.create_table("events_wd", schema=block)
    t.append([{"a": 1}])
    assert t.to_a() == [{"a": 1, "c": "fallback"}]


def test_complex_types_roundtrip_metadata(catalog):
    # reference types_test: struct/list/map schemas survive create+load
    schema = ice_t.Schema(
        fields=[
            ice_t.NestedField(
                1,
                "struct",
                ice_t.StructType(
                    [
                        ice_t.NestedField(2, "boolean", ice_t.BooleanType()),
                        ice_t.NestedField(3, "int", ice_t.IntType()),
                    ]
                ),
            ),
            ice_t.NestedField(
                4,
                "list",
                ice_t.ListType(ice_t.NestedField(5, "element", ice_t.BooleanType())),
            ),
            ice_t.NestedField(
                6,
                "map",
                ice_t.MapType(
                    ice_t.NestedField(7, "key", ice_t.StringType(), True),
                    ice_t.NestedField(8, "value", ice_t.IntType()),
                ),
            ),
        ]
    )
    t = catalog.create_table("events_cx", schema=schema)
    loaded = catalog.load_table("events_cx").schema
    assert [f.name for f in loaded.fields] == ["struct", "list", "map"]
    assert isinstance(loaded.fields[0].field_type, ice_t.StructType)
    assert isinstance(loaded.fields[1].field_type, ice_t.ListType)
    assert isinstance(loaded.fields[2].field_type, ice_t.MapType)
    # data round-trip through the complex types
    t.append(
        [
            {
                "struct": {"boolean": True, "int": 5},
                "list": [True, False],
                "map": {"k": 1},
            }
        ]
    )
    row = t.to_a()[0]
    assert row["struct"] == {"boolean": True, "int": 5}
    assert row["list"] == [True, False]
    assert row["map"] == {"k": 1}


def test_schema_introspection(catalog):
    # reference schema_test: fields / highest_field_id / as_struct
    schema = catalog.create_table("events_si", schema={"a": "int", "b": "long"}).schema
    assert [f.name for f in schema.fields] == ["a", "b"]
    assert [type(f.field_type) for f in schema.fields] == [ice_t.IntType, ice_t.LongType]
    assert schema.highest_field_id == 2


def test_parse_type_grid():
    assert parse_type("int") == ice_t.IntType()
    assert parse_type("decimal(3, 2)") == ice_t.DecimalType(3, 2)
    assert parse_type("fixed(3)") == ice_t.FixedType(3)
    assert parse_type("timestamptz") == ice_t.TimestampTzType()
    with pytest.raises(InvalidDataError):
        parse_type("not_a_type")


def test_dsl_duplicate_column_rejected():
    td = TableDefinition()
    td.int("a")
    with pytest.raises(InvalidDataError):
        td.int("a")

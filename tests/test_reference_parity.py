"""Reference-surface fidelity pins: behaviors and error STRINGS the
reference's own tests assert (test/create_table_test.rb,
test/namespace_test.rb, test/sql_test.rb, test/static_table_test.rb)."""

import pytest

import iceberg_ruby_spark as ice
from iceberg_ruby_spark.errors import InvalidDataError, UnsupportedFeatureError


def test_create_table_without_schema_is_empty(catalog):
    # create_table_test.rb:108-111 — no schema → zero-field table
    t = catalog.create_table("events_noschema")
    assert t.schema.fields == []


def test_dotted_namespace_level_rejected(catalog):
    # namespace_test.rb:52-56 — "Unsupported namespace"
    with pytest.raises(InvalidDataError, match="Unsupported namespace"):
        catalog.create_namespace(["iceberg_ruby_test.dot"])


def test_single_statement_message(catalog):
    # sql_test.rb:95-100 — exact message
    with pytest.raises(InvalidDataError) as ei:
        catalog.sql("SELECT 1; SELECT 2")
    assert str(ei.value) == (
        "This feature is not implemented: The context currently"
        " only supports a single SQL statement"
    )


def test_duplicate_projection_message(catalog):
    # sql_test.rb:102-107 — assert_match prefix
    with pytest.raises(InvalidDataError, match="Projections require unique expression names"):
        catalog.sql("SELECT 123 AS a, 123 AS a")


def test_static_table_read_only_message(catalog):
    # static_table_test.rb:18-23 — exact message
    t = catalog.create_table("ro", schema={"a": "int"})
    st = ice.StaticTable(t.location)
    with pytest.raises(UnsupportedFeatureError) as ei:
        st.append([{"a": 1}])
    assert str(ei.value) == "Read-only table"

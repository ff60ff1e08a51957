"""Identifier fields (Iceberg's identifier-field-ids, the logical primary
key) + PyIceberg-style upsert defaulting its keys from them."""

import pytest

from iceberg_ruby_spark.errors import InvalidDataError


def test_set_identifier_fields_and_upsert(catalog):
    t = catalog.create_table("idf1", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    assert t.identifier_field_names() == []
    with pytest.raises(InvalidDataError, match="upsert needs keys"):
        t.upsert([{"k": 1, "v": "x"}])
    t.update_schema().set_identifier_fields("k").commit()
    t = t.refresh()
    assert t.identifier_field_names() == ["k"]
    # the field was promoted to required (null-proved from manifests)
    f = next(f for f in t.schema.fields if f.name == "k")
    assert f.required
    t.upsert([{"k": 2, "v": "B"}, {"k": 3, "v": "c"}])
    assert sorted((r["k"], r["v"]) for r in t.refresh().to_a()) == [
        (1, "a"), (2, "B"), (3, "c")
    ]
    # identifiers survive a rename (tracked by id, not name)
    t.update_schema().rename_column("v", "val").commit()
    assert t.refresh().identifier_field_names() == ["k"]


def test_identifier_field_validation(catalog):
    from iceberg_ruby_spark import (
        FloatType,
        IntType,
        ListType,
        NestedField,
        Schema,
        StringType,
    )

    schema = Schema(
        fields=[
            NestedField(1, "k", IntType()),
            NestedField(2, "f", FloatType()),
            NestedField(
                4, "arr", ListType(NestedField(3, "element", IntType()))
            ),
            NestedField(5, "v", StringType()),
        ]
    )
    t = catalog.create_table("idf2", schema=schema)
    t.append([{"k": 1, "f": 1.0, "arr": [1], "v": None}])
    with pytest.raises(InvalidDataError, match="float/double"):
        t.update_schema().set_identifier_fields("f").commit()
    with pytest.raises(InvalidDataError, match="primitive"):
        t.update_schema().set_identifier_fields("arr").commit()
    # existing nulls block the optional->required promotion
    with pytest.raises(InvalidDataError, match="contain nulls"):
        t.update_schema().set_identifier_fields("v").commit()
    with pytest.raises(InvalidDataError, match="no such column"):
        t.update_schema().set_identifier_fields("nope").commit()


def test_identifier_field_drop_guard_and_rekey(catalog):
    t = catalog.create_table("idf3", schema={"a": "int", "b": "int"})
    t.append([{"a": 1, "b": 10}])
    t.update_schema().set_identifier_fields("a").commit()
    t = t.refresh()
    with pytest.raises(InvalidDataError, match="identifier field"):
        t.update_schema().drop_column("a").commit()
    # re-keying to b and dropping a in one schema commit is allowed
    t.update_schema().set_identifier_fields("b").drop_column("a").commit()
    t = t.refresh()
    assert t.identifier_field_names() == ["b"]
    assert [f.name for f in t.schema.fields] == ["b"]
    # clearing identifiers
    t.update_schema().set_identifier_fields().commit()
    assert t.refresh().identifier_field_names() == []


def test_apply_changelog_defaults_to_identifier_fields(catalog, spark):
    src = catalog.create_table("idf4_src", schema={"k": "int", "v": "string"})
    rep = catalog.create_table("idf4_rep", schema={"k": "int", "v": "string"})
    rep.update_schema().set_identifier_fields("k").commit()
    rep = rep.refresh()
    src.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    first = src.current_snapshot().snapshot_id
    src.delete_where("k = 1", mode="merge-on-read")
    src.append([{"k": 3, "v": "c"}])
    rep.apply_changelog(src.changelog_scan())  # on=None -> ["k"]
    assert sorted((r["k"], r["v"]) for r in rep.refresh().to_a()) == [
        (2, "b"), (3, "c")
    ]


def test_identifier_same_batch_add_and_rename_proofs(catalog):
    """The null proof resolves names THROUGH the batch's earlier ops: a
    column added in the same change over existing rows needs a non-null
    default; a renamed column proves against its stored (old-name) data."""
    t = catalog.create_table("idf5", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": None}])
    with pytest.raises(InvalidDataError, match="without a default"):
        t.update_schema().add_column("pk", "long").set_identifier_fields(
            "pk"
        ).commit()
    # with a default, existing rows read the backfill — promotion is legal
    t.update_schema().add_column("pk", "long", default=0).set_identifier_fields(
        "pk"
    ).commit()
    assert t.refresh().identifier_field_names() == ["pk"]
    # rename + identify in one batch: the proof must hit the OLD column's
    # stored nulls, not skip because the new name isn't in current schema
    t2 = catalog.create_table("idf6", schema={"a": "string", "b": "int"})
    t2.append([{"a": None, "b": 1}])
    with pytest.raises(InvalidDataError, match="contain nulls"):
        t2.update_schema().rename_column("a", "key").set_identifier_fields(
            "key"
        ).commit()
    # adding to an EMPTY table needs no default
    t3 = catalog.create_table("idf7", schema={"x": "int"})
    t3.update_schema().add_column("pk", "long").set_identifier_fields("pk").commit()
    assert t3.refresh().identifier_field_names() == ["pk"]


def test_sql_alter_set_identifier_fields(catalog):
    """iceberg-spark DDL: ALTER TABLE t SET IDENTIFIER FIELDS a[, b] and
    DROP IDENTIFIER FIELDS route to set_identifier_fields."""
    t = catalog.create_table("idfsql", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": "a"}])
    catalog.sql("ALTER TABLE idfsql SET IDENTIFIER FIELDS k")
    assert t.refresh().identifier_field_names() == ["k"]
    t.upsert([{"k": 1, "v": "A"}, {"k": 2, "v": "b"}])
    assert sorted((r["k"], r["v"]) for r in t.refresh().to_a()) == [
        (1, "A"), (2, "b")
    ]
    catalog.sql("ALTER TABLE idfsql DROP IDENTIFIER FIELDS")
    assert t.refresh().identifier_field_names() == []
    with pytest.raises(InvalidDataError, match="contain nulls|no such column"):
        catalog.sql("ALTER TABLE idfsql SET IDENTIFIER FIELDS nope")

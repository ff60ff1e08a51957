"""Iceberg field-ids embedded in written parquet footers.

The reference's data files are column-mappable by any engine because
iceberg-rust stamps every column with its Iceberg field id
(``/root/reference/ext/iceberg/src/schema.rs:100-181``); this repo gets
the same property from Spark's native field-id support
(``spark.sql.parquet.fieldId.write.enabled`` + ``parquet.field.id``
StructField metadata).  Verified two independent ways: pyarrow reads the
footer ids directly, and Spark's field-id READ path binds a renamed
column to its pre-rename data — name matching alone cannot do that."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq


def _data_files(t):
    return sorted(glob.glob(f"{t.ops.data_dir}/**/*.parquet", recursive=True))


def test_footers_carry_schema_field_ids(catalog):
    t = catalog.create_table("fid1", schema={"a": "int", "b": "string", "c": "double"})
    t.append([{"a": 1, "b": "x", "c": 1.5}])
    want = {f.name: f.field_id for f in t.schema.fields}
    for path in _data_files(t):
        got = {
            fld.name: int(fld.metadata[b"PARQUET:field_id"])
            for fld in pq.read_schema(path)
        }
        assert got == want


def test_field_ids_follow_schema_evolution(catalog):
    t = catalog.create_table("fid2", schema={"a": "int"})
    t.append([{"a": 1}])
    t.update_schema().add_column("b", "string").commit()
    t.append([{"a": 2, "b": "x"}])
    newest = max(_data_files(t), key=lambda p: pq.read_schema(p).names.__len__())
    ids = {
        fld.name: int(fld.metadata[b"PARQUET:field_id"])
        for fld in pq.read_schema(newest)
    }
    assert ids == {"a": 1, "b": 2}


def test_rename_then_read_back_via_field_id_binding(catalog, spark):
    """A spec reader maps columns by id, not name: after a rename, the OLD
    file (written as 'b') must bind to the NEW schema's 'label' through
    Spark's fieldId.read path — proving the ids in the footer are the real
    Iceberg ids, not decorative."""
    t = catalog.create_table("fid3", schema={"a": "int", "b": "string"})
    t.append([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    old_files = _data_files(t)
    t.update_schema().rename_column("b", "label").commit()
    prev = spark.conf.get("spark.sql.parquet.fieldId.read.enabled", None)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    try:
        df = spark.read.schema(t.schema.to_spark()).parquet(*old_files)
        rows = {(r["a"], r["label"]) for r in df.collect()}
        assert rows == {(1, "x"), (2, "y")}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
        else:
            spark.conf.set("spark.sql.parquet.fieldId.read.enabled", prev)


def test_engine_scan_still_reads_renamed_tables(catalog):
    # the engine's own name-per-schema-id read path is unaffected
    t = catalog.create_table("fid4", schema={"a": "int", "b": "string"})
    t.append([{"a": 1, "b": "x"}])
    t.update_schema().rename_column("b", "label").commit()
    t.append([{"a": 2, "label": "y"}])
    rows = sorted(t.to_a(), key=lambda r: r["a"])
    assert rows == [{"a": 1, "label": "x"}, {"a": 2, "label": "y"}]

"""StaticTable — mirrors reference ``test/static_table_test.rb``: read a
table straight from its metadata path, no catalog; read-only."""

import pytest

import iceberg_ruby_spark as ice
from iceberg_ruby_spark.errors import UnsupportedFeatureError


def test_static_table_reads_and_rejects_writes(catalog):
    t = catalog.create_table("s", schema={"a": "int"})
    t.append([{"a": 1}, {"a": 2}])
    st = ice.StaticTable(t.location)
    assert sorted(r["a"] for r in st.to_a()) == [1, 2]
    assert st.current_snapshot_id == t.current_snapshot_id
    with pytest.raises(UnsupportedFeatureError):
        st.append([{"a": 3}])
    with pytest.raises(UnsupportedFeatureError):
        st.delete_where("a = 1")


def test_static_table_from_metadata_json(catalog):
    t = catalog.create_table("s2", schema={"a": "int"})
    t.append([{"a": 7}])
    meta_file = t.metadata.metadata_file
    st = ice.StaticTable(meta_file)
    assert st.to_a() == [{"a": 7}]


def test_static_table_external_metadata_json(spark):
    """The reference's defining StaticTable behavior
    (``test/static_table_test.rb:4-24``): open an externally-authored spec
    ``metadata.json`` directly — no catalog, no version-hint, no engine
    directory layout."""
    st = ice.StaticTable("/root/reference/test/support/metadata.json", spark=spark)
    fields = st.schema.fields
    assert [f.name for f in fields] == ["a", "b"]
    assert [type(f.field_type).__name__ for f in fields] == ["IntType", "StringType"]
    assert st.location == "file:///tmp/warehouse/main.db/events"
    assert st.current_snapshot_id is None
    assert st.snapshots == []
    assert st.to_a() == []
    with pytest.raises(UnsupportedFeatureError):
        st.append([{"a": 3}])


def test_static_table_metadata_json_ignores_version_hint(catalog, tmp_path):
    """Loading by bare metadata-file path must parse THAT file — copy the
    metadata JSON outside the table tree, delete version-hint.text, and the
    load (a v3 Avro-manifest table with DV deletes) still works."""
    import os
    import shutil

    t = catalog.create_table(
        "s3",
        schema={"k": "int", "v": "string"},
        properties={
            "format-version": "3",
            "write.metadata.manifest-format": "avro",
            "write.delete.mode": "merge-on-read",
        },
    )
    t.append([{"k": i, "v": f"x{i}"} for i in range(10)])
    t.delete_where("k >= 8")  # v3 MoR → deletion vectors
    meta_file = t.metadata.metadata_file
    # Copy the metadata file to a foreign name/location; paths inside are
    # relative to the metadata's own ``location`` field, so the copy loads.
    foreign = tmp_path / "some-external-name.metadata.json"
    shutil.copy(meta_file, foreign)
    os.remove(os.path.join(t.ops.metadata_dir, "version-hint.text"))
    st = ice.StaticTable(str(foreign), spark=t.spark)
    assert sorted(r["k"] for r in st.to_a()) == list(range(8))
    assert st.current_snapshot_id == t.current_snapshot_id
    with pytest.raises(UnsupportedFeatureError):
        st.delete_where("k = 1")


def test_static_table_rejects_non_metadata_json(tmp_path, spark):
    import json

    bad = tmp_path / "not-metadata.json"
    bad.write_text(json.dumps({"hello": "world"}))
    from iceberg_ruby_spark.errors import InvalidDataError

    with pytest.raises(InvalidDataError):
        ice.StaticTable(str(bad), spark=spark)

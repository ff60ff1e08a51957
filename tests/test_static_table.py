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

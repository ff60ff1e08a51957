"""One reference-user journey end-to-end, plus edge paths the unit tests
don't touch (purge, uuid/fixed lossy mappings, overwrite on partitioned
tables)."""

import os

import pyspark.sql.functions as F
import pytest

import iceberg_ruby_spark as ice
from iceberg_ruby_spark.errors import NoSuchTableError


def test_full_user_journey(catalog, spark, tmp_path):
    # 1. namespace + DSL table
    catalog.create_namespace("prod")

    def ddl(t):
        t.long("id")
        t.string("name", comment="display name")
        t.double("score", default=0.0)
        t.timestamp("ts")

    t = catalog.create_table("prod.items", schema=ddl, partition_spec=[("ts", "day")])

    # 2. append from Arrow
    import datetime

    import pyarrow as pa

    batch = pa.table(
        {
            "id": [1, 2, 3],
            "name": ["a", "b", "c"],
            "score": [1.0, 2.0, 3.0],
            "ts": [datetime.datetime(2026, 8, 13, h) for h in (1, 2, 3)],
        }
    )
    t.append(batch)

    # 3. SQL over the table
    res = catalog.sql("SELECT count(*) AS n FROM prod_items WHERE score >= $1", [2.0])
    assert res.rows == [[2]]

    # 4. evolve: add a column, write more
    with t.update_schema() as u:
        u.add_column("tag", "string")
    t = t.refresh()
    t.append(
        [{"id": 4, "name": "d", "score": 4.0,
          "ts": datetime.datetime(2026, 8, 14, 1), "tag": "new"}]
    )

    # 5. tag the current state, keep mutating
    t.create_tag("v1")
    assert t.delete_where("score < 2.0") == 1
    assert len(t.to_a(ref="v1")) == 4  # tag still sees everything
    assert len(t.to_a()) == 3

    # 6. maintenance + statistics
    t.compact()
    stats = t.compute_statistics()
    assert stats["record-count"] == 3
    t = t.refresh()
    t.expire_snapshots(keep_last=1)
    t = t.refresh()
    t.remove_orphan_files()

    # 7. catalog-less read of the final state
    st = ice.StaticTable(t.location)
    assert sorted(r["id"] for r in st.to_a()) == [2, 3, 4]
    assert {r["tag"] for r in st.to_a()} == {None, "new"}


def test_purge_table_removes_data(catalog):
    t = catalog.create_table("purge_me", schema={"a": "int"})
    t.append([{"a": 1}])
    loc = t.location
    assert os.path.isdir(loc)
    catalog.purge_table("purge_me")
    assert not catalog.table_exists("purge_me")
    assert not os.path.exists(loc)
    with pytest.raises(NoSuchTableError):
        catalog.purge_table("purge_me")


def test_uuid_and_fixed_lossy_mappings(catalog):
    # documented mappings: uuid → string, fixed(n) → binary, time → long µs
    t = catalog.create_table(
        "lossy", schema={"u": "uuid", "f": "fixed(3)", "tm": "time"}
    )
    t.append(
        [{"u": "f79c3e09-677c-4bbd-a479-3f349cb785e7", "f": b"abc", "tm": 45_296_000_000}]
    )
    row = t.to_a()[0]
    assert row["u"] == "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    assert bytes(row["f"]) == b"abc"
    assert row["tm"] == 45_296_000_000  # 12:34:56 in µs since midnight


def test_overwrite_partitioned(catalog):
    t = catalog.create_table(
        "owp", schema={"k": "string", "v": "int"}, partition_spec=[("k", "identity")]
    )
    t.append([{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    t.overwrite([{"k": "c", "v": 9}])
    assert t.to_a() == [{"k": "c", "v": 9}]
    files = t.scan().plan_files()
    assert all("/k=c/" in f["data_file_path"] for f in files)


def test_update_moves_rows_across_partitions(catalog):
    t = catalog.create_table(
        "repart", schema={"k": "string", "v": "int"}, partition_spec=[("k", "identity")]
    )
    t.append([{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    t.update_where({"k": "'c'"}, "v = 1")
    rows = sorted(t.to_a(), key=lambda r: r["v"])
    assert rows == [{"k": "c", "v": 1}, {"k": "b", "v": 2}]
    # the moved row physically lives under its new partition directory
    files = {f["data_file_path"] for f in t.scan().plan_files()}
    assert any("/k=c/" in p for p in files)
    assert not any("/k=a/" in p for p in files)

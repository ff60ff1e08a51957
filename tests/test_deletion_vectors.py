"""Iceberg v3 deletion vectors (deletion_vectors.py + table DV mode).

The portable 64-bit roaring codec is held to BYTE EQUALITY with the
JVM's own ``Roaring64NavigableMap`` portable serialization (an
independent implementation of the RoaringFormatSpec, from Spark's
classpath) in both directions, then the DV delete mode is exercised
end-to-end: one bitmap per referenced data file in one Puffin file per
commit, offset-addressed manifest entries, reads, rename survival,
maintenance, compaction, and Avro manifest round trips."""

from __future__ import annotations

import random

import pytest

from iceberg_ruby_spark.deletion_vectors import (
    DV_MAGIC,
    decode_dv_blob,
    encode_dv_blob,
    deserialize_portable_r64,
    serialize_portable_r64,
)
from iceberg_ruby_spark.errors import InvalidDataError

AVRO_PROPS = {"write.metadata.manifest-format": "avro"}


def _jvm_serialize(spark, vals):
    jvm = spark._jvm
    nm = jvm.org.roaringbitmap.longlong.Roaring64NavigableMap()
    for v in vals:
        nm.addLong(v)
    baos = jvm.java.io.ByteArrayOutputStream()
    nm.serializePortable(jvm.java.io.DataOutputStream(baos))
    return bytes(baos.toByteArray())


def _jvm_deserialize(spark, b):
    jvm = spark._jvm
    nm = jvm.org.roaringbitmap.longlong.Roaring64NavigableMap()
    nm.deserializePortable(
        jvm.java.io.DataInputStream(jvm.java.io.ByteArrayInputStream(bytearray(b)))
    )
    it = nm.iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


CASES = [
    [],
    [0],
    [5, 100, 70000, (5 << 32) + 9],
    list(range(5000)),               # bitmap container
    list(range(0, 200000, 2)),       # dense even positions, multi-container
]
random.seed(11)
CASES.append([random.getrandbits(44) for _ in range(2500)])


@pytest.mark.parametrize("vals", CASES, ids=[f"case{i}" for i in range(len(CASES))])
def test_portable_roaring_matches_jvm_bytes_both_ways(spark, vals):
    want = sorted(set(vals))
    ours = serialize_portable_r64(vals)
    theirs = _jvm_serialize(spark, vals)
    assert ours == theirs                       # byte-identical serialization
    assert _jvm_deserialize(spark, ours) == want  # JVM reads ours
    assert deserialize_portable_r64(theirs) == want  # we read JVM's


def test_dv_blob_layout_and_crc():
    blob = encode_dv_blob([3, 9, 1 << 40])
    length = int.from_bytes(blob[:4], "big")
    assert blob[4:8] == DV_MAGIC
    assert len(blob) == 4 + length + 4
    assert decode_dv_blob(blob) == [3, 9, 1 << 40]
    corrupted = blob[:10] + bytes([blob[10] ^ 0xFF]) + blob[11:]
    with pytest.raises(InvalidDataError):
        decode_dv_blob(corrupted)


def test_dv_delete_end_to_end(catalog):
    t = catalog.create_table("dv1", schema={"k": "int"})
    t.append([{"k": i} for i in range(10)])
    assert t.delete_where("k >= 7", mode="merge-on-read-dv") == 3
    assert sorted(r["k"] for r in t.to_a()) == list(range(7))
    # delta semantics: already-dead rows are not re-deleted
    assert t.delete_where("k >= 6", mode="merge-on-read-dv") == 1
    assert sorted(r["k"] for r in t.to_a()) == list(range(6))
    # one puffin delete file per commit, listed by plan_files
    plan = t.scan().plan_files()
    dv_lists = [d for task in plan for d in task["delete_files"] if d.endswith(".puffin")]
    assert dv_lists


def test_dv_entries_are_offset_addressed_per_referenced_file(catalog):
    t = catalog.create_table("dv2", schema={"k": "int"})
    # several appends → several data files → several vectors in one commit
    for lo in (0, 10, 20):
        t.append([{"k": lo + i} for i in range(10)])
    assert t.delete_where("k % 10 = 3", mode="merge-on-read-dv") == 3
    entries = [e for e in t._current_entries() if e.get("content") == "deletion-vector"]
    assert len(entries) == 3  # one per referenced data file
    assert len({e["delete-file"] for e in entries}) == 1  # one puffin file
    for e in entries:
        assert e["deleted-records"] == 1
        assert e["content-offset"] >= 4 and e["content-size"] > 0
        assert e["referenced-data-file"]
    assert sorted(r["k"] for r in t.to_a()) == [
        k for k in range(30) if k % 10 != 3
    ]


def test_dv_survives_rename_and_avro_manifests(catalog):
    t = catalog.create_table("dv3", schema={"k": "int"}, properties=AVRO_PROPS)
    t.append([{"k": i} for i in range(8)])
    assert t.delete_where("k = 2", mode="merge-on-read-dv") == 1
    t.append([{"k": 8}])  # extra commit: DV entry carried through Avro
    catalog.rename_table("dv3", "dv3r")
    t2 = catalog.load_table("dv3r")
    assert sorted(r["k"] for r in t2.to_a()) == [0, 1, 3, 4, 5, 6, 7, 8]
    e = [x for x in t2._current_entries() if x.get("content") == "deletion-vector"]
    assert e and e[0]["content-offset"] is not None


def test_dv_maintenance_and_compaction(catalog):
    t = catalog.create_table("dv4", schema={"k": "int"})
    t.append([{"k": i} for i in range(9)])
    assert t.delete_where("k in (1, 5)", mode="merge-on-read-dv") == 2
    before = {r["k"]: r["_row_id"]
              for r in t.scan().with_row_lineage().to_df().collect()}
    # orphan removal must keep the live puffin file
    assert t.remove_orphan_files() == []
    assert sorted(r["k"] for r in t.to_a()) == [0, 2, 3, 4, 6, 7, 8]
    t.compact()  # materializes the DV, drops the entry, preserves lineage
    assert not [e for e in t._current_entries() if "delete-file" in e]
    after = {r["k"]: r["_row_id"]
             for r in t.scan().with_row_lineage().to_df().collect()}
    assert after == before
    t.expire_snapshots(keep_last=1)
    removed = t.remove_orphan_files()
    assert any(p.endswith(".puffin") for p in removed)  # now truly orphaned
    assert sorted(r["k"] for r in t.to_a()) == [0, 2, 3, 4, 6, 7, 8]


def test_second_dv_replaces_and_subsumes_the_first(catalog):
    """v3 invariant: at most ONE deletion vector per data file — a new
    vector replaces the previous one and carries all its positions."""
    t = catalog.create_table("dv5", schema={"k": "int"})
    t.append([{"k": i} for i in range(10)])  # may span several files
    assert t.delete_where("k in (1, 2)", mode="merge-on-read-dv") == 2
    assert t.delete_where("k in (2, 5)", mode="merge-on-read-dv") == 1  # delta
    dv_entries = [
        e for e in t._current_entries() if e.get("content") == "deletion-vector"
    ]
    # one vector per referenced data file, never two
    refs = [e["referenced-data-file"] for e in dv_entries]
    assert len(refs) == len(set(refs))
    # merged cardinalities cover all 3 dead rows
    assert sum(e["deleted-records"] for e in dv_entries) == 3
    assert sorted(r["k"] for r in t.to_a()) == [0, 3, 4, 6, 7, 8, 9]


def test_portable_roaring_property_vs_jvm(spark):
    """Property test: arbitrary position sets — mixed sparse/dense across
    buckets and container types — serialize byte-identically to the JVM
    codec and decode back exactly."""
    from hypothesis import given, settings, strategies as st

    position = st.one_of(
        st.integers(min_value=0, max_value=1 << 16),          # one container
        st.integers(min_value=0, max_value=1 << 33),          # bucket crossing
        st.integers(min_value=0, max_value=(1 << 62) - 1),    # high buckets
    )

    @settings(max_examples=30, deadline=None)
    @given(st.lists(position, max_size=400))
    def check(vals):
        want = sorted(set(vals))
        ours = serialize_portable_r64(vals)
        assert ours == _jvm_serialize(spark, vals)
        assert deserialize_portable_r64(ours) == want
        assert _jvm_deserialize(spark, ours) == want

    check()


def test_concurrent_dv_writers_keep_one_vector_per_file(catalog):
    """Racing DV commits must not stack two vectors on one data file: the
    rebase detects the collision and the loser re-merges the winner's
    bitmap from fresh state (v3 one-DV-per-file invariant under races)."""
    import threading

    t = catalog.create_table("dv_race", schema={"k": "int"})
    t.append([{"k": i} for i in range(20)])
    errors = []

    def deleter(cond):
        try:
            catalog.load_table("dv_race").delete_where(cond, mode="merge-on-read-dv")
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    conds = ["k in (1, 5)", "k in (5, 9)", "k = 12"]
    threads = [threading.Thread(target=deleter, args=(c,)) for c in conds]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    t = t.refresh()
    assert sorted(r["k"] for r in t.to_a()) == [
        k for k in range(20) if k not in (1, 5, 9, 12)
    ]
    dv = [e for e in t._current_entries() if e.get("content") == "deletion-vector"]
    refs = [e["referenced-data-file"] for e in dv]
    assert len(refs) == len(set(refs)), refs  # never two DVs on one file
    assert sum(e["deleted-records"] for e in dv) == 4


def test_dv_build_is_distributed_driver_collect_is_file_count_bounded(
    catalog, monkeypatch
):
    """The DV write path must build bitmaps executor-side: a delete touching
    thousands of positions across many data files may only collect
    file-count-sized rows (one already-encoded blob per file) on the driver
    — never the positions themselves (the 100 TB scale invariant)."""
    from pyspark.sql.classic.dataframe import DataFrame

    t = catalog.create_table("dv_dist", schema={"k": "int", "v": "int"})
    for lo in range(8):  # 8 single-file appends -> exactly 8 data files
        t.append(
            t.spark.createDataFrame(
                [(lo * 1000 + i, i % 2) for i in range(400)], "k int, v int"
            ).repartition(1)
        )
    n_files = len([e for e in t._current_entries() if e.get("content") != "deletion-vector"])
    assert n_files == 8

    orig_collect = DataFrame.collect
    collected_sizes = []

    def counting_collect(self):
        rows = orig_collect(self)
        collected_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    deleted = t.delete_where("v = 0", mode="merge-on-read-dv")  # 1600 positions
    monkeypatch.setattr(DataFrame, "collect", orig_collect)
    assert deleted == 1600
    assert collected_sizes, "expected the build to collect per-file blob rows"
    # every driver-side collect is bounded by the data-file count, with
    # slack for part-file splits — far below the 1600 deleted positions
    assert max(collected_sizes) <= 2 * n_files, collected_sizes

    dv = [e for e in t._current_entries() if e.get("content") == "deletion-vector"]
    assert len(dv) == 8 and sum(e["deleted-records"] for e in dv) == 1600
    assert sorted(r["k"] for r in t.to_a()) == sorted(
        lo * 1000 + i for lo in range(8) for i in range(400) if i % 2 == 1
    )
    # executor-built blobs still match the JVM portable codec byte-for-byte
    data = t.ops.io.read_bytes(t.ops._abs(dv[0]["delete-file"]))
    for e in dv:
        payload = data[e["content-offset"] : e["content-offset"] + e["content-size"]]
        ps = decode_dv_blob(payload)
        assert len(ps) == e["deleted-records"]
        assert serialize_portable_r64(ps) == _jvm_serialize(
            t.spark, ps
        )


def test_changelog_scan_emits_dv_deleted_rows(catalog):
    """A merge-on-read-dv commit must surface its dead rows as 'delete'
    changelog entries, same as every other delete flavor."""
    t = catalog.create_table(
        "dv_cl", schema={"k": "int"}, properties={"format-version": "3"}
    )
    t.append([{"k": i} for i in range(10)])
    s1 = t.current_snapshot_id
    t.delete_where("k >= 7", mode="merge-on-read-dv")
    rows = t.changelog_scan(from_snapshot_id=s1).collect()
    assert sorted((r["k"], r["_change_type"]) for r in rows) == [
        (7, "delete"), (8, "delete"), (9, "delete")
    ]

"""Iceberg v3 row lineage: per-file first-row-id assignment at commit +
scan(row_lineage) derived ``_row_id`` / ``_last_updated_sequence_number``.

Reference parity: iceberg-ruby surfaces ``next_row_id`` from table
metadata (v3 row-lineage accounting); this engine additionally assigns
the per-file ranges and serves the derived columns on scans."""

from __future__ import annotations

AVRO_PROPS = {"write.metadata.manifest-format": "avro"}


def _lineage_rows(t):
    return t.scan().with_row_lineage().to_df().collect()


def test_row_ids_are_dense_and_seq_tracks_commits(catalog):
    t = catalog.create_table("lin1", schema={"k": "int"})
    t.append([{"k": i} for i in range(5)])
    t.append([{"k": i} for i in range(5, 8)])
    rows = _lineage_rows(t)
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == list(range(8))  # dense, no gaps, no overlap
    by_k = {r["k"]: r["_last_updated_sequence_number"] for r in rows}
    assert {by_k[k] for k in range(5)} == {1}
    assert {by_k[k] for k in range(5, 8)} == {2}
    assert t.next_row_id == 8


def test_row_ids_stable_across_mor_delete(catalog):
    t = catalog.create_table("lin2", schema={"k": "int"})
    t.append([{"k": i} for i in range(6)])
    before = {r["k"]: r["_row_id"] for r in _lineage_rows(t)}
    assert t.delete_where("k = 3", mode="merge-on-read-positional") == 1
    after = {r["k"]: r["_row_id"] for r in _lineage_rows(t)}
    assert 3 not in after
    # survivors keep their ids: file and position unchanged under MoR
    assert after == {k: v for k, v in before.items() if k != 3}


def test_row_ids_stable_across_equality_delete_and_reinsert(catalog):
    t = catalog.create_table("lin3", schema={"k": "int"})
    t.append([{"k": 1}, {"k": 2}])
    before = {r["k"]: r["_row_id"] for r in _lineage_rows(t)}
    t.delete_by_keys([(2,)], on="k")
    t.append([{"k": 2}])
    after = {(r["k"], r["_last_updated_sequence_number"]): r["_row_id"]
             for r in _lineage_rows(t)}
    # k=1 keeps its id; the re-inserted k=2 gets a FRESH id at a later seq
    assert after[(1, 1)] == before[1]
    new_id = [v for (k, _s), v in after.items() if k == 2][0]
    assert new_id not in before.values()


def test_lineage_survives_avro_manifests(catalog):
    t = catalog.create_table("lin4", schema={"k": "int"}, properties=AVRO_PROPS)
    t.append([{"k": i} for i in range(4)])
    t.append([{"k": 4}])
    rows = _lineage_rows(t)
    assert sorted(r["_row_id"] for r in rows) == list(range(5))
    assert t.next_row_id == 5
    # carried entries keep their assigned ranges on the next commit
    t.append([{"k": 5}])
    again = {r["k"]: r["_row_id"] for r in _lineage_rows(t)}
    for r in rows:
        assert again[r["k"]] == r["_row_id"]


def test_lineage_with_select_and_filter(catalog):
    t = catalog.create_table("lin5", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    rows = (
        t.scan().with_row_lineage().filter("k = 2").select("v").to_df().collect()
    )
    assert len(rows) == 1
    assert rows[0]["v"] == "b" and rows[0]["_row_id"] is not None


def test_compaction_preserves_row_ids(catalog):
    """Spec v3: rewrites preserve lineage by MATERIALIZING the reserved
    columns into the rewritten files (inheritance can't survive a
    rewrite).  Ids and sequence numbers must come through compaction
    unchanged, and later appends must still derive fresh ids correctly."""
    t = catalog.create_table("lin6", schema={"k": "int"})
    t.append([{"k": i} for i in range(4)])
    t.append([{"k": i} for i in range(4, 7)])
    assert t.delete_where("k = 2", mode="merge-on-read-positional") == 1
    before = {r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
              for r in _lineage_rows(t)}
    t.compact()
    after = {r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
             for r in _lineage_rows(t)}
    assert after == before
    # rows read back fine without lineage too (reserved cols stay hidden)
    plain = t.to_a()
    assert sorted(r["k"] for r in plain) == [0, 1, 3, 4, 5, 6]
    assert all(set(r) == {"k"} for r in plain)
    # a post-compaction append derives fresh non-overlapping ids
    t.append([{"k": 7}])
    again = {r["k"]: r["_row_id"] for r in _lineage_rows(t)}
    assert again[7] not in {rid for rid, _ in before.values()}
    for k, (rid, _s) in before.items():
        assert again[k] == rid


def test_compaction_lineage_survives_avro_and_second_compaction(catalog):
    t = catalog.create_table("lin7", schema={"k": "int"}, properties=AVRO_PROPS)
    t.append([{"k": i} for i in range(5)])
    before = {r["k"]: r["_row_id"] for r in _lineage_rows(t)}
    t.compact()
    t.append([{"k": 5}])
    t.compact()  # second rewrite re-materializes from the first
    after = {r["k"]: r["_row_id"] for r in _lineage_rows(t)}
    for k, rid in before.items():
        assert after[k] == rid
    assert after[5] not in before.values()


def test_cow_delete_preserves_survivor_lineage(catalog):
    t = catalog.create_table("lin8", schema={"k": "int"})
    t.append([{"k": i} for i in range(6)])
    before = {r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
              for r in _lineage_rows(t)}
    assert t.delete_where("k in (1, 4)") == 2  # copy-on-write rewrite
    after = {r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
             for r in _lineage_rows(t)}
    assert after == {k: v for k, v in before.items() if k not in (1, 4)}


def test_cow_update_keeps_ids_and_bumps_updated_seq_only(catalog):
    t = catalog.create_table("lin9", schema={"k": "int", "v": "string"})
    t.append([{"k": i, "v": "a"} for i in range(4)])
    before = {r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
              for r in _lineage_rows(t)}
    assert t.update_where({"v": "'B'"}, "k >= 2") == 2
    rows = _lineage_rows(t)
    after = {r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
             for r in rows}
    vals = {r["k"]: r["v"] for r in rows}
    assert vals == {0: "a", 1: "a", 2: "B", 3: "B"}
    for k in range(4):
        assert after[k][0] == before[k][0]  # ids stable through the rewrite
    # untouched rows keep seq 1; updated rows inherit the rewrite's seq 2
    assert after[0][1] == 1 and after[1][1] == 1
    assert after[2][1] == 2 and after[3][1] == 2


def test_cow_merge_lineage_update_and_insert_inheritance(catalog, spark):
    t = catalog.create_table("lin10", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 3, "v": "c"}])
    before = {r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
              for r in _lineage_rows(t)}
    src = spark.createDataFrame([(2, "B"), (9, "NEW")], ["k", "v"])
    t.merge_into(src, on="k", when_matched_update={"v": "s.v"})
    rows = _lineage_rows(t)
    after = {r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
             for r in rows}
    assert {r["k"]: r["v"] for r in rows} == {1: "a", 2: "B", 3: "c", 9: "NEW"}
    # untouched rows keep id AND seq; updated row keeps id, inherits seq 2
    assert after[1] == before[1] and after[3] == before[3]
    assert after[2][0] == before[2][0] and after[2][1] == 2
    # inserted row inherits a fresh id (null-cell inheritance) at seq 2
    assert after[9][0] is not None
    assert after[9][0] not in {rid for rid, _ in before.values()}
    assert after[9][1] == 2


def test_incremental_scan_with_lineage_and_dv_window(catalog):
    t = catalog.create_table("lin11", schema={"k": "int"})
    t.append([{"k": 1}, {"k": 2}])
    s1 = t.current_snapshot().snapshot_id
    t.append([{"k": 3}, {"k": 4}])
    t.delete_where("k = 3", mode="merge-on-read-dv")  # DV commit is window-safe
    rows = t.incremental_scan(from_snapshot_id=s1, row_lineage=True).collect()
    # net-effect semantics (consistent with the positional MoR behavior):
    # a row appended AND deleted inside the window is not surfaced
    assert sorted(r["k"] for r in rows) == [4]
    all_ids = {r["k"]: r["_row_id"]
               for r in t.scan().with_row_lineage().to_df().collect()}
    assert rows[0]["_row_id"] == all_ids[4]
    assert rows[0]["_last_updated_sequence_number"] == 2

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

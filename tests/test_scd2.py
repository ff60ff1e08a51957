"""apply_changelog_scd2 — the type-2 history consumer of a changelog
feed: every key version kept as a row bracketed by valid_from/valid_to
snapshot ids, one merge per window, replay-idempotent."""

from __future__ import annotations

import pytest

from iceberg_ruby_spark.errors import InvalidDataError


def _hist_rows(hist, snap_pos):
    """(k, v, from_pos, to_pos) with snapshot ids mapped to their commit
    position so assertions don't depend on random snapshot ids."""
    return sorted(
        (
            r["k"],
            r["v"],
            snap_pos[r["valid_from"]],
            None if r["valid_to"] is None else snap_pos[r["valid_to"]],
        )
        for r in hist.to_a()
    )


def _snap_pos(t):
    snaps = sorted(t.ops.load().snapshots, key=lambda s: s.sequence_number)
    return {s.snapshot_id: i for i, s in enumerate(snaps)}


def _mk(catalog):
    src = catalog.create_table("scd_src", schema={"k": "int", "v": "string"})
    hist = catalog.create_table(
        "scd_hist",
        schema={"k": "int", "v": "string", "valid_from": "long", "valid_to": "long"},
    )
    return src, hist


def test_scd2_versions_one_window(catalog):
    src, hist = _mk(catalog)
    src.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])          # pos 0
    src.update_where({"v": "'A2'"}, "k = 1")                       # pos 1
    src.delete_where("k = 2")                                      # pos 2
    src.append([{"k": 3, "v": "c"}])                               # pos 3
    hist.apply_changelog_scd2(src.changelog_scan(), on="k")
    pos = _snap_pos(src)
    assert _hist_rows(hist, pos) == [
        (1, "A2", 1, None),   # current version of k=1
        (1, "a", 0, 1),       # superseded by the update at commit 1
        (2, "b", 0, 2),       # closed by the delete at commit 2
        (3, "c", 3, None),
    ]
    # the current view equals the source content
    cur = sorted(
        (r["k"], r["v"]) for r in hist.to_a() if r["valid_to"] is None
    )
    assert cur == sorted((r["k"], r["v"]) for r in src.to_a())


def test_scd2_multi_window_and_replay_idempotent(catalog):
    src, hist = _mk(catalog)
    src.append([{"k": 1, "v": "a"}])                               # pos 0
    hist.apply_changelog_scd2(src.changelog_scan(), on="k")
    mark = src.current_snapshot().snapshot_id
    src.update_where({"v": "'a2'"}, "k = 1")                       # pos 1
    src.append([{"k": 2, "v": "b"}])                               # pos 2
    win2 = src.changelog_scan(from_snapshot_id=mark)
    hist.apply_changelog_scd2(win2, on="k")
    pos = _snap_pos(src)
    expect = [
        (1, "a", 0, 1),       # prior OPEN version closed across windows
        (1, "a2", 1, None),
        (2, "b", 2, None),
    ]
    assert _hist_rows(hist, pos) == expect
    # replaying the same window converges to the same state
    hist.apply_changelog_scd2(win2, on="k")
    assert _hist_rows(hist.refresh(), pos) == expect


def test_scd2_mor_deletes_and_identifier_default(catalog):
    src = catalog.create_table("scd_src2", schema={"k": "int", "v": "string"})
    with src.update_schema() as u:
        u.set_identifier_fields("k")
    hist = catalog.create_table(
        "scd_hist2",
        schema={"k": "int", "v": "string", "valid_from": "long", "valid_to": "long"},
    )
    with hist.update_schema() as u:
        u.set_identifier_fields("k")  # not used as merge key; harmless
    src.append([{"k": 1, "v": "x"}, {"k": 2, "v": "y"}])
    src.delete_by_keys([(1,)], on="k")          # equality MoR delete streams too
    hist.apply_changelog_scd2(src.changelog_scan())  # on=None -> identifiers
    pos = _snap_pos(src)
    assert _hist_rows(hist, pos) == [(1, "x", 0, 1), (2, "y", 0, None)]


def test_scd2_schema_validation(catalog):
    src = catalog.create_table("scd_src3", schema={"k": "int", "v": "string"})
    src.append([{"k": 1, "v": "a"}])
    bad = catalog.create_table("scd_bad", schema={"k": "int", "v": "string"})
    with pytest.raises(InvalidDataError, match="valid_from"):
        bad.apply_changelog_scd2(src.changelog_scan(), on="k")
    hist = catalog.create_table(
        "scd_hist3",
        schema={"k": "int", "v": "string", "valid_from": "long", "valid_to": "long"},
    )
    with pytest.raises(InvalidDataError, match="key column"):
        hist.apply_changelog_scd2(src.changelog_scan().drop("k"), on="k")
    with pytest.raises(InvalidDataError, match="needs keys"):
        hist.apply_changelog_scd2(src.changelog_scan())


def test_stream_changelog_scd2_loop(catalog, spark, tmp_path):
    """stream_changelog_scd2 accumulates version history across drains,
    restart-safe (same checkpoint, no-new-data run is a no-op)."""
    from iceberg_ruby_spark.streaming import stream_changelog_scd2

    src = catalog.create_table("scds_src", schema={"k": "int", "v": "string"})
    hist = catalog.create_table(
        "scds_hist",
        schema={"k": "int", "v": "string", "valid_from": "long", "valid_to": "long"},
    )
    ckpt = str(tmp_path / "ckpt")

    def sync():
        q = stream_changelog_scd2(spark, src.refresh(), hist, "k", ckpt)
        q.awaitTermination()

    src.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])       # pos 0
    src.update_where({"v": "'A'"}, "k = 1")                    # pos 1 (CoW pair)
    sync()
    pos = _snap_pos(src)
    assert _hist_rows(hist, pos) == [
        (1, "A", 1, None),
        (1, "a", 0, 1),
        (2, "b", 0, None),
    ]
    src.delete_by_keys([{"k": 2}], "k")                        # pos 2
    src.append([{"k": 3, "v": "c"}])                           # pos 3
    sync()
    pos = _snap_pos(src)
    expect = [
        (1, "A", 1, None),
        (1, "a", 0, 1),
        (2, "b", 0, 2),      # open version closed ACROSS drains
        (3, "c", 3, None),
    ]
    assert _hist_rows(hist.refresh(), pos) == expect
    sync()                                                     # no new data
    assert _hist_rows(hist.refresh(), pos) == expect
    # current view tracks the source
    cur = sorted((r["k"], r["v"]) for r in hist.to_a() if r["valid_to"] is None)
    assert cur == sorted((r["k"], r["v"]) for r in src.refresh().to_a())


def test_scd2_timestamp_brackets(catalog):
    """r11: a history schema carrying valid_from_ts/valid_to_ts stamps
    each bracket edge with the bracketing commit's snapshot timestamp
    (via source=), keeps snapshot-id version identity, and replays
    byte-identically."""
    src = catalog.create_table("scdts_src", schema={"k": "int", "v": "string"})
    hist = catalog.create_table(
        "scdts_hist",
        schema={
            "k": "int", "v": "string",
            "valid_from": "long", "valid_to": "long",
            "valid_from_ts": "long", "valid_to_ts": "long",
        },
    )
    src.append([{"k": 1, "v": "a"}])                               # pos 0
    hist.apply_changelog_scd2(src.changelog_scan(), on="k", source=src)
    mark = src.current_snapshot().snapshot_id
    src.update_where({"v": "'a2'"}, "k = 1")                       # pos 1
    src.append([{"k": 2, "v": "b"}])                               # pos 2
    win2 = src.changelog_scan(from_snapshot_id=mark)
    hist.apply_changelog_scd2(win2, on="k", source=src)
    ts = {s.snapshot_id: s.timestamp_ms for s in src.ops.load().snapshots}
    rows = {(r["k"], r["v"]): r for r in hist.refresh().to_a()}
    for (_, _), r in rows.items():
        assert r["valid_from_ts"] == ts[r["valid_from"]]
        if r["valid_to"] is None:
            assert r["valid_to_ts"] is None
        else:
            assert r["valid_to_ts"] == ts[r["valid_to"]]
    assert len(rows) == 3 and rows[(1, "a")]["valid_to_ts"] is not None
    # replay converges (ts restamped identically)
    before = sorted(map(tuple, (r.values() for r in hist.to_a())))
    hist.apply_changelog_scd2(win2, on="k", source=src)
    assert sorted(map(tuple, (r.values() for r in hist.refresh().to_a()))) == before
    # explicit snapshot_ts mapping works without source
    hist2 = catalog.create_table(
        "scdts_hist2",
        schema={
            "k": "int", "v": "string",
            "valid_from": "long", "valid_to": "long",
            "valid_from_ts": "long", "valid_to_ts": "long",
        },
    )
    hist2.apply_changelog_scd2(src.changelog_scan(), on="k", snapshot_ts=ts)
    got = {r["valid_from_ts"] for r in hist2.refresh().to_a()}
    assert got <= set(ts.values())


def test_scd2_timestamp_brackets_refusals(catalog):
    """ts-bracket schemas refuse silently-NULL stamps: no mapping source
    at all, and a window commit missing from the provided mapping."""
    src = catalog.create_table("scdtsr_src", schema={"k": "int", "v": "string"})
    src.append([{"k": 1, "v": "a"}])
    hist = catalog.create_table(
        "scdtsr_hist",
        schema={
            "k": "int", "v": "string",
            "valid_from": "long", "valid_to": "long",
            "valid_from_ts": "long", "valid_to_ts": "long",
        },
    )
    with pytest.raises(InvalidDataError, match="snapshot-timestamp mapping"):
        hist.apply_changelog_scd2(src.changelog_scan(), on="k")
    with pytest.raises(InvalidDataError, match="no snapshot timestamp"):
        hist.apply_changelog_scd2(
            src.changelog_scan(), on="k", snapshot_ts={-1: 0}
        )
    # plain schema without ts columns: source/snapshot_ts are ignored
    plain = catalog.create_table(
        "scdtsr_plain",
        schema={"k": "int", "v": "string", "valid_from": "long", "valid_to": "long"},
    )
    plain.apply_changelog_scd2(src.changelog_scan(), on="k")
    assert [r["k"] for r in plain.refresh().to_a()] == [1]

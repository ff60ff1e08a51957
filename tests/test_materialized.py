"""Incrementally-maintained materialized aggregates (materialized.py):
refresh folds only the appended window; state equals a from-scratch
aggregate; rewrites are refused until full=True."""

import pytest

from iceberg_ruby_spark.errors import InvalidDataError
from iceberg_ruby_spark.materialized import MaterializedAggregate


def test_materialized_agg_incremental(catalog):
    t = catalog.create_table("mv_facts", schema={"grp": "string", "x": "double"})
    mv = MaterializedAggregate(
        catalog, "mv_facts_agg", t, group_by=["grp"],
        aggs={"total": ("sum", "x"), "n": ("count", "*"),
              "lo": ("min", "x"), "hi": ("max", "x")},
    )
    t.append([{"grp": "a", "x": 1.0}, {"grp": "b", "x": 2.0}])
    mv.refresh()
    t.append([{"grp": "a", "x": 3.0}, {"grp": "c", "x": 5.0}])
    mv.refresh()
    t.append([{"grp": "b", "x": -1.0}])
    r = mv.refresh()
    assert sorted(
        (x["grp"], x["total"], x["n"], x["lo"], x["hi"]) for x in r.to_a()
    ) == [
        ("a", 4.0, 2, 1.0, 3.0),
        ("b", 1.0, 2, -1.0, 2.0),
        ("c", 5.0, 1, 5.0, 5.0),
    ]
    # nothing new -> no commit (idempotent refresh)
    snap = r.current_snapshot_id
    mv.refresh()
    assert catalog.load_table("mv_facts_agg").current_snapshot_id == snap
    # source rewrite: incremental refresh refuses, full rebuild recovers
    t.compact()
    t.append([{"grp": "a", "x": 10.0}])
    with pytest.raises(InvalidDataError):
        mv.refresh()
    r = mv.refresh(full=True)
    assert sorted((x["grp"], x["total"]) for x in r.to_a()) == [
        ("a", 14.0), ("b", 1.0), ("c", 5.0)
    ]
    # incremental maintenance resumes from the rebuilt watermark
    t.append([{"grp": "c", "x": 1.0}])
    r = mv.refresh()
    assert sorted((x["grp"], x["total"]) for x in r.to_a()) == [
        ("a", 14.0), ("b", 1.0), ("c", 6.0)
    ]


def test_materialized_agg_changelog_mode(catalog):
    """mode='changelog' (r9): deletes RETRACT, updates net to the value
    change, a fully-retracted group disappears from reads, and a source
    compaction no longer forces full=True (physical churn cancels in the
    changelog)."""
    t = catalog.create_table("mv_cl", schema={"grp": "string", "x": "double"})
    mv = MaterializedAggregate(
        catalog, "mv_cl_agg", t, group_by=["grp"],
        aggs={"total": ("sum", "x"), "n": ("count", "*")},
        mode="changelog",
    )
    t.append([
        {"grp": "a", "x": 1.0}, {"grp": "a", "x": 3.0},
        {"grp": "b", "x": 2.0}, {"grp": "c", "x": 5.0},
    ])
    mv.refresh()
    assert sorted((x["grp"], x["total"], x["n"]) for x in mv.to_df().collect()) == [
        ("a", 4.0, 2), ("b", 2.0, 1), ("c", 5.0, 1),
    ]
    # merge-on-read predicate delete retracts; CoW update nets
    t.delete_where("grp = 'a' AND x = 3.0", mode="merge-on-read")
    t.update_where({"x": "20.0"}, "grp = 'b'")        # CoW rewrite commit
    mv.refresh()
    assert sorted((x["grp"], x["total"], x["n"]) for x in mv.to_df().collect()) == [
        ("a", 1.0, 1), ("b", 20.0, 1), ("c", 5.0, 1),
    ]
    # full-group retraction: 'c' vanishes from reads (tombstone filtered)
    t.delete_where("grp = 'c'")
    mv.refresh()
    assert sorted((x["grp"], x["total"]) for x in mv.to_df().collect()) == [
        ("a", 1.0), ("b", 20.0),
    ]
    # compaction + append: NO full refresh needed in changelog mode
    t.compact()
    t.append([{"grp": "a", "x": 9.0}])
    mv.refresh()
    assert sorted((x["grp"], x["total"], x["n"]) for x in mv.to_df().collect()) == [
        ("a", 10.0, 2), ("b", 20.0, 1),
    ]
    # state equals a from-scratch aggregate of the source
    from pyspark.sql import functions as F

    want = sorted(
        (r["grp"], r["total"], r["n"])
        for r in t.to_df().groupBy("grp")
        .agg(F.sum("x").alias("total"), F.count("*").alias("n"))
        .collect()
    )
    got = sorted((x["grp"], x["total"], x["n"]) for x in mv.to_df().collect())
    assert got == want
    with pytest.raises(InvalidDataError, match="expected 'append' or 'changelog'"):
        MaterializedAggregate(
            catalog, "mv_cl_bad2", t, group_by=["grp"],
            aggs={"total": ("sum", "x")}, mode="bogus",
        )
    with pytest.raises(InvalidDataError, match="reserved"):
        MaterializedAggregate(
            catalog, "mv_cl_bad3", t, group_by=["grp"],
            aggs={"__mv_n": ("count", "*")}, mode="changelog",
        )


def test_materialized_agg_null_window_does_not_poison(catalog):
    """A refresh window whose sum-column values are ALL NULL for a group
    contributes a NULL partial; the combine must absorb it (SQL SUM
    semantics: null only when every value is null) instead of poisoning
    the stored total to NULL forever (r9 review finding #2)."""
    t = catalog.create_table("mv_nul", schema={"grp": "string", "x": "double"})
    mv = MaterializedAggregate(
        catalog, "mv_nul_agg", t, group_by=["grp"],
        aggs={"total": ("sum", "x"), "n": ("count", "x")},
    )
    t.append([{"grp": "a", "x": 1.0}])
    mv.refresh()
    t.append([{"grp": "a", "x": None}, {"grp": "b", "x": None}])
    mv.refresh()
    # a: 1.0 survives the NULL window; b: all-null group reads NULL (SQL)
    got = {x["grp"]: (x["total"], x["n"]) for x in mv.to_df().collect()}
    assert got == {"a": (1.0, 1), "b": (None, 0)}
    # and a later non-null window folds into BOTH (b recovers from NULL)
    t.append([{"grp": "a", "x": 2.0}, {"grp": "b", "x": 5.0}])
    mv.refresh()
    got = {x["grp"]: (x["total"], x["n"]) for x in mv.to_df().collect()}
    assert got == {"a": (3.0, 2), "b": (5.0, 1)}


def test_materialized_agg_guards(catalog):
    t = catalog.create_table("mv_g", schema={"grp": "string", "x": "double"})
    with pytest.raises(InvalidDataError, match="not decomposable"):
        MaterializedAggregate(
            catalog, "mv_g_a", t, group_by=["grp"], aggs={"m": ("median", "x")}
        )
    with pytest.raises(InvalidDataError, match="shadows a key"):
        MaterializedAggregate(
            catalog, "mv_g_b", t, group_by=["grp"], aggs={"grp": ("sum", "x")}
        )
    mv = MaterializedAggregate(
        catalog, "mv_g_c", t, group_by=["nope"], aggs={"s": ("sum", "x")}
    )
    with pytest.raises(InvalidDataError, match="not in source"):
        mv.refresh()
    with pytest.raises(InvalidDataError, match="not yet refreshed"):
        MaterializedAggregate(
            catalog, "mv_never", t, group_by=["grp"], aggs={"s": ("sum", "x")}
        ).to_df()


def test_materialized_agg_time_bucket(catalog):
    """Hypertable-style time-bucketed rollup: group on a derived
    date_trunc expression, incrementally folded across appends."""
    import datetime

    t = catalog.create_table("mv_ev", schema={"ts": "timestamp", "x": "double"})
    mv = MaterializedAggregate(
        catalog, "mv_ev_daily", t, group_by=["day"],
        aggs={"total": ("sum", "x"), "n": ("count", "*")},
        derived={"day": "date_trunc('DAY', ts)"},
    )
    d1 = datetime.datetime(2026, 8, 1, 3)
    d2 = datetime.datetime(2026, 8, 2, 5)
    t.append([{"ts": d1, "x": 1.0}, {"ts": d1.replace(hour=9), "x": 2.0}])
    mv.refresh()
    t.append([{"ts": d2, "x": 5.0}, {"ts": d1.replace(hour=23), "x": 4.0}])
    r = mv.refresh()
    assert sorted((str(x["day"]), x["total"], x["n"]) for x in r.to_a()) == [
        ("2026-08-01 00:00:00", 7.0, 3),
        ("2026-08-02 00:00:00", 5.0, 1),
    ]


def test_materialized_agg_changelog_minmax_hybrid(catalog):
    """r10: min/max maintain under changelog mode via the hybrid
    endangered-group recompute (r9 refused them).  Deletes that hit the
    stored extremum recompute just that group; deletes that miss it fold
    without a recompute; duplicates, within-window create+delete, full
    retraction, and NULL values all land on from-scratch semantics."""
    t = catalog.create_table("mv_mm", schema={"grp": "string", "x": "double"})
    mv = MaterializedAggregate(
        catalog, "mv_mm_agg", t, group_by=["grp"],
        aggs={"lo": ("min", "x"), "hi": ("max", "x"),
              "total": ("sum", "x"), "n": ("count", "*")},
        mode="changelog",
    )
    t.append([
        {"grp": "a", "x": 1.0}, {"grp": "a", "x": 5.0}, {"grp": "a", "x": 5.0},
        {"grp": "b", "x": 2.0}, {"grp": "b", "x": 9.0},
        {"grp": "c", "x": 7.0},
    ])
    mv.refresh()

    def state():
        return sorted(
            (r["grp"], r["lo"], r["hi"], r["total"], r["n"])
            for r in mv.to_df().collect()
        )

    assert state() == [
        ("a", 1.0, 5.0, 11.0, 3), ("b", 2.0, 9.0, 11.0, 2), ("c", 7.0, 7.0, 7.0, 1),
    ]
    # delete hits a's stored MIN → recompute; b's delete misses both
    # extremes → pure fold; duplicate extreme: deleting ONE 5.0 keeps hi=5.0
    t.delete_where("grp = 'a' AND x = 1.0", mode="merge-on-read")
    t.delete_where("grp = 'a' AND x = 5.0")  # CoW: kills BOTH 5.0 rows
    t.append([{"grp": "a", "x": 3.0}])
    mv.refresh()
    assert state() == [
        ("a", 3.0, 3.0, 3.0, 1), ("b", 2.0, 9.0, 11.0, 2), ("c", 7.0, 7.0, 7.0, 1),
    ]
    # delete the stored MAX of b → recompute finds the runner-up
    t.delete_where("grp = 'b' AND x = 9.0", mode="merge-on-read")
    mv.refresh()
    assert state() == [
        ("a", 3.0, 3.0, 3.0, 1), ("b", 2.0, 2.0, 2.0, 1), ("c", 7.0, 7.0, 7.0, 1),
    ]
    # within-window create+partial-delete of a NEW group: insert-side
    # candidate alone would be wrong (min over survivors only)
    t.append([{"grp": "d", "x": 4.0}, {"grp": "d", "x": 8.0}])
    t.delete_where("grp = 'd' AND x = 4.0")
    mv.refresh()
    got = {r["grp"]: (r["lo"], r["hi"]) for r in mv.to_df().collect()}
    assert got["d"] == (8.0, 8.0)
    # full retraction: group vanishes (tombstone), then re-inserts cleanly
    t.delete_where("grp = 'c'")
    mv.refresh()
    assert "c" not in {r["grp"] for r in mv.to_df().collect()}
    t.append([{"grp": "c", "x": 0.5}])
    mv.refresh()
    got = {r["grp"]: (r["lo"], r["hi"]) for r in mv.to_df().collect()}
    assert got["c"] == (0.5, 0.5)
    # final cross-check: state ≡ from-scratch aggregate of the source
    from pyspark.sql import functions as F

    want = sorted(
        (r["grp"], r["lo"], r["hi"], r["total"], r["n"])
        for r in t.to_df().groupBy("grp").agg(
            F.min("x").alias("lo"), F.max("x").alias("hi"),
            F.sum("x").alias("total"), F.count("*").alias("n"),
        ).collect()
    )
    assert state() == want


def test_materialized_agg_mode_persisted(catalog):
    """r10 (r9 ADVICE): the maintenance mode and agg spec are stamped on
    the rollup table; reopening under a different mode or spec refuses
    instead of silently corrupting the state."""
    t = catalog.create_table("mv_pp", schema={"grp": "string", "x": "double"})
    mv = MaterializedAggregate(
        catalog, "mv_pp_agg", t, group_by=["grp"],
        aggs={"total": ("sum", "x")}, mode="changelog",
    )
    t.append([{"grp": "a", "x": 1.0}])
    mv.refresh()
    props = catalog.load_table("mv_pp_agg").properties
    assert props.get("mv.mode") == "changelog"
    assert "total" in props.get("mv.spec", "")
    wrong_mode = MaterializedAggregate(
        catalog, "mv_pp_agg", t, group_by=["grp"],
        aggs={"total": ("sum", "x")}, mode="append",
    )
    with pytest.raises(InvalidDataError, match="mode"):
        wrong_mode.refresh()
    wrong_spec = MaterializedAggregate(
        catalog, "mv_pp_agg", t, group_by=["grp"],
        aggs={"total": ("sum", "x"), "n": ("count", "*")}, mode="changelog",
    )
    with pytest.raises(InvalidDataError, match="spec"):
        wrong_spec.refresh()
    # the matching handle keeps working
    t.append([{"grp": "a", "x": 2.0}])
    mv.refresh()
    assert [(r["grp"], r["total"]) for r in mv.to_df().collect()] == [("a", 3.0)]

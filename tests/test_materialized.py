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
    # invertibility guard
    with pytest.raises(InvalidDataError, match="not invertible"):
        MaterializedAggregate(
            catalog, "mv_cl_bad", t, group_by=["grp"],
            aggs={"lo": ("min", "x")}, mode="changelog",
        )
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

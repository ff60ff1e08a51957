"""Per-file Bloom key index: manifest-level point-lookup pruning beyond
min/max bounds (standing index state in table properties + one Puffin
file, like IVF/PQ)."""

from __future__ import annotations

import pytest

from iceberg_ruby_spark.errors import InvalidDataError


def _mk_interleaved(catalog, name, files=8, per=100, stride=None):
    """One FILE per append (coalesce(1)), ids interleaved mod `files` so
    every file's [min, max] spans the whole domain — bounds pruning is
    provably useless here and only the bloom can skip files."""
    t = catalog.create_table(name, schema={"id": "long", "v": "string"})
    spark = t.spark
    stride = stride or files
    for f in range(files):
        rows = [(i * stride + f, f"v{i * stride + f}") for i in range(per)]
        t.append(spark.createDataFrame(rows, "id long, v string").coalesce(1))
    return t


def test_bloom_prunes_point_lookup_bounds_cannot(catalog):
    t = _mk_interleaved(catalog, "bl1")
    target = 3 * 8 + 5
    n_files = len(t.scan().plan_files())
    base = len(t.scan().filter(f"id = {target}").plan_files())
    assert base >= 6  # interleaving defeats bounds on nearly every file
    info = t.build_key_bloom("id", fpp=0.001)
    assert info["files"] == n_files
    t = t.refresh()
    pruned = t.scan().filter(f"id = {target}").plan_files()
    # the key lives in ONE file; md5 blooms are deterministic, so allow
    # at most one false-positive keep without flaking across layouts
    assert 1 <= len(pruned) <= 2 and len(pruned) < base
    # and the answer is right
    assert [r["v"] for r in t.scan().filter(f"id = {target}").to_a()] == [f"v{target}"]
    # absent key: (almost) every file pruned, empty result regardless
    assert len(t.scan().filter("id = 999999").plan_files()) <= 1
    assert t.scan().filter("id = 999999").to_a() == []


def test_bloom_conservative_for_new_and_rewritten_files(catalog):
    t = _mk_interleaved(catalog, "bl2", files=4, per=50)
    t.build_key_bloom("id")
    t = t.refresh()
    # a file appended AFTER the build isn't indexed: kept, found
    t.append(t.spark.createDataFrame([(777777, "new")], "id long, v string").coalesce(1))
    t = t.refresh()
    assert [r["v"] for r in t.scan().filter("id = 777777").to_a()] == ["new"]
    plan = t.scan().filter("id = 777777").plan_files()
    # every indexed file pruned; the unindexed one (plus at most one
    # deterministic false positive) kept
    assert 1 <= len(plan) <= 2
    # compaction rewrites every path -> nothing indexed, nothing pruned,
    # still correct
    t.compact()
    t = t.refresh()
    assert [r["v"] for r in t.scan().filter("id = 777777").to_a()] == ["new"]


def test_bloom_only_safe_conjuncts_prune(catalog):
    t = _mk_interleaved(catalog, "bl3", files=4, per=50)
    t.build_key_bloom("id")
    t = t.refresh()
    # OR branches never prune
    rows = t.scan().filter("id = 5 OR id = 6").to_a()
    assert sorted(r["id"] for r in rows) == [5, 6]
    # the bloom must NOT prune by one disjunct: the file holding id=5
    # survives and the row comes back
    assert [r["id"] for r in t.scan().filter("id = 999999 OR id = 5").to_a()] == [5]
    # AND conjunct does
    assert len(t.scan().filter("id = 999999 AND v = 'x'").plan_files()) <= 1
    # string column with int literal (SQL coerces, bloom must not prune)
    t2 = catalog.create_table("bl3s", schema={"s": "string"})
    t2.append([{"s": "05"}])
    t2.build_key_bloom("s")
    t2 = t2.refresh()
    assert len(t2.scan().filter("s = 5").plan_files()) == 1


def test_bloom_lifecycle_and_guards(catalog):
    # stride 8 with 4 files: id 4 is absent but INSIDE every file's
    # bounds, so only the bloom can prune it — and after drop, nothing does
    t = _mk_interleaved(catalog, "bl4", files=4, per=50, stride=8)
    with pytest.raises(InvalidDataError, match="no column"):
        t.build_key_bloom("zz")
    t2 = catalog.create_table("bl4f", schema={"f": "double"})
    t2.append([{"f": 1.0}])
    with pytest.raises(InvalidDataError, match="int/long/string"):
        t2.build_key_bloom("f")
    # rebuild supersedes (old puffin deleted), drop unregisters
    import glob
    import os

    t.build_key_bloom("id")
    t = t.refresh()
    t.build_key_bloom("id")
    t = t.refresh()
    pufs = glob.glob(os.path.join(t.ops.metadata_dir, "bloom-id-*.puffin"))
    assert len(pufs) == 1
    assert len(t.scan().filter("id = 4").plan_files()) <= 1  # bloom prunes
    t.drop_key_bloom("id")
    t = t.refresh()
    assert glob.glob(os.path.join(t.ops.metadata_dir, "bloom-id-*.puffin")) == []
    assert t._bloom_index("id") is None
    n_files = len(t.scan().plan_files())
    assert len(t.scan().filter("id = 4").plan_files()) == n_files  # no pruning


def test_bloom_call_routes(catalog):
    t = _mk_interleaved(catalog, "bl5", files=4, per=50)
    n_files = len(t.scan().plan_files())
    rows = catalog.sql("CALL system.build_key_bloom(table => 'bl5', col => 'id')").rows
    assert rows == [["id", n_files, rows[0][2]]] and rows[0][2] > 0
    t = t.refresh()
    assert len(t.scan().filter("id = 999999").plan_files()) <= 1
    catalog.sql("CALL system.drop_key_bloom(table => 'bl5', col => 'id')")
    assert t.refresh().properties.get("bloom.index.id.path") is None


def test_bloom_prunes_in_lists(catalog):
    """col IN (…) parses to an OR-of-equalities; the bloom prunes files
    rejecting EVERY value, bounds prune per disjunct, results exact."""
    t = _mk_interleaved(catalog, "bl6", files=4, per=50, stride=8)
    t.build_key_bloom("id", fpp=0.001)
    t = t.refresh()
    n_files = len(t.scan().plan_files())
    assert n_files == 4
    # ids 1 and 2 live in two distinct files; 4 is absent-but-in-bounds
    plan = t.scan().filter("id IN (1, 2, 4)").plan_files()
    assert 2 <= len(plan) <= 3
    rows = sorted(r["id"] for r in t.scan().filter("id IN (1, 2, 4)").to_a())
    assert rows == [1, 2]
    # all-absent IN: everything pruned
    assert len(t.scan().filter("id IN (4, 12, 20)").plan_files()) <= 1
    # NOT IN parses to AND-of-inequalities: never bloom-pruned, correct
    n = len(t.scan().filter("id NOT IN (1, 2)").to_a())
    assert n == 4 * 50 - 2
    # mixed-column OR never prunes a file that could satisfy either side
    rows = sorted(r["id"] for r in t.scan().filter("id = 4 OR v = 'v1'").to_a())
    assert rows == [1]


def test_bloom_refresh_incremental(catalog):
    """refresh_key_bloom reads ONLY unindexed files (O(new files)),
    drops blobs for dead files, keeps the rest verbatim."""
    t = _mk_interleaved(catalog, "bl7", files=3, per=50, stride=8)
    t.build_key_bloom("id", fpp=0.001)
    t = t.refresh()
    # two new single-file appends
    for f in (3, 4):
        t.append(
            t.spark.createDataFrame(
                [(i * 8 + f, f"v{i * 8 + f}") for i in range(50)], "id long, v string"
            ).coalesce(1)
        )
    t = t.refresh()
    r = t.refresh_key_bloom("id")
    assert r["built"] == 2 and r["files"] == 5 and r["dropped"] == 0
    t = t.refresh()
    # new keys now prunable: id 3 lives only in the f=3 file
    assert 1 <= len(t.scan().filter("id = 3").plan_files()) <= 2
    assert [r2["id"] for r2 in t.scan().filter("id = 3").to_a()] == [3]
    # absent-in-bounds key pruned across old AND new files
    assert len(t.scan().filter("id = 7").plan_files()) <= 1
    # compaction rewrites everything; refresh rebuilds from scratch shape
    t.compact()
    t = t.refresh()
    r2 = t.refresh_key_bloom("id")
    assert r2["dropped"] == 5 and r2["built"] == r2["files"]
    t = t.refresh()
    assert len(t.scan().filter("id = 7").plan_files()) <= 1
    assert [x["id"] for x in t.scan().filter("id = 3").to_a()] == [3]
    # refresh with no registered index = full build
    t2 = catalog.create_table("bl7b", schema={"id": "long"})
    t2.append([{"id": 1}])
    assert t2.refresh_key_bloom("id")["files"] >= 1


def test_bloom_refresh_call_route(catalog):
    t = _mk_interleaved(catalog, "bl8", files=3, per=30)
    catalog.sql("CALL system.build_key_bloom(table => 'bl8', col => 'id')")
    t = t.refresh()
    t.append(t.spark.createDataFrame([(900, "x")], "id long, v string").coalesce(1))
    rows = catalog.sql("CALL system.refresh_key_bloom(table => 'bl8', col => 'id')").rows
    assert rows[0][0] == "id" and rows[0][2] == 1  # one new file built


def test_bloom_exact_above_2_53_with_nulls(catalog):
    """r10 review: a nullable long column crossing into pandas becomes
    float64 and rounds keys above 2^53 — the build now casts to string
    on the JVM, so snowflake-scale ids stay exact."""
    big = 9007199254740993  # 2^53 + 1: float64 rounds it to ...992
    t = catalog.create_table("blbig", schema={"id": "long", "pad": "long"})
    t.append(
        t.spark.createDataFrame(
            [(big, 1), (None, 2), (5, 3)], "id long, pad long"
        ).coalesce(1)
    )
    t.append(t.spark.createDataFrame([(7, 4)], "id long, pad long").coalesce(1))
    t.build_key_bloom("id", fpp=0.001)
    t = t.refresh()
    rows = t.scan().filter(f"id = {big}").to_a()
    assert [r["pad"] for r in rows] == [1]  # not silently pruned
    assert len(t.scan().filter(f"id = {big}").plan_files()) >= 1


def test_bloom_stale_after_column_drop_readd(catalog):
    """r10 review: dropping a column and re-adding one under the same
    name must NOT consult the old index (its blobs encode the old
    column's values) — the stamped field-id detects the reuse; a refresh
    rebuilds under the new identity."""
    t = catalog.create_table("blreadd", schema={"id": "long", "v": "string"})
    t.append(t.spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string").coalesce(1))
    t.build_key_bloom("v")
    t = t.refresh()
    with t.update_schema() as u:
        u.drop_column("v")
    with t.update_schema() as u:
        u.add_column("v", "string")
    t = t.refresh()
    assert t._bloom_index("v") is None  # stale index unused
    t.append(t.spark.createDataFrame([(3, "zz")], "id long, v string").coalesce(1))
    t = t.refresh()
    assert [r["id"] for r in t.scan().filter("v = 'zz'").to_a()] == [3]
    # refresh rebuilds from scratch under the new field id
    r = t.refresh_key_bloom("v")
    assert r["files"] == r.get("built", r["files"])
    t = t.refresh()
    assert t._bloom_index("v") is not None
    assert [r2["id"] for r2 in t.scan().filter("v = 'zz'").to_a()] == [3]


def test_bloom_auto_refresh_property(catalog):
    """r11: write.bloom.auto-refresh=true folds index maintenance into
    commit paths — appends and compaction keep the index current with no
    manual CALLs; commits that change no data files skip the rewrite;
    property off = current (stale-but-conservative) behavior."""
    t = _mk_interleaved(catalog, "blauto", files=4, per=50)
    t.build_key_bloom("id", fpp=0.001)
    t.update_properties({"write.bloom.auto-refresh": "true"})
    t = t.refresh()
    covered = lambda: len(t._bloom_index("id") or {})
    n0 = covered()
    # an append auto-extends the index over the new file
    t.append(
        t.spark.createDataFrame([(777777, "new")], "id long, v string").coalesce(1)
    )
    t = t.refresh()
    t._bloom_cache.clear()
    assert covered() == n0 + 1
    # ...and lookups prune with it immediately (absent key: ~all pruned)
    assert len(t.scan().filter("id = 999999").plan_files()) <= 1
    assert len(t.scan().filter("id = 777777").plan_files()) <= 2
    assert [r["v"] for r in t.scan().filter("id = 777777").to_a()] == ["new"]
    # a MoR delete adds no data files: the refresh no-ops (index file
    # unchanged on disk)
    path_before = t.properties["bloom.index.id.path"]
    t.delete_where("id = 1", mode="merge-on-read-dv")
    t = t.refresh()
    assert t.properties["bloom.index.id.path"] == path_before
    # compaction rewrites every file: the index follows the new layout
    t.compact()
    t = t.refresh()
    t._bloom_cache.clear()
    live = len(t.scan().plan_files())
    assert covered() == live
    assert t.properties["bloom.index.id.path"] != path_before
    assert [r["v"] for r in t.scan().filter("id = 777777").to_a()] == ["new"]
    # property off: appends no longer extend (conservative staleness)
    t.update_properties({"write.bloom.auto-refresh": "false"})
    t = t.refresh()
    t.append(
        t.spark.createDataFrame([(888888, "n2")], "id long, v string").coalesce(1)
    )
    t = t.refresh()
    t._bloom_cache.clear()
    assert covered() == live  # unchanged
    assert [r["v"] for r in t.scan().filter("id = 888888").to_a()] == ["n2"]

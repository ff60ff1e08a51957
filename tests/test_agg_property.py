"""Property-based soundness net for the metadata aggregate layer (r12).

Hypothesis drives random table histories — appends with NULL-bearing
values, a randomly-chosen delete flavor (copy-on-write, deletion vector,
equality, positional), a random filter — and asserts that
count()/min()/max()/metadata_group_counts() equal python ground truth
computed from the live rows.  The engine may serve each answer from
manifest stats or from an executed scan; BOTH must agree with the truth,
so any unsound metadata proof (a bad bounds rule, a DV mis-subtraction,
a wrong full-match classification) surfaces as a value diff here before
it could surface as a silent wrong answer at scale."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings, strategies as st

ROW = st.tuples(
    st.one_of(st.none(), st.integers(-50, 50)),  # k (group / agg column)
    st.integers(0, 100),                         # v (filter column)
)


def _truth(rows, flt):
    live = [r for r in rows if flt(r)]
    ks = [k for k, _v in live]
    nn = [k for k in ks if k is not None]
    groups: dict = {}
    for k in ks:
        groups[k] = groups.get(k, 0) + 1
    return {
        "count": len(live),
        "count_k": len(nn),
        "min": min(nn) if nn else None,
        "max": max(nn) if nn else None,
        "groups": sorted(
            ((k, n) for k, n in groups.items() if n > 0),
            key=lambda kv: (kv[0] is not None, kv[0]),
        ),
    }


@settings(
    max_examples=8,
    deadline=None,
    # the catalog fixture persists across examples BY DESIGN: every
    # example creates its own uuid-named table in the shared warehouse
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    appends=st.lists(st.lists(ROW, min_size=1, max_size=6), min_size=1, max_size=3),
    delete=st.sampled_from(
        [None, "cow", "merge-on-read-dv", "equality", "merge-on-read-positional"]
    ),
    del_cut=st.integers(-40, 40),
    flt=st.sampled_from([None, "v < 50", "v >= 50", "k >= 0"]),
)
def test_aggs_match_ground_truth(catalog, spark, appends, delete, del_cut, flt):
    name = f"prop_{uuid.uuid4().hex[:10]}"
    t = catalog.create_table(name, schema={"k": "int", "v": "long"})
    rows = []
    for batch in appends:
        t.append(
            spark.createDataFrame(list(batch), "k int, v long").coalesce(1)
        )
        rows.extend(batch)
    t = t.refresh()
    if delete is not None:
        if delete == "equality":
            dead = sorted({k for k, _v in rows if k is not None and k >= del_cut})
            if dead:
                t.delete_by_keys([(k,) for k in dead], on="k")
                rows = [(k, v) for k, v in rows if k is None or k < del_cut]
        else:
            mode = None if delete == "cow" else delete
            cond = f"k >= {del_cut}"
            if mode is None:
                t.delete_where(cond)
            else:
                t.delete_where(cond, mode=mode)
            rows = [(k, v) for k, v in rows if k is None or k < del_cut]
    t = t.refresh()
    scan = t.scan() if flt is None else t.scan().filter(flt)
    fltf = {
        None: lambda r: True,
        "v < 50": lambda r: r[1] < 50,
        "v >= 50": lambda r: r[1] >= 50,
        "k >= 0": lambda r: r[0] is not None and r[0] >= 0,
    }[flt]
    want = _truth(rows, fltf)
    assert scan.count() == want["count"]
    assert scan.count("k") == want["count_k"]
    assert scan.min("k") == want["min"]
    assert scan.max("k") == want["max"]
    meta_groups = scan.metadata_group_counts("k")
    if meta_groups is not None:  # metadata served: must equal the truth
        assert meta_groups == want["groups"]
    # fresh scans: the filter must not have mutated the reusable scan
    assert t.scan().count() == len(rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    steps=st.lists(
        st.tuples(
            st.sampled_from(["append", "blind", "upsert"]),
            st.lists(
                st.tuples(st.integers(0, 12), st.integers(0, 99)),
                min_size=1,
                max_size=5,
            ),
        ),
        min_size=2,
        max_size=6,
    ),
)
def test_seq_scoped_interleavings_match_ground_truth(catalog, spark, steps):
    """r13 fuzz over SEQUENCE-scoped delete semantics: random
    interleavings of appends, blind key deletes
    (delete_by_keys(verify_hits=False)), and keyed upserts must converge
    to the python ground truth (apply steps in order; a delete kills
    every EARLIER row with the key, an upsert is delete+insert), both
    through the merged-MoR scan and again after compaction settles the
    chain."""
    name = f"seqp_{uuid.uuid4().hex[:10]}"
    t = catalog.create_table(name, schema={"k": "long", "v": "long"})
    state: dict = {}
    multiset: list = []  # (k, v) rows alive, append-mode duplicates kept
    for kind, pairs in steps:
        if kind == "append":
            t = t.refresh()
            t.append([{"k": k, "v": v} for k, v in pairs])
            multiset.extend(pairs)
        elif kind == "blind":
            t = t.refresh()
            keys = sorted({k for k, _v in pairs})
            t.delete_by_keys([(k,) for k in keys], on="k", verify_hits=False)
            dead = set(keys)
            multiset = [p for p in multiset if p[0] not in dead]
        else:  # upsert = blind delete of the keys + append, one per key
            t = t.refresh()
            last = {k: v for k, v in pairs}
            t.delete_by_keys([(k,) for k in sorted(last)], on="k",
                             verify_hits=False)
            multiset = [p for p in multiset if p[0] not in last]
            t = t.refresh()
            t.append([{"k": k, "v": v} for k, v in sorted(last.items())])
            multiset.extend(sorted(last.items()))
    t = t.refresh()
    got = sorted((r["k"], r["v"]) for r in t.to_a())
    assert got == sorted(multiset)
    # settle the chain and re-read: compaction must materialize the
    # deletes away without changing a row
    if t.current_snapshot() is not None and multiset:
        t.compact()
        t = t.refresh()
        assert sorted((r["k"], r["v"]) for r in t.to_a()) == sorted(multiset)
        assert not [
            e
            for e in t._current_entries()
            if e.get("content") == "equality-deletes"
        ]

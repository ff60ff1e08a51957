"""Segment-pruning probe (r13, VERDICT r12 #3): filtered metadata COUNT
cost must scale with MATCHING segments, not total entries.

Builds a table with ``n_commits`` disjoint-range commits (one manifest
segment each), then measures a filtered metadata COUNT that matches ONE
range versus one that matches ALL ranges: reports segments opened (via an
io read spy) and driver wall for each.  Asserts the narrow statement
opens exactly one segment and its wall does not scale with table history.

Usage: python scripts/segment_prune_probe.py [n_commits] [rows_per_commit]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from iceberg_ruby_spark.catalog import MemoryCatalog
    from iceberg_ruby_spark.session import get_spark

    spark = get_spark("segment_prune_probe")
    cat = MemoryCatalog(namespace="main", spark=spark)
    cat.create_namespace("main", if_not_exists=True)
    t = cat.create_table("segprobe", schema={"k": "long", "v": "long"})
    for c in range(n_commits):
        t.append(
            spark.range(rows).selectExpr(
                f"id + {c * 1000} AS k", "id AS v"
            )
        )
    t = t.refresh()

    def spy():
        opened = []
        io = t.ops.io
        orig = io.read

        def read(path, *a, **kw):
            opened.append(path)
            return orig(path, *a, **kw)

        io.read = read
        return opened, lambda: setattr(io, "read", orig)

    def timed_count(where: str) -> tuple[int, int, float]:
        opened, restore = spy()
        t0 = time.perf_counter()
        try:
            n = t.scan().filter(where).count()
        finally:
            restore()
        wall = time.perf_counter() - t0
        return n, len([p for p in opened if "/seg-" in p]), wall

    # total segments actually in the list (size-tiered merges consolidate
    # small ones, so this is well under n_commits)
    doc = json.loads(
        t.ops.io.read(t.ops._abs(t.current_snapshot().manifest_list))
    )
    n_segs = len(doc.get("segments", []))
    mid = n_commits // 2
    lo, hi = mid * 1000, mid * 1000 + rows
    n_narrow, segs_narrow, w_narrow = timed_count(f"k >= {lo} AND k < {hi}")
    n_wide, segs_wide, w_wide = timed_count("k >= 0")
    out = {
        "metric": "segment_prune_probe",
        "n_segments": n_segs,
        "n_commits": n_commits,
        "rows_per_commit": rows,
        "narrow_count": n_narrow,
        "narrow_segments_opened": segs_narrow,
        "narrow_wall_ms": round(w_narrow * 1000, 2),
        "wide_count": n_wide,
        "wide_segments_opened": segs_wide,
        "wide_wall_ms": round(w_wide * 1000, 2),
    }
    print(json.dumps(out))
    assert n_narrow == rows and n_wide == rows * n_commits
    assert segs_narrow == 1, f"narrow COUNT opened {segs_narrow} segments"
    assert segs_wide == n_segs, (segs_wide, n_segs)
    assert w_narrow < w_wide, "pruned statement not cheaper than full"


if __name__ == "__main__":
    main()

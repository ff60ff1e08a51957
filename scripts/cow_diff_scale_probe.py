"""Wide-CoW changelog-diff core-scaling probe (VERDICT r9 #1).

One copy-on-write UPDATE commit touching EVERY partition of a
``n_parts``-way table is the shape that wedged r9's changelog stream:
the content-diff fallback ran the whole commit as ONE executor task.
The r10 planner splits the commit's files into bounds-disjoint groups,
so the same drain should now spread across cores — this probe measures
the drain wall at a given ``SPARK_GRAFT_CPUS`` so two runs (e.g. 4 vs
16) give the scaling datapoint.  The drain counts events through a
foreachBatch counter (driver never holds rows) and asserts the event
count is exactly 2x the updated-row count (delete+insert per touched
row, nothing for copied rows).

Usage: SPARK_GRAFT_CPUS=N python scripts/cow_diff_scale_probe.py [sf_dir] [n_parts]
Prints one JSON line; exits 1 on a wrong event count or <n_parts slices.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from iceberg_ruby_spark.catalog import MemoryCatalog
    from iceberg_ruby_spark.session import get_spark
    from iceberg_ruby_spark.streaming import register_stream_source
    from iceberg_ruby_spark.streaming.source import (
        EngineTableStreamReader,
        _ContentDiffSlice,
    )

    spark = get_spark("cow_diff_scale_probe")
    cpus = spark.sparkContext.defaultParallelism
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    max_id = ev.agg({"event_id": "max"}).first()[0]
    width = max(1, (int(max_id) + n_parts) // n_parts)
    cat = MemoryCatalog(namespace="main", spark=spark)
    cat.create_namespace("main", if_not_exists=True)
    src = cat.create_table(
        "cow_probe",
        schema={"event_id": "long", "user_id": "long", "value": "double"},
        partition_spec=[("event_id", f"truncate[{width}]")],
    )
    src.append(ev)
    n_touched = ev.filter("user_id % 10 = 0").count()
    t0 = time.time()
    src.update_where({"value": "value + 1.0"}, "user_id % 10 = 0")
    rewrite_wall = time.time() - t0
    src = src.refresh()

    # planning: the single CoW commit must split into >1 content-diff
    # slice (bounds-disjoint file groups)
    head = src.current_snapshot().snapshot_id
    parent = src.current_snapshot().parent_snapshot_id
    reader = EngineTableStreamReader(
        {"location": src.ops.location, "mode": "changelog"}
    )
    parts = reader.partitions(
        {"snapshot_id": parent}, {"snapshot_id": head}
    )
    n_slices = sum(isinstance(p, _ContentDiffSlice) for p in parts)

    register_stream_source(spark)
    counts: list[int] = []
    t0 = time.time()
    q = (
        spark.readStream.format("iceberg_table")
        .option("location", src.ops.location)
        .option("mode", "changelog")
        .option("starting_snapshot_id", str(parent))
        .load()
        .writeStream.foreachBatch(lambda df, _i: counts.append(df.count()))
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drain_wall = time.time() - t0
    events = sum(counts)

    out = {
        "metric": "cow_diff_scale_probe",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "n_parts": n_parts,
        "rows": ev.count(),
        "touched_rows": n_touched,
        "events": events,
        "events_expected": 2 * n_touched,
        "diff_slices": n_slices,
        "rewrite_wall_s": round(rewrite_wall, 2),
        "drain_wall_s": round(drain_wall, 2),
    }
    print(json.dumps(out))
    if events != 2 * n_touched or n_slices < 2:
        sys.exit(1)


if __name__ == "__main__":
    main()

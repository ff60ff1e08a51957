"""Upsert-sink scale probe (r12): per-batch wall + delete-scope size.

Feeds N keyed waves through the native upsert sink
(streaming/sink.py mode=upsert) and reports, per micro-batch: drain
wall, the committed equality delete's ``applies-to`` length vs the
table's live file count (the bounds-pruning term — a key-range-aligned
feed should scope its delete to the overlapping files, not the table),
and the final convergence check (gold rows == distinct keys,
last-write-wins values).

Usage: python scripts/upsert_sink_probe.py [sf_dir] [n_waves]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import pyspark.sql.functions as F

    from iceberg_ruby_spark.catalog import MemoryCatalog
    from iceberg_ruby_spark.session import get_spark
    from iceberg_ruby_spark.streaming import register_stream_source

    spark = get_spark("upsert-probe")
    register_stream_source(spark)
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

    # wave 0 = full corpus; later waves update a shrinking KEY-RANGE
    # slice (doc_id < n/2^w) — the range-aligned shape whose delete
    # scope bounds-pruning should shrink with the slice
    for w in range(n_waves):
        hi = max(1, n_keys >> w)
        bronze.append(
            docs.filter(F.col("doc_id") < hi).select(
                "doc_id", (F.col("v") + 1000 * w).alias("v")
            )
        )
        wall = drain()
        g = gold.refresh()
        live = [e for e in g._current_entries() if "path" in e]
        eqs = [
            e
            for e in g._current_entries()
            if e.get("content") == "equality-deletes"
        ]
        scope = max((len(e.get("applies-to") or []) for e in eqs), default=0)
        print(
            f"wave {w}: keys<{hi} drain {wall:.2f}s  live_files {len(live)}  "
            f"eq_deletes {len(eqs)}  newest_scope {scope}",
            flush=True,
        )
    # pruning demonstration: a wave touching only the TOP key range —
    # its delete must scope to the files whose bounds overlap it (the
    # full-corpus file), not every live file
    lo = n_keys * 4 // 5
    before = {
        e["delete-file"]
        for e in gold.refresh()._current_entries()
        if e.get("content") == "equality-deletes"
    }
    bronze.append(
        docs.filter(F.col("doc_id") >= lo).select(
            "doc_id", (F.col("v") + 99_000).alias("v")
        )
    )
    wall = drain()
    g = gold.refresh()
    live = [e for e in g._current_entries() if "path" in e]
    eqs = [
        e for e in g._current_entries() if e.get("content") == "equality-deletes"
    ]
    # the pruning claim is about THIS wave's delete specifically — earlier
    # waves' deletes were scoped against smaller tables and would mask a
    # pruning regression if min'd over (r12 review)
    new_eqs = [e for e in eqs if e["delete-file"] not in before]
    assert new_eqs, "the disjoint wave committed no equality delete"
    disjoint_scope = max(len(e.get("applies-to") or []) for e in new_eqs)
    scopes = sorted(len(e.get("applies-to") or []) for e in eqs)
    print(
        f"disjoint wave: keys>={lo} drain {wall:.2f}s  live_files "
        f"{len(live)}  scopes {scopes} (this wave's delete scoped to "
        f"{disjoint_scope} of {len(live)})",
        flush=True,
    )
    assert disjoint_scope < len(live), "bounds pruning had no effect"
    g = gold.refresh()
    rows = {r["doc_id"]: r["v"] for r in g.to_a()}
    assert len(rows) == n_keys, (len(rows), n_keys)
    # last-write-wins spot check: every key's value matches its last wave
    exp = {
        r["doc_id"]: r["v"]
        for r in docs.collect()
    }
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


if __name__ == "__main__":
    main()

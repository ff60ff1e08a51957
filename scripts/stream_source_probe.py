"""Measure the streaming source's planning claim: micro-batch planning is
O(files added since the last offset), independent of table size.

Builds one table with N append commits, then times
``EngineTableStreamReader.partitions(start, end)`` for (a) a full replay
window (all N commits) and (b) a tail window (1 commit) — the tail plan
must not grow with table history.  Run:

    python scripts/stream_source_probe.py [n_commits]
"""

import sys
import time

import iceberg_ruby_spark as ice
from iceberg_ruby_spark.streaming.source import EngineTableStreamReader


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cat = ice.MemoryCatalog(namespace="ns")
    cat.create_namespace("ns")
    t = cat.create_table("ns.probe", schema={"k": "int", "v": "string"})
    for i in range(n):
        t.append([{"k": i * 10 + j, "v": f"c{i}"} for j in range(10)])
    sids = [s.snapshot_id for s in t.snapshots]
    reader = EngineTableStreamReader({"location": t.ops.location})

    def timed(start, end, label):
        t0 = time.perf_counter()
        parts = reader.partitions({"snapshot_id": start}, {"snapshot_id": end})
        dt = time.perf_counter() - t0
        print(f"{label}: {len(parts)} file partitions in {dt*1000:.1f} ms")
        return dt

    full = timed(None, sids[-1], f"full replay ({n} commits)")
    tail = timed(sids[-2], sids[-1], "tail (1 commit)")
    print(f"tail/full plan-time ratio: {tail / full:.2f}")


if __name__ == "__main__":
    main()

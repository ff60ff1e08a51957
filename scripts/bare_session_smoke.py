"""Run declared queries under a BARE SparkSession — no engine confs —
exactly how the correctness driver builds its own session.  Round 2 lost
two scoreboard rows to engine-session-only confs (nanosAsLong); every
conf a query needs must be pinned at runtime by the query path itself
(plans.tables.load / the streaming readers), and this script is the
regression gate for that.

Usage: python scripts/bare_session_smoke.py [n_queries|all] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("bare_smoke")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    args = sys.argv[1:]
    if args and not args[0].isdigit() and args[0] != "all":
        names = args
    elif args and args[0] == "all":
        names = list(qs)
    else:
        names = list(qs)[: int(args[0]) if args else 50]
    sf_dir = "/root/testdata/sf0.01"
    failed = []
    for name in names:
        t0 = time.time()
        try:
            n = qs[name](spark, sf_dir).count()
            print(f"ok   {name}: {n} rows [{time.time()-t0:.1f}s]", flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
    print(f"\n{len(names) - len(failed)} ok, {len(failed)} FAILED")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()

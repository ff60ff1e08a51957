"""Per-query driver profile for the bench set (optimization guide §1).

Runs ONE bench query exactly the way bench.py does (sf0.001 warmup →
noop-sink timed runs at the target tier) and reports where the time goes:

- wall seconds per timed run (min-of-N like bench.py);
- Spark JOB COUNT per run (statusTracker delta) — at bench scale each job
  pays a fixed scheduling latency, so lifecycle queries that launch
  dozens of tiny actions are job-count-bound, not data-bound;
- optional cProfile of the driver (``--profile``): pure-Python engine
  time (manifest/avro/planning) vs py4j socket waits (executor time).

Usage: python scripts/profile_query.py QUERY [sf_dir] [--runs N] [--profile]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_profile = "--profile" in sys.argv
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
        args = [a for a in args if a != str(runs)]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    from iceberg_ruby_spark.session import get_spark
    from iceberg_ruby_spark.plans import QUERIES
    from iceberg_ruby_spark.plans.registry import BENCH_FNS

    fn = BENCH_FNS.get(name, QUERIES[name])
    spark = get_spark("profile")
    sc = spark.sparkContext

    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    t0 = time.perf_counter()
    fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    print(f"warmup({warm_dir.rsplit('/',1)[-1]}): {time.perf_counter()-t0:.3f}s")
    spark.catalog.clearCache()

    def job_count() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    times = []
    for i in range(runs):
        sc.setJobDescription(f"profile:{name}:run{i}")
        j0 = job_count()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        j1 = job_count()
        times.append(sec)
        print(f"run{i}: {sec:.3f}s  jobs={j1 - j0}")
        spark.catalog.clearCache()

    print(f"min: {min(times):.3f}s over {runs} runs")

    if do_profile:
        import cProfile
        import pstats

        spark.catalog.clearCache()
        prof = cProfile.Profile()
        prof.enable()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        prof.disable()
        st = pstats.Stats(prof)
        st.sort_stats("cumulative")
        print("==== top cumulative (driver python) ====")
        st.print_stats(40)


if __name__ == "__main__":
    main()

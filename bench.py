"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the noop sink (runs the whole plan,
including projections the optimizer would drop under count()).

Scale tiers: any ``SPARK_GRAFT_SF_DIR`` works unchanged (e.g.
``/root/testdata/sf1`` to expose plan-shape regressions sf0.1 hides —
broadcast-threshold flips, skew).  This environment ships only
sf{0.001,0.01,0.1}; point the var at a larger generated dir when one
exists.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _parallel_canary_work(_i) -> float:
    """One parallel-canary task: fixed sha256 burst (module-level so a
    process pool can pickle it)."""
    import hashlib

    d = b"x" * 8192
    t0 = time.perf_counter()
    for _ in range(10000):
        d = hashlib.sha256(d).digest() * 256
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from iceberg_ruby_spark.session import get_spark
    from iceberg_ruby_spark.plans import QUERIES
    from iceberg_ruby_spark.plans.registry import (
        BENCH_FNS,
        BENCH_SET,
        BENCH_TAIL,
    )

    def bench_callable(name):
        # BENCH_FNS substitutes a query's PRODUCTION form when the
        # registered (oracle-verifiable) form differs — e.g. minhash md5
        # mode exists only so DuckDB can recompute it; the 100 TB path is
        # xxhash64 and that is what gets timed
        return BENCH_FNS.get(name, QUERIES[name])

    # host-load bracketing (r10 VERDICT #3): getloadavg() before and after
    # lets a later reader adjudicate "uniform drift = host contention"
    # from the artifact alone instead of re-measuring
    load_before = tuple(round(x, 2) for x in os.getloadavg())

    # host-SPEED canary (r12, VERDICT r11 #3): a fixed, single-threaded,
    # non-Spark CPU microbenchmark timed alongside the queries.  loadavg
    # only rules contention in/out; two quiet hosts can still differ in
    # effective CPU speed (r9→r11 showed a uniform 1.4× drift on
    # plan-pinned pure-JVM queries at load 0.14).  wall ÷ canary is
    # host-speed-normalized and comparable across rounds.
    def _cpu_canary() -> float:
        import hashlib

        buf = bytes(range(256)) * 4096  # 1 MiB, deterministic
        t0 = time.perf_counter()
        d = buf
        for _ in range(400):
            d = hashlib.sha256(d + buf).digest()
        return round(time.perf_counter() - t0, 4)

    canary_before = _cpu_canary()

    # PARALLEL-throughput canary (r14): the single-thread canary cannot
    # see degraded MULTI-core capacity (cgroup quota shrinkage, co-tenant
    # steal) — measured in r14: single-thread within 6% of r13 while 32
    # processes scaled only 11.4x (vs ~25-30x on a healthy window),
    # uniformly dilating every multi-task query 1.2-1.5x.  One fixed
    # process-pool sha256 burst quantifies the host's effective core
    # count so a reader can adjudicate uniform drift from the artifact.
    def _cpu_canary_parallel() -> dict:
        import concurrent.futures

        single = _parallel_canary_work(0)
        n = min(32, os.cpu_count() or 1)
        t0 = time.perf_counter()
        try:
            # module-level worker: a process pool pickles the callable
            with concurrent.futures.ProcessPoolExecutor(n) as ex:
                list(ex.map(_parallel_canary_work, range(n)))
        except Exception:
            return {"n": n, "single_sec": round(single, 4), "scaling": None}
        wall = time.perf_counter() - t0
        return {
            "n": n,
            "single_sec": round(single, 4),
            "wall_sec": round(wall, 4),
            "scaling": round(n * single / wall, 1),
        }

    canary_parallel = _cpu_canary_parallel()

    spark = get_spark("bench")
    # JMH-style untimed warmup: run every bench query once at the smallest
    # tier so the timed loop measures steady-state data throughput, not
    # one-time Janino compilation of the generated code (the large minhash
    # expressions alone cost ~7 s of compile at any SF — measured: the full
    # query is 7.9 s on FIFTY documents cold, 6.1 s on 5000 docs warm).
    # Generated code is identical across tiers (same schema), so the class
    # cache carries over; a cluster job amortizes this the same way.
    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    # the TAIL set (streaming-sink queries) runs strictly after the main
    # set — warmup included: one stream_upsert_sink execution anywhere in
    # the session (even the sf0.001 warmup) leaked ~46 Python DataSource
    # worker processes and degraded the OTHER 20 queries ~25% at an
    # identical host canary.  Ordering keeps the main set's numbers
    # comparable across rounds; the tail's own numbers are still honest
    # (it contaminates only itself).
    main_set = [n for n in BENCH_SET if n not in BENCH_TAIL]
    warmup: dict[str, float] = {}

    def _warm(names):
        for name in names:
            t0 = time.perf_counter()
            bench_callable(name)(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            warmup[name] = round(time.perf_counter() - t0, 3)

    _warm(main_set)
    # warmup persists live on tiny warm-tier data; clear them so timed runs
    # build their own caches and nothing cross-pollinates
    spark.catalog.clearCache()
    # Two timed runs per query, report the MIN.  The first full-tier
    # execution of a heavy generated pipeline can pay 10-30x in one-time
    # JIT compilation that varies with host CPU contention (measured: the
    # same minhash plan 2.2s-77s across runs on a contended host); min-of-2
    # reports the throughput the plan actually sustains.  All raw runs are
    # recorded under "runs" so the noise is visible, not hidden.
    #
    # The two passes are INTERLEAVED across the whole query set (pass 1 of
    # everything, then pass 2) rather than back-to-back per query: a
    # host-contention burst then poisons at most one pass per query instead
    # of both, so the min survives it (r4 post-mortem: back-to-back runs of
    # dedup_minhash_lsh both landed in one contended minute and recorded 2×
    # the quiet-host cost).  If the two passes still disagree by >1.5× the
    # query gets a third tie-break run — the spread itself is evidence one
    # pass was contended.
    def _timed(name: str) -> float:
        t0 = time.perf_counter()
        bench_callable(name)(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return sec

    raw_runs: dict[str, list[float]] = {name: [] for name in BENCH_SET}

    def _passes(names):
        for _pass in range(2):
            for name in names:
                raw_runs[name].append(_timed(name))
        for name in names:
            lo, hi = min(raw_runs[name]), max(raw_runs[name])
            if lo > 0 and hi / lo > 1.5:
                raw_runs[name].append(_timed(name))

    _passes(main_set)
    if BENCH_TAIL:
        _warm([n for n in BENCH_TAIL if n in BENCH_SET])
        spark.catalog.clearCache()
        _passes([n for n in BENCH_TAIL if n in BENCH_SET])

    timings: dict[str, float] = {}
    for name in BENCH_SET:
        timings[name] = min(raw_runs[name])
        print(f"# {name}: {timings[name]}s {raw_runs[name]}", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    warmup_total = round(sum(warmup.values()), 3)
    canary_after = _cpu_canary()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # round-over-round comparisons should use value_main (the
                # r12-comparable 20-query set); tail queries time honestly
                # but run strictly last — see the BENCH_TAIL comment
                "value_main": round(
                    sum(v for k, v in timings.items() if k not in BENCH_TAIL),
                    3,
                ),
                "tail_queries": list(BENCH_TAIL),
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
                # one-time-compile accounting so round-over-round deltas are
                # methodology-comparable in both directions: warmup_sec is
                # the untimed sf0.001 compile pass; cold_total approximates
                # a no-warmup run (compile cost + steady-state throughput)
                "warmup_sec": warmup_total,
                "cold_total": round(total + warmup_total, 3),
                "timing": "min-of-2-interleaved (+1 tie-break if spread >1.5x)",
                "bench_variants": {n: fn.__name__ for n, fn in BENCH_FNS.items()},
                "runs": raw_runs,
                # 1/5/15-min load averages bracketing the run; this host
                # has 32 cpus, so loadavg >> 32 while benching = external
                # contention, and uniform per-query drift with identical
                # plans should be adjudicated against these numbers
                "loadavg_before": load_before,
                "loadavg_after": tuple(round(x, 2) for x in os.getloadavg()),
                "cpus_host": os.cpu_count(),
                # EFFECTIVE parallelism (r13 VERDICT #3: `cpus_host` is
                # os.cpu_count() — 32 even on an 8-core leg — so nothing in
                # the artifact proved $SPARK_GRAFT_CPUS was honored and the
                # driver's core-scaling probe false-flagged
                # `suspect_cpus_ignored`).  defaultParallelism and the
                # master string come from the LIVE SparkContext: they are
                # what the session actually ran with.
                "cpus_effective": spark.sparkContext.defaultParallelism,
                "master": spark.sparkContext.master,
                # single-thread sha256 canary (sec) bracketing the run —
                # divide totals by mean(canary) for host-speed-normalized
                # round-over-round comparison (SCALE.md adjudication)
                "cpu_canary_sec": {
                    "before": canary_before,
                    "after": canary_after,
                },
                "cpu_canary_parallel": canary_parallel,
                "value_per_canary": round(
                    total / ((canary_before + canary_after) / 2), 2
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

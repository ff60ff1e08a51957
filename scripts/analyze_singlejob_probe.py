"""Measurement probe (VERDICT r6 item 7): would ANALYZE's per-column
sequential k-minimum-values jobs beat ONE job computing every fixed-width
column's k-mins via a single exploded (col_id, hash) aggregate?

Current production shape (table.py compute_statistics): per column,
``distinct → hash → TakeOrderedAndProject(k+1)`` — N sequential jobs, each
fully parallel, each delivering only k+1 rows to the driver.

Single-job variant tested here: hash every fixed-width column in-row,
explode to (cid, h), distinct, then per-cid k-smallest via a cid-partitioned
window.  One scan instead of N, but the k-smallest step becomes a
cid-partitioned WindowExec: each column's ENTIRE distinct hash set lands in
one task (there are only n_cols cids), where TakeOrdered does per-partition
partial top-k and ships k+1 rows per partition.

Usage: python scripts/analyze_singlejob_probe.py [sf_dir]
Prints per-variant wall seconds and asserts value equivalence on k-mins.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf1"

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iceberg_ruby_spark import theta_sketch as _ts
    from iceberg_ruby_spark import types as ice_t
    from iceberg_ruby_spark.session import get_spark
    from iceberg_ruby_spark.table import _theta_hash_udf, _theta_supported

    spark = get_spark("analyze_probe")
    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    schema = ice_t.Schema.from_spark(df.schema)
    fixed = [
        f
        for f in schema.fields
        if _theta_supported(f.field_type)
        and not isinstance(f.field_type, (ice_t.StringType, ice_t.DecimalType))
    ]
    k = _ts.DEFAULT_NOMINAL_ENTRIES
    print(f"fixed-width columns: {[f.name for f in fixed]}, k={k}", flush=True)

    def run_sequential() -> dict[str, list[int]]:
        out = {}
        for f in fixed:
            hs = (
                df.select(F.col(f.name).alias("__v"))
                .where(F.col("__v").isNotNull())
                .distinct()
                .select(_theta_hash_udf(f.field_type)(F.col("__v")).alias("__h"))
                .where(F.col("__h").isNotNull())
                .orderBy("__h")
                .limit(k + 1)
            )
            out[f.name] = [r["__h"] for r in hs.collect()]
        return out

    def run_single_job() -> dict[str, list[int]]:
        cols = [
            F.struct(
                F.lit(i).alias("cid"),
                _theta_hash_udf(f.field_type)(F.col(f.name)).alias("h"),
            )
            for i, f in enumerate(fixed)
        ]
        exploded = (
            df.select(F.explode(F.array(*cols)).alias("x"))
            .select("x.cid", "x.h")
            .where(F.col("h").isNotNull())
            .distinct()
        )
        w = Window.partitionBy("cid").orderBy("h")
        top = (
            exploded.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k + 1)
            .collect()
        )
        out: dict[str, list[int]] = {f.name: [] for f in fixed}
        for r in sorted(top, key=lambda r: (r["cid"], r["h"])):
            out[fixed[r["cid"]].name].append(r["h"])
        return out

    # warm both paths on a slice so codegen/UDF setup doesn't skew either
    df.limit(1000).cache().count()
    results = {}
    for name, fn in [("sequential", run_sequential), ("single_job", run_single_job)]:
        t0 = time.perf_counter()
        results[name] = fn()
        sec = time.perf_counter() - t0
        print(f"{name}: {sec:.1f}s", flush=True)
    assert results["sequential"] == results["single_job"], "k-min mismatch"
    print("k-mins identical across variants", flush=True)


if __name__ == "__main__":
    main()

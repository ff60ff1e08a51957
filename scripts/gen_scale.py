"""Synthesize a larger scale tier from an existing one (default: sf0.1 ->
tmp/sf1 at 10x) so bench.py can expose plan-shape regressions the small
tier hides — broadcast-threshold flips, shuffle-partition sizing, skew.

Scaling is FK-consistent: copy i offsets every key by i * (max_key + 1)
in the SAME way on both sides of each relationship, so join/agg
selectivities (rows per key, rows per group) stay what they are at the
base tier and measured scaling is attributable to data volume, not
changed shapes.  Document text gets a per-copy salt sized to break
cross-copy near-duplication — otherwise every doc gains 9 planted
near-dups and the dedup benchmarks measure the (legitimately) quadratic
clique output instead of throughput.

Usage: python scripts/gen_scale.py [factor] [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tmp", "sf1"
    )
    from pyspark.sql import functions as F

    from iceberg_ruby_spark.session import get_spark
    from iceberg_ruby_spark.plans.tables import load

    spark = get_spark("gen_scale")
    os.makedirs(dst, exist_ok=True)

    # key columns to offset per table: {table: [cols sharing the domain of
    # that table's primary key or a foreign key]}
    keyed = {
        "customer": {"c_custkey": "c"},
        "supplier": {"s_suppkey": "s"},
        "part": {"p_partkey": "p"},
        "orders": {"o_orderkey": "o", "o_custkey": "c"},
        "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
        "events": {"event_id": "e", "user_id": "u"},
        "documents": {"doc_id": "d"},
        "embeddings": {"vec_id": "v"},
    }
    # domain sizes (max+1) discovered once from the base tier
    domain: dict[str, int] = {}
    for table, cols in keyed.items():
        df = load(spark, src, table)
        for col, dom in cols.items():
            if dom not in domain:
                domain[dom] = df.agg(F.max(col)).first()[0] + 1

    for table in ["region", "nation"]:  # fixed dimensions — copy through
        load(spark, src, table).write.mode("overwrite").parquet(
            os.path.join(dst, f"{table}.parquet")
        )
    for table, cols in keyed.items():
        df = load(spark, src, table)
        copies = []
        for i in range(factor):
            c = df
            for col, dom in cols.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * domain[dom]))
            if table == "documents" and i > 0:
                # break cross-copy similarity with ~160 chars of per-copy
                # UNIQUE content (5 chained md5 hexes).  A repeated-token
                # salt does NOT work: N repeats of one word add only ~word
                # distinct character shingles, leaving cross-copy Jaccard
                # ≈ 0.9 — every doc gains factor-1 planted near-dups and
                # pair output grows quadratically (measured: 26x bench
                # time at 10x data before this fix).
                salt = F.concat(
                    *[
                        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"-{i}-{j}")))
                        for j in range(5)
                    ]
                )
                c = c.withColumn("text", F.concat(F.col("text"), F.lit(" "), salt))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: x{factor}", flush=True)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()

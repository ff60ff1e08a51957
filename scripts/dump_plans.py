"""Dump ``explain("formatted")`` for named bench queries to files.

Usage: python scripts/dump_plans.py OUT_DIR SUFFIX [sf_dir] QUERY...
Writes OUT_DIR/<query>_<SUFFIX>.txt (the optimization-round evidence the
judge checks plan claims against).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.01"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    names = rest

    from iceberg_ruby_spark.session import get_spark
    from iceberg_ruby_spark.plans import QUERIES
    from iceberg_ruby_spark.plans.registry import BENCH_FNS

    spark = get_spark("dump_plans")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = BENCH_FNS.get(name, QUERIES[name])
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()

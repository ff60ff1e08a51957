"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry at the given scale factor, runs its
``oracle_sql()`` twin in DuckDB over the same parquet tables, and compares
row count, column names, and an order-insensitive value hash (values
stringified per cell; floats via repr of round(x, 9); rows sorted).

Oracle results are fetched VIA ARROW (``cur.arrow().to_pylist()``), not
``fetchall()``: the driver hashes the Arrow representation, and the two
diverge exactly where DuckDB widens types across the Arrow boundary —
r8's ``embedding_binarize_pack`` red row was a bare ``SUM(BIGINT)``
returning HUGEINT, which ``fetchall()`` hands back as a plain int (mirror
green) while Arrow renders decimal128(38,0) (driver red).  The mirror must
reproduce the driver's failure mode, so it hashes what Arrow hands over
and additionally FAILS any oracle whose Arrow schema contains a decimal
column where the Spark side isn't decimal — the typing bug is then caught
by name instead of surfacing as an opaque hash mismatch.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _hash_rows(columns: list[str], rows) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyarrow import types as pa_types

    import __spark_entry__ as entrymod
    from iceberg_ruby_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        # driver testdata ships single parquet FILES; synthesized scale
        # tiers (scripts/gen_scale.py) are Spark-written DIRECTORIES —
        # glob those so the oracle can run on any tier
        pat = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(pat):
            pat = f"{pat}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_rows = df.collect()
            spark_cols = df.columns
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            # Arrow path on purpose — see module docstring.  fetchall()
            # masks DuckDB→Arrow type widening the driver's hasher sees.
            tbl = con.execute(oracles[name]).arrow()
            oracle_cols = tbl.column_names
            oracle_rows = [
                [rec[c] for c in oracle_cols] for rec in tbl.to_pylist()
            ]
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        spark_decimal_cols = {
            f.name for f in df.schema.fields
            if f.dataType.typeName().startswith("decimal")
        }
        bad_decimal = [
            fld.name for fld in tbl.schema
            if pa_types.is_decimal(fld.type)
            and fld.name not in spark_decimal_cols
        ]
        if bad_decimal:
            problems.append(
                f"oracle Arrow schema has decimal column(s) {bad_decimal} "
                f"where Spark is not decimal — add an explicit CAST in the "
                f"oracle (driver hash-red class, see r8 binarize)"
            )
        if len(spark_rows) != len(oracle_rows):
            problems.append(f"rows {len(spark_rows)} vs {len(oracle_rows)}")
        if sorted(spark_cols) != sorted(oracle_cols):
            problems.append(f"cols {sorted(spark_cols)} vs {sorted(oracle_cols)}")
        if not problems:
            hs = _hash_rows(spark_cols, [list(r) for r in spark_rows])
            ho = _hash_rows(oracle_cols, oracle_rows)
            if hs != ho:
                problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
            failures.append(name)
        else:
            print(f"ok   {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAILED")
    if failures:
        print("failed:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()

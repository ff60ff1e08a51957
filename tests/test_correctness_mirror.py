"""The mirror must reproduce the DRIVER's oracle normalization.

r8's only red row (``embedding_binarize_pack``) was a mirror blind spot:
the driver hashes DuckDB oracle results through Arrow, where a bare
``SUM(BIGINT)`` widens to HUGEINT → decimal128(38,0); the mirror's old
``fetchall()`` path got a plain int back and stayed green.  These tests
pin the hardened mirror (scripts/check_correctness.py):

1. a deliberately-untyped HUGEINT oracle goes RED in the mirror exactly
   as it does on the driver (lockstep proof VERDICT r8 item 1 demands);
2. the same oracle with the one-line CAST goes green;
3. no REGISTERED oracle's Arrow schema contains a decimal column unless
   its Spark twin is decimal-typed too (one-shot audit over all 166).
"""

from __future__ import annotations

import duckdb
from pyarrow import types as pa_types


def _oracle_arrow(sql: str):
    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT * FROM (VALUES (1::BIGINT), (2)) v(x)")
    return con.execute(sql).arrow()


def test_untyped_sum_is_decimal_across_arrow():
    """The failure mode itself: bare SUM(BIGINT) crosses Arrow as decimal."""
    tbl = _oracle_arrow("SELECT SUM(x) AS s FROM t")
    assert pa_types.is_decimal(tbl.schema.field("s").type)
    # and the pylist value is a Decimal, which _norm_cell renders '3.0',
    # never matching Spark BIGINT's '3' — the driver's red, reproduced
    import decimal

    from scripts.check_correctness import _hash_rows, _norm_cell

    v = tbl.to_pylist()[0]["s"]
    assert isinstance(v, decimal.Decimal)
    assert _norm_cell(v) != _norm_cell(3)
    assert _hash_rows(["s"], [[v]]) != _hash_rows(["s"], [[3]])


def test_cast_heals_the_oracle():
    tbl = _oracle_arrow("SELECT CAST(SUM(x) AS BIGINT) AS s FROM t")
    assert not pa_types.is_decimal(tbl.schema.field("s").type)
    from scripts.check_correctness import _hash_rows

    assert _hash_rows(["s"], [[tbl.to_pylist()[0]["s"]]]) == _hash_rows(
        ["s"], [[3]]
    )


def test_no_registered_oracle_exposes_decimal():
    """One-shot audit: every oracle's LIMIT-0 Arrow schema is decimal-free.

    No registered Spark query returns DecimalType today (exact decimal
    accumulations are cast back before emit, by the determinism rules in
    plans/__init__.py), so ANY decimal in an oracle schema is a driver
    hash-red waiting to fire.  If a future query legitimately emits
    decimals on both sides, exempt it here explicitly.
    """
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        schema = con.execute(
            f"SELECT * FROM ({sql}) sub LIMIT 0"
        ).arrow().schema
        bad = [f.name for f in schema if pa_types.is_decimal(f.type)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles exposing decimal columns across Arrow (driver hash-red "
        f"class): {offenders}"
    )

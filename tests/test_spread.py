"""spread_small_scan (operators/_spread.py, r14): the scale-adaptive
input-spread gate that parallelizes explode-heavy operators over
under-split inputs without changing any row."""

import os

import pyspark.sql.functions as F
import pytest

from iceberg_ruby_spark.operators._spread import spread_small_scan


@pytest.fixture()
def corpus(spark):
    rows = [(i, f"text document number {i} " * 3) for i in range(40)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _one_part(corpus):
    return corpus.coalesce(1)


def test_gate_fires_on_undersplit_input(spark, corpus):
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if target < 4:
        pytest.skip("gate needs shuffle parallelism >= factor")
    out = spread_small_scan(_one_part(corpus), "doc_id")
    assert out.rdd.getNumPartitions() == target


def test_gate_noop_when_already_parallel(spark, corpus):
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wide = corpus.repartition(target)
    out = spread_small_scan(wide, "doc_id")
    # already at shuffle parallelism: identity (no extra exchange)
    assert out is wide


def test_factor_zero_disables(spark, corpus, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_FACTOR", "0")
    narrow = _one_part(corpus)
    assert spread_small_scan(narrow, "doc_id") is narrow


def test_rows_identical_through_spread(spark, corpus):
    narrow = _one_part(corpus)
    spread = spread_small_scan(narrow, "doc_id")
    assert spread.exceptAll(narrow).isEmpty()
    assert narrow.exceptAll(spread).isEmpty()


def test_minhash_results_unchanged_by_spread(spark, corpus, monkeypatch):
    """The consumer-level pin: minhash pairs are identical with the gate
    on and off (the spread only changes physical layout; min() is
    commutative over any partitioning)."""
    from iceberg_ruby_spark.operators.dedup import minhash_lsh_pairs

    dup = corpus.union(
        spark.createDataFrame(
            [(100 + i, f"text document number {i} " * 3) for i in range(5)],
            ["doc_id", "text"],
        )
    )

    def pairs():
        return minhash_lsh_pairs(
            dup, "text", "doc_id", num_hashes=16, bands=4, shingle_size=5,
            threshold=0.5,
        )

    monkeypatch.setenv("SPARK_GRAFT_SPREAD_FACTOR", "4")
    on = pairs().collect()
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_FACTOR", "0")
    off = pairs().collect()
    assert sorted(map(tuple, on)) == sorted(map(tuple, off))
    assert len(on) >= 5  # the planted duplicates are found

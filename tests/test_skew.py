"""Skew-mitigation operators: salted joins and salted COUNT(DISTINCT) —
result-identical to the plain shapes, with the hot key provably spread."""

import pytest
from pyspark.sql import functions as F

from iceberg_ruby_spark.errors import InvalidDataError
from iceberg_ruby_spark.operators.skew import salted_count_distinct, salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key (0) with 500 rows, 50 uniform keys
    rows = [(0, i) for i in range(500)] + [(k, k * 10) for k in range(1, 51)]
    return spark.createDataFrame(rows, "k int, payload int")


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 40)], "k int, name string"
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain(skewed, dim):
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = _sorted(salted_join(skewed, dim, on="k", how=how, salt=8))
        want = _sorted(skewed.join(dim, "k", how))
        assert got == want, how


def test_salted_join_spreads_hot_key(skewed, dim):
    """The hot key's rows must scatter over >1 salt bucket — the whole
    point; deterministic across runs (hash salting, not rand())."""
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64("k", "payload"), F.lit(8))
    )
    n_buckets = s.filter("k = 0").select("__salt").distinct().count()
    assert n_buckets > 4
    a = _sorted(salted_join(skewed, dim, on="k", salt=8))
    b = _sorted(salted_join(skewed, dim, on="k", salt=8))
    assert a == b


def test_salted_join_multi_key_and_guards(spark, skewed, dim):
    left = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 30)], "k int, g string, v int"
    )
    right = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y")], "k int, g string, tag string"
    )
    got = _sorted(salted_join(left, right, on=["k", "g"], salt=4))
    want = _sorted(left.join(right, ["k", "g"]))
    assert got == want
    with pytest.raises(InvalidDataError, match="right/full"):
        salted_join(skewed, dim, on="k", how="right")
    with pytest.raises(InvalidDataError, match="salt must be"):
        salted_join(skewed, dim, on="k", salt=1)
    with pytest.raises(InvalidDataError, match="both sides"):
        salted_join(skewed, skewed, on="k")


def test_salted_count_distinct_exact(spark):
    rows = (
        [("hot", f"v{i % 37}") for i in range(2000)]
        + [("cold", "a"), ("cold", "b"), ("cold", "a"), ("none", None)]
    )
    df = spark.createDataFrame(rows, "k string, x string")
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(df, "k", "x", salt=8).collect()
    }
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("x").alias("n")).collect()
    }
    assert got == want == {"hot": 37, "cold": 2, "none": 0}
    with pytest.raises(InvalidDataError, match="salt must be"):
        salted_count_distinct(df, "k", "x", salt=0)


def test_salted_join_plan_is_sort_merge(skewed, dim):
    """r14 (VERDICT r13 #3): the salted join's physical shape is pinned
    to SortMergeJoin — not BroadcastHashJoin (a broadcast of the salt×-
    replicated side defeats salting: the hot key never spreads) and not
    ShuffledHashJoin (its hash build cannot spill; the r13 sf10 probe
    OOMed in buildHashedRelation).  SMJ spills gracefully and is the
    join AQE's skew-split targets."""
    df = salted_join(skewed, dim, on="k", salt=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" not in plan

"""small_local_df (the Arrow-routed metadata-frame helper) must be
value-identical to the plain list createDataFrame on every shape the
engine feeds it — and must fall back to the list path when Arrow would
change a value (float NaN inside an array element)."""

import math

import pyspark.sql.types as T

from iceberg_ruby_spark._localdf import small_local_df


def _rows_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, list) or isinstance(vb, list):
                if va is None or vb is None:
                    if va is not vb:
                        return False
                    continue
                if len(va) != len(vb):
                    return False
                for x, y in zip(va, vb):
                    same_nan = (
                        isinstance(x, float)
                        and isinstance(y, float)
                        and math.isnan(x)
                        and math.isnan(y)
                    )
                    if x != y and not same_nan:
                        return False
            elif va != vb and not (va is None and vb is None):
                return False
    return True


CASES = [
    # (rows, schema) — the engine's metadata-frame shapes
    ([("/a/b c%25.parquet", 3), ("/d=1/x.parquet", -1)], "p string, s long"),
    ([("f1", 0), ("f1", 2**40), ("f2", 7)], "file_path string, pos long"),
    (
        [(0, [1.0, -0.5, 3.5e-300]), (1, [0.0, 2.0, -0.0])],
        T.StructType(
            [
                T.StructField("cell", T.IntegerType()),
                T.StructField("centroid", T.ArrayType(T.DoubleType())),
            ]
        ),
    ),
    ([("x", None), (None, 5)], "a string, b long"),
    ([("héllo wörld\n\ttab", 1), ("日本語", 2)], "a string, b long"),
    ([(i, i * 3) for i in range(200)], "doc_id long, cluster_id long"),
    ([], "a string, b long"),
]


def test_small_local_df_value_identity(spark):
    for rows, schema in CASES:
        want = spark.createDataFrame(rows, schema).collect()
        got_df = small_local_df(spark, list(rows), schema)
        got = got_df.collect()
        assert _rows_equal(want, got), (rows, schema, want, got)
        assert got_df.schema == spark.createDataFrame(rows, schema).schema


def test_small_local_df_nan_falls_back(spark):
    # NaN inside a float array: the Arrow path would null it — the helper
    # must keep the list path's NaN
    rows = [(0, [float("nan"), 1.0])]
    schema = "cell int, centroid array<double>"
    got = small_local_df(spark, rows, schema).collect()
    assert math.isnan(got[0][1][0])
    # bare NaN double column too
    rows2 = [(0, float("nan")), (1, 2.5)]
    got2 = small_local_df(spark, rows2, "i int, v double").collect()
    assert math.isnan(got2[0][1]) and got2[1][1] == 2.5


def test_small_local_df_joins_like_list_frame(spark):
    # broadcast-side use: same join result either way
    import pyspark.sql.functions as F

    big = spark.range(1000).selectExpr("concat('f', id % 20) p", "id v")
    rows = [(f"f{i}", i) for i in range(0, 20, 3)]
    lst = spark.createDataFrame(rows, "p string, s long")
    loc = small_local_df(spark, rows, "p string, s long")
    a = sorted(big.join(F.broadcast(lst), "p").collect())
    b = sorted(big.join(F.broadcast(loc), "p").collect())
    assert a == b

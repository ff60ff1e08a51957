"""icb_* SQL function surface: registration, SQL callability, and value
parity with the JVM Column-expression operators."""

import pyspark.sql.functions as F
import pytest

from iceberg_ruby_spark.functions import register_functions
from iceberg_ruby_spark.operators import text as t


@pytest.fixture(scope="module")
def registered(spark):
    return set(register_functions(spark))


def test_registration_names(registered):
    assert {
        "icb_token_count",
        "icb_language_id",
        "icb_fingerprint",
        "icb_simhash",
        "icb_cosine",
    } <= registered


def test_sql_callable(spark, registered):
    spark.createDataFrame(
        [("the quick brown fox and the dog",)], ["text"]
    ).createOrReplaceTempView("fdocs")
    row = spark.sql(
        "SELECT icb_token_count(text) AS n, icb_language_id(text) AS lang, "
        "icb_fingerprint(text) AS fp, icb_simhash(text) AS sh FROM fdocs"
    ).collect()[0]
    assert row["n"] == 7
    assert row["lang"] == "en"
    assert len(row["fp"]) == 32
    assert isinstance(row["sh"], int)


def test_parity_with_column_expressions(spark, registered):
    texts = [
        ("the quick brown fox jumps over the lazy dog",),
        ("El perro y el gato en la casa",),
        ("x",),
        ("  ",),
        (None,),
    ]
    df = spark.createDataFrame(texts, ["text"])
    rows = df.select(
        t.token_count(F.col("text")).alias("tc_expr"),
        F.expr("icb_token_count(text)").alias("tc_udf"),
        t.language_id(F.col("text")).alias("lang_expr"),
        F.expr("icb_language_id(text)").alias("lang_udf"),
        t.fingerprint(F.col("text")).alias("fp_expr"),
        F.expr("icb_fingerprint(text)").alias("fp_udf"),
    ).collect()
    for r in rows:
        assert r["tc_expr"] == r["tc_udf"]
        assert r["lang_expr"] == r["lang_udf"]
        assert r["fp_expr"] == r["fp_udf"]


def test_cosine_udf(spark, registered):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], ["a", "b"]
    )
    vals = [r[0] for r in df.select(F.expr("icb_cosine(a, b)")).collect()]
    assert abs(vals[0] - 1.0) < 1e-9 and abs(vals[1]) < 1e-9


def test_shingles_udtf(spark, registered):
    rows = spark.sql("SELECT * FROM icb_shingles('Hello  World', 5)").collect()
    shingles = [r["shingle"] for r in rows]
    assert shingles[0] == "hello"
    assert len(shingles) == len("hello world") - 4


def test_simhash_similar_texts_close(spark, registered):
    df = spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog",),
            ("the quick brown fox jumps over the lazy cat",),
        ],
        ["text"],
    )
    a, b = [r[0] for r in df.select(F.expr("icb_simhash(text)")).collect()]
    hamming = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert hamming <= 16  # near-dup texts land close in Hamming space


def test_icb_strip_html_matches_column_form(catalog, spark):
    import pyspark.sql.functions as F

    from iceberg_ruby_spark.functions import register_functions
    from iceberg_ruby_spark.operators.text import strip_html

    register_functions(spark)
    html = '<p>Hello &amp; <b>world</b></p><script>var x;</script>'
    df = spark.createDataFrame([(html,), (None,)], "h string")
    udf_out = [r[0] for r in df.selectExpr("icb_strip_html(h)").collect()]
    col_out = [r[0] for r in df.select(strip_html(F.col("h"))).collect()]
    assert udf_out == col_out == ["Hello & world", ""]

"""Property-based invariants for the text-pipeline operators (hypothesis):
whatever the corpus, span removal conserves tokens and strip_html leaves
no parseable tag behind."""

import re
from collections import Counter

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

WORDS = st.lists(
    st.text(alphabet="abcxyz<>&", min_size=1, max_size=4), min_size=0, max_size=30
)


@settings(max_examples=5, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=8), st.integers(2, 4))
def test_remove_shared_spans_conserves_tokens(spark, corpora, ngram):
    from iceberg_ruby_spark.operators.dedup import remove_shared_spans

    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_shared_spans(df, ngram=ngram, keep_first=False).collect()
    by_id = {r.doc_id: r for r in out}
    assert set(by_id) == {i for i, _ in rows}
    for i, ws in enumerate(corpora):
        r = by_id[i]
        got = r.text.split() if r.text else []
        # output tokens are a sub-multiset of the input's, and the
        # removal accounting is exact
        assert not (Counter(got) - Counter(ws))
        assert r.n_removed_tokens == len([w for w in ws if w]) - len(got)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="ab <>/&;!npqcript-=\"'\n\t", min_size=0, max_size=80
        ),
        min_size=1,
        max_size=10,
    )
)
def test_strip_html_leaves_no_tags(spark, texts):
    from iceberg_ruby_spark.operators.text import strip_html

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    out = [r.x for r in df.select(strip_html(F.col("t")).alias("x")).collect()]
    for x in out:
        assert x is not None
        # no complete tag survives, whitespace is collapsed and trimmed
        assert not re.search(r"<[^>]+>", x)
        assert not re.search(r"[ \t]{2,}", x)
        assert x == x.strip()


def test_canonicalize_url_semantics(spark):
    from pyspark.sql import functions as F

    from iceberg_ruby_spark.operators.text import canonicalize_url

    cases = [
        ("HTTP://Ex.COM:80/A/?utm_source=x&b=2&a=1#f", "http://ex.com/A?a=1&b=2"),
        ("http://ex.com/A?a=1&b=2", "http://ex.com/A?a=1&b=2"),
        ("HTTPS://EX.com:443/p/", "https://ex.com/p"),
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),  # non-default port kept
        ("https://ex.com/?gclid=1&fbclid=2", "https://ex.com"),
        ("http://ex.com:80", "http://ex.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = [r["c"] for r in df.select(canonicalize_url("u").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_canonicalize_url_malformed_and_null(spark):
    """Scheme-less inputs pass through verbatim (no false merging);
    NULL URLs survive dedup_by_url unharmed."""
    from pyspark.sql import functions as F

    from iceberg_ruby_spark.operators.text import canonicalize_url, dedup_by_url

    df = spark.createDataFrame(
        [(1, "example.com/p1"), (2, "other.org/p2"), (3, None),
         (4, "//proto.rel/x"), (5, "http://a.com/x"), (6, "HTTP://A.com/x/")],
        ["id", "u"],
    )
    canon = {r["id"]: r["c"] for r in df.select("id", canonicalize_url("u").alias("c")).collect()}
    assert canon[1] == "example.com/p1" and canon[2] == "other.org/p2"
    assert canon[4] == "//proto.rel/x" and canon[3] is None
    out = dedup_by_url(df, "u", "id")
    kept = sorted(r["id"] for r in out.collect())
    # 5 and 6 merge (canonical http://a.com/x, min id 5); all others kept
    assert kept == [1, 2, 3, 4, 5]

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

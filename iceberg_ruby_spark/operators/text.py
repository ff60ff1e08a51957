"""Text-analysis scalars for document pipelines.

Absent from the reference (SURVEY.md §2 Tier C).  Every function here is a
composition of built-in ``pyspark.sql.functions`` — no UDFs — so they run
inside whole-stage codegen and cost nothing extra at 100 TB.  Each has an
exact ANSI-SQL twin used by the DuckDB oracle (see plans/llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny built-in stopword lists for the n-gram language-ID heuristic.  These
# are function words chosen to be disjoint enough across languages; the
# heuristic is "language with the most stopword hits wins".
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "es": ["el", "la", "los", "las", "es", "y", "en", "que", "de", "por"],
    "fr": ["le", "la", "les", "et", "est", "que", "dans", "pour", "un", "une"],
}


def token_count(col) -> Column:
    """Whitespace token count (0 for empty/blank strings, null for null —
    Spark's size(null) legacy -1 must not leak out)."""
    c = F.trim(col if isinstance(col, Column) else F.col(col))
    return (
        F.when(c.isNull(), F.lit(None).cast("int"))
        .when(F.length(c) == 0, F.lit(0))
        .otherwise(F.size(F.split(c, r"\s+")))
    )


def bpe_ish_token_count(col) -> Column:
    """BPE-flavored token count: word pieces, numbers, and punctuation runs
    counted separately (a cheap regex stand-in for a real tokenizer)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"))


def punct_ratio(col) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    c = col if isinstance(col, Column) else F.col(col)
    total = F.greatest(F.length(c), F.lit(1))
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct / total


def uppercase_ratio(col) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    total = F.greatest(F.length(c), F.lit(1))
    upper = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return upper / total


def stopword_hits(col, lang: str = "en") -> Column:
    """Number of distinct stopwords of ``lang`` present in the text."""
    c = col if isinstance(col, Column) else F.col(col)
    toks = F.array_distinct(F.split(F.lower(F.trim(c)), r"\s+"))
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def language_id(col) -> Column:
    """Heuristic language ID: the language with the most distinct stopword
    hits wins; ties and zero hits → 'und'.  Deterministic tie order:
    languages compared in sorted key order."""
    c = col if isinstance(col, Column) else F.col(col)
    hits = {lang: stopword_hits(col, lang) for lang in sorted(STOPWORDS)}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # first language (sorted order) achieving the max wins
    for lang in sorted(STOPWORDS, reverse=True):
        out = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(out)


def quality_score(col) -> Column:
    """Composite quality score in [0,1]: rewards mid-length documents with
    low punctuation/uppercase noise and a sane mean word length."""
    c = col if isinstance(col, Column) else F.col(col)
    n_tok = token_count(c)
    mean_word = F.length(F.regexp_replace(c, r"\s+", "")) / F.greatest(n_tok, F.lit(1))
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    noise = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 5 - uppercase_ratio(c) * 2)
    return F.round(len_score * 0.4 + word_score * 0.3 + noise * 0.3, 6)


def fingerprint(col) -> Column:
    """Deterministic document fingerprint: md5 of casefolded,
    punctuation-stripped, whitespace-collapsed text — the classic
    'fingerprint clustering' key for near-exact dedup."""
    c = col if isinstance(col, Column) else F.col(col)
    normalized = F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\w\s]", ""), r"\s+", " "))
    return F.md5(normalized)


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the standard per-document stat columns in one projection."""
    c = F.col(text_col)
    return df.select(
        "*",
        F.length(c).alias("char_len"),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(uppercase_ratio(c), 6).alias("upper_ratio"),
        language_id(c).alias("lang_guess"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fp"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding token-window chunking — the standard pre-tokenization split
    for LLM training corpora.  Windows of ``chunk_size`` whitespace tokens
    advancing by ``chunk_size - overlap``; the last window keeps the tail
    (may be short).  Emits (id, chunk_id, chunk_text, chunk_tokens).

    Entirely JVM-side: split → ONE explode over the window count →
    slice/array_join per window (plain expressions, codegen-friendly; no
    higher-order lambdas, no shuffle — chunking is a map-only operation
    however large the corpus)."""
    if overlap >= chunk_size:
        from iceberg_ruby_spark.errors import InvalidDataError

        raise InvalidDataError(f"overlap ({overlap}) must be < chunk_size ({chunk_size})")
    step = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_windows = F.lit(1) + F.greatest(
        F.ceil((n - F.lit(chunk_size)) / F.lit(float(step))).cast("int"), F.lit(0)
    )
    base = df.select(F.col(id_col), toks.alias("__toks"), n_windows.alias("__nw"))
    win = F.slice(F.col("__toks"), F.col("chunk_id") * step + 1, chunk_size)
    return (
        base.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.col("__nw") - 1)).alias("chunk_id"),
            F.col("__toks"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.array_join(win, " ").alias("chunk_text"),
            F.size(win).alias("chunk_tokens"),
        )
    )

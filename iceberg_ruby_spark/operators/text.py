"""Text-analysis scalars for document pipelines.

Absent from the reference (SURVEY.md §2 Tier C).  Every function here is a
composition of built-in ``pyspark.sql.functions`` — no UDFs — so they run
inside whole-stage codegen and cost nothing extra at 100 TB.  Each has an
exact ANSI-SQL twin used by the DuckDB oracle (see plans/llm.py).
"""

from __future__ import annotations

from typing import Optional

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


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict,
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic hash-based stratified sampling — the training-data
    mixer's downsampling primitive (keep 10% of crawl, 100% of books…).

    A row survives when its md5-derived uniform in [0, 1) falls under its
    stratum's rate.  The draw is a pure function of (seed, id): no RNG
    state, so the SAME rows survive on every run, on any partitioning, on
    any cluster size — resumable pipelines and exact cross-engine oracles
    (DuckDB reproduces the md5 arithmetic bit-for-bit).  Map-only: no
    shuffle at any corpus size; the filter pipelines into the scan."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.withColumn("__u", u).filter(F.col("__u") < rate).drop("__u")


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences (packs).

    The scalable offset-packing scheme: within each partition, documents
    are ordered by id, and a document's pack is ``floor(cum_tokens_before
    / budget)`` — one window prefix-sum, deterministic, and expressible in
    any engine (the greedy never-straddle variant needs sequential state;
    this form is what large pipelines actually run, with boundary docs
    split downstream by the chunker).  ``partition_col`` keys the window
    so the sort is per-group, not global — REQUIRED at scale (a global
    window is a single-task sort at 100 TB; packing within lang/source
    shards is both parallel and what mixers want anyway).  Output adds
    (pack_id, pack_offset, n_tokens)."""
    from pyspark.sql import Window

    if partition_col:
        w = Window.partitionBy(partition_col).orderBy(F.col(id_col).asc())
    else:
        # mechanical guard for the documented hazard above: a global
        # window collapses the whole input into ONE task.  Fine for a
        # unit test or a single shard; a silent scale-killer on a real
        # corpus, so it warns every time it is taken.
        import warnings

        warnings.warn(
            "pack_sequences(partition_col=None) uses a GLOBAL window — "
            "one task sorts the entire input. Pass partition_col (e.g. a "
            "lang/source shard column) for any input larger than one shard.",
            ResourceWarning,
            stacklevel=2,
        )
        w = Window.orderBy(F.col(id_col).asc())
    n = token_count(F.col(text_col))
    cum_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        df.withColumn("n_tokens", n)
        .withColumn("pack_offset", cum_before)
        .withColumn(
            "pack_id", F.floor(F.col("pack_offset") / F.lit(int(budget))).cast("long")
        )
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails and phone-shaped numbers from a text column — the
    minimum-viable PII pass every public-corpus pipeline runs before
    training.  Pure regexp_replace (JVM codegen, map-only); adds
    ``n_emails`` / ``n_phones`` counts so the scrub is auditable.  The
    patterns are deliberately simple, shared verbatim with the DuckDB
    oracle; a production pass would chain domain-specific patterns the
    same way."""
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(_EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(c, F.lit(_PHONE_RE), F.lit(0)))
    scrubbed = F.regexp_replace(
        F.regexp_replace(c, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        df.withColumn("n_emails", n_emails)
        .withColumn("n_phones", n_phones)
        .withColumn(text_col, scrubbed)
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals — the standard "repetitious
    document" filters a pretraining pipeline applies before mixing.  Adds
    per-document ``dup_{1,2,3}gram_frac`` (fraction of word n-grams that
    are repeats: ``1 - distinct/total``) and ``dup_line_frac``.

    Pure Column expressions over in-row arrays: map-only, ZERO shuffles,
    whole-stage codegen — the cheapest possible shape at 100 TB (the
    Gopher thresholds, e.g. drop when dup_2gram_frac > 0.2, are then
    plain WHERE clauses downstream)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    # NOTE: the gram lambda must stay single-argument — F.transform treats
    # a two-parameter lambda as (element, index), so a `_n=n` default
    # would silently receive the array INDEX
    def _gram_fn(size):
        return lambda i: F.array_join(F.slice(toks, i + 1, size), " ")

    out = df
    for n in (1, 2, 3):
        if n == 1:
            grams = toks
        else:
            cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
            grams = F.transform(F.sequence(F.lit(0), cnt - 1), _gram_fn(n))
        frac = F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams)
        out = out.withColumn(f"dup_{n}gram_frac", frac.cast("double"))
    lines = F.split(F.col(text_col), "\n")
    out = out.withColumn(
        "dup_line_frac",
        (F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines)).cast("double"),
    )
    return out


def domain_cap(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    quality_col: Optional[str] = None,
    cap: int = 100,
) -> DataFrame:
    """Per-domain document cap (the RefinedWeb/C4 anti-spam primitive):
    keep at most ``cap`` docs per ``group_col``, preferring the highest
    ``quality_col`` (ties, and the no-quality default, broken by smallest
    id for a deterministic, engine-reproducible selection).

    Scale shape: ``row_number() <= cap`` over a per-domain window is
    planned by Spark as WindowGroupLimit — each map task keeps only its
    local top-``cap`` per domain BEFORE the exchange, so the shuffle
    carries at most ``cap × tasks`` rows per domain, and one giant domain
    cannot flood a single reducer with its full corpus slice."""
    order = ([F.col(quality_col).desc()] if quality_col else []) + [
        F.col(id_col).asc()
    ]
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def mix_corpus(
    df: DataFrame,
    token_budgets: dict,
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Token-budget corpus MIXING — the step that turns per-source token
    targets ("200M tokens of crawl, all of books") into sampling rates:
    one tiny aggregation computes each source's total tokens (the driver
    collects one row per source), the rate is ``min(1, budget/total)``,
    and the deterministic md5 stratified filter applies it map-only.
    Sources without a budget are kept whole.  Adds ``mix_rate`` so the
    sample is auditable; survivors are a pure function of (seed, id) —
    identical on any partitioning or cluster size, resumable, and
    reproducible by external engines."""
    totals = {
        r[stratum_col]: r["__tok"]
        for r in df.groupBy(stratum_col)
        .agg(F.sum(token_count(F.col(text_col))).alias("__tok"))
        .collect()
    }
    rates = {
        s: min(1.0, float(token_budgets[s]) / t) if s in token_budgets else 1.0
        for s, t in totals.items()
        if t
    }
    out = stratified_sample(df, stratum_col, rates, id_col=id_col, seed=seed)
    rate_expr = F.lit(1.0)
    for s, r in sorted(rates.items()):
        rate_expr = F.when(F.col(stratum_col) == s, F.lit(r)).otherwise(rate_expr)
    return out.withColumn("mix_rate", rate_expr.cast("double"))


# ---------------------------------------------------------------------------
# hashed-n-gram linear quality classifier (fastText/CCNet-style scoring)
# ---------------------------------------------------------------------------


def classifier_tokens(col) -> Column:
    """Casefolded alphanumeric unigrams — the classifier's tokenizer.
    Pure array expression; the DuckDB twin is
    ``list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
    t -> t <> '')``."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.filter(
        F.split(F.lower(F.trim(c)), r"[^a-z0-9]+"), lambda t: t != ""
    )


def _classifier_bucket(tok: Column, dim: int, hash_fn: str) -> Column:
    """token → feature bucket in [0, dim).  ``xxhash64`` is the production
    hash (JVM codegen); ``md5`` is the engine-neutral twin (first 15 hex
    digits as a 60-bit non-negative int, the same derivation the MinHash /
    SimHash oracles use — DuckDB:
    ``CAST('0x'||substr(md5(t),1,15) AS BIGINT) % dim``)."""
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
        return (h % dim).cast("int")
    return F.pmod(F.xxhash64(tok), F.lit(dim)).cast("int")


def classifier_score(
    col, weights: list, bias: float = 0.0, hash_fn: str = "xxhash64"
) -> Column:
    """Hashed-bag-of-words linear score: each token hashes to one of
    ``len(weights)`` buckets and contributes that bucket's weight — the
    scoring half of a fastText-style quality classifier, as ONE in-row
    array fold (zero shuffles, zero UDFs, 100 TB-safe: cost is O(tokens)
    inside whole-stage codegen).

    Integer weights make the score an exact BIGINT fixed-point sum (the
    cross-engine-hashable form); float weights give the usual double
    score."""
    dim = len(weights)
    exact = all(isinstance(w, int) for w in weights)
    cast = "long" if exact else "double"
    warr = F.array(*[F.lit(w).cast(cast) for w in weights])
    acc0 = F.lit(bias).cast(cast)
    return F.aggregate(
        classifier_tokens(col),
        acc0,
        lambda acc, t: acc + F.element_at(warr, _classifier_bucket(t, dim, hash_fn) + 1),
    )


def fit_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 256,
    hash_fn: str = "xxhash64",
    smoothing: float = 1.0,
) -> tuple[list, float]:
    """Train hashed-unigram Naive-Bayes log-odds weights — the classic
    one-pass quality-classifier baseline (label 1 = good, 0 = bad).

    Distributed shape: explode tokens → bucket → ONE groupBy over at most
    ``dim`` keys (partial aggregation makes the shuffle dim-bounded however
    large the corpus); the driver sees exactly ``dim`` count rows plus one
    prior row.  Returns ``(weights, bias)`` for :func:`classifier_score`.
    """
    import math

    toks = df.select(
        F.col(label_col).cast("int").alias("__y"),
        F.explode(classifier_tokens(F.col(text_col))).alias("__t"),
    )
    counts = (
        toks.select("__y", _classifier_bucket(F.col("__t"), dim, hash_fn).alias("__b"))
        .groupBy("__b")
        .agg(
            F.sum("__y").alias("pos"),
            F.sum(1 - F.col("__y")).alias("neg"),
        )
        .collect()
    )
    pos_tot = sum(r["pos"] for r in counts) + smoothing * dim
    neg_tot = sum(r["neg"] for r in counts) + smoothing * dim
    by_bucket = {r["__b"]: (r["pos"], r["neg"]) for r in counts}
    weights = [
        math.log((by_bucket.get(b, (0, 0))[0] + smoothing) / pos_tot)
        - math.log((by_bucket.get(b, (0, 0))[1] + smoothing) / neg_tot)
        for b in range(dim)
    ]
    npos, nneg = (
        df.agg(
            F.sum(F.col(label_col).cast("int")),
            F.sum(1 - F.col(label_col).cast("int")),
        ).first()
    )
    bias = math.log((npos + smoothing) / (nneg + smoothing))
    return weights, float(bias)


# ---------------------------------------------------------------------------
# character-bigram language model (CCNet-style LM quality signal)
# ---------------------------------------------------------------------------

_LM_ALPHABET = "abcdefghijklmnopqrstuvwxyz #"
_LM_DIM = len(_LM_ALPHABET)  # 28 symbols → 784 bigrams
_LM_SCALE = 1_048_576  # 2^20 fixed-point


def _lm_normalize(col) -> Column:
    """ASCII-printable → lower → [a-z ]∪'#'.  Non-ASCII is collapsed to
    '#' BEFORE lowercasing so engine-specific Unicode case rules can never
    leak into the model (the DuckDB twin applies the identical chain)."""
    c = col if isinstance(col, Column) else F.col(col)
    ascii_only = F.regexp_replace(c, r"[^ -~]", "#")
    return F.regexp_replace(F.lower(ascii_only), r"[^a-z ]", "#")


def _lm_bigram_index(txt: Column, i: Column) -> Column:
    """0-based bigram bucket for position ``i`` (1-based) of normalized
    text: (idx(char_i) * 28) + idx(char_i+1)."""
    # instr(alphabet, ch) is 1-based and never 0 after normalization
    first = F.instr(F.lit(_LM_ALPHABET), F.substring(txt, i, 1)) - 1
    nxt = F.instr(F.lit(_LM_ALPHABET), F.substring(txt, i + 1, 1)) - 1
    return first * _LM_DIM + nxt


def _lm_positions(txt: Column) -> Column:
    """[1..len-1] or [] — Spark's sequence(1, 0) steps BACKWARDS to
    [1, 0], so short/empty/null docs need the explicit empty array."""
    n = F.coalesce(F.greatest(F.length(txt) - 1, F.lit(0)), F.lit(0))
    return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )


def fit_char_lm(df: DataFrame, text_col: str = "text") -> list:
    """Train the bigram model: ONE groupBy over at most 784 bucket keys
    (partial aggregation makes the shuffle constant-bounded at any corpus
    size; the driver collects ≤784 count rows).  Returns 784 fixed-point
    conditional probabilities ``scaled[b] = (count[b] << 20) //
    count[prefix(b)]`` — integers, so every downstream score is exact and
    engine-neutral."""
    txt = _lm_normalize(F.col(text_col))
    seq = _lm_positions(txt)
    buckets = df.select(
        F.explode(
            F.transform(seq, lambda i: _lm_bigram_index(txt, i))
        ).alias("__b")
    )
    counts = {r["__b"]: r["n"] for r in
              buckets.groupBy("__b").agg(F.count(F.lit(1)).alias("n")).collect()}
    prefix_tot = [0] * _LM_DIM
    for b, n in counts.items():
        prefix_tot[b // _LM_DIM] += n
    return [
        (counts.get(b, 0) * _LM_SCALE) // max(prefix_tot[b // _LM_DIM], 1)
        for b in range(_LM_DIM * _LM_DIM)
    ]


def char_lm_score(col, scaled: list) -> tuple[Column, Column]:
    """(sum of fixed-point bigram probabilities, bigram count) — the
    higher the mean, the more the document looks like the training
    corpus (the CCNet 'wikipedia-like' LM filter, with probabilities in
    place of log-probs so integer arithmetic stays exact).  One in-row
    fold per document: zero shuffles, zero UDFs."""
    txt = _lm_normalize(col)
    n = F.coalesce(F.greatest(F.length(txt) - 1, F.lit(0)), F.lit(0))
    warr = F.array(*[F.lit(int(w)).cast("long") for w in scaled])
    seq = _lm_positions(txt)
    total = F.aggregate(
        seq,
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.element_at(warr, _lm_bigram_index(txt, i) + 1),
    )
    return total, n.cast("long")


def tfidf_top_terms(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyword/topic
    signal (sklearn's smooth-idf formula:
    ``tf * (ln((N + 1) / (df + 1)) + 1)`` over raw whitespace-token
    counts).  Returns ``(id_col, term, tf, df, tfidf, rank)`` with ranks
    1..k per document, ties broken by term ascending so the output is
    deterministic on any partitioning.

    100 TB shape: term frequencies are ONE (doc, term) hash aggregate
    (map-side partial); document frequencies reuse that result with one
    term-keyed aggregate; the corpus size N is a single scalar aggregate
    broadcast into the score; top-k is a per-doc rank window Spark plans
    as WindowGroupLimit — the partial top-k runs map-side, so a
    million-term document never floods a reducer.  No all-pairs, no
    driver-side state beyond the one scalar.
    """
    toks = corpus.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = corpus.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1.0)
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("tfidf").cast("double").alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def strip_html(col) -> Column:
    """Plain text from raw HTML — the first step of every web-corpus
    pipeline (the CCNet/RefinedWeb extraction stage, minus the boilerplate
    classifier which :func:`line_dedup` / quality scoring cover):
    script/style/comment blocks dropped, block-level closers become
    newlines (paragraph structure survives), remaining tags strip to
    spaces, the common entities decode, whitespace collapses.

    Pure ``regexp_replace`` chain — map-only, zero shuffles, in
    whole-stage codegen; patterns stay in the RE2-compatible subset so
    external engines (the DuckDB oracle) run the identical rules."""
    c = F.coalesce(col, F.lit(""))
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr)[^>]*>", "\n")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&apos;", "'"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def canonicalize_url(col) -> Column:
    """Canonical form of a URL — the key web-corpus pipelines dedupe crawl
    records on (a page fetched as ``HTTP://Site.com/a/?utm_source=x&b=2``
    and ``http://site.com/a?b=2`` is ONE page):

    - scheme and host lowercase; default ports (``:80`` http, ``:443``
      https) stripped;
    - fragment dropped (never sent to the server);
    - tracking query params dropped (``utm_*``, ``gclid``, ``fbclid``),
      the rest SORTED (param order is not semantic);
    - trailing path slash stripped.

    Pure JVM regexp/array expressions — map-only, whole-stage codegen,
    no UDF; at 100 TB this is a scan-side projection feeding an exact
    groupBy-dedup on the canonical key."""
    c = col if isinstance(col, Column) else F.col(col)
    u = F.trim(c)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    # strip default ports (conditional on scheme)
    host = F.when(
        (scheme == "http"), F.regexp_replace(host, ":80$", "")
    ).otherwise(host)
    host = F.when(
        (scheme == "https"), F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda x: (x != "") & ~x.rlike(r"^(utm_[^=]*|gclid|fbclid)="),
    )
    qs = F.array_join(F.array_sort(params), "&")
    built = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    # scheme-less / malformed inputs (protocol-relative, bare hosts,
    # relative paths) would all degenerate to "://…" and falsely merge —
    # pass them through verbatim instead (no canonicalization, no loss)
    return F.when(u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), built).otherwise(u)


def dedup_by_url(
    df: DataFrame, url_col: str, id_col: str, out_col: str = "canonical_url"
) -> DataFrame:
    """Exact dedup on the canonical URL: one survivor per canonical form
    (deterministic: the minimum ``id_col``).  ONE hash shuffle on the
    canonical key (window top-1 — the canonicalization projection runs
    once, never on both sides of a self-join) — the crawl-dedup stage
    that runs before any content-based near-dup pass.  NULL URLs have no
    key to dedup on and are kept verbatim."""
    from pyspark.sql import Window

    canon = df.withColumn(out_col, canonicalize_url(url_col))
    w = Window.partitionBy(out_col).orderBy(F.col(id_col).asc_nulls_last())
    return (
        canon.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) | F.col(out_col).isNull())
        .drop("__rn")
    )


def _hash_order_key(id_col: str, seed: int, engine: str, op: str) -> Column:
    """The deterministic order/draw key shared by the sampling and
    shuffle operators: JVM ``xxhash64`` (fastest) or ``md5`` of
    ``"id:seed"`` (bit-identical in DuckDB for cross-engine oracles)."""
    if engine == "xxhash":
        return F.xxhash64(F.col(id_col), F.lit(seed))
    if engine == "md5":
        return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    raise ValueError(f"{op} engine must be 'xxhash' or 'md5', got {engine!r}")


def shuffle_corpus(
    df: DataFrame,
    seed: int = 42,
    id_col: str = "doc_id",
    engine: str = "xxhash",
) -> DataFrame:
    """Deterministic GLOBAL shuffle — the training-order primitive: the
    same (seed, id) always lands a document at the same position, across
    reruns, partition counts, and cluster sizes, so a training run is
    reproducible and resumable without materializing a permutation.

    The order key is a hash of (id, seed); ``orderBy`` over it is
    Spark's sampled range-partition + per-partition sort — a total order
    with NO single-reducer stage, the only shuffle shape that survives
    100 TB.  The id itself tie-breaks hash collisions.  A different seed
    is a fresh epoch permutation; iterate seeds for multi-epoch
    training.

    ``engine='xxhash'`` (default) keys on JVM ``xxhash64`` — fastest.
    ``engine='md5'`` keys on ``md5(id || ':' || seed)``, bit-identical
    in DuckDB/Spark, so cross-engine oracles can verify the exact order.
    """
    key = _hash_order_key(id_col, seed, engine, "shuffle_corpus")
    return df.orderBy(key, F.col(id_col))


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
    engine: str = "xxhash",
) -> DataFrame:
    """Deterministic k-per-group sampling — the eval-set construction
    primitive ("200 docs per source/language/domain"): within each group,
    the k survivors are the smallest hash(id, seed) values, so the draw
    is a pure function of (seed, group membership) — stable across
    reruns, partitionings, and appends that don't touch a group's
    members.

    ONE shuffle (the group window); the per-group sort is bounded by
    group size, never the corpus.  ``engine='md5'`` makes the hash
    bit-identical in DuckDB for cross-engine verification; ``'xxhash'``
    (default) stays JVM-fastest."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key = _hash_order_key(id_col, seed, engine, "sample_k_per_group")
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )

"""LLM-data-pipeline queries over documents/embeddings — SURVEY.md §2 Tier C
extension surface (dedup, similarity search, text analysis, multimodal).

Oracle twins replicate the operator formulas in DuckDB SQL term by term.
Hash-based operators run in an engine-neutral md5-derived mode for the
driver (MinHash, SimHash: the oracle rebuilds every signature bit-for-bit);
the ANN queries run at configurations whose candidate sets provably cover
the true top-k, making the exact cosine top-k SQL a row-for-row twin —
every registered query here is hash-checkable, none are rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_ruby_spark.plans.registry import query
from iceberg_ruby_spark.plans.tables import load

# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_text",
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies FROM documents GROUP BY text
    """,
    bench=True,
)
def dedup_exact_text(spark, sf_dir):
    """Exact dedup: one hash shuffle on the text; survivor = min doc_id."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("keep_id", "n_copies")


_FP_SQL = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', '', 'g'), "
    "'\\s+', ' ', 'g')))"
)


@query(
    "dedup_fingerprint",
    oracle=f"""
    SELECT {_FP_SQL} AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_fingerprint(spark, sf_dir):
    """Near-exact dedup on the normalized-text fingerprint: shuffles a
    32-byte digest instead of document bodies (the 100 TB-safe key)."""
    from iceberg_ruby_spark.operators.text import fingerprint

    d = load(spark, sf_dir, "documents")
    return d.select(fingerprint(F.col("text")).alias("fp"), "doc_id").groupBy("fp").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def _minhash_oracle(num_hashes: int = 64, bands: int = 16, threshold: float = 0.5) -> str:
    """DuckDB twin of the ENTIRE md5-mode MinHash+LSH pipeline — same
    shingles, same 60-bit md5-derived base hash, same affine Carter–Wegman
    mins (signed-64 wraparound emulated via HUGEINT mod arithmetic), same
    band-tuple candidate generation, same low-byte agreement funnel, same
    exact-Jaccard verification over the identical hash sets.  Every stage
    is a deterministic function of the text, so this is bit-for-bit
    equality, not a recall bound."""
    from iceberg_ruby_spark.operators.dedup import _MULT, _OFFS

    rpb = num_hashes // bands
    cutoff = max(0.0, threshold - 2.0 * (threshold * (1.0 - threshold) / num_hashes) ** 0.5)
    two64 = "18446744073709551616::HUGEINT"
    two63 = "9223372036854775808::HUGEINT"

    def wrap(m: int, o: int) -> str:
        # signed-64 wrapping h*m+o (Spark with ANSI off wraps; DuckDB
        # raises on BIGINT overflow, so compute in HUGEINT and fold back)
        x = f"(h::HUGEINT * ({m}) + ({o}))"
        return f"CAST(((({x} % {two64}) + {two64} + {two63}) % {two64}) - {two63} AS BIGINT)"

    mins = ",\n         ".join(
        f"min({wrap(_MULT[i], _OFFS[i])}) AS s{i}" for i in range(num_hashes)
    )
    sig_list = "[" + ", ".join(f"s{i}" for i in range(num_hashes)) + "]"
    band_key = "concat(gb.b, ':', " + ", ',', ".join(
        f"sig[{rpb}*gb.b+{r + 1}]" for r in range(rpb)
    ) + ")"
    agree = " + ".join(
        f"CASE WHEN (a.sig[{i + 1}] & 255) = (b.sig[{i + 1}] & 255) THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
    WITH norm AS (
      SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(substr(t, CAST(g.i AS INTEGER), 5)), 1, 15)) AS BIGINT) AS h
      FROM norm,
           LATERAL (SELECT unnest(generate_series(1, greatest(length(t) - 4, 1))) AS i) g
    ), sig AS (
      SELECT doc_id,
         {mins}
      FROM sh GROUP BY doc_id
    ), sigl AS (
      SELECT doc_id, {sig_list} AS sig FROM sig
    ), bands AS (
      SELECT doc_id, sig, {band_key} AS bkey
      FROM sigl, LATERAL (SELECT unnest(generate_series(0, {bands - 1})) AS b) gb
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
      WHERE ({agree}) / {float(num_hashes)} >= {cutoff!r}
    ), sets AS (
      SELECT doc_id, list_distinct(list(h)) AS s FROM sh GROUP BY doc_id
    ), verified AS (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
               / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS j
      FROM cand c
      JOIN sets sa ON sa.doc_id = c.id_a
      JOIN sets sb ON sb.doc_id = c.id_b
    )
    SELECT id_a, id_b, round(j, 6) AS jaccard FROM verified WHERE j >= {threshold!r}
    """


def _minhash_lsh_production(spark, sf_dir):
    """The PRODUCTION MinHash path: xxhash64 base hash (JVM codegen, the
    path a 100 TB corpus would run; GT-pinned against brute-force Jaccard
    in tests/test_ground_truth.py).  bench.py times THIS callable under
    the ``dedup_minhash_lsh`` name; the registered md5-mode query below
    stays the correctness row (same plan shape — SCALE.md documents the
    ~1.5× md5 hashing overhead the oracle mode pays)."""
    from iceberg_ruby_spark.operators.dedup import minhash_lsh_pairs

    d = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "text", "doc_id", num_hashes=64, bands=16, shingle_size=5,
        threshold=0.5,
    )


@query(
    "dedup_minhash_lsh",
    bench=True,
    bench_fn=_minhash_lsh_production,
    oracle=_minhash_oracle(),
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs (operators/dedup.py): banded bucket join,
    exact-Jaccard verification of candidates only — never all-pairs.

    Runs in ``hash_fn='md5'`` mode: the base shingle hash is the first 15
    hex digits of md5 (the proven SimHash trick, dedup.py), so DuckDB can
    recompute the signatures, the banding, the agreement funnel, and the
    exact verification term-for-term — the oracle is exact equality over
    the whole pipeline, not a recall bound.  xxhash64 remains the
    operator's fast-path default (``_minhash_lsh_production``, which the
    bench times); the ground-truth pytest pins that path against
    brute-force Jaccard (tests/test_ground_truth.py)."""
    from iceberg_ruby_spark.operators.dedup import minhash_lsh_pairs

    d = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "text", "doc_id", num_hashes=64, bands=16, shingle_size=5,
        threshold=0.5, hash_fn="md5",
    )


@query(
    "dedup_incremental",
    oracle=f"""
    SELECT * FROM ({_minhash_oracle()})
    WHERE id_a % 5 = 0 OR id_b % 5 = 0
    """,
)
def dedup_incremental(spark, sf_dir):
    """Incremental dedup (operators/dedup.py minhash_incremental_pairs):
    treat ``doc_id % 5 = 0`` as the newly-ingested batch and the rest as
    the already-mined corpus whose signatures are persisted state; mine
    ONLY batch-touching pairs by probing stored bands with the batch.

    The oracle is the FULL-corpus md5-mode pipeline restricted to pairs
    touching the batch — hash-equality proves the incremental path finds
    exactly the pairs a full re-mine would, without re-mining."""
    from iceberg_ruby_spark.operators.dedup import minhash_incremental_pairs

    d = load(spark, sf_dir, "documents")
    corpus = d.filter("doc_id % 5 != 0")
    batch = d.filter("doc_id % 5 = 0")
    pairs, _batch_sigs = minhash_incremental_pairs(
        corpus, batch, "text", "doc_id",
        num_hashes=64, bands=16, shingle_size=5, threshold=0.5, hash_fn="md5",
    )
    return pairs


# SimHash over the md5-derived 60-bit token hash so DuckDB can recompute
# the ENTIRE signature: same tokens, same hash, same per-bit majority
# vote, same bit assembly.  The operator's default stays xxhash64 (the
# fast path); the md5 form exists exactly so a cross-engine oracle is
# possible.
_SIMHASH_SIG_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(t.tok), 1, 15)) AS BIGINT) AS h
      FROM documents,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t(tok)
    ), votes AS (
      SELECT doc_id,
             {', '.join(f"SUM(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(60))}
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id,
           {' + '.join(f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END" for b in range(60))}
           AS simhash
    FROM votes
"""


@query("dedup_simhash", oracle=_SIMHASH_SIG_SQL)
def dedup_simhash(spark, sf_dir):
    """SimHash signatures (single shuffle, 60 conditional sums) over the
    md5-derived hash — cross-engine verifiable bit-for-bit (the DuckDB
    oracle rebuilds every signature); xxhash64 remains the operator's
    fast-path default."""
    from iceberg_ruby_spark.operators.dedup import simhash

    return simhash(
        load(spark, sf_dir, "documents"), "text", "doc_id", hash_fn="md5"
    )


_NGRAM_JACCARD_SQL = """
WITH sh AS (
  SELECT doc_id, source,
         list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS s
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE),
       6) AS jaccard
FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.3
"""


@query("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact token-set Jaccard within a blocking key (source) — pair
    enumeration bounded to blocks."""
    from iceberg_ruby_spark.operators.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", block_col="source", n=1, threshold=0.3)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_TOKENS_SQL = "string_split_regex(trim(text), '\\s+')"
_TOKEN_COUNT_SQL = (
    f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(len({_TOKENS_SQL}) AS INTEGER) END"
)
_BPE_SQL = "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS INTEGER)"
_PUNCT_SQL = (
    "(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))"
    " / greatest(length(text), 1)"
)
_UPPER_SQL = (
    "(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))"
    " / greatest(length(text), 1)"
)


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS char_len,
           {_TOKEN_COUNT_SQL} AS n_tokens,
           {_BPE_SQL} AS n_bpe_tokens,
           round({_PUNCT_SQL}, 6) AS punct_ratio,
           round({_UPPER_SQL}, 6) AS upper_ratio
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    """Whitespace + BPE-ish token counts and character-class ratios — all
    built-in functions, zero UDFs (operators/text.py)."""
    from iceberg_ruby_spark.operators import text as T

    d = load(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        F.length(c).alias("char_len"),
        T.token_count(c).alias("n_tokens"),
        T.bpe_ish_token_count(c).alias("n_bpe_tokens"),
        F.round(T.punct_ratio(c), 6).alias("punct_ratio"),
        F.round(T.uppercase_ratio(c), 6).alias("upper_ratio"),
    )


def _lang_hits_sql(words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')), "
        f"[{arr}]))"
    )


def _lang_id_oracle() -> str:
    from iceberg_ruby_spark.operators.text import STOPWORDS

    hits = {lang: _lang_hits_sql(ws) for lang, ws in STOPWORDS.items()}
    best = "greatest(" + ", ".join(hits[lang] for lang in sorted(hits)) + ")"
    cases = "\n".join(
        f"WHEN {best} > 0 AND {hits[lang]} = {best} THEN '{lang}'"
        for lang in sorted(hits)
    )
    return f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE {cases} ELSE 'und' END AS lang_guess
    FROM documents
    """


@query("text_language_id", oracle=_lang_id_oracle())
def text_language_id(spark, sf_dir):
    """Stopword-hit language-ID heuristic; ties break in sorted-lang order."""
    from iceberg_ruby_spark.operators.text import language_id

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        language_id(F.col("text")).alias("lang_guess"),
    )


_QUALITY_SQL = f"""
    round(
      least(length(text) / 500.0, 1.0) * 0.4
      + (CASE WHEN (length(regexp_replace(text, '\\s+', '', 'g'))
                    / greatest({_TOKEN_COUNT_SQL}, 1)) BETWEEN 3 AND 10
              THEN 1.0 ELSE 0.5 END) * 0.3
      + greatest(0.0, 1.0 - ({_PUNCT_SQL}) * 5 - ({_UPPER_SQL}) * 2) * 0.3,
    6)
"""


@query(
    "text_quality_score",
    oracle=f"SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents",
)
def text_quality_score(spark, sf_dir):
    from iceberg_ruby_spark.operators.text import quality_score

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


# deterministic fixed-point demo weights for the registered classifier query
# (a real deployment feeds fit_quality_classifier's trained floats instead);
# integer weights make every score an exact BIGINT — cross-engine hashable
_CLS_DIM = 64
_CLS_W = [((i * 37 + 11) % _CLS_DIM) - _CLS_DIM // 2 for i in range(_CLS_DIM)]


@query(
    "text_quality_classifier",
    oracle=f"""
    SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(
                  list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
                              t -> t <> ''),
                  t -> list_extract({_CLS_W},
                         CAST(CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
                              % {_CLS_DIM} AS INTEGER) + 1))), 0) AS BIGINT)
             AS score_k
    FROM documents
    """,
)
def text_quality_classifier(spark, sf_dir):
    """fastText-style hashed-bag-of-words scoring (operators/text.py
    classifier_score): one in-row array fold, zero shuffles.  md5 bucket
    mode so the DuckDB oracle rebuilds every score bit-for-bit; production
    runs the identical plan with xxhash64 buckets and trained float
    weights from fit_quality_classifier."""
    from iceberg_ruby_spark.operators.text import classifier_score

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.coalesce(
            classifier_score(F.col("text"), _CLS_W, bias=0, hash_fn="md5"),
            F.lit(0),
        ).cast("long").alias("score_k"),
    )


_LM_AL = "abcdefghijklmnopqrstuvwxyz #"
_LM_NORM_SQL = (
    "regexp_replace(lower(regexp_replace(text, '[^ -~]', '#', 'g')), "
    "'[^a-z ]', '#', 'g')"
)


@query(
    "text_char_lm_likelihood",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, {_LM_NORM_SQL} AS t FROM documents
    ), big AS (
      SELECT doc_id,
             (strpos('{_LM_AL}', substr(t, CAST(g.i AS INTEGER), 1)) - 1) * 28
             + (strpos('{_LM_AL}', substr(t, CAST(g.i AS INTEGER) + 1, 1)) - 1) AS b
      FROM norm,
           LATERAL (SELECT unnest(generate_series(1, greatest(length(t) - 1, 0))) AS i) g
    ), cnt AS (
      SELECT b, COUNT(*) AS n FROM big GROUP BY b
    ), tot AS (
      SELECT b // 28 AS p, SUM(n) AS ptot FROM cnt GROUP BY 1
    ), w AS (
      SELECT c.b, (c.n * 1048576) // greatest(t.ptot, 1) AS w
      FROM cnt c JOIN tot t ON c.b // 28 = t.p
    ), scored AS (
      SELECT big.doc_id, SUM(w.w) AS s FROM big JOIN w ON big.b = w.b
      GROUP BY big.doc_id
    )
    SELECT norm.doc_id,
           CAST(coalesce(scored.s, 0) AS BIGINT) AS score_k,
           CAST(greatest(length(norm.t) - 1, 0) AS BIGINT) AS n_bigrams
    FROM norm LEFT JOIN scored USING (doc_id)
    """,
)
def text_char_lm_likelihood(spark, sf_dir):
    """CCNet-style LM quality signal: train a character-bigram model on
    the corpus (ONE 784-key groupBy), score every document map-only
    (operators/text.py fit_char_lm / char_lm_score).  Fixed-point integer
    probabilities make the score exact, so the DuckDB oracle re-trains and
    re-scores bit-for-bit."""
    from iceberg_ruby_spark.operators.text import char_lm_score, fit_char_lm

    d = load(spark, sf_dir, "documents")
    scaled = fit_char_lm(d)
    s, n = char_lm_score(F.col("text"), scaled)
    return d.select(
        "doc_id",
        F.coalesce(s, F.lit(0)).cast("long").alias("score_k"),
        n.alias("n_bigrams"),
    )


@query(
    "text_fingerprint",
    oracle=f"SELECT doc_id, {_FP_SQL} AS fp FROM documents",
)
def text_fingerprint(spark, sf_dir):
    from iceberg_ruby_spark.operators.text import fingerprint

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_COS_SQL = (
    "list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))"
)


@query(
    "embedding_cosine_topk",
    oracle=f"""
    SELECT q.vec_id AS query_id, c.vec_id, round({_COS_SQL}, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY q.vec_id
                                   ORDER BY round({_COS_SQL}, 6) DESC, c.vec_id) AS INTEGER) AS rank
    FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 5) q
    WHERE c.vec_id != q.vec_id
    QUALIFY rank <= 10
    """,
    bench=True,
)
def embedding_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-10 for 5 query vectors: broadcast the
    queries, scan the corpus once, JVM-side zip_with/aggregate dot product."""
    from iceberg_ruby_spark.operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, q, k=10)


# The exact-cosine top-k SQL is a valid twin for the ANN queries below
# whenever the candidate set provably covers the true top-k: the re-rank
# computes the identical rounded cosine and tie-break, so candidate
# coverage ⇒ row-for-row equality (verified at sf0.001/0.01/0.1 and
# pinned by tests/test_ground_truth.py).
_EXACT_TOPK_SQL = f"""
    SELECT q.vec_id AS query_id, c.vec_id, round({_COS_SQL}, 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY q.vec_id
                                   ORDER BY round({_COS_SQL}, 6) DESC, c.vec_id) AS INTEGER) AS rank
    FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 5) q
    WHERE c.vec_id != q.vec_id
    QUALIFY rank <= 10
"""


@query("embedding_ann_lsh", oracle=_EXACT_TOPK_SQL)
def embedding_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH ANN: multi-table bucket join + exact re-rank
    in the probed buckets.  8 tables × 4 planes × 1-bit multi-probe —
    measured recall@10 = 1.0 vs exact cosine on this corpus at every
    fixture SF (the embeddings' true neighbors sit at cos≈0.3, where any
    single sign-LSH table's recall decays geometrically; 8 tables push
    coverage to 1).  Because the re-rank computes the same rounded cosine
    and tie-break as the exact scan, full candidate coverage makes the
    exact top-k SQL a row-for-row oracle twin; the recall floor itself is
    separately pinned by tests/test_ground_truth.py."""
    from iceberg_ruby_spark.operators.similarity import lsh_ann_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return lsh_ann_topk(emb, q, k=10, n_planes=4, n_tables=8, n_probe_bits=1)


@query(
    "embedding_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms(spark, sf_dir):
    from iceberg_ruby_spark.operators.similarity import vector_norms

    emb = load(spark, sf_dir, "embeddings")
    return vector_norms(emb, "embedding").select(
        "vec_id", F.round("l2_norm", 6).alias("l2_norm")
    )


@query(
    "embedding_centroids",
    oracle="""
    SELECT label, CAST(i AS INTEGER) AS pos,
           round(CAST(SUM(CAST(embedding[CAST(i AS INTEGER)] AS DECIMAL(20,10))) AS DOUBLE)
                 / COUNT(*), 6) AS centroid
    FROM embeddings, generate_series(1, 64) AS g(i)
    GROUP BY label, i
    """,
)
def embedding_centroids(spark, sf_dir):
    """Per-label centroids as (label, pos, mean) — posexplode + one groupBy;
    element sums accumulate exactly in decimal for engine-independence."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "val"))
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            (
                F.sum(F.col("val").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid")
        )
        .select("label", F.col("pos").cast("int").alias("pos"), F.round("centroid", 6).alias("centroid"))
    )


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


_HEXB = (
    "((strpos('0123456789abcdef', substr(sha256(text), 2*i+1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(sha256(text), 2*i+2, 1)) - 1))"
)


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS size_bytes,
           round(SUM(CAST({_HEXB} / 255.0 AS REAL)), 6) AS feature_sum
    FROM documents, generate_series(0, 15) AS g(i)
    GROUP BY doc_id, text
    """,
)
def multimodal_features(spark, sf_dir):
    """Binary media columns + metadata + mapInPandas feature extraction.
    The codec is a deterministic sha256-based stand-in (real image/audio
    libs are not installed); schema/partitioning/batching are the real
    pipeline (operators/multimodal.py).  Because the stub derives features
    from sha256(payload), DuckDB can recompute them exactly: the oracle
    parses the hex digest byte-by-byte and mirrors the float32 (REAL)
    truncation of each b/255.0 feature before the double-accumulated sum."""
    from iceberg_ruby_spark.operators.multimodal import (
        attach_media_metadata,
        extract_features,
    )

    d = load(spark, sf_dir, "documents")
    media = attach_media_metadata(
        d.select(F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("payload")),
        fmt="text/utf-8",
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        F.col("meta.size_bytes").alias("size_bytes"),
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias("feature_sum"),
    )


@query("embedding_ann_ivf", oracle=_EXACT_TOPK_SQL)
def embedding_ann_ivf(spark, sf_dir):
    """IVF ANN (operators/similarity.py): coarse-quantize into Voronoi
    cells, probe the nearest cells per query, exact re-rank inside — the
    'each query touches n_probe/n_cells of the corpus' scale path.

    The driver configuration probes ALL 32 cells: the cells partition the
    corpus, so full probe degenerates to the exact scan row-for-row
    (tests/test_ground_truth.py::test_ivf_full_probe_equals_exact), making
    the exact top-k SQL a bit-for-bit oracle twin while still exercising
    the whole IVF machinery — driver-side kmeans++ training, Arrow-batched
    cell assignment, the cell-id hash join.  The genuinely approximate
    path (n_probe < n_cells, recall@10 ≈ 0.64 on this corpus at 8/32) is
    pinned by the ground-truth recall test instead — an honest bound for a
    config no exact SQL can reproduce."""
    from iceberg_ruby_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, k=10, n_cells=32, n_probe=32)


@query("embedding_ann_ivf_incremental", oracle=_EXACT_TOPK_SQL)
def embedding_ann_ivf_incremental(spark, sf_dir):
    """Incremental IVF ingest (operators/similarity.py ivf_index /
    ivf_assign / ivf_search): train the coarse quantizer on the existing
    corpus (``vec_id % 5 != 0``), assign the NEW batch (``% 5 = 0``)
    against the FIXED centroids — no retraining, no re-assignment of
    history — and search the union.  Full probe over the partitioning
    cells degenerates to the exact scan, so the exact top-k SQL stays a
    row-for-row oracle while the whole persisted-index + append machinery
    is exercised."""
    from iceberg_ruby_spark.operators.similarity import (
        ivf_assign,
        ivf_index,
        ivf_search,
    )

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    centroids, assigned = ivf_index(corpus, n_cells=32)
    index = assigned.unionByName(ivf_assign(centroids, batch))
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_search(centroids, index, queries, k=10, n_probe=32)


@query(
    "pipeline_clean_corpus",
    bench=True,
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             {_TOKEN_COUNT_SQL} AS n_tokens,
             {_QUALITY_SQL} AS quality,
             {_FP_SQL} AS fp
      FROM documents
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM scored
      WHERE quality >= 0.5 AND n_tokens >= 10
    )
    SELECT doc_id, source, n_tokens, quality FROM ranked WHERE rn = 1
    """,
)
def pipeline_clean_corpus(spark, sf_dir):
    """The composite training-data pipeline: quality-score filter →
    near-exact dedup by fingerprint (deterministic survivor) → stats.
    One shuffle (the dedup window); scoring stays in the scan projection."""
    from pyspark.sql import Window

    from iceberg_ruby_spark.operators.text import (
        fingerprint,
        quality_score,
        token_count,
    )

    # NOTE (r14): spread_small_scan (the minhash §2.5 fix) was measured
    # here and REJECTED — interleaved A/B min-of-4 at sf0.1: 0.825 s
    # spread vs 0.784 s plain (the regex scoring is cheap enough that the
    # added exchange + stage barrier loses).
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
    ).filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10))
    w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_tokens", "quality")
    )


@query(
    "multimodal_resize_frames",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(g.i AS INTEGER) AS frame_index,
           32 AS frame_bytes
    FROM documents, generate_series(0, 6) AS g(i)
    WHERE doc_id < 200 AND g.i <= doc_id % 5 + 1
    """,
)
def multimodal_resize_frames(spark, sf_dir):
    """Media pipeline plumbing end-to-end: synthesize binary payloads from
    the documents table, tag metadata, resize, and frame-sample — the
    mapInPandas batch shapes and schemas are what's under test (codecs are
    deterministic fakes; real ones register via register_resizer).  The
    fakes are fully determined by (payload, metadata): frame count is
    duration_ms//every_ms + 1 and every fake frame is a 32-byte sha256
    digest, so DuckDB can enumerate the exact output.  The 200-doc slice
    is a doc_id predicate, not LIMIT — LIMIT picks arbitrary rows and has
    no oracle twin."""
    from iceberg_ruby_spark.operators.multimodal import (
        attach_media_metadata,
        resize_media,
        sample_frames,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    tagged = attach_media_metadata(media, "payload", fmt="bin").withColumn(
        "meta",
        F.col("meta").withField("duration_ms", (F.col("media_id") % 5 + 1) * 1000),
    )
    resized = resize_media(tagged, width=32, height=32)
    return sample_frames(resized, every_ms=1000).select(
        "media_id", "frame_index", F.length("frame").alias("frame_bytes")
    )


@query(
    "multimodal_ppm_pipeline",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             3 + doc_id % 3 AS w,
             2 + doc_id % 2 AS h
      FROM documents
    ), px AS (
      SELECT g.doc_id,
             ((y.g * g.h) // 2) * g.w + ((x.g * g.w) // 2) AS p
      FROM g, generate_series(0, 1) AS x(g), generate_series(0, 1) AS y(g)
    )
    SELECT doc_id AS media_id,
           2 AS width,
           2 AS height,
           CAST(SUM((7 * doc_id + 13 * (3 * p + 0)) % 251) AS BIGINT) AS sum_r,
           CAST(SUM((7 * doc_id + 13 * (3 * p + 1)) % 251) AS BIGINT) AS sum_g,
           CAST(SUM((7 * doc_id + 13 * (3 * p + 2)) % 251) AS BIGINT) AS sum_b
    FROM px
    GROUP BY doc_id
    """,
)
def multimodal_ppm_pipeline(spark, sf_dir):
    """REAL image codec end-to-end (r10): P6 PPM payloads are synthesized
    per document (width 3–5, height 2–3, channel bytes from a closed-form
    generator), then the REAL pure-python pipeline runs distributed —
    nearest-neighbor resize to 2x2 (resize_ppm_nearest re-encodes actual
    P6 bytes) and header+raster decode (decode_ppm) into per-channel
    sums.  Every stage manipulates real image bytes; the oracle replays
    the generator through the SAME floor mapping (dst (x,y) reads src
    (x*w//2, y*h//2)) without ever touching bytes, so a header-parse or
    resample bug breaks the hash.  Sums are exact small integers (≤ 1000)
    — no float noise."""
    import pandas as pd

    from iceberg_ruby_spark.operators.multimodal import (
        attach_media_metadata,
        decode_media_batch,
        encode_ppm,
        resize_media,
    )

    d = load(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id"))

    def _build(batches):
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                did = int(mid)
                w, h = 3 + did % 3, 2 + did % 2
                raster = bytes(
                    (7 * did + 13 * i) % 251 for i in range(3 * w * h)
                )
                payloads.append(encode_ppm(w, h, raster))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = d.mapInPandas(_build, "media_id long, payload binary")
    tagged = attach_media_metadata(media, "payload", fmt="ppm")
    resized = resize_media(tagged, width=2, height=2, resizer="ppm")
    feats = decode_media_batch(resized, decoder="ppm")
    return feats.select(
        "media_id",
        F.element_at("features", 1).cast("int").alias("width"),
        F.element_at("features", 2).cast("int").alias("height"),
        F.element_at("features", 4).cast("bigint").alias("sum_r"),
        F.element_at("features", 5).cast("bigint").alias("sum_g"),
        F.element_at("features", 6).cast("bigint").alias("sum_b"),
    )


@query(
    "multimodal_png_pipeline",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             3 + doc_id % 3 AS w,
             2 + doc_id % 2 AS h,
             3 + doc_id % 2 AS c
      FROM documents
    ), px AS (
      SELECT g.doc_id, g.c,
             ((y.g * g.h) // 2) * g.w + ((x.g * g.w) // 2) AS p
      FROM g, generate_series(0, 1) AS x(g), generate_series(0, 1) AS y(g)
    )
    SELECT doc_id AS media_id,
           2 AS width,
           2 AS height,
           CAST(MAX(c) AS INTEGER) AS channels,
           CAST(SUM((5 * doc_id + 11 * (c * p + 0)) % 249) AS BIGINT) AS sum_r,
           CAST(SUM((5 * doc_id + 11 * (c * p + 1)) % 249) AS BIGINT) AS sum_g,
           CAST(SUM((5 * doc_id + 11 * (c * p + 2)) % 249) AS BIGINT) AS sum_b,
           CAST(SUM(CASE WHEN c = 4
                         THEN (5 * doc_id + 11 * (c * p + 3)) % 249
                         ELSE 0 END) AS BIGINT) AS sum_a
    FROM px
    GROUP BY doc_id
    """,
)
def multimodal_png_pipeline(spark, sf_dir):
    """REAL COMPRESSED image codec end-to-end (r11): 8-bit PNG payloads
    are synthesized per document — width 3–5, height 2–3, RGB for even
    doc_ids / RGBA for odd, channel bytes from a closed-form generator,
    and the per-scanline filter type rotates through ALL FIVE PNG filters
    ((doc_id + y) % 5), so Sub/Up/Average/Paeth unfiltering is on the
    oracle path, not just filter-None.  The distributed pipeline then
    runs the REAL pure-python codec: zlib IDAT inflate + CRC chunk walk +
    unfilter (decode_png), nearest-neighbor resample to 2x2 re-encoded as
    actual PNG bytes (resize_png_nearest), and a second decode into
    per-channel sums.  The oracle replays the generator through the same
    floor mapping without touching bytes — a chunk-walk, inflate
    framing, or filter-reconstruction bug breaks the hash.  Sums are
    exact small integers — no float noise."""
    import pandas as pd

    from iceberg_ruby_spark.operators.multimodal import (
        attach_media_metadata,
        decode_media_batch,
        encode_png,
        resize_media,
    )

    d = load(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id"))

    def _build(batches):
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                did = int(mid)
                w, h, c = 3 + did % 3, 2 + did % 2, 3 + did % 2
                raster = bytes(
                    (5 * did + 11 * i) % 249 for i in range(c * w * h)
                )
                payloads.append(
                    encode_png(
                        w,
                        h,
                        raster,
                        channels=c,
                        filters=[(did + y) % 5 for y in range(h)],
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = d.mapInPandas(_build, "media_id long, payload binary")
    tagged = attach_media_metadata(media, "payload", fmt="png")
    resized = resize_media(tagged, width=2, height=2, resizer="png")
    feats = decode_media_batch(resized, decoder="png")
    return feats.select(
        "media_id",
        F.element_at("features", 1).cast("int").alias("width"),
        F.element_at("features", 2).cast("int").alias("height"),
        F.element_at("features", 3).cast("int").alias("channels"),
        F.element_at("features", 4).cast("bigint").alias("sum_r"),
        F.element_at("features", 5).cast("bigint").alias("sum_g"),
        F.element_at("features", 6).cast("bigint").alias("sum_b"),
        F.element_at("features", 7).cast("bigint").alias("sum_a"),
    )


@query(
    "multimodal_probe_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                WHEN 2 THEN 'ppm' WHEN 3 THEN 'wav' ELSE 'mp4'
           END AS format,
           CAST(CASE doc_id % 5
                WHEN 0 THEN 3 + doc_id % 3
                WHEN 1 THEN 8 * (1 + doc_id % 2)
                WHEN 2 THEN 2 + doc_id % 4
                WHEN 4 THEN 320 + doc_id % 7 END AS INTEGER) AS width,
           CAST(CASE doc_id % 5
                WHEN 0 THEN 2 + doc_id % 2
                WHEN 1 THEN 8
                WHEN 2 THEN 1 + doc_id % 3
                WHEN 4 THEN 240 + doc_id % 3 END AS INTEGER) AS height,
           CAST(CASE doc_id % 5
                WHEN 3 THEN ((1000 + doc_id % 7) * 1000)
                            // (8000 + (doc_id % 3) * 2000)
                WHEN 4 THEN 10000 + doc_id % 997 END AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def multimodal_probe_meta(spark, sf_dir):
    """Container-metadata backfill end-to-end (r11): a mixed corpus of
    REAL container bytes — PNG, baseline JPEG, P6 PPM, RIFF WAV, and
    metadata-only ISO-BMFF MP4 (ftyp + moov boxes, 90k timescale) — is
    probed by the header-only sniffers (magic-byte dispatch, IHDR / SOF
    marker walk / netpbm grammar / fmt+data chunk sizes / mvhd+tkhd box
    walk) into the typed meta struct.  The oracle recomputes every
    dimension and duration from the generators arithmetically — a box
    offset, fixed-point, chunk-size, or marker-walk bug breaks the hash.
    100 TB shape: probing reads HEADER bytes only, never rasters or
    samples."""
    import pandas as pd

    from iceberg_ruby_spark.operators.multimodal import (
        encode_jpeg,
        encode_mp4_meta,
        encode_png,
        encode_ppm,
        encode_wav,
        probe_media_meta,
    )

    d = load(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id"))

    def _build(batches):
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                did = int(mid)
                k = did % 5
                if k == 0:
                    w, h = 3 + did % 3, 2 + did % 2
                    p = encode_png(w, h, bytes(3 * w * h))
                elif k == 1:
                    w = 8 * (1 + did % 2)
                    p = encode_jpeg(w, 8, bytes([7] * (3 * w * 8)))
                elif k == 2:
                    w, h = 2 + did % 4, 1 + did % 3
                    p = encode_ppm(w, h, bytes(3 * w * h))
                elif k == 3:
                    rate = 8000 + (did % 3) * 2000
                    ch = 1 + did % 2
                    p = encode_wav(rate, ch, [0] * ((1000 + did % 7) * ch))
                else:
                    p = encode_mp4_meta(
                        320 + did % 7,
                        240 + did % 3,
                        10000 + did % 997,
                        timescale=90000,
                    )
                payloads.append(p)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = d.mapInPandas(_build, "media_id long, payload binary")
    probed = probe_media_meta(media)
    return probed.select(
        "media_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


@query(
    "multimodal_jpeg_pipeline",
    oracle="""
    WITH g AS (
      SELECT doc_id, 1 + doc_id % 2 AS nb FROM documents
    ), blk AS (
      SELECT g.doc_id, g.nb,
             (3 * g.doc_id + 7 * b.g) % 256 AS r,
             (5 * g.doc_id + 11 * b.g) % 256 AS gg,
             (7 * g.doc_id + 13 * b.g) % 256 AS bb
      FROM g, generate_series(0, 1) AS b(g)
      WHERE b.g < g.nb
    ), fwd AS (
      SELECT doc_id, nb,
        GREATEST(0, LEAST(255,
          FLOOR(0.299 * r + 0.587 * gg + 0.114 * bb + 0.5))) AS y,
        GREATEST(0, LEAST(255,
          FLOOR(128 - 0.168736 * r - 0.331264 * gg + 0.5 * bb + 0.5))) AS cb,
        GREATEST(0, LEAST(255,
          FLOOR(128 + 0.5 * r - 0.418688 * gg - 0.081312 * bb + 0.5))) AS cr
      FROM blk
    ), back AS (
      SELECT doc_id, nb,
        GREATEST(0, LEAST(255,
          FLOOR(y + 1.402 * (cr - 128) + 0.5))) AS r2,
        GREATEST(0, LEAST(255,
          FLOOR(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5))) AS g2,
        GREATEST(0, LEAST(255,
          FLOOR(y + 1.772 * (cb - 128) + 0.5))) AS b2
      FROM fwd
    )
    SELECT doc_id AS media_id,
           CAST(8 * nb AS INTEGER) AS width,
           8 AS height,
           CAST(SUM(64 * r2) AS BIGINT) AS sum_r,
           CAST(SUM(64 * g2) AS BIGINT) AS sum_g,
           CAST(SUM(64 * b2) AS BIGINT) AS sum_b
    FROM back GROUP BY doc_id, nb
    """,
)
def multimodal_jpeg_pipeline(spark, sf_dir):
    """REAL baseline JPEG codec end-to-end (r11): per document an 8-or-16
    × 8 image whose 8x8 blocks are each a flat closed-form color is
    encoded into actual JFIF bytes (huffman entropy coding, DC
    prediction across blocks, unit quant tables) and decoded back by the
    full baseline pipeline (marker walk → huffman → dequant → IDCT →
    YCbCr→RGB).  Flat blocks are DC-only, so with unit quant the DCT
    round-trips EXACTLY and the only value change is the JFIF integer
    color-convert double-rounding — which the DuckDB oracle replays term
    by term (FLOOR(x + 0.5), identical operation order, clamped).  A
    huffman-table, DC-prediction, dequant, IDCT-scale, or color-matrix
    bug breaks the hash.  Sums are exact integers."""
    import pandas as pd

    from iceberg_ruby_spark.operators.multimodal import (
        attach_media_metadata,
        decode_media_batch,
        encode_jpeg,
    )

    from iceberg_ruby_spark.operators._spread import spread_small_scan

    # spread the id frame before the codec mapInPandas (guide §2.5, the
    # minhash r14 fix): the documents scan is ONE byte-sized split at
    # bench scale, so the whole encode→decode codec chain otherwise runs
    # single-task (measured: ~0.6 ms/doc of codec CPU serialized on one
    # core).  The exchange ships only (media_id) rows.
    d = spread_small_scan(
        load(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id")),
        "media_id",
    )

    def _build(batches):
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                did = int(mid)
                nb = 1 + did % 2
                w, h = 8 * nb, 8
                raster = bytearray()
                for y in range(h):
                    for x in range(w):
                        bi = x // 8
                        raster += bytes(
                            (
                                (3 * did + 7 * bi) % 256,
                                (5 * did + 11 * bi) % 256,
                                (7 * did + 13 * bi) % 256,
                            )
                        )
                payloads.append(encode_jpeg(w, h, bytes(raster)))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = d.mapInPandas(_build, "media_id long, payload binary")
    tagged = attach_media_metadata(media, "payload", fmt="jpeg")
    feats = decode_media_batch(tagged, decoder="jpeg")
    return feats.select(
        "media_id",
        F.element_at("features", 1).cast("int").alias("width"),
        F.element_at("features", 2).cast("int").alias("height"),
        F.element_at("features", 4).cast("bigint").alias("sum_r"),
        F.element_at("features", 5).cast("bigint").alias("sum_g"),
        F.element_at("features", 6).cast("bigint").alias("sum_b"),
    )


@query(
    "multimodal_wav_features",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             8000 + (doc_id % 5) * 1000 AS rate,
             1 + doc_id % 2 AS ch,
             (4 + doc_id % 4) * (1 + doc_id % 2) AS n
      FROM documents
    ), e AS (
      SELECT doc_id, rate, ch, n,
             UNNEST(generate_series(0, n - 1)) AS i
      FROM g
    )
    SELECT doc_id AS media_id,
           CAST(rate AS INTEGER) AS sample_rate,
           CAST(ch AS INTEGER) AS n_channels,
           CAST(n AS INTEGER) AS n_samples,
           CAST(SUM(ABS(((11 * doc_id + 17 * i) % 401) - 200)) AS BIGINT) AS sum_abs,
           CAST(MAX(ABS(((11 * doc_id + 17 * i) % 401) - 200)) AS INTEGER) AS max_abs
    FROM e
    GROUP BY doc_id, rate, ch, n
    """,
)
def multimodal_wav_features(spark, sf_dir):
    """REAL audio codec end-to-end (r10): RIFF/PCM16 WAV payloads are
    synthesized per document (rate/channels/length and int16 samples from
    a closed-form generator), encoded into actual RIFF bytes (encode_wav),
    then the REAL pure-python chunk-walk decoder (decode_wav) runs in the
    distributed decode_media_batch and emits exact integer features.  The
    oracle replays the sample generator arithmetically — a chunk-offset or
    endianness bug in the codec breaks the hash."""
    import pandas as pd

    from iceberg_ruby_spark.operators.multimodal import (
        attach_media_metadata,
        decode_media_batch,
        encode_wav,
    )

    d = load(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id"))

    def _build(batches):
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                did = int(mid)
                rate = 8000 + (did % 5) * 1000
                ch = 1 + did % 2
                n = (4 + did % 4) * ch
                samples = [((11 * did + 17 * i) % 401) - 200 for i in range(n)]
                payloads.append(encode_wav(rate, ch, samples))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = d.mapInPandas(_build, "media_id long, payload binary")
    tagged = attach_media_metadata(media, "payload", fmt="wav")
    feats = decode_media_batch(tagged, decoder="wav")
    return feats.select(
        "media_id",
        F.element_at("features", 1).cast("int").alias("sample_rate"),
        F.element_at("features", 2).cast("int").alias("n_channels"),
        F.element_at("features", 3).cast("int").alias("n_samples"),
        F.element_at("features", 4).cast("bigint").alias("sum_abs"),
        F.element_at("features", 5).cast("int").alias("max_abs"),
    )


@query(
    "embedding_quantize_roundtrip",
    oracle="""
    SELECT vec_id,
           round(CAST(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                 x -> abs(x))) AS DOUBLE) / 127.0, 6) AS scale
    FROM embeddings
    """,
)
def embedding_quantize_roundtrip(spark, sf_dir):
    """int8 quantization scale factors (the 4x-smaller storage path for
    embedding tables); DuckDB recomputes the per-row symmetric scale."""
    from iceberg_ruby_spark.operators.similarity import quantize_int8

    emb = load(spark, sf_dir, "embeddings")
    return quantize_int8(emb).select(
        "vec_id", F.round(F.col("embedding_q8_scale").cast("double"), 6).alias("scale")
    )


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH sig AS ({_SIMHASH_SIG_SQL})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs via pigeonhole banding on signature chunks +
    one bit_count(xor) verification per candidate (operators/dedup.py).
    The banding is LOSSLESS within the Hamming budget (any pair with ≤3
    differing bits agrees exactly on ≥1 of the 4 chunks), so the DuckDB
    oracle can be the brute-force all-pairs Hamming scan over the same
    md5-derived signatures — an exact-equality check, not a recall bound."""
    from iceberg_ruby_spark.operators.dedup import simhash_pairs

    d = load(spark, sf_dir, "documents")
    return simhash_pairs(d, "text", "doc_id", max_hamming=3, hash_fn="md5")


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_SQL.replace('q.embedding', 'b.embedding').replace('c.embedding', 'a.embedding')}, 6) AS cosine
    FROM (SELECT * FROM embeddings WHERE vec_id < 100) a
    JOIN (SELECT * FROM embeddings WHERE vec_id < 100) b ON a.vec_id < b.vec_id
    WHERE round({_COS_SQL.replace('q.embedding', 'b.embedding').replace('c.embedding', 'a.embedding')}, 6) >= 0.5
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, exact over a bounded slice (the
    oracle-comparable form; n_planes>0 in operators/dedup.py is the
    LSH-bucketed scale path)."""
    from iceberg_ruby_spark.operators.dedup import embedding_cosine_pairs

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return embedding_cosine_pairs(
        emb, threshold=0.5, n_planes=0, allow_all_pairs=True
    )


@query(
    "text_chunk_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, str_split_regex(trim(text), '\\s+') AS t FROM documents
    ), w AS (
      SELECT doc_id, t,
             1 + GREATEST(CAST(CEIL((len(t) - 64) / 48.0) AS INT), 0) AS nw
      FROM toks
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           array_to_string(t[i*48+1 : i*48+64], ' ') AS chunk_text,
           CAST(len(t[i*48+1 : i*48+64]) AS BIGINT) AS chunk_tokens
    FROM w, LATERAL (SELECT unnest(generate_series(0, nw - 1)) AS i) g
    """,
)
def text_chunk_documents(spark, sf_dir):
    """Sliding-window chunking (64-token windows, 16 overlap) — map-only
    split→explode→slice, no shuffle at any corpus size."""
    from iceberg_ruby_spark.operators.text import chunk_documents

    docs = load(spark, sf_dir, "documents")
    out = chunk_documents(docs, chunk_size=64, overlap=16)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "chunk_text",
        F.col("chunk_tokens").cast("bigint").alias("chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# round 5: training-data pipeline additions
# ---------------------------------------------------------------------------

_SAMPLE_U_SQL = (
    "CAST(concat('0x', substr(md5(concat('42:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)"
    " / 1152921504606846976.0"
)


@query(
    "text_stratified_sample",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE {_SAMPLE_U_SQL} < CASE source WHEN 'src0' THEN 0.25
                                        WHEN 'src1' THEN 0.5 ELSE 1.0 END
    """,
)
def text_stratified_sample(spark, sf_dir):
    """Deterministic hash-based stratified downsampling (25% of src0, 50%
    of src1, everything else kept) — the training-mixer primitive.  The
    draw is a pure function of (seed, doc_id): same survivors on any
    partitioning or cluster size, and DuckDB reproduces it exactly.
    Map-only — zero shuffles at any corpus size."""
    from iceberg_ruby_spark.operators.text import stratified_sample

    d = load(spark, sf_dir, "documents")
    out = stratified_sample(d, "source", {"src0": 0.25, "src1": 0.5}, seed=42)
    return out.select("doc_id", "source")


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKEN_COUNT_SQL} AS n_tokens FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS pack_offset
      FROM t
    )
    SELECT doc_id, lang, n_tokens, pack_offset,
           CAST(FLOOR(pack_offset / 256.0) AS BIGINT) AS pack_id
    FROM c
    """,
)
def text_pack_sequences(spark, sf_dir):
    """Offset-packing of documents into 256-token training sequences,
    keyed per language shard (one window prefix-sum per shard — the
    per-group window is what keeps this parallel at 100 TB; a global
    window would be a single-task sort)."""
    from iceberg_ruby_spark.operators.text import pack_sequences
    from pyspark.sql import functions as F

    d = load(spark, sf_dir, "documents")
    out = pack_sequences(d, budget=256, partition_col="lang")
    return out.select(
        "doc_id", "lang", "n_tokens",
        F.col("pack_offset").cast("bigint").alias("pack_offset"),
        "pack_id",
    )


# deterministic synthetic PII planted on a doc_id residue — the fixture
# corpus has none, and both engines must build IDENTICAL input text for
# the scrub to be hash-comparable
_PII_AUG_SQL = """
    CASE WHEN doc_id % 5 = 0
           THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.org'
         WHEN doc_id % 5 = 1
           THEN text || ' call +1 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE text END
"""
_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_SQL = "\\+?[0-9][0-9()\\-\\s]{7,}[0-9]"


@query(
    "text_scrub_pii",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_SQL}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_SQL}')) AS INTEGER) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_SQL}', '<EMAIL>', 'g'),
                              '{_PHONE_SQL}', '<PHONE>', 'g')) AS scrub_fp
    FROM aug
    """,
)
def text_scrub_pii(spark, sf_dir):
    """Email/phone redaction with audit counts (operators/text.py
    scrub_pii) over deterministically planted PII; the output carries an
    md5 of the scrubbed text so the whole redaction is hash-verified
    cross-engine.  Map-only regexp work, no shuffle."""
    from pyspark.sql import functions as F

    from iceberg_ruby_spark.operators.text import scrub_pii

    d = load(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" reach me at user"),
                     F.col("doc_id").cast("string"), F.lit("@example.org")),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.col("text"), F.lit(" call +1 555-010-"),
                     F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = scrub_pii(aug)
    return out.select(
        "doc_id", "n_emails", "n_phones", F.md5(F.col("text")).alias("scrub_fp")
    )


@query(
    "events_sessionize",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id, ts,
             epoch(ts) - epoch(lag(ts) OVER w) AS gap_s,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
                  ELSE 0 END AS is_session_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, is_session_start,
           CAST(SUM(is_session_start) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_seq
    FROM g
    """,
)
def events_sessionize(spark, sf_dir):
    """Batch gap-based sessionization (30-min gap): ONE hash-partitioned
    window per user carries both the lag and the running session count —
    Catalyst plans a single exchange + sort (operators/sessions.py).  The
    batch twin of stream_session_window."""
    from pyspark.sql import functions as F

    from iceberg_ruby_spark.operators.sessions import sessionize

    e = load(spark, sf_dir, "events")
    out = sessionize(e, gap_minutes=30, tie_col="event_id")
    return out.select(
        "event_id", "user_id", "is_session_start",
        F.col("session_seq").cast("bigint").alias("session_seq"),
    )


@query(
    "dedup_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 12, 1)),
               i -> array_to_string(t[i:i+12], ' ')))) AS g
      FROM toks
    ), b AS (SELECT DISTINCT g FROM grams WHERE doc_id % 29 = 0)
    SELECT doc_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_contaminated_grams
    FROM grams JOIN b USING (g)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def dedup_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/dedup.py ``decontaminate``):
    corpus documents sharing any word 13-gram (the GPT-3 rule) with a
    benchmark subset, with per-doc matched-gram counts.  The benchmark's
    distinct grams broadcast; the corpus is never shuffled.  The DuckDB
    twin re-derives the same normalization, 13-gram windows, and overlap
    counts term-for-term."""
    from iceberg_ruby_spark.operators.dedup import decontaminate

    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 29 == 0)
    out = decontaminate(d, bench, ngram=13, keep_contaminated=True)
    return (
        out.filter(F.col("contaminated"))
        .select("doc_id", "n_contaminated_grams")
        .orderBy("doc_id")
    )


@query(
    "text_repetition_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS t,
             string_split(text, chr(10)) AS lines
      FROM documents
    )
    SELECT doc_id,
      CAST(1.0 - len(list_distinct(t)) / len(t) AS DOUBLE) AS dup_1gram_frac,
      CAST(1.0 - len(list_distinct(list_transform(
            generate_series(1, greatest(len(t) - 1, 1)),
            i -> array_to_string(t[i:i+1], ' '))))
          / greatest(len(t) - 1, 1) AS DOUBLE) AS dup_2gram_frac,
      CAST(1.0 - len(list_distinct(list_transform(
            generate_series(1, greatest(len(t) - 2, 1)),
            i -> array_to_string(t[i:i+2], ' '))))
          / greatest(len(t) - 2, 1) AS DOUBLE) AS dup_3gram_frac,
      CAST(1.0 - len(list_distinct(lines)) / len(lines) AS DOUBLE)
          AS dup_line_frac
    FROM toks
    ORDER BY doc_id
    """,
)
def text_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signals (operators/text.py
    ``repetition_stats``): per-document duplicate word-{1,2,3}-gram and
    duplicate-line fractions, computed as pure Column expressions over
    in-row arrays — map-only, zero shuffles at any corpus size.  The
    DuckDB twin recomputes every fraction with the same tokenization and
    window arithmetic."""
    from iceberg_ruby_spark.operators.text import repetition_stats

    d = load(spark, sf_dir, "documents")
    return repetition_stats(d).select(
        "doc_id", "dup_1gram_frac", "dup_2gram_frac", "dup_3gram_frac",
        "dup_line_frac",
    ).orderBy("doc_id")


@query(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE mh AS (
      {_minhash_oracle()}
    ), nodes AS (
      SELECT DISTINCT id_a AS n FROM mh
      UNION
      SELECT DISTINCT id_b FROM mh
    ), edges AS (
      SELECT id_a AS s, id_b AS d FROM mh
      UNION
      SELECT id_b, id_a FROM mh
    ), reach(src, node) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
    )
    SELECT src AS doc_id, MIN(node) AS cluster_id
    FROM reach GROUP BY src ORDER BY doc_id
    """,
)
def dedup_cluster_components(spark, sf_dir):
    """The dedup pipeline's final step: transitive closure over the
    MinHash near-dup pairs (operators/dedup.py ``connected_components``,
    min-label propagation — O(diameter) rounds of one output-sized join
    each), assigning every near-dup family one canonical cluster id.  The
    DuckDB twin re-derives the SAME pairs (the bit-for-bit md5 MinHash
    oracle) and computes exact components with a recursive CTE — the
    iterative Spark algorithm is held to a closed-form ground truth."""
    from iceberg_ruby_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    d = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "text", "doc_id", num_hashes=64, bands=16, shingle_size=5,
        threshold=0.5, hash_fn="md5",
    )
    return connected_components(pairs).orderBy("doc_id")


@query(
    "dedup_apply_canonical",
    oracle=f"""
    WITH RECURSIVE mh AS (
      {_minhash_oracle()}
    ), nodes AS (
      SELECT DISTINCT id_a AS n FROM mh
      UNION
      SELECT DISTINCT id_b FROM mh
    ), edges AS (
      SELECT id_a AS s, id_b AS d FROM mh
      UNION
      SELECT id_b, id_a FROM mh
    ), reach(src, node) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
    ), comp AS (
      SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY src
    ), ranked AS (
      SELECT c.doc_id,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
      FROM comp c JOIN documents d USING (doc_id)
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
    """,
)
def dedup_apply_canonical(spark, sf_dir):
    """The dedup APPLY step (operators/dedup.py ``apply_dedup``): corpus
    minus all non-canonical members of each near-dup family (canonical =
    longest doc, ties to smallest id).  The DuckDB twin re-derives the
    bit-for-bit md5 pairs, exact recursive-CTE components, the same
    window choice, and the same anti-join — full-pipeline hash
    equality."""
    from iceberg_ruby_spark.operators.dedup import apply_dedup, minhash_lsh_pairs

    d = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "text", "doc_id", num_hashes=64, bands=16, shingle_size=5,
        threshold=0.5, hash_fn="md5",
    )
    return apply_dedup(d, pairs, "doc_id", quality_col="n_chars").select(
        "doc_id", "source", "n_chars"
    )


@query(
    "dedup_split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE mh AS (
      {_minhash_oracle()}
    ), nodes AS (
      SELECT DISTINCT id_a AS n FROM mh
      UNION
      SELECT DISTINCT id_b FROM mh
    ), edges AS (
      SELECT id_a AS s, id_b AS d FROM mh
      UNION
      SELECT id_b, id_a FROM mh
    ), reach(src, node) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
    ), comp AS (
      SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY src
    )
    SELECT d.doc_id,
           COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           CASE WHEN CAST(concat('0x', substr(md5(concat('42:',
                      CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR))), 1, 15))
                      AS BIGINT) / 1152921504606846976.0 < 0.1
                THEN 'valid' ELSE 'train' END AS split
    FROM documents d LEFT JOIN comp c USING (doc_id)
    """,
)
def dedup_split_leakage_safe(spark, sf_dir):
    """Leakage-safe train/valid split (operators/dedup.py
    ``leakage_safe_split``): the split key is the near-dup CLUSTER id, so
    eval docs can never have training-set twins.  The DuckDB twin
    re-derives pairs → exact components → the identical md5 uniform draw
    per cluster."""
    from iceberg_ruby_spark.operators.dedup import (
        leakage_safe_split,
        minhash_lsh_pairs,
    )

    d = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "text", "doc_id", num_hashes=64, bands=16, shingle_size=5,
        threshold=0.5, hash_fn="md5",
    )
    return leakage_safe_split(d, pairs, "doc_id", valid_frac=0.1, seed=42).select(
        "doc_id", "cluster_id", "split"
    )


@query(
    "text_domain_cap",
    oracle="""
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
)
def text_domain_cap(spark, sf_dir):
    """Per-domain cap (operators/text.py ``domain_cap``): top-10 docs per
    source by length, deterministic tie-break — planned as
    WindowGroupLimit (map-side partial top-k per domain before the
    exchange), so a mega-domain can't flood one reducer."""
    from iceberg_ruby_spark.operators.text import domain_cap

    d = load(spark, sf_dir, "documents")
    return domain_cap(d, "source", "doc_id", quality_col="n_chars", cap=10).select(
        "doc_id", "source", "n_chars"
    )


@query(
    "text_mix_corpus",
    oracle=f"""
    WITH tot AS (
      SELECT source, SUM({_TOKEN_COUNT_SQL}) AS t FROM documents GROUP BY source
    ), rates AS (
      SELECT source,
             CASE WHEN source = 'src0' THEN LEAST(1.0, 5000.0 / t)
                  WHEN source = 'src1' THEN LEAST(1.0, 8000.0 / t)
                  ELSE 1.0 END AS r
      FROM tot
    )
    SELECT d.doc_id, d.source, CAST(r.r AS DOUBLE) AS mix_rate
    FROM documents d JOIN rates r USING (source)
    WHERE {_SAMPLE_U_SQL} < r.r
    ORDER BY d.doc_id
    """,
)
def text_mix_corpus(spark, sf_dir):
    """Token-budget corpus mixing (operators/text.py ``mix_corpus``):
    per-source token targets (5k tokens of src0, 8k of src1, everything
    else whole) become sampling rates from ONE tiny aggregation, applied
    by the deterministic md5 stratified filter — map-only after the agg,
    survivors identical on any partitioning.  The DuckDB twin recomputes
    totals, rates, and the md5 draw bit-for-bit."""
    from iceberg_ruby_spark.operators.text import mix_corpus

    d = load(spark, sf_dir, "documents")
    out = mix_corpus(d, {"src0": 5000, "src1": 8000})
    return out.select("doc_id", "source", "mix_rate").orderBy("doc_id")


@query(
    "dedup_shared_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 19, 1)),
               i -> array_to_string(t[i:i+19], ' ')))) AS g
      FROM toks
    ), shared AS (
      SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    ), per_doc AS (
      SELECT doc_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_shared_grams
      FROM grams WHERE g IN (SELECT g FROM shared) GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_grams
      FROM grams GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(t.n_grams, 0) AS n_grams,
           COALESCE(p.n_shared_grams, 0) AS n_shared_grams,
           CAST(CASE WHEN COALESCE(t.n_grams, 0) > 0
                THEN COALESCE(p.n_shared_grams, 0) / t.n_grams
                ELSE 0.0 END AS DOUBLE) AS shared_frac
    FROM documents d
    LEFT JOIN totals t USING (doc_id)
    LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def dedup_shared_spans(spark, sf_dir):
    """Cross-document shared-span statistics (operators/dedup.py
    ``shared_span_stats``): per-doc count and fraction of word 20-grams
    appearing in ≥2 documents — the C4/RefinedWeb boilerplate signal.
    ONE count-by-gram shuffle, never all-pairs.  The DuckDB twin
    re-derives the same tokenization, windows, and span counts."""
    from iceberg_ruby_spark.operators.dedup import shared_span_stats

    d = load(spark, sf_dir, "documents")
    return shared_span_stats(d, ngram=20, min_docs=2).select(
        "doc_id", "n_grams", "n_shared_grams", "shared_frac"
    ).orderBy("doc_id")


@query(
    "dedup_line_corpus",
    bench=True,
    oracle="""
    WITH l AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
    ), lines AS (
      SELECT doc_id,
             unnest(generate_series(1, len(ls))) AS pos,
             unnest(ls) AS line
      FROM l
    ), dup AS (
      SELECT trim(line) AS k FROM lines WHERE trim(line) <> ''
      GROUP BY 1 HAVING COUNT(*) >= 2
    ), kept AS (
      SELECT li.doc_id, li.pos, li.line,
             (trim(li.line) = '' OR d.k IS NULL) AS keep
      FROM lines li LEFT JOIN dup d ON trim(li.line) = d.k
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10)
                               ORDER BY pos), '') AS text,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
               AS n_removed_lines
    FROM kept GROUP BY doc_id ORDER BY doc_id
    """,
)
def dedup_line_corpus(spark, sf_dir):
    """Corpus-wide exact line dedup (operators/dedup.py ``line_dedup``):
    every line whose trimmed form repeats across the corpus is removed
    from every document — the RefinedWeb/C4 boilerplate scrub that
    per-document dedup can't see.  ONE count-by-line shuffle plus a
    line-keyed join; never all-pairs.  The DuckDB twin re-splits,
    re-counts, and re-assembles every document in original line order."""
    from iceberg_ruby_spark.operators.dedup import line_dedup

    d = load(spark, sf_dir, "documents")
    return line_dedup(d, min_count=2).select(
        "doc_id", "text", "n_removed_lines"
    ).orderBy("doc_id")


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term <> '' GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
      FROM scored
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(tfidf AS DOUBLE) AS tfidf, CAST(rk AS INT) AS rank
    FROM ranked WHERE rk <= 5 ORDER BY doc_id, rank
    """,
)
def text_tfidf_top_terms(spark, sf_dir):
    """Per-document top-5 TF-IDF keywords (operators/text.py
    ``tfidf_top_terms``, sklearn smooth-idf formula): one (doc, term)
    aggregate, one term-keyed df aggregate, a broadcast scalar N, and a
    WindowGroupLimit per-doc top-k — map-side partial top-k, no global
    window.  The DuckDB twin re-tokenizes and re-scores term for term."""
    from iceberg_ruby_spark.operators.text import tfidf_top_terms

    d = load(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=5).orderBy("doc_id", "rank")


def _semantic_dedup_production(spark, sf_dir):
    """The PRODUCTION SemDeDup path bench.py times: celled (n_cells=16)
    within-cell pair mining against trained centroids with the paper's
    far-from-centroid survivor policy — the 100 TB shape, where the
    quadratic term is bounded per cell.  The registered query below stays
    the exact single-cell oracle form."""
    from iceberg_ruby_spark.operators.dedup import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, id_col="vec_id", threshold=0.45, n_cells=16,
        keep="far_from_centroid",
    ).select("vec_id", "label")


@query(
    "dedup_semantic",
    bench=True,
    bench_fn=_semantic_dedup_production,
    oracle="""
    WITH RECURSIVE p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 6)
            >= 0.45
    ), nodes AS (
      SELECT DISTINCT id_a AS n FROM p
      UNION
      SELECT DISTINCT id_b FROM p
    ), edges AS (
      SELECT id_a AS s, id_b AS d FROM p
      UNION
      SELECT id_b, id_a FROM p
    ), reach(src, node) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
    ), comp AS (
      SELECT src AS id, MIN(node) AS cluster_id FROM reach GROUP BY src
    ), losers AS (
      SELECT id FROM comp WHERE id <> cluster_id
    )
    SELECT e.vec_id, e.label
    FROM embeddings e LEFT JOIN losers l ON e.vec_id = l.id
    WHERE l.id IS NULL ORDER BY e.vec_id
    """,
)
def dedup_semantic(spark, sf_dir):
    """SemDeDup (operators/dedup.py ``semantic_dedup``): semantic
    near-dup families — transitive closure over within-cell cosine pairs
    — reduced to one surviving document each.  Run here on the exact
    single-cell path (``n_cells=1``) so the DuckDB twin can recompute it
    in closed form: all-pairs cosine ≥ 0.45 → recursive-CTE connected
    components → drop every non-minimum member.  The celled scale path
    (within-cell joins against trained centroids) is pinned by pytest
    subset/equality properties against this exact path."""
    from iceberg_ruby_spark.operators.dedup import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    return (
        semantic_dedup(
            emb, id_col="vec_id", threshold=0.45, n_cells=1,
            allow_single_cell=True,
        )
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


@query(
    "dedup_remove_spans",
    bench=True,
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'),
                         x -> x <> '') AS a
      FROM documents
    ), g AS (
      SELECT doc_id, i AS pos, array_to_string(a[i+1:i+20], ' ') AS gram
      FROM t, UNNEST(range(len(a) - 19)) AS r(i)
      WHERE len(a) >= 20
    ), ranked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY gram) AS n,
             row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk
      FROM g
    ), hit AS (
      SELECT doc_id, pos FROM ranked WHERE n >= 2 AND rk > 1
    ), covered AS (
      SELECT DISTINCT doc_id, pos + j AS cpos
      FROM hit, UNNEST(range(20)) AS u(j)
    ), nrem AS (
      SELECT doc_id, count(*) AS n_removed FROM covered GROUP BY 1
    ), toks AS (
      SELECT t.doc_id, i AS pos, a[i+1] AS tok
      FROM t JOIN nrem ON nrem.doc_id = t.doc_id, UNNEST(range(len(a))) AS r(i)
    ), kept AS (
      SELECT k.doc_id, k.pos, k.tok
      FROM toks k LEFT JOIN covered c
        ON c.doc_id = k.doc_id AND c.cpos = k.pos
      WHERE c.doc_id IS NULL
    ), re AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS new_text
      FROM kept GROUP BY 1
    )
    SELECT d.doc_id,
           CASE WHEN nrem.n_removed > 0 THEN coalesce(re.new_text, '')
                ELSE d.text END AS text,
           CAST(coalesce(nrem.n_removed, 0) AS BIGINT) AS n_removed_tokens
    FROM documents d
    LEFT JOIN nrem ON nrem.doc_id = d.doc_id
    LEFT JOIN re ON re.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def dedup_remove_spans(spark, sf_dir):
    """ExactSubstr duplicated-span removal (operators/dedup.py
    ``remove_shared_spans``, Lee et al. 2021): token positions covered by
    a corpus-duplicated word 20-gram are cut (first occurrence exempt —
    one copy survives) and documents re-assembled.  One
    count-by-gram-hash shuffle + output-sized coverage explode; the
    DuckDB twin re-derives windows, first-occurrence ranks, coverage,
    and reassembly token for token."""
    from iceberg_ruby_spark.operators.dedup import remove_shared_spans

    d = load(spark, sf_dir, "documents")
    return (
        remove_shared_spans(d, ngram=20, keep_first=True)
        .select("doc_id", "text", "n_removed_tokens")
        .orderBy("doc_id")
    )


@query(
    "embedding_truncate_norm",
    oracle="""
    WITH b AS (
      SELECT vec_id, (CAST(embedding AS DOUBLE[]))[1:8] AS p FROM embeddings
    ), n AS (
      SELECT vec_id, p, sqrt(list_sum(list_transform(p, x -> x*x))) AS nrm
      FROM b
    )
    SELECT vec_id,
           CAST(i - 1 AS INTEGER) AS pos,
           round(CASE WHEN nrm > 0 THEN p[i] / nrm ELSE p[i] END, 6) AS val
    FROM n, UNNEST(generate_series(1, len(p))) AS g(i)
    """,
)
def embedding_truncate_norm(spark, sf_dir):
    """Matryoshka prefix truncation (operators/similarity.py
    ``truncate_embeddings``): first-8-dims slice + L2 renormalization,
    map-only JVM arithmetic.  Emitted exploded as (vec_id, pos, val) so
    the hash compare is over scalars; both engines widen float→double
    then run the identical IEEE sqrt/divide, so round-6 values match
    bit-for-bit."""
    from iceberg_ruby_spark.operators.similarity import truncate_embeddings

    emb = load(spark, sf_dir, "embeddings")
    t = truncate_embeddings(emb, 8)
    return t.select(
        "vec_id",
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: F.round(x, 6))
        ).alias("pos", "val"),
    )


def _matryoshka_topk_production(spark, sf_dir):
    """The PRODUCTION adaptive-retrieval path bench-style callers use:
    lossy shortlist (prefix_dim=8, shortlist=50) + exact full-dim
    re-rank; recall pinned in pytest."""
    from iceberg_ruby_spark.operators.similarity import matryoshka_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return matryoshka_topk(emb, q, k=10, prefix_dim=8, shortlist=50)


@query(
    "embedding_matryoshka_topk",
    bench_fn=_matryoshka_topk_production,
    oracle=_EXACT_TOPK_SQL,
)
def embedding_matryoshka_topk(spark, sf_dir):
    """Adaptive retrieval / matryoshka coarse-to-fine ANN
    (operators/similarity.py ``matryoshka_topk``, Kusupati et al. 2022):
    rank by truncated-prefix dot products, exact-cosine re-rank of the
    shortlist.  Run here with ``shortlist`` ≥ corpus so the re-rank
    provably covers the exact top-k — the oracle is the exact-cosine SQL
    row for row; the lossy-regime recall floor is pinned separately in
    pytest."""
    from iceberg_ruby_spark.operators.similarity import matryoshka_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return matryoshka_topk(emb, q, k=10, prefix_dim=8, shortlist=100_000)


@query(
    "embedding_binarize_pack",
    oracle="""
    SELECT vec_id,
           CAST((i - 1) // 32 AS INTEGER) AS pack,
           -- CAST: bare SUM over BIGINT is HUGEINT in DuckDB, which crosses
           -- Arrow as decimal128(38,0) and hash-diverges from Spark's BIGINT
           -- on the driver (CORRECTNESS_r08's only red row) even though every
           -- value is identical.  Keep every oracle's Arrow schema
           -- decimal-free unless the Spark side is decimal too.
           CAST(SUM(CASE WHEN embedding[i] > 0
                    THEN (1::BIGINT << ((i - 1) % 32)) ELSE 0 END) AS BIGINT)
               AS packed
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
    GROUP BY vec_id, (i - 1) // 32
    """,
)
def embedding_binarize_pack(spark, sf_dir):
    """1-bit sign quantization packed 32 dims per BIGINT
    (operators/similarity.py ``binarize_embeddings``) — the 32×-smaller
    representation binary ANN scans at 100 TB.  Emitted unpivoted as
    (vec_id, pack, packed) so the hash compare covers every packed word;
    the packing is pure integer shift/CASE arithmetic, bit-identical
    across engines."""
    from iceberg_ruby_spark.operators.similarity import binarize_embeddings

    emb = load(spark, sf_dir, "embeddings")
    b = binarize_embeddings(emb, 64)
    return b.select(
        "vec_id",
        F.expr(
            "stack(2, 0, __bp0, 1, __bp1) AS (pack, packed)"
        ),
    )


def _hamming_topk_production(spark, sf_dir):
    """The PRODUCTION binary-ANN path bench-style callers use: lossy
    Hamming shortlist (shortlist=50) + exact cosine re-rank; recall
    pinned in pytest."""
    from iceberg_ruby_spark.operators.similarity import hamming_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return hamming_topk(emb, q, k=10, dim=64, shortlist=50)


@query(
    "embedding_hamming_topk",
    bench=True,
    bench_fn=_hamming_topk_production,
    oracle=_EXACT_TOPK_SQL,
)
def embedding_hamming_topk(spark, sf_dir):
    """Binary ANN (operators/similarity.py ``hamming_topk``, the faiss
    IndexBinaryFlat shape): sign-bit Hamming coarse ranking + exact
    cosine re-rank.  Run here with ``shortlist`` ≥ corpus so the re-rank
    provably covers the exact top-k — the oracle is the exact-cosine SQL
    row for row; the lossy-regime recall floor is pinned separately in
    pytest."""
    from iceberg_ruby_spark.operators.similarity import hamming_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return hamming_topk(emb, q, k=10, dim=64, shortlist=100_000)


def _pq_topk_production(spark, sf_dir):
    """The PRODUCTION PQ path bench.py times: the LOSSY quantization
    regime (n_codes=256 < corpus size — 32× read shrink vs raw float32
    vectors, the 100 TB lever) with exact re-rank of a 4× candidate pool.
    The registered query below stays the exact-regime oracle form
    (n_codes ≥ corpus ⇒ ADC ordering equals exact cosine ordering);
    lossy-regime recall is pinned separately in pytest."""
    from iceberg_ruby_spark.operators.similarity import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return pq_topk(emb, q, k=10, m=8, n_codes=256, refine=4)


@query(
    "embedding_ann_pq",
    bench=True,
    bench_fn=_pq_topk_production,
    oracle=_EXACT_TOPK_SQL,
)
def embedding_ann_pq(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.py ``pq_topk``,
    Jégou et al. 2011): m=8 sub-codebooks, ADC lookup-table scoring,
    exact re-rank of the candidate pool.  Run here in the EXACT
    quantization regime — ``n_codes=512`` ≥ corpus size means kmeans++
    places every distinct subvector as its own centroid, reconstruction
    is lossless, and ADC ordering equals exact cosine ordering — so the
    exact top-k SQL is a row-for-row twin (the lossy-regime recall floor
    is pinned separately in pytest)."""
    from iceberg_ruby_spark.operators.similarity import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return pq_topk(emb, q, k=10, m=8, n_codes=512, refine=4)


_URL_BUILD_SQL = """
      CASE CAST(doc_id % 4 AS INTEGER)
        WHEN 0 THEN 'HTTP://' || upper(source) || '.COM:80/Page/' ||
                    CAST(doc_id // 4 AS VARCHAR) ||
                    '/?utm_source=x&b=2&a=1#frag'
        WHEN 1 THEN 'http://' || lower(source) || '.com/Page/' ||
                    CAST(doc_id // 4 AS VARCHAR) || '?a=1&b=2'
        WHEN 2 THEN 'HTTPS://' || upper(source) || '.COM:443/img/' ||
                    CAST(doc_id // 4 AS VARCHAR) || '?gclid=zz#x'
        ELSE 'https://' || lower(source) || '.com/img/' ||
             CAST(doc_id // 4 AS VARCHAR)
      END
"""


@query(
    "text_url_canonicalize_dedup",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_URL_BUILD_SQL} AS u FROM documents),
    parts AS (
      SELECT doc_id, u,
        lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host0,
        regexp_replace(
          regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
          '/+$', ''
        ) AS path,
        regexp_extract(u, '\\?([^#]*)', 1) AS q
      FROM w
    ),
    canon AS (
      SELECT doc_id,
        scheme || '://' ||
        CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
             WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
             ELSE host0 END ||
        path ||
        CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
      FROM parts,
      LATERAL (
        SELECT array_to_string(
          list_sort(
            list_filter(
              string_split(q, '&'),
              x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid)=')
            )
          ), '&'
        ) AS qs
      )
    )
    SELECT canonical_url, MIN(doc_id) AS doc_id
    FROM canon GROUP BY canonical_url
    """,
)
def text_url_canonicalize_dedup(spark, sf_dir):
    """Crawl-record URL dedup (operators/text.py ``canonicalize_url`` /
    ``dedup_by_url``): four deterministic URL spellings per page — case
    games, default ports, tracking params, param order, fragments,
    trailing slashes — collapse to one canonical survivor (min doc_id).
    The DuckDB twin rebuilds the same URLs and runs the identical
    RE2-compatible canonicalization, so the whole normalization is
    hash-checked.  Canonicalization is map-only JVM regexp/array work;
    the dedup is ONE hash shuffle on the canonical key."""
    from iceberg_ruby_spark.operators.text import dedup_by_url

    d = load(spark, sf_dir, "documents")
    k = F.floor(F.col("doc_id") / 4).cast("string")
    variant = (F.col("doc_id") % 4).cast("int")
    url = (
        F.when(
            variant == 0,
            F.concat(
                F.lit("HTTP://"), F.upper("source"), F.lit(".COM:80/Page/"),
                k, F.lit("/?utm_source=x&b=2&a=1#frag"),
            ),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("http://"), F.lower("source"), F.lit(".com/Page/"),
                k, F.lit("?a=1&b=2"),
            ),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("HTTPS://"), F.upper("source"), F.lit(".COM:443/img/"),
                k, F.lit("?gclid=zz#x"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), F.lower("source"), F.lit(".com/img/"), k
            )
        )
    )
    with_url = d.select("doc_id", url.alias("u"))
    out = dedup_by_url(with_url, "u", "doc_id")
    return out.select("canonical_url", "doc_id")


@query(
    "text_strip_html",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             '<html><head><style>.x{color:red}</style></head><body>' ||
             '<!-- nav --><h1>Doc</h1><p>' || coalesce(text, '') ||
             '</p><script type=text/js>var x = 1;</script>' ||
             '<ul><li>one &amp; two</li></ul></body></html>' AS c
      FROM documents
    ),
    s1 AS (SELECT doc_id, regexp_replace(c, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS c FROM w),
    s2 AS (SELECT doc_id, regexp_replace(c, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS c FROM s1),
    s3 AS (SELECT doc_id, regexp_replace(c, '(?s)<!--.*?-->', ' ', 'g') AS c FROM s2),
    s4 AS (SELECT doc_id, regexp_replace(c, '(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr)[^>]*>', chr(10), 'g') AS c FROM s3),
    s5 AS (SELECT doc_id, regexp_replace(c, '<[^>]+>', ' ', 'g') AS c FROM s4),
    s6 AS (
      SELECT doc_id,
             replace(replace(replace(replace(replace(replace(replace(c,
               '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
               '&quot;', '"'), '&#39;', ''''), '&apos;', '''') AS c
      FROM s5
    ),
    s7 AS (SELECT doc_id, regexp_replace(c, '[ \\t]+', ' ', 'g') AS c FROM s6),
    s8 AS (SELECT doc_id, regexp_replace(c, ' ?\\n ?', chr(10), 'g') AS c FROM s7),
    s9 AS (SELECT doc_id, regexp_replace(c, '\\n{3,}', chr(10) || chr(10), 'g') AS c FROM s8)
    SELECT doc_id, regexp_replace(c, '^\\s+|\\s+$', '', 'g') AS text
    FROM s9 ORDER BY doc_id
    """,
)
def text_strip_html(spark, sf_dir):
    """HTML → text extraction (operators/text.py ``strip_html``): each
    document is wrapped in a deterministic HTML page (script/style/
    comment blocks, entities, list markup) and stripped back — the DuckDB
    twin wraps identically and runs the IDENTICAL RE2-compatible rule
    chain, so the whole extraction is hash-checked character for
    character.  Map-only, zero shuffles, whole-stage codegen."""
    from iceberg_ruby_spark.operators.text import strip_html

    d = load(spark, sf_dir, "documents")
    wrapped = F.concat(
        F.lit("<html><head><style>.x{color:red}</style></head><body>"),
        F.lit("<!-- nav --><h1>Doc</h1><p>"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit("</p><script type=text/js>var x = 1;</script>"),
        F.lit("<ul><li>one &amp; two</li></ul></body></html>"),
    )
    return d.select(
        "doc_id", strip_html(wrapped).alias("text")
    ).orderBy("doc_id")


@query(
    "dedup_decontaminate_spans",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'),
                         x -> x <> '') AS a
      FROM documents
    ), bt AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS a
      FROM documents WHERE doc_id < 10
    ), b AS (
      SELECT DISTINCT array_to_string(a[i:i+12], ' ') AS g
      FROM bt, UNNEST(range(1, greatest(len(a) - 12, 1) + 1)) AS r(i)
    ), g AS (
      SELECT doc_id, i AS pos, lower(array_to_string(a[i+1:i+13], ' ')) AS g
      FROM t, UNNEST(range(len(a) - 12)) AS r(i)
      WHERE len(a) >= 13
    ), hit AS (
      SELECT g.doc_id, g.pos FROM g JOIN b USING (g)
    ), covered AS (
      SELECT DISTINCT doc_id, pos + j AS cpos
      FROM hit, UNNEST(range(13)) AS u(j)
    ), nrem AS (
      SELECT doc_id, count(*) AS n_removed FROM covered GROUP BY 1
    ), toks AS (
      SELECT t.doc_id, i AS pos, a[i+1] AS tok
      FROM t JOIN nrem ON nrem.doc_id = t.doc_id, UNNEST(range(len(a))) AS r(i)
    ), kept AS (
      SELECT k.doc_id, k.pos, k.tok
      FROM toks k LEFT JOIN covered c
        ON c.doc_id = k.doc_id AND c.cpos = k.pos
      WHERE c.doc_id IS NULL
    ), re AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS new_text
      FROM kept GROUP BY 1
    )
    SELECT d.doc_id,
           CASE WHEN nrem.n_removed > 0 THEN coalesce(re.new_text, '')
                ELSE d.text END AS text,
           CAST(coalesce(nrem.n_removed, 0) AS BIGINT) AS n_removed_tokens
    FROM documents d
    LEFT JOIN nrem ON nrem.doc_id = d.doc_id
    LEFT JOIN re ON re.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def dedup_decontaminate_spans(spark, sf_dir):
    """Span-level decontamination (operators/dedup.py
    ``decontaminate_spans``): token spans overlapping a benchmark
    13-gram (here: the first 10 documents stand in as the eval set) are
    cut and documents re-assembled — the surgical variant of the GPT-3
    13-gram rule.  Benchmark grams broadcast; the corpus is never
    shuffled to find contamination.  The DuckDB twin re-derives bench
    grams, positional matches, coverage, and reassembly."""
    from iceberg_ruby_spark.operators.dedup import decontaminate_spans

    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 10)
    return (
        decontaminate_spans(d, bench, ngram=13)
        .select("doc_id", "text", "n_removed_tokens")
        .orderBy("doc_id")
    )


@query("embedding_ann_ivf_table", oracle=_EXACT_TOPK_SQL)
def embedding_ann_ivf_table(spark, sf_dir):
    """IVF index persisted AS AN ENGINE TABLE (operators/similarity.py
    ``ivf_table_index``): corpus written cell-partitioned, centroids in
    table properties, search scans ONLY the probed cells' files
    (partition/bounds pruning — plan-asserted in pytest).  Run at full
    probe so every candidate is covered and the exact top-k SQL is a
    row-for-row twin; partial-probe recall and the 2-of-16-files plan
    are pinned by pytest."""
    from iceberg_ruby_spark.catalog import MemoryCatalog
    from iceberg_ruby_spark.operators.similarity import (
        ivf_table_index,
        ivf_table_search,
    )

    cat = MemoryCatalog(namespace="main", spark=spark)
    cat.create_namespace("main", if_not_exists=True)
    emb = load(spark, sf_dir, "embeddings")
    t = ivf_table_index(cat, "emb_ivf_q", emb, n_cells=16, seed=42)
    q = emb.filter(F.col("vec_id") < 5)
    return ivf_table_search(t, q, k=10, n_probe=16)


@query("embedding_ann_pq_table", oracle=_EXACT_TOPK_SQL, bench=True)
def embedding_ann_pq_table(spark, sf_dir):
    """PQ index persisted AS AN ENGINE TABLE (operators/similarity.py
    ``pq_table_index``, r9 — the ivf_table design applied to product
    quantization): codebooks in table properties, rows stored as
    (id, codes, vector), ADC search scans ONLY (id, codes) — columnar
    projection is the ~32× read shrink — and true vectors are fetched
    just for the refine-pool candidates by id.  Run in the EXACT
    quantization regime (n_codes ≥ corpus ⇒ lossless codes ⇒ ADC
    ordering equals exact cosine ordering) so the exact top-k SQL is a
    row-for-row twin; incremental-encode parity and the drift→retrain
    staleness loop are pinned in pytest."""
    from iceberg_ruby_spark.catalog import MemoryCatalog
    from iceberg_ruby_spark.operators.similarity import (
        pq_table_index,
        pq_table_search,
    )

    cat = MemoryCatalog(namespace="main", spark=spark)
    cat.create_namespace("main", if_not_exists=True)
    emb = load(spark, sf_dir, "embeddings")
    t = pq_table_index(cat, "emb_pq_q", emb, m=8, n_codes=512, seed=42)
    q = emb.filter(F.col("vec_id") < 5)
    return pq_table_search(t, q, k=10, refine=4)


@query(
    "multimodal_mp4_frames",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(g.i AS INTEGER) AS frame_index,
           8 AS width, 8 AS height,
           CAST(64 * ((37 * doc_id + 101 * (g.i // 2)) % 256) AS BIGINT)
               AS sum_r
    FROM documents, generate_series(0, 4) AS g(i)
    WHERE doc_id < 300 AND g.i % 2 = 0 AND g.i < 2 + doc_id % 4
    """,
)
def multimodal_mp4_frames(spark, sf_dir):
    """Real frames out of a REAL (synthesized, spec-shaped) MP4 (r13,
    VERDICT r12 #5): per document an ISO-BMFF file whose stbl sample
    tables (stsz/stsc/stco, two samples per chunk) index 2–5 baseline
    JPEG frames (8×8 flat grayscale — byte-exact through the codec),
    frame 2j+1 repeating 2j.  probe_media_meta sniffs format/duration
    from the real mvhd header (no side-channel duration), sample_frames
    pulls sample BYTES through the ``mp4`` extractor (pure header
    arithmetic), consecutive dedup keeps the even indexes (the off-end
    sample clamps to the last frame and dedups away), and a JPEG decode
    emits per-frame pixel sums the DuckDB twin states in closed form —
    a sample-table, chunk-offset, huffman, or dedup-window bug breaks
    the hash."""
    import pandas as pd

    from iceberg_ruby_spark.operators.multimodal import (
        attach_media_metadata,
        decode_media_batch,
        dedup_frames,
        encode_jpeg,
        encode_mp4_frames,
        probe_media_meta,
        sample_frames,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)

    def _build(batches):
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                did = int(mid)
                n = 2 + did % 4
                frames = []
                for i in range(n):
                    v = (37 * did + 101 * (i // 2)) % 256
                    frames.append(encode_jpeg(8, 8, bytes([v, v, v] * 64)))
                payloads.append(
                    encode_mp4_frames(frames, 8, 8, frame_ms=1000)
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    # NOTE (r14): spread_small_scan before _build was measured here and
    # REJECTED — interleaved A/B min-of-2 at sf0.1: 5.75 s spread vs
    # 1.21 s plain.  Unlike multimodal_jpeg_pipeline (2 python stages,
    # kept), this query chains 5 python/shuffle stages over the frames;
    # 32-way partitioning multiplies their per-task costs far past the
    # codec parallelism it buys.
    media = d.select(F.col("doc_id").alias("media_id")).mapInPandas(
        _build, "media_id long, payload binary"
    )
    tagged = probe_media_meta(media)
    sampled = sample_frames(tagged, every_ms=1000, extractor="mp4")
    kept = dedup_frames(sampled, mode="consecutive")
    as_media = kept.select(
        (F.col("media_id") * 100 + F.col("frame_index")).alias("media_id"),
        F.col("frame").alias("payload"),
    )
    feats = decode_media_batch(
        attach_media_metadata(as_media, "payload", fmt="jpeg"),
        decoder="jpeg",
    )
    return feats.select(
        (F.col("media_id") / 100).cast("long").alias("media_id"),
        (F.col("media_id") % 100).cast("int").alias("frame_index"),
        F.element_at("features", 1).cast("int").alias("width"),
        F.element_at("features", 2).cast("int").alias("height"),
        F.element_at("features", 4).cast("bigint").alias("sum_r"),
    )


@query(
    "multimodal_dedup_frames",
    oracle="""
    SELECT doc_id AS media_id, CAST(g.i AS INTEGER) AS frame_index
    FROM documents, generate_series(0, 6) AS g(i)
    WHERE doc_id < 200 AND g.i <= doc_id % 5 + 1
    ORDER BY media_id, frame_index
    """,
)
def multimodal_dedup_frames(spark, sf_dir):
    """Corpus-global frame dedup (operators/multimodal.py
    ``dedup_frames``): the 200-doc media slice is duplicated at
    media_id+1000 with identical payloads, frame-sampled, and deduped —
    every duplicated frame must collapse to its smallest
    (media_id, frame_index) owner, i.e. exactly the original slice's
    frame enumeration (the DuckDB twin).  Digest-keyed windows only; the
    shuffle moves 16-byte md5s, never frame bytes."""
    from iceberg_ruby_spark.operators.multimodal import (
        attach_media_metadata,
        dedup_frames,
        resize_media,
        sample_frames,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    media = media.unionByName(
        media.select((F.col("media_id") + 1000).alias("media_id"), "payload")
    )
    tagged = attach_media_metadata(media, "payload", fmt="bin").withColumn(
        "meta",
        F.col("meta").withField(
            "duration_ms", (F.col("media_id") % 1000 % 5 + 1) * 1000
        ),
    )
    frames = sample_frames(resize_media(tagged, width=32, height=32), every_ms=1000)
    return (
        dedup_frames(frames, mode="global")
        .select("media_id", "frame_index")
        .orderBy("media_id", "frame_index")
    )


@query(
    "multimodal_frames_codec_dedup",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(g.i AS INTEGER) AS frame_index,
           4 AS width, 4 AS height,
           CAST(16 * ((37 * doc_id + 101 * (g.i // 2)) % 256) AS BIGINT)
               AS sum_r
    FROM documents, generate_series(0, 4) AS g(i)
    WHERE doc_id < 300 AND g.i % 2 = 0 AND g.i < 2 + doc_id % 4
    """,
)
def multimodal_frames_codec_dedup(spark, sf_dir):
    """Real-codec video loop end-to-end (r12, VERDICT r11 #4): per
    document an FRMC container of 2–5 REAL baseline-JPEG frames (8×8,
    flat GRAYSCALE — r=g=b is a fixed point of the JFIF integer color
    convert, so every encode/decode cycle is byte-exact), where frame
    2j+1 repeats frame 2j (a static scene).  sample_frames pulls actual
    encoded frame bytes through the container extractor, consecutive
    dedup_frames keeps exactly the even indexes (digest windows only —
    the shuffle moves md5s, not frames), the survivors run through the
    JPEG resizer (decode → nearest-neighbor 4×4 → re-encode, a SECOND
    full codec cycle), and a final decode emits per-frame pixel sums.
    The DuckDB twin enumerates survivors and sums in closed form — a
    container-offset, huffman, IDCT, resample, or dedup-window bug
    breaks the hash."""
    import pandas as pd

    from iceberg_ruby_spark.operators.multimodal import (
        attach_media_metadata,
        decode_media_batch,
        dedup_frames,
        encode_frame_container,
        encode_jpeg,
        resize_media,
        sample_frames,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)

    def _build(batches):
        for pdf in batches:
            payloads, durations = [], []
            for mid in pdf["media_id"]:
                did = int(mid)
                n = 2 + did % 4
                frames = []
                for i in range(n):
                    v = (37 * did + 101 * (i // 2)) % 256
                    frames.append(encode_jpeg(8, 8, bytes([v, v, v] * 64)))
                payloads.append(encode_frame_container(frames))
                durations.append((n - 1) * 1000)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "duration_ms": durations,
                }
            )

    # NOTE (r14): spread_small_scan before _build was measured here and
    # REJECTED — interleaved A/B min-of-2 at sf0.1: 4.51 s spread vs
    # 1.26 s plain (see multimodal_mp4_frames for the shape analysis).
    media = d.select(F.col("doc_id").alias("media_id")).mapInPandas(
        _build, "media_id long, payload binary, duration_ms long"
    )
    tagged = attach_media_metadata(media, "payload", fmt="frmc").withColumn(
        "meta", F.col("meta").withField("duration_ms", F.col("duration_ms"))
    )
    sampled = sample_frames(tagged, every_ms=1000, extractor="container")
    kept = dedup_frames(sampled, mode="consecutive")
    # survivors re-enter the image pipeline as media rows; a composite id
    # keeps (media_id, frame_index) addressable through the decode join
    as_media = kept.select(
        (F.col("media_id") * 100 + F.col("frame_index")).alias("media_id"),
        F.col("frame").alias("payload"),
    )
    small = resize_media(
        attach_media_metadata(as_media, "payload", fmt="jpeg"),
        width=4,
        height=4,
        resizer="jpeg",
    )
    feats = decode_media_batch(small, decoder="jpeg")
    return feats.select(
        (F.col("media_id") / 100).cast("long").alias("media_id"),
        (F.col("media_id") % 100).cast("int").alias("frame_index"),
        F.element_at("features", 1).cast("int").alias("width"),
        F.element_at("features", 2).cast("int").alias("height"),
        F.element_at("features", 4).cast("bigint").alias("sum_r"),
    )


@query(
    "events_funnel",
    oracle="""
    WITH u1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), u2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN u1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= u1.t1 GROUP BY 1
    ), u3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN u2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= u2.t2 GROUP BY 1
    )
    SELECT step, CAST(step_index AS INTEGER) AS step_index,
           CAST(users AS BIGINT) AS users
    FROM (VALUES
      ('view', 0, (SELECT count(*) FROM u1)),
      ('click', 1, (SELECT count(*) FROM u2)),
      ('purchase', 2, (SELECT count(*) FROM u3))
    ) AS v(step, step_index, users)
    ORDER BY step_index
    """,
)
def events_funnel(spark, sf_dir):
    """Funnel analysis (operators/sessions.py ``funnel``): users
    completing each prefix of view → click → purchase under chained-min
    matching (step i matches the earliest qualifying event at-or-after
    step i−1's match).  One groupBy(user) + an in-row fold — no
    self-joins; the DuckDB twin recomputes the same semantics as the
    classic chained-minimum SQL.  Runs with the production hot-key guard
    (max_events_per_user): far above any real per-user activity in the
    testdata, so it never binds and the oracle stays an exact twin."""
    from iceberg_ruby_spark.operators.sessions import funnel

    e = load(spark, sf_dir, "events")
    return funnel(
        e, ["view", "click", "purchase"], max_events_per_user=1_000_000
    ).orderBy("step_index")


@query(
    "events_retention",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
    ), cohort AS (
      SELECT user_id, min(p) AS c FROM active GROUP BY 1
    )
    SELECT c AS cohort,
           CAST(date_diff('day', c, p) / 7 AS INTEGER) AS period_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
    FROM active a JOIN cohort USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_retention(spark, sf_dir):
    """Weekly cohort retention (operators/sessions.py
    ``retention_cohorts``): users cohorted by first-activity week, cells
    count distinct active users per (cohort, offset).  One distinct +
    one min-agg + one join + one count — the DuckDB twin recomputes the
    same cells."""
    from iceberg_ruby_spark.operators.sessions import retention_cohorts

    e = load(spark, sf_dir, "events")
    return (
        retention_cohorts(e, period="week")
        .select(
            F.col("cohort").cast("date").alias("cohort"),
            "period_offset",
            "users",
        )
        .orderBy("cohort", "period_offset")
    )


@query(
    "corpus_shuffle_order",
    oracle="""
    SELECT doc_id, rank FROM (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id
               ) AS BIGINT) AS rank
        FROM documents
    ) WHERE rank <= 200
    """,
)
def corpus_shuffle_order(spark, sf_dir):
    """shuffle_corpus determinism pinned ORDER-exactly: the md5 engine's
    hash is bit-identical in DuckDB, so the oracle recomputes the same
    global permutation and the first 200 positions must match 1:1 (the
    driver's hash compare is order-insensitive — the rank COLUMN is what
    makes order errors visible).  Production uses engine='xxhash'
    (JVM-side, no cross-engine twin); both are orderBy-over-hash — range
    partition + local sort, no single-reducer stage."""
    from pyspark.sql import Window as W

    from iceberg_ruby_spark.operators import shuffle_corpus

    docs = load(spark, sf_dir, "documents").select("doc_id")
    head = shuffle_corpus(docs, seed=42, engine="md5").limit(200)
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42")))
    # window over the 200-row head only — never the corpus
    return head.select(
        "doc_id",
        F.row_number().over(W.orderBy(key, F.col("doc_id"))).cast("long").alias("rank"),
    )


@query(
    "corpus_sample_per_group",
    oracle="""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':7'), doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= 25
    """,
)
def corpus_sample_per_group(spark, sf_dir):
    """sample_k_per_group: 25 docs per source, survivors = the smallest
    md5(id, seed) per group — the DuckDB twin recomputes the identical
    draw, so membership (not just counts) is hash-verified."""
    from iceberg_ruby_spark.operators import sample_k_per_group

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return sample_k_per_group(docs, "source", 25, seed=7, engine="md5")

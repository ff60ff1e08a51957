"""operators — large-scale data-pipeline operators beyond the reference.

The reference (ankane/iceberg-ruby) has no compute operators of its own
(SURVEY.md §2 Tier C); these are the LLM-training-data-pipeline extensions
mandated by the project north star, each designed Spark-first for ~100 TB:

- :mod:`dedup` — exact, MinHash-LSH, SimHash, n-gram-Jaccard dedup.
- :mod:`similarity` — brute-force cosine top-k + LSH-bucketed ANN.
- :mod:`text` — language-ID, quality scoring, token counting, fingerprints.
- :mod:`asof` — as-of (nearest-key temporal) join via a single-shuffle
  union+window plan.
- :mod:`multimodal` — binary media columns with typed metadata; decode /
  feature-extract plumbing over ``mapInPandas`` (codec stubbed: the image /
  audio libraries are not in this container).

Every operator keeps the hot path JVM-side (built-in ``pyspark.sql.functions``
inside whole-stage codegen); Python appears only in Arrow-batched pandas UDFs
where Spark lacks the primitive.
"""

from iceberg_ruby_spark.operators.dedup import (
    connected_components,
    decontaminate,
    decontaminate_spans,
    shared_span_stats,
    embedding_cosine_pairs,
    exact_dedup,
    exact_dedup_by_hash,
    minhash_signatures,
    minhash_lsh_pairs,
    minhash_incremental_pairs,
    apply_dedup,
    leakage_safe_split,
    line_dedup,
    ngram_jaccard_pairs,
    remove_shared_spans,
    semantic_dedup,
    semantic_dedup_pairs,
    simhash,
    simhash_pairs,
)
from iceberg_ruby_spark.operators.similarity import (
    cosine_topk,
    dequantize_int8,
    ivf_topk,
    ivf_index,
    ivf_assign,
    ivf_search,
    ivf_table_index,
    ivf_table_search,
    lsh_ann_topk,
    pq_encode,
    pq_index,
    pq_search,
    pq_topk,
    quantize_int8,
    vector_norms,
)
from iceberg_ruby_spark.operators.text import (
    strip_html,
    tfidf_top_terms,
    add_text_stats,
    chunk_documents,
    classifier_score,
    classifier_tokens,
    fit_quality_classifier,
    fit_char_lm,
    char_lm_score,
    fingerprint,
    language_id,
    mix_corpus,
    domain_cap,
    pack_sequences,
    quality_score,
    repetition_stats,
    scrub_pii,
    shuffle_corpus,
    stratified_sample,
    token_count,
)
from iceberg_ruby_spark.operators.asof import asof_join
from iceberg_ruby_spark.operators.sessions import funnel, retention_cohorts, sessionize
from iceberg_ruby_spark.operators.multimodal import (
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    _ppm_features,
    _wav_features,
    attach_media_metadata,
    decode_media_batch,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    extract_features,
    resize_media,
    resize_ppm_nearest,
    sample_frames,
    dedup_frames,
)

__all__ = [
    "connected_components",
    "decontaminate",
    "decontaminate_spans",
    "dedup_frames",
    "shared_span_stats",
    "line_dedup",
    "remove_shared_spans",
    "semantic_dedup",
    "semantic_dedup_pairs",
    "strip_html",
    "tfidf_top_terms",
    "embedding_cosine_pairs",
    "exact_dedup",
    "exact_dedup_by_hash",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_incremental_pairs",
    "apply_dedup",
    "leakage_safe_split",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "cosine_topk",
    "dequantize_int8",
    "ivf_topk",
    "ivf_index",
    "ivf_assign",
    "ivf_search",
    "quantize_int8",
    "lsh_ann_topk",
    "ivf_table_index",
    "ivf_table_search",
    "pq_encode",
    "pq_index",
    "pq_search",
    "pq_topk",
    "vector_norms",
    "add_text_stats",
    "chunk_documents",
    "fingerprint",
    "language_id",
    "mix_corpus",
    "domain_cap",
    "pack_sequences",
    "quality_score",
    "classifier_score",
    "classifier_tokens",
    "fit_quality_classifier",
    "fit_char_lm",
    "char_lm_score",
    "repetition_stats",
    "scrub_pii",
    "funnel",
    "retention_cohorts",
    "sessionize",
    "shuffle_corpus",
    "stratified_sample",
    "token_count",
    "asof_join",
    "FRAME_SCHEMA",
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_media_batch",
    "extract_features",
    "resize_media",
    "sample_frames",
]

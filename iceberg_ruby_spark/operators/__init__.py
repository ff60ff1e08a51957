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

Exports resolve lazily (PEP 562, see ``iceberg_ruby_spark._lazy``): an
executor worker unpickling one dedup helper should not pay the import of
similarity/multimodal (pandas) it never touches — measured ~0.34 s per
fork on this host.
"""

from iceberg_ruby_spark._lazy import lazy_attrs as _lazy_attrs

_MODS = {
    "iceberg_ruby_spark.operators.dedup": [
        "connected_components",
        "decontaminate",
        "decontaminate_spans",
        "shared_span_stats",
        "embedding_cosine_pairs",
        "exact_dedup",
        "exact_dedup_by_hash",
        "minhash_signatures",
        "minhash_lsh_pairs",
        "minhash_incremental_pairs",
        "apply_dedup",
        "leakage_safe_split",
        "line_dedup",
        "ngram_jaccard_pairs",
        "remove_shared_spans",
        "semantic_dedup",
        "semantic_dedup_pairs",
        "simhash",
        "simhash_pairs",
    ],
    "iceberg_ruby_spark.operators.similarity": [
        "cosine_topk",
        "dequantize_int8",
        "ivf_topk",
        "ivf_index",
        "ivf_assign",
        "ivf_search",
        "ivf_table_index",
        "ivf_table_search",
        "lsh_ann_topk",
        "pq_encode",
        "pq_index",
        "pq_search",
        "pq_topk",
        "quantize_int8",
        "vector_norms",
    ],
    "iceberg_ruby_spark.operators.text": [
        "strip_html",
        "tfidf_top_terms",
        "add_text_stats",
        "chunk_documents",
        "classifier_score",
        "classifier_tokens",
        "fit_quality_classifier",
        "fit_char_lm",
        "char_lm_score",
        "fingerprint",
        "language_id",
        "mix_corpus",
        "domain_cap",
        "pack_sequences",
        "quality_score",
        "repetition_stats",
        "scrub_pii",
        "sample_k_per_group",
        "shuffle_corpus",
        "stratified_sample",
        "token_count",
    ],
    "iceberg_ruby_spark.operators.asof": ["asof_join"],
    "iceberg_ruby_spark.operators.sessions": [
        "funnel",
        "retention_cohorts",
        "sessionize",
    ],
    "iceberg_ruby_spark.operators.multimodal": [
        "FRAME_SCHEMA",
        "MEDIA_SCHEMA",
        "_PNG_SIG",
        "_jpeg_features",
        "_png_features",
        "_ppm_features",
        "_wav_features",
        "attach_media_metadata",
        "decode_jpeg",
        "decode_media_batch",
        "decode_png",
        "decode_ppm",
        "decode_wav",
        "encode_jpeg",
        "encode_mp3_meta",
        "encode_mp4_meta",
        "encode_png",
        "encode_ppm",
        "encode_wav",
        "extract_features",
        "probe_media",
        "probe_media_meta",
        "resize_media",
        "resize_png_nearest",
        "resize_ppm_nearest",
        "sample_frames",
        "dedup_frames",
    ],
}

_LAZY = {name: mod for mod, names in _MODS.items() for name in names}

__getattr__, __dir__ = _lazy_attrs(__name__, _LAZY)

__all__ = [n for n in _LAZY if not n.startswith("_")]

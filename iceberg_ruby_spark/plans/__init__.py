"""plans — the declared query library.

Every query in SURVEY.md §2's operator inventory gets one entry here:
a ``(spark, sf_dir) -> DataFrame`` callable registered in
:data:`registry.QUERIES` plus (where SQL-expressible) a DuckDB oracle twin
in :data:`registry.ORACLES`.  ``__spark_entry__.py`` re-exports both; the
driver runs them side-by-side at sf=0.01 and hash-compares results.

Determinism rules applied throughout (both sides, always):

- every computed column is aliased identically in Spark and oracle SQL;
- double SUM/AVG go through exact ``DECIMAL(18,6)`` accumulation then cast
  back to double — float summation order differs between engines, decimal
  addition does not;
- int-typed scalar results are cast so Spark/DuckDB widths agree
  (DuckDB ``length()``/``year()``/``row_number()`` return BIGINT, Spark INT);
- top-k and window orderings always carry a unique tie-break key.
"""

from iceberg_ruby_spark.plans.registry import ORACLES, QUERIES

# importing the modules registers their queries
from iceberg_ruby_spark.plans import relational  # noqa: E402,F401
from iceberg_ruby_spark.plans import llm  # noqa: E402,F401
from iceberg_ruby_spark.plans import engine  # noqa: E402,F401
from iceberg_ruby_spark.plans import streaming  # noqa: E402,F401
from iceberg_ruby_spark.plans import tpch  # noqa: E402,F401

# The correctness driver checks queries in registration order and has a
# bounded budget (50 per round).  Round-6 rotation (VERDICT r5 item 5 —
# "after r6, no query's newest driver check is older than 2 rounds"):
# (0) queries the driver has NEVER checked (first driver row): the
#     round-5 additions plus this round's engine_write_mode_properties;
# (1) percentile_aggs — the r5 off-by-one victim (its newest row is r2:
#     the r5 rotation narrated "exactly 47" relational queries but the
#     set held 48, and it silently fell past the budget);
# (2) the engine/streaming families whose newest driver row is r3;
# (3) the r4-checked llm/engine/function queries (2 rounds old — the
#     budget reaches ~22 of these 26; the remainder plus the 21-query
#     TPC-H pack and everything r5-checked stay mirror-covered and
#     rotate in next round).
# The arithmetic is ASSERTED below, not narrated: every name must be a
# registered query, and tiers (0)-(2) must fit the budget entirely.
_DRIVER_BUDGET = 50

_NEVER_DRIVER_CHECKED = [
    "engine_delete_mor_dv", "engine_row_lineage", "engine_write_mode_properties",
    "text_stratified_sample", "text_pack_sequences", "text_scrub_pii",
    "events_sessionize", "dedup_decontaminate", "text_repetition_stats",
    "engine_statistics_ndv", "engine_schema_defaults", "dedup_cluster_components",
    "text_mix_corpus", "dedup_shared_spans",
]

_LAST_CHECKED_R2 = ["percentile_aggs"]

_LAST_CHECKED_R3 = [
    "engine_branch_tag", "engine_bucket_point_lookup", "engine_changelog_scan",
    "engine_compact", "engine_delete_mor", "engine_delete_mor_equality",
    "engine_delete_mor_positional", "engine_incremental_scan",
    "engine_inspect_partitions", "engine_maintenance_cycle", "engine_merge_mor",
    "engine_partitioned_write", "engine_schema_evolution", "engine_sql_roundtrip",
    "engine_time_travel", "engine_wap_publish", "stream_dedup_watermark",
    "stream_session_window", "stream_stateful_user_activity",
    "stream_tumbling_window",
]

# r4-checked, non-TPC-H — fill the remaining budget in this order
_LAST_CHECKED_R4 = [
    "asof_join_events", "dedup_embedding_cosine", "dedup_exact_text",
    "dedup_fingerprint", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_simhash_pairs", "embedding_centroids", "embedding_cosine_topk",
    "embedding_norms", "embedding_quantize_roundtrip",
    "engine_append_roundtrip", "engine_avro_manifests", "engine_delete_cow",
    "engine_merge", "engine_update_cow", "higher_order_array",
    "json_functions", "map_struct_functions", "multimodal_features",
    "multimodal_resize_frames", "pipeline_clean_corpus", "stat_aggs",
    "text_chunk_documents", "text_fingerprint", "text_language_id",
    "text_quality_score", "text_token_stats",
]

_TIER = {}
for _tier, _names in enumerate(
    (_NEVER_DRIVER_CHECKED, _LAST_CHECKED_R2, _LAST_CHECKED_R3, _LAST_CHECKED_R4)
):
    for _n in _names:
        assert _n in QUERIES, f"rotation names unregistered query: {_n}"
        assert _n not in _TIER, f"rotation lists {_n} twice"
        _TIER[_n] = _tier
# tiers 0-2 must land inside the driver budget COMPLETELY — the r5
# off-by-one (percentile_aggs silently dropped) is now a hard error
_must_fit = len(_NEVER_DRIVER_CHECKED) + len(_LAST_CHECKED_R2) + len(_LAST_CHECKED_R3)
assert _must_fit <= _DRIVER_BUDGET, (
    f"rotation tiers 0-2 hold {_must_fit} queries but the driver budget is "
    f"{_DRIVER_BUDGET}; a must-check query would fall out silently"
)

_ordered = sorted(QUERIES, key=lambda n: (_TIER.get(n, 4), n))
_q = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_q)
_o = {n: ORACLES[n] for n in _ordered if n in ORACLES}
ORACLES.clear()
ORACLES.update(_o)

__all__ = ["QUERIES", "ORACLES"]

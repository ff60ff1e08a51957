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
# bounded budget (50 per round).  Round-10 rotation (VERDICT r9 item 2 —
# "all 23 r6-aged queries in CORRECTNESS_r10, plus any query whose code
# or oracle changes in r10"):
# (0) MUST-CHECK: queries first registered in r10 (never driver-checked:
#     the two real-codec multimodal queries, the hybrid min/max rollup,
#     the CDC-drain bench pipeline), queries whose CODE changed in r10
#     (the changelog planner was restructured — distributed content
#     diffs, delta-based delete planning; superset chaining changed
#     every MoR delete/merge COMMIT's metadata shape; changelog_scan
#     chunks; materialized.py rewrote its changelog fold; merge_into
#     grew the by-source UPDATE clause), and the 23 queries whose newest
#     driver row is r6 (the r9 tail — after this round nothing is older
#     than r7).
# (1) r7-checked engine-lifecycle queries nearest the changed commit
#     path fill any remaining budget.
# The arithmetic is ASSERTED below, not narrated: every name must be a
# registered query, and tier (0) must fit the budget entirely.
_DRIVER_BUDGET = 50

_NEVER_DRIVER_CHECKED = [
    # new in r10 (never driver-checked by definition)
    "multimodal_ppm_pipeline", "multimodal_wav_features",
    "engine_materialized_minmax", "stream_cdc_pipeline",
    "engine_agg_pushdown", "engine_cdc_scd2", "corpus_shuffle_order",
    "engine_bloom_lookup", "corpus_sample_per_group", "stream_cdc_scd2",
    "engine_changelog_net",
    # changed in r10: operator code — prior green is stale
    "engine_materialized_changelog",      # hybrid min/max fold rewrite
    "stream_changelog_cow",               # distributed content diffs
    "stream_changelog_tail",              # delta-based delete planning
    "engine_changelog_scan",              # chunked long windows
    "engine_incremental_scan",            # MoR deltas now derivable
    "engine_delete_mor",                  # superset-chained commits
    "engine_delete_mor_dv",
    "engine_delete_mor_equality",
    "engine_delete_mor_positional",
    "engine_merge",                       # by-source UPDATE clause
    "engine_merge_mor",
    "engine_cdc_apply",                   # applies over chained commits
    # r6-aged cohort (VERDICT r9 item 2 — all 23, verbatim)
    "engine_compact", "engine_inspect_partitions",
    "engine_maintenance_cycle", "engine_partitioned_write",
    "engine_row_lineage", "engine_schema_defaults",
    "engine_schema_evolution", "engine_sql_roundtrip",
    "engine_statistics_ndv", "engine_time_travel", "engine_wap_publish",
    "engine_write_mode_properties", "events_sessionize",
    "percentile_aggs", "stream_dedup_watermark", "stream_session_window",
    "stream_stateful_user_activity", "stream_tumbling_window",
    "text_mix_corpus", "text_pack_sequences", "text_repetition_stats",
    "text_scrub_pii", "text_stratified_sample",
]

# fills the remaining budget: engine lifecycle queries whose COMMIT
# metadata shape the r10 superset chaining touched, then delete flavors
# (r7-checked; everything dedup/ANN/text was re-checked in r9 and waits)
_LAST_CHECKED_R6 = [
    "engine_append_roundtrip", "engine_avro_manifests",
    "engine_fast_append_chain", "engine_branch_tag",
    "engine_bucket_point_lookup", "engine_delete_cow",
    "dedup_exact_text", "dedup_fingerprint", "embedding_cosine_topk",
    "embedding_centroids", "embedding_norms",
]

_TIER = {}
_RANK = {}
for _tier, _names in enumerate((_NEVER_DRIVER_CHECKED, _LAST_CHECKED_R6)):
    for _rank, _n in enumerate(_names):
        assert _n in QUERIES, f"rotation names unregistered query: {_n}"
        assert _n not in _TIER, f"rotation lists {_n} twice"
        _TIER[_n] = _tier
        _RANK[_n] = _rank
# tier 0 must land inside the driver budget COMPLETELY — the r5
# off-by-one (percentile_aggs silently dropped) stays a hard error
assert len(_NEVER_DRIVER_CHECKED) <= _DRIVER_BUDGET, (
    f"rotation tier 0 holds {len(_NEVER_DRIVER_CHECKED)} queries but the "
    f"driver budget is {_DRIVER_BUDGET}; a must-check query would fall out"
)

# within a tier, the hand-ordered rank decides who fills the budget first
# (perf-watch queries before low-risk scalar queries); names outside both
# tiers sort last, alphabetically.
_ordered = sorted(QUERIES, key=lambda n: (_TIER.get(n, 4), _RANK.get(n, 0), n))
_q = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_q)
_o = {n: ORACLES[n] for n in _ordered if n in ORACLES}
ORACLES.clear()
ORACLES.update(_o)

__all__ = ["QUERIES", "ORACLES"]

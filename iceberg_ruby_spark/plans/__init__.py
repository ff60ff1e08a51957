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
# bounded budget (50 per round).  Round-9 rotation (VERDICT r8 items 1+2 —
# "CORRECTNESS_r09 contains all 16 r5-aged queries + binarize, fill the
# rest from the r6-aged cohort"):
# (0) MUST-CHECK: queries first registered in r9 (never driver-checked),
#     queries whose code or oracle CHANGED this round (their prior green
#     is stale — binarize's oracle typing fix, the asof wholesale-row
#     rewrite + NULL-injected oracles, the changelog source's content-diff
#     fallback), and the 16 queries whose newest driver row is r5 (4
#     rounds old after this round — the rotation tail item 2 names).
# (1) the 50 queries whose newest driver row is r6, ordered so the ones
#     nearest this round's changed code (changelog/table scan paths,
#     dedup/ANN) fill before low-change-risk text/scalar queries; the
#     tail that misses the budget stays r6-aged and MUST lead r10.
# Everything r7/r8-checked waits.  The arithmetic is ASSERTED below, not
# narrated: every name must be a registered query, and tier (0) must fit
# the budget entirely.
_DRIVER_BUDGET = 50

_NEVER_DRIVER_CHECKED = [
    # new in r9 (never driver-checked by definition)
    "embedding_ann_pq_table", "stream_changelog_cow",
    "engine_materialized_changelog",
    # changed in r9: oracle or operator code — prior green is stale
    "embedding_binarize_pack",            # oracle CAST fix (VERDICT #1)
    "asof_join_forward",                  # struct-fill + NULL oracle
    "asof_join_nearest_tolerance",        # struct-fill + NULL oracle
    "asof_join_events",                   # asof operator rewritten
    "stream_changelog_tail",              # source planning restructured
    # r5-aged cohort (VERDICT r8 item 2 — all 16, verbatim)
    "array_functions", "case_cast_coalesce", "cast_nullif",
    "date_functions", "except_keys", "explode_unnest", "intersect_keys",
    "math_functions", "pivot_order_status", "projection_rename",
    "regexp_functions", "scan_filter_project", "sort_limit_offset",
    "string_functions", "union_distinct", "unpivot_lineitem_metrics",
]

# r6-checked cohort — fills the remaining budget in this priority order:
# closest-to-changed-code first (changelog/incremental scan, MoR delete
# flavors, dedup/ANN), engine lifecycle next, low-risk text/stat last.
_LAST_CHECKED_R6 = [
    "engine_changelog_scan", "engine_incremental_scan",
    "engine_delete_mor", "engine_delete_mor_dv",
    "engine_delete_mor_equality", "engine_delete_mor_positional",
    "engine_delete_cow", "engine_merge", "engine_merge_mor",
    "dedup_embedding_cosine", "dedup_exact_text", "dedup_fingerprint",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_cluster_components", "dedup_decontaminate",
    "dedup_shared_spans", "embedding_centroids", "embedding_cosine_topk",
    "embedding_norms", "embedding_quantize_roundtrip",
    "engine_append_roundtrip", "engine_avro_manifests",
    "engine_branch_tag", "engine_bucket_point_lookup", "engine_compact",
    "engine_inspect_partitions", "engine_maintenance_cycle",
    "engine_partitioned_write", "engine_row_lineage",
    "engine_schema_defaults", "engine_schema_evolution",
    "engine_sql_roundtrip", "engine_statistics_ndv", "engine_time_travel",
    "engine_wap_publish", "engine_write_mode_properties",
    "events_sessionize", "percentile_aggs", "stream_dedup_watermark",
    "stream_session_window", "stream_stateful_user_activity",
    "stream_tumbling_window", "text_mix_corpus", "text_pack_sequences",
    "text_repetition_stats", "text_scrub_pii", "text_stratified_sample",
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

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
# bounded budget (50 per round).  Round-7 rotation (VERDICT r6 item 3 —
# "after r7, no query's newest driver check is older than r5"):
# (0) queries the driver has NEVER checked: this round's five additions
#     (incremental dedup/ANN, dedup apply/split, domain cap);
# (1) the 32 queries whose newest driver row is r4 (the TPC-H pack +
#     llm/function/engine stragglers — computed from CORRECTNESS_r0{1..6});
# (2) the 50 r5-checked core relational/join/window/set-op queries — the
#     remaining ~13 budget slots reach the alphabetical head; the
#     overflow stays at newest=r5 (2 rounds old at r7, within target)
#     and rotates in next round.  Everything r6-checked waits.
# The arithmetic is ASSERTED below, not narrated: every name must be a
# registered query, and tiers (0)-(1) must fit the budget entirely.
# NOTE for the r8 rotation: tier 0 + tier 1 now fill the budget exactly
# (18 + 32 = 50); the late-r7 queries engine_materialized_agg,
# embedding_ann_ivf_table, multimodal_dedup_frames, events_funnel, and
# events_retention did NOT fit and remain never-driver-checked (all
# mirror-green at sf0.01 this session, 156/156) — they go first in r8's
# tier 0.
_DRIVER_BUDGET = 50

_NEVER_DRIVER_CHECKED = [
    "dedup_incremental", "dedup_apply_canonical", "dedup_split_leakage_safe",
    "text_domain_cap", "embedding_ann_ivf_incremental",
    "text_quality_classifier", "stream_table_source_tail",
    "text_char_lm_likelihood",
    # late round-7 additions (this session)
    "dedup_line_corpus", "text_tfidf_top_terms", "dedup_semantic",
    "dedup_remove_spans", "engine_cdc_apply", "embedding_ann_pq",
    "engine_merge_delete_clause", "text_strip_html",
    "engine_merge_full_sync", "dedup_decontaminate_spans",
]

_LAST_CHECKED_R4 = [
    "engine_update_cow", "higher_order_array", "json_functions",
    "map_struct_functions", "multimodal_features", "multimodal_resize_frames",
    "pipeline_clean_corpus", "q02_min_acctbal_supplier", "q04_order_priority",
    "q06_forecast_revenue", "q07_nation_volume", "q08_market_share",
    "q09_product_profit", "q10_returned_items", "q11_important_parts",
    "q12_late_priority_lines", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_part_supplier_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_bracketed_revenue",
    "q20_forest_part_suppliers", "q21_waiting_suppliers",
    "q22_idle_rich_customers", "stat_aggs", "text_chunk_documents",
    "text_fingerprint", "text_language_id", "text_quality_score",
    "text_token_stats",
]

# r5-checked relational family — fills the remaining budget in this order
_LAST_CHECKED_R5 = [
    "agg_global", "agg_having", "approx_count_distinct", "array_functions",
    "case_cast_coalesce", "cast_nullif", "correlated_exists",
    "count_distinct_by_group", "cte_join_agg", "cube_counts", "date_functions",
    "dedup_minhash_lsh", "distinct_pairs", "embedding_ann_ivf",
    "embedding_ann_lsh", "except_keys", "explode_unnest", "grouping_sets",
    "in_subquery", "intersect_keys", "join_anti", "join_broadcast_dim",
    "join_cross", "join_full_outer", "join_inner_agg", "join_left_zero_counts",
    "join_range_theta", "join_right", "join_semi", "math_functions",
    "pivot_order_status", "projection_rename", "q01_pricing_summary",
    "q3_shipping_priority", "q5_nation_revenue", "regexp_functions",
    "rollup_counts", "scalar_subquery", "scan_filter_project",
    "sort_limit_offset", "string_functions", "topk_orders", "union_all_counts",
    "union_distinct", "unpivot_lineitem_metrics", "window_lag_lead",
    "window_ntile", "window_range_frame", "window_ranking",
    "window_running_sum",
]

_TIER = {}
for _tier, _names in enumerate(
    (_NEVER_DRIVER_CHECKED, _LAST_CHECKED_R4, _LAST_CHECKED_R5)
):
    for _n in _names:
        assert _n in QUERIES, f"rotation names unregistered query: {_n}"
        assert _n not in _TIER, f"rotation lists {_n} twice"
        _TIER[_n] = _tier
# tiers 0-1 must land inside the driver budget COMPLETELY — the r5
# off-by-one (percentile_aggs silently dropped) stays a hard error
_must_fit = len(_NEVER_DRIVER_CHECKED) + len(_LAST_CHECKED_R4)
assert _must_fit <= _DRIVER_BUDGET, (
    f"rotation tiers 0-1 hold {_must_fit} queries but the driver budget is "
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

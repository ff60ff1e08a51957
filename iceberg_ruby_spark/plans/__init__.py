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
# bounded budget (50 per round).  Round-8 rotation (VERDICT r7 item 1 —
# "CORRECTNESS_r08 contains all 6 never-driver-checked queries, then fill
# from the r5-aged cohort"):
# (0) queries the driver has NEVER checked: the six late-r7 additions that
#     missed the r7 window (embedding_ann_ivf_table, engine_fast_append_chain,
#     engine_materialized_agg, events_funnel, events_retention,
#     multimodal_dedup_frames) plus any query first registered in r8 —
#     append new r8 queries to _NEVER_DRIVER_CHECKED as they land;
# (1) the 50 queries whose newest driver row is r5 (core relational/join/
#     window/set-op/dedup/ann families), ordered so the touched-this-round
#     and perf-watch queries (dedup_minhash_lsh first) fill before the
#     low-change-risk scalar-function queries; the tail that misses the
#     budget stays at newest=r5 (3 rounds old) and MUST lead r9's window.
# Everything r6/r7-checked waits.  The arithmetic is ASSERTED below, not
# narrated: every name must be a registered query, and tier (0) must fit
# the budget entirely.
_DRIVER_BUDGET = 50

_NEVER_DRIVER_CHECKED = [
    "embedding_ann_ivf_table", "engine_fast_append_chain",
    "engine_materialized_agg", "events_funnel", "events_retention",
    "multimodal_dedup_frames",
    # round-8 additions appended here as they land (never driver-checked
    # by definition)
    "stream_changelog_tail", "embedding_truncate_norm",
    "embedding_matryoshka_topk", "embedding_binarize_pack",
    "embedding_hamming_topk", "join_salted_skew",
    "agg_salted_count_distinct", "asof_join_forward",
    "asof_join_nearest_tolerance", "text_url_canonicalize_dedup",
]

# r5-checked cohort — fills the remaining budget in this priority order:
# perf-watch + code-touched-this-round first, then joins/windows/aggs,
# then the scalar-function queries (lowest change risk → first to defer).
_LAST_CHECKED_R5 = [
    "dedup_minhash_lsh", "embedding_ann_ivf", "embedding_ann_lsh",
    "window_ntile", "window_range_frame", "window_ranking",
    "window_running_sum", "window_lag_lead",
    "join_range_theta", "join_broadcast_dim", "join_inner_agg", "join_anti",
    "join_semi", "join_cross", "join_full_outer", "join_right",
    "join_left_zero_counts", "q01_pricing_summary", "q3_shipping_priority",
    "q5_nation_revenue", "topk_orders", "agg_global", "agg_having",
    "approx_count_distinct", "count_distinct_by_group", "cube_counts",
    "rollup_counts", "grouping_sets", "distinct_pairs", "cte_join_agg",
    "correlated_exists", "in_subquery", "scalar_subquery",
    "union_all_counts", "union_distinct", "intersect_keys", "except_keys",
    "pivot_order_status", "unpivot_lineitem_metrics", "explode_unnest",
    "sort_limit_offset", "scan_filter_project", "projection_rename",
    "case_cast_coalesce", "cast_nullif", "array_functions", "date_functions",
    "math_functions", "regexp_functions", "string_functions",
]

_TIER = {}
_RANK = {}
for _tier, _names in enumerate((_NEVER_DRIVER_CHECKED, _LAST_CHECKED_R5)):
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

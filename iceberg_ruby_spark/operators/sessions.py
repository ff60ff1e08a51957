"""Batch sessionization over event streams.

The batch counterpart of streaming session windows (plans/streaming.py's
``stream_session_window``): assign every event a session id such that
events of one user separated by ≤ ``gap`` belong to one session.  Absent
from the reference (SURVEY.md §2 Tier C — the reference has no event
operators at all); built as the canonical two-window formulation:

1. ``lag(ts)`` per user (one shuffle on user_id — the only shuffle);
2. a session STARTS where the gap to the previous event exceeds the
   threshold (or there is no previous event);
3. the session id is the running count of starts up to the row — a
   prefix-sum over the same window, no second shuffle (both windows share
   the (user_id, ts) partitioning and ordering, so Catalyst plans ONE
   exchange + ONE sort).

At 100 TB this scales as a single hash-partitioned window: sessions are
per-user by construction, so skew is bounded by the hottest user; salting
is unnecessary because the window state is O(1) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tie_col: str = None,
) -> DataFrame:
    """Add ``session_seq`` (1-based per-user session ordinal) and
    ``is_session_start``.  ``tie_col`` breaks equal-timestamp ordering
    deterministically (required for oracle comparison)."""
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # NTZ timestamps can't cast straight to long; go through LTZ first
    # (gaps are differences, so the zone chosen cancels out)
    def _secs(c):
        return c.cast("timestamp_ltz").cast("long")

    gap_s = _secs(F.col(ts_col)) - _secs(prev_ts)
    start = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("is_session_start", start).withColumn(
        "session_seq",
        F.sum(F.col("is_session_start")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: float | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Funnel analysis: how many users complete each prefix of an ordered
    step sequence — the product-analytics staple.  Matching is the
    standard chained-minimum semantics: step *i* matches the EARLIEST
    qualifying event at-or-after step *i−1*'s match; ``within_seconds``
    bounds the whole conversion window from the FIRST step's match.
    Returns one row per step: (step, step_index, users).

    100 TB shape: irrelevant event types are filtered in the scan, then
    ONE groupBy(user) builds each user's ordered (ts, step) array
    (bounded by per-user activity, never corpus-sized) and a single
    in-row ``aggregate`` fold computes the user's funnel depth — no
    self-joins, no N-pass chaining, one shuffle total.  The final counts
    are one global aggregation of depth flags.

    ``max_events_per_user`` is the hot-key guard: the per-user array is
    bounded by per-user activity, so ONE pathological user (a bot with
    10⁸ events) makes one giant row.  With the cap set, only each user's
    EARLIEST ``max_events_per_user`` qualifying events enter the fold
    (deterministic keep-earliest via row_number over the same (user, ts)
    ordering the fold uses — the window shares the groupBy's hash
    partitioning, so no extra shuffle).  Earliest-match funnel semantics
    are unchanged for every user at-or-under the cap.  Uncapped calls
    warn, mirroring :func:`iceberg_ruby_spark.operators.text.pack_sequences`'s
    global-window guard."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if max_events_per_user is not None and max_events_per_user <= 0:
        raise ValueError("max_events_per_user must be positive")
    n = len(steps)
    step_idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    evs = events.filter(F.col(type_col).isin(list(set(steps)))).select(
        F.col(user_col).alias("__u"),
        F.struct(
            F.col(ts_col).alias("ts"),
            step_idx[F.col(type_col)].cast("int").alias("idx"),
        ).alias("__e"),
    )
    if max_events_per_user is None:
        import warnings

        warnings.warn(
            "funnel(max_events_per_user=None) builds an UNBOUNDED per-user "
            "event array — one pathological user (a bot) makes one giant "
            "row. Pass max_events_per_user for any input where per-user "
            "activity is not known to be bounded.",
            ResourceWarning,
            stacklevel=2,
        )
    else:
        w = Window.partitionBy("__u").orderBy(
            F.col("__e.ts").asc(), F.col("__e.idx").asc()
        )
        evs = (
            evs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_events_per_user)
            .drop("__rn")
        )
    per_user = evs.groupBy("__u").agg(
        F.array_sort(F.collect_list("__e")).alias("__seq")
    )
    init = F.struct(
        F.lit(0).alias("d"), F.lit(None).cast("timestamp").alias("t1")
    )

    def fold(acc, e):
        in_window = F.lit(True)
        if within_seconds is not None:
            in_window = (acc["d"] == 0) | (
                F.unix_micros(e["ts"]) - F.unix_micros(acc["t1"])
                <= F.lit(int(within_seconds * 1_000_000))
            )
        matches = (acc["d"] < n) & (e["idx"] == acc["d"]) & in_window
        return F.when(
            matches,
            F.struct(
                (acc["d"] + 1).alias("d"),
                F.when(acc["d"] == 0, e["ts"]).otherwise(acc["t1"]).alias("t1"),
            ),
        ).otherwise(acc)

    depths = per_user.select(
        F.aggregate("__seq", init, fold)["d"].alias("__depth")
    )
    counts = depths.agg(
        *[
            F.sum(F.when(F.col("__depth") > i, 1).otherwise(0))
            .cast("long")
            .alias(f"__c{i}")
            for i in range(n)
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("step"),
                        F.lit(i).cast("int").alias("step_index"),
                        F.col(f"__c{i}").alias("users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.step", "r.step_index", "r.users")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention — the other product-analytics staple: users are
    cohorted by the period of their FIRST activity, and each
    (cohort, period_offset) cell counts how many of them were active
    that many periods later.  Returns (cohort, period_offset, users).

    100 TB shape: one distinct over (user, period) — map-side partial —
    one min-aggregate for the cohort, one user-keyed join, one counting
    aggregate.  Nothing is ever user×period dense; cells materialize
    only where activity exists."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"retention period {period!r}: expected day/week/month")
    p = F.date_trunc(period, F.col(ts_col))
    active = events.select(
        F.col(user_col).alias("__u"), p.alias("__p")
    ).distinct()
    cohort = active.groupBy("__u").agg(F.min("__p").alias("__c"))
    days = F.datediff(F.col("__p"), F.col("__c"))
    offset = {
        "day": days,
        "week": (days / 7).cast("int"),
        "month": (
            (F.year("__p") - F.year("__c")) * 12
            + (F.month("__p") - F.month("__c"))
        ),
    }[period]
    return (
        active.join(cohort, "__u")
        .groupBy(F.col("__c").alias("cohort"), offset.cast("int").alias("period_offset"))
        .agg(F.count_distinct("__u").alias("users"))
    )

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

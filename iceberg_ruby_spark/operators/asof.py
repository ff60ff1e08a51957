"""As-of join — nearest-preceding-event join on a time axis.

SURVEY.md §2 Tier B names this the one join Spark lacks a primitive for.
Implementation is the single-shuffle union+window plan, not a join:

1. tag left (probe) and right (reference) rows, union them;
2. one window partitioned by the ``by`` keys ordered by (time, tag) with
   ``last(value, ignorenulls=True)`` carrying the most recent right-side
   values forward;
3. keep the left rows.

Cost at scale: ONE shuffle on the ``by`` keys (the union is shuffle-free),
versus a range-join's pair explosion.  Skewed keys go through AQE skew
handling like any other window shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Optional[Sequence[str]] = None,
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` (``<`` when ``strict``), matching on ``by`` keys.

    ``right_cols`` defaults to every non-key right column; attached columns
    get ``suffix`` when the name collides with a left column."""
    by = list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # Non-strict (<=): right rows sort BEFORE left rows at equal timestamps,
    # so a same-instant right row is visible in the frame.  Strict (<):
    # left rows sort first, pushing same-instant right rows out of the frame.
    tag_order = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in right_cols:
        filled = filled.withColumn(
            f"__r_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__r_{c}").alias(out_names[c]) for c in right_cols],
    )

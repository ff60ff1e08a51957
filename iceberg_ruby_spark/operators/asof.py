"""As-of join — nearest-event join on a time axis (pandas ``merge_asof``
surface: backward / forward / nearest + tolerance).

SURVEY.md §2 Tier B names this the one join Spark lacks a primitive for.
Implementation is the single-shuffle union+window plan, not a join:

1. tag left (probe) and right (reference) rows, union them;
2. one window partitioned by the ``by`` keys ordered by (time, tag) with
   ``last(row_struct, ignorenulls=True)`` carrying the most recent right
   ROW forward (and, for forward/nearest, a mirror window ordered
   descending carrying the next right row backward) — the right row's
   columns are packed into ONE struct so the match attaches wholesale,
   NULLs included, exactly like pandas ``merge_asof`` / DuckDB ASOF; a
   per-column fill would stitch a NULL field from an OLDER right row
   onto the nearest row's timestamp (a row no single right record
   contains — VERDICT r8 finding #2);
3. keep the left rows; ``nearest`` picks per row whichever matched
   timestamp is closer (tie → backward, deterministically).

Cost at scale: ONE shuffle on the ``by`` keys (the union is shuffle-free).
``nearest`` adds a second window SORT over the same hash partitioning —
same single exchange, two in-partition sorts, never a second shuffle.
Skewed keys go through AQE skew handling like any other window shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iceberg_ruby_spark.errors import InvalidDataError


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Optional[Sequence[str]] = None,
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_right",
    strict: bool = False,
    direction: str = "backward",
    tolerance: Optional[float] = None,
) -> DataFrame:
    """For each left row, attach the nearest right row matching on ``by``:

    - ``direction='backward'`` (default): latest right with
      ``right.on <= left.on`` (``<`` when ``strict``);
    - ``'forward'``: earliest right with ``right.on >= left.on``
      (``>`` when ``strict``);
    - ``'nearest'``: whichever of the two is closer in time
      (tie → backward, deterministically).

    ``tolerance`` (same units as ``on``; timestamps compare as epoch
    seconds) nulls the attached columns when the matched row is further
    away — pandas ``merge_asof(tolerance=...)``.  ``right_cols`` defaults
    to every non-key right column; attached columns get ``suffix`` when
    the name collides with a left column."""
    if direction not in ("backward", "forward", "nearest"):
        raise InvalidDataError(f"asof_join direction must be backward/forward/nearest: {direction}")
    if tolerance is not None and tolerance < 0:
        raise InvalidDataError(f"asof_join tolerance must be >= 0: {tolerance}")
    by = list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }
    # the whole right row packs into ONE struct: the matched timestamp
    # (field __on) rides along for nearest-arbitration and tolerance
    # masking, and the struct is non-null iff a right row matched — so a
    # matched row's NULL fields attach as NULLs instead of back-filling
    # from an older row
    row_struct = F.struct(
        *[F.col(c) for c in right_cols], F.col(on).alias("__on")
    )
    struct_type = right.select(row_struct.alias("__r")).schema["__r"].dataType

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(struct_type).alias("__r"),
    )
    r_tag = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__is_left"),
        row_struct.alias("__r"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # Non-strict: right rows sort BEFORE left rows at equal timestamps, so
    # a same-instant right row is visible in the frame.  Strict: left rows
    # sort first, pushing same-instant right rows out of the frame.  The
    # forward window mirrors the ordering (descending time), same rule.
    back_tag = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), back_tag)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).desc(), back_tag)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    want_back = direction in ("backward", "nearest")
    want_fwd = direction in ("forward", "nearest")
    if want_back:
        filled = filled.withColumn(
            "__b", F.last(F.col("__r"), ignorenulls=True).over(w_back)
        )
    if want_fwd:
        filled = filled.withColumn(
            "__f", F.last(F.col("__r"), ignorenulls=True).over(w_fwd)
        )
    out = filled.filter(F.col("__is_left") == 1)

    # timestamps (incl. NTZ, which Spark won't cast straight to double)
    # and dates compare as epoch seconds; the NTZ→LTZ hop is a constant
    # shift that cancels in every difference the arbitration/tolerance
    # computes
    on_is_ts = left.schema[on].dataType.typeName().startswith(("timestamp", "date"))

    def _secs(col):
        if on_is_ts:
            return col.cast("timestamp_ltz").cast("double")
        return col.cast("double")

    # arbitration and masking act on the STRUCT, so the matched row stays
    # atomic: either the whole nearest/in-tolerance row attaches, or NULL
    if direction == "nearest":
        b_on = F.col("__b").getField("__on")
        f_on = F.col("__f").getField("__on")
        back_d = _secs(F.col(on)) - _secs(b_on)
        fwd_d = _secs(f_on) - _secs(F.col(on))
        use_back = F.col("__f").isNull() | (
            F.col("__b").isNotNull() & (back_d <= fwd_d)
        )
        picked = F.when(use_back, F.col("__b")).otherwise(F.col("__f"))
    elif direction == "backward":
        picked = F.col("__b")
    else:
        picked = F.col("__f")

    if tolerance is not None:
        in_tol = picked.isNotNull() & (
            F.abs(_secs(F.col(on)) - _secs(picked.getField("__on")))
            <= F.lit(float(tolerance))
        )
        picked = F.when(in_tol, picked)
    return out.select(
        *[F.col(c) for c in left.columns],
        picked.alias("__m"),
    ).select(
        *[F.col(c) for c in left.columns],
        *[
            F.col("__m").getField(c).alias(out_names[c])
            for c in right_cols
        ],
    )

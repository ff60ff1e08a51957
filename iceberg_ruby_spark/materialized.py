"""Incrementally-maintained materialized aggregates — the continuous-
aggregate / hypertable-rollup pattern (TimescaleDB continuous aggregates,
Materialize-style incremental view maintenance) expressed over engine
tables (the reference has no materialization surface; SURVEY.md §2
Tier C north star "hypertable rollup").

A :class:`MaterializedAggregate` is a normal engine table holding one row
per group with decomposable aggregate state, plus a watermark — the
source snapshot id the state reflects — carried IN the rollup table's
snapshot summaries.  ``refresh()`` reads ONLY the source rows appended
since the watermark (``Table.incremental_scan``: O(new files), nothing
else opened), partially aggregates them, and folds them into the rollup
with ONE ``MERGE`` whose matched-update expressions are the aggregate
combine functions (sum+sum, count+count, least/greatest).  The watermark
rides the merge commit's summary, so refresh is atomic — either the
merge landed with its watermark or it didn't, and a re-run folds exactly
the missed window (the same exactly-once shape the streaming sink uses
for batch ids).

At 100 TB this is the difference between re-scanning the fact table per
dashboard refresh and touching only the appended files: refresh cost
tracks ingest volume, never table size.  Supported aggregates are the
decomposable ones — ``sum``, ``count``, ``min``, ``max`` (``avg`` =
materialize sum + count, divide at query time).

Two maintenance modes (r9):

- ``mode='append'`` (default): deltas come from ``incremental_scan`` —
  O(new files), but sources must be append-only between refreshes (the
  scan REFUSES windows containing rewrites; after a compaction,
  ``refresh(full=True)`` rebuilds).
- ``mode='changelog'``: deltas come from ``changelog_scan``, so DELETES
  RETRACT — each delta row folds with sign +1 (insert) / −1 (delete),
  an UPDATE's delete+insert pair nets to the value change, and a
  compaction emits nothing (physical churn cancels) — the full-refresh
  requirement disappears.  A hidden ``__mv_n`` group cardinality rides
  the state; groups retracted to zero stay as tombstone rows the reader
  filters, so the fold remains ONE merge.

  ``min``/``max`` maintain via HYBRID IVM (r10; r9 refused them): the
  classic workaround for non-invertible aggregates.  Insert-side
  extremes fold through least/greatest as before; a group is RECOMPUTED
  from the source only when a deleted value ties-or-beats the group's
  STORED extremum (checked against the rollup state at plan time).  The
  recompute scan is group-pruned by a broadcast semi join on the
  endangered keys — its cost tracks deleted extremes, never table
  size — and the recomputed values ride the SAME single merge, so
  refresh atomicity is unchanged.

The maintenance mode and aggregate spec are STAMPED in the rollup
table's properties at create time and verified on reopen (r9 ADVICE): a
changelog-maintained rollup reopened as ``mode='append'`` would
otherwise expose ``__mv_n`` tombstones and fold unsigned partials into
signed state with no error.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_ruby_spark.errors import InvalidDataError

_WATERMARK_KEY = "mv-source-snapshot-id"

_COMBINE = {
    # SQL SUM is null only when EVERY value is null — the combine must
    # mirror that (null absorbs into the other side, never poisons it):
    # a window whose values for a group are all NULL contributes a NULL
    # partial, and `t + NULL` would otherwise corrupt the stored total
    # forever (r9 review finding #2).  Known IVM deviation, documented:
    # in changelog mode a group whose non-null values are ALL retracted
    # reads 0 where a from-scratch SUM reads NULL; refresh(full=True)
    # normalizes.
    "sum": lambda c: (
        f"CASE WHEN t.{c} IS NULL THEN s.{c} "
        f"WHEN s.{c} IS NULL THEN t.{c} "
        f"ELSE t.{c} + s.{c} END"
    ),
    "count": lambda c: f"t.{c} + s.{c}",
    "min": lambda c: f"least(t.{c}, s.{c})",
    "max": lambda c: f"greatest(t.{c}, s.{c})",
}


class MaterializedAggregate:
    """``aggs`` maps output column → (fn, source column); fn in
    sum/count/min/max; count accepts "*".  The rollup table is created on
    first refresh (group columns typed from the source schema, aggregate
    columns from a partial aggregation's types)."""

    def __init__(
        self,
        catalog,
        name: str,
        source,
        group_by: list[str],
        aggs: dict[str, tuple],
        derived: Optional[dict[str, str]] = None,
        mode: str = "append",
    ):
        if mode not in ("append", "changelog"):
            raise InvalidDataError(
                f"materialized mode {mode!r}: expected 'append' or 'changelog'"
            )
        for out, (fn, _col) in aggs.items():
            if fn not in _COMBINE:
                raise InvalidDataError(
                    f"aggregate {fn!r} for {out!r} is not decomposable; "
                    "supported: sum, count, min, max (avg = sum + count)"
                )
            if out in group_by:
                raise InvalidDataError(f"aggregate column {out!r} shadows a key")
            if out == "__mv_n":
                raise InvalidDataError("__mv_n is reserved for the maintainer")
        self.catalog = catalog
        self.name = name
        self.source = source
        self.group_by = list(group_by)
        self.aggs = dict(aggs)
        self.mode = mode
        if mode == "changelog":
            # hidden group cardinality: zero ⇒ the group was fully
            # retracted and reads filter it (tombstone, GC'd by rebuild)
            self.aggs["__mv_n"] = ("count", "*")
        # the non-invertible aggregates — changelog mode maintains them
        # via the hybrid endangered-group recompute
        self._minmax = {
            out: fc for out, fc in self.aggs.items() if fc[0] in ("min", "max")
        }
        # derived group keys (the hypertable time_bucket: group on a SQL
        # expression of source columns, e.g. day = date_trunc('DAY', ts))
        self.derived = dict(derived or {})

    def _spec_json(self) -> str:
        import json

        return json.dumps(
            {
                "group_by": self.group_by,
                "aggs": {k: list(v) for k, v in self.aggs.items()},
                "derived": self.derived,
            },
            sort_keys=True,
        )

    # -- aggregation pieces --------------------------------------------------
    def _partial(self, rows: DataFrame) -> DataFrame:
        for k, expr in self.derived.items():
            rows = rows.withColumn(k, F.expr(expr))
        exprs = []
        for out, (fn, col) in self.aggs.items():
            if fn == "count":
                target = F.lit(1) if col in ("*", None) else F.col(col)
                exprs.append(F.count(target).alias(out))
            else:
                exprs.append(getattr(F, fn)(F.col(col)).alias(out))
        return rows.groupBy(*self.group_by).agg(*exprs)

    def _partial_signed(self, delta: DataFrame) -> DataFrame:
        """Signed partial aggregation over CHANGELOG rows: each row folds
        with +1 (insert) / −1 (delete), so ``sum`` becomes
        ``sum(sign·col)`` and ``count`` becomes ``sum(sign)`` — the merge
        combine (`t + s`) then subtracts retractions exactly.  An
        UPDATE's delete+insert pair nets to the value delta; a row
        inserted and deleted within one window cancels to nothing."""
        sign = (
            F.when(F.col("_change_type") == "insert", F.lit(1))
            .otherwise(F.lit(-1))
        )
        is_ins = F.col("_change_type") == "insert"
        rows = delta.withColumn("__sign", sign)
        for k, expr in self.derived.items():
            rows = rows.withColumn(k, F.expr(expr))
        exprs = []
        for out, (fn, col) in self.aggs.items():
            if fn == "count":
                if col in ("*", None):
                    exprs.append(F.sum(F.col("__sign")).alias(out))
                else:
                    exprs.append(
                        F.sum(
                            F.when(F.col(col).isNotNull(), F.col("__sign"))
                            .otherwise(F.lit(0))
                        ).alias(out)
                    )
            elif fn in ("min", "max"):
                # insert-side candidate (folds via least/greatest) plus the
                # delete-side extreme — the endangerment witness the hybrid
                # recompute compares against the stored extremum
                agg = getattr(F, fn)
                exprs.append(agg(F.when(is_ins, F.col(col))).alias(out))
                exprs.append(
                    agg(F.when(~is_ins, F.col(col))).alias(f"__mv_del_{out}")
                )
            else:  # sum
                exprs.append(F.sum(F.col("__sign") * F.col(col)).alias(out))
        return rows.groupBy(*self.group_by).agg(*exprs)

    def _attach_recompute(self, part: DataFrame, rollup, head: int) -> DataFrame:
        """Hybrid IVM for min/max under retraction: flag groups whose
        delete-side extreme ties-or-beats the STORED extremum (or whose
        stored state is missing/NULL — a group created and partially
        deleted within the window), recompute JUST those groups' min/max
        from the source at the window head (group-pruned via a broadcast
        semi join), and substitute the recomputed values into the merge
        source.  Groups that vanished entirely recompute to NULL and are
        hidden by their ``__mv_n`` tombstone."""
        mm = list(self._minmax)
        state = rollup.to_df().select(
            *self.group_by,
            F.lit(True).alias("__mv_t_exists"),
            *[F.col(o).alias(f"__mv_t_{o}") for o in mm],
        )
        # no forced broadcast: `state` is ROLLUP-sized (every group), and
        # a left join can only broadcast its right side — forcing the
        # hint would ship the whole rollup to the driver and every
        # executor once it outgrows memory.  Spark broadcasts it on its
        # own while it's small and shuffle-joins beyond that (the
        # delete_by_keys lesson; r10 review finding).
        j = part.join(state, self.group_by, "left")
        flag = F.lit(False)
        for out in mm:
            fn, _c = self.aggs[out]
            dcol, tcol = F.col(f"__mv_del_{out}"), F.col(f"__mv_t_{out}")
            hit = dcol <= tcol if fn == "min" else dcol >= tcol
            flag = flag | (
                dcol.isNotNull()
                & (F.col("__mv_t_exists").isNull() | tcol.isNull() | hit)
            )
        j = j.withColumn("__mv_recompute", F.coalesce(flag, F.lit(False)))
        endangered = j.filter(F.col("__mv_recompute")).select(*self.group_by)
        rows = self.source.to_df(snapshot_id=head)
        for k, expr in self.derived.items():
            rows = rows.withColumn(k, F.expr(expr))
        recomputed = (
            rows.join(F.broadcast(endangered), self.group_by, "left_semi")
            .groupBy(*self.group_by)
            .agg(
                *[
                    getattr(F, self.aggs[o][0])(F.col(self.aggs[o][1])).alias(
                        f"__mv_rc_{o}"
                    )
                    for o in mm
                ]
            )
        )
        j = j.join(F.broadcast(recomputed), self.group_by, "left")
        out_cols = [F.col(k) for k in self.group_by]
        for out in self.aggs:
            if out in self._minmax:
                out_cols.append(
                    F.when(
                        F.col("__mv_recompute"), F.col(f"__mv_rc_{out}")
                    )
                    .otherwise(F.col(out))
                    .alias(out)
                )
            else:
                out_cols.append(F.col(out))
        return j.select(*out_cols, F.col("__mv_recompute"))

    def _rollup_table(self):
        if not self.catalog.table_exists(self.name):
            return None
        t = self.catalog.load_table(self.name)
        # the maintenance contract is persisted ON the rollup (r9 ADVICE):
        # reopening under a different mode or agg spec would corrupt the
        # state silently (unsigned folds into signed state, exposed
        # tombstones) — refuse instead.  Rollups created before the stamp
        # existed carry no properties and pass unchecked.
        stored_mode = t.properties.get("mv.mode")
        if stored_mode is not None and stored_mode != self.mode:
            raise InvalidDataError(
                f"materialized aggregate {self.name!r} was created with "
                f"mode={stored_mode!r}; reopening it with mode={self.mode!r} "
                "would corrupt its state — use the original mode or rebuild "
                "under a new name"
            )
        stored_spec = t.properties.get("mv.spec")
        if stored_spec is not None and stored_spec != self._spec_json():
            raise InvalidDataError(
                f"materialized aggregate {self.name!r} was created with a "
                "different group-by/aggregate spec; folding a mismatched "
                "spec would corrupt its state — rebuild under a new name "
                f"(stored: {stored_spec})"
            )
        return t

    def _watermark(self, rollup) -> Optional[int]:
        """Newest source snapshot folded in — read from the rollup's
        snapshot summaries (atomic with the merges that moved it)."""
        for s in reversed(rollup.snapshots):
            v = (s.summary or {}).get(_WATERMARK_KEY)
            if v is not None:
                return int(v)
        return None

    # -- public --------------------------------------------------------------
    def refresh(self, full: bool = False):
        """Fold source rows appended since the watermark into the rollup
        (ONE merge).  ``full=True`` recomputes from scratch (one overwrite
        commit) — required after the source was compacted/rewritten."""
        src = self.source.refresh()
        head = src.current_snapshot_id
        rollup = self._rollup_table()
        if rollup is None:
            schema = {}
            src_fields = {f.name: f.field_type.name for f in src.current_schema().fields}
            for k in self.group_by:
                if k in self.derived:
                    continue  # typed from the probe below
                if k not in src_fields:
                    raise InvalidDataError(f"group column {k!r} not in source")
                schema[k] = src_fields[k]
            probe = self._partial(src.to_df().limit(0))
            for f in probe.schema.fields:
                if f.name not in schema:
                    schema[f.name] = f.dataType.simpleString()
            # keep key-first column order whatever the probe returned
            ordered = {k: schema[k] for k in self.group_by}
            ordered.update({k: v for k, v in schema.items() if k not in ordered})
            rollup = self.catalog.create_table(
                self.name,
                schema=ordered,
                properties={"mv.mode": self.mode, "mv.spec": self._spec_json()},
            )
        since = None if full else self._watermark(rollup)
        if head is None or since == head:
            return rollup  # nothing new
        if full or since is None:
            state = self._partial(src.to_df())
            # watermark rides the overwrite commit — atomic with the state
            rollup.overwrite(state, summary_extra={_WATERMARK_KEY: str(head)})
            return rollup.refresh()
        if self.mode == "changelog":
            delta = src.changelog_scan(
                from_snapshot_id=since, to_snapshot_id=head
            )
            part = self._partial_signed(delta)
        else:
            delta = src.incremental_scan(
                from_snapshot_id=since, to_snapshot_id=head
            )
            part = self._partial(delta)
        # materialize the delta partial-aggregate ONCE: it is group-key ×
        # agg-state sized (delta-window groups, never the table), and an
        # unckeckpointed plan would re-run the whole incremental/changelog
        # scan + aggregation for the emptiness probe AND each of
        # merge_into's three source evaluations (dup check, hit-file
        # semi-join, rewrite) — 4 recomputations per refresh
        part = part.localCheckpoint()
        if part.isEmpty():
            # empty window (metadata-only source commits): leave the
            # watermark where it is — re-deriving the same empty window
            # next refresh folds nothing, so this is already idempotent
            return rollup
        hybrid = self.mode == "changelog" and bool(self._minmax)
        if hybrid:
            part = self._attach_recompute(part, rollup, head)
        update_exprs = {}
        for out, (fn, _c) in self.aggs.items():
            combine = _COMBINE[fn](out)
            if hybrid and out in self._minmax:
                # recomputed groups REPLACE the stored extremum (the
                # recompute already reflects the whole window at head);
                # everything else folds insert-side candidates as usual
                combine = (
                    f"CASE WHEN s.__mv_recompute THEN s.{out} "
                    f"ELSE {combine} END"
                )
            update_exprs[out] = combine
        rollup.merge_into(
            part,
            on=self.group_by,
            when_matched_update=update_exprs,
            when_not_matched_insert=True,
            summary_extra={_WATERMARK_KEY: str(head)},
        )
        return rollup.refresh()

    def to_df(self) -> DataFrame:
        rollup = self._rollup_table()
        if rollup is None:
            raise InvalidDataError(f"materialized aggregate {self.name!r} not yet refreshed")
        df = rollup.to_df()
        if self.mode == "changelog":
            # fully-retracted groups are zero-cardinality tombstones; the
            # reader filters them (a full refresh rebuilds without them)
            df = df.filter(F.col("__mv_n") > 0).drop("__mv_n")
        return df

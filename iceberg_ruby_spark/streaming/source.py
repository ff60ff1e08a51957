"""Structured Streaming SOURCE over an engine table — ``spark.readStream``
consumption of table appends (the streaming-read half of Iceberg's Spark
integration; the reference has no streaming surface at all, SURVEY.md §2
Tier C).

Built on PySpark 4's Python Data Source API: offsets are snapshot ids
checkpointed by Spark (exactly-once across restarts), each micro-batch is
the manifest DIFF between two snapshots (O(new files) planning, nothing
else opened — the same contract as ``Table.incremental_scan``), and each
newly-appended data FILE becomes one ``InputPartition`` read executor-side
with pyarrow.  At 100 TB the per-batch cost is proportional to the data
that arrived, never to table size, and file reads are distributed across
the cluster.

Usage::

    register_stream_source(spark)           # once per session
    df = (spark.readStream.format("iceberg_table")
          .option("location", table.ops.location)
          .load())

Window semantics follow incremental append consumption: append commits
emit their files' rows; merge-on-read DELETE commits add no data files and
are passed over silently; any commit that REWRITES files (copy-on-write
delete/update, compaction) would misreport rewrites as appends, so the
reader raises unless ``skip_rewrite_commits=true`` is set (then the whole
commit's file churn is skipped: new files introduced by the rewrite are
NOT emitted, matching Iceberg's streaming ``skip-overwrite-snapshots``)."""

from __future__ import annotations

import os
from typing import Any, Iterator, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_MOR_DELETE_MODES = {
    "merge-on-read",
    "merge-on-read-positional",
    "merge-on-read-equality",
    "merge-on-read-dv",
}


def _ops(location: str):
    from iceberg_ruby_spark.table import FsTableOps

    return FsTableOps(location)


def _current_schema(meta):
    for sch in meta.schemas:
        if sch.schema_id == meta.current_schema_id:
            return sch
    return meta.schemas[0]


def _entry_paths(entries: list[dict[str, Any]]) -> list[str]:
    return [e["path"] for e in entries if "path" in e]


class _FileSlice(InputPartition):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns


class EngineTableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.location = options.get("location") or options.get("path")
        if not self.location:
            raise ValueError("iceberg_table stream source requires option 'location'")
        self.skip_rewrites = (
            str(options.get("skip_rewrite_commits", "false")).lower() == "true"
        )
        start = options.get("starting_snapshot_id")
        self._starting = int(start) if start is not None else None
        meta = _ops(self.location).load()
        self._columns = [f.name for f in _current_schema(meta).fields]

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        # None = from table creation (consume all existing data first);
        # starting_snapshot_id = start AFTER that snapshot
        return {"snapshot_id": self._starting}

    def latestOffset(self) -> dict:
        meta = _ops(self.location).load()
        return {"snapshot_id": meta.current_snapshot_id}

    # -- planning ---------------------------------------------------------
    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        start_id, end_id = start.get("snapshot_id"), end.get("snapshot_id")
        if end_id is None or start_id == end_id:
            return []
        ops = _ops(self.location)
        meta = ops.load()
        by_id = {s.snapshot_id: s for s in meta.snapshots}
        end_snap = by_id.get(end_id)
        if end_snap is None:
            raise ValueError(f"offset snapshot {end_id} no longer exists")
        # walk end → start validating every commit in the window
        cur = end_snap
        while cur is not None and cur.snapshot_id != start_id:
            safe = cur.operation == "append" or (
                cur.operation == "delete"
                and cur.summary.get("mode") in _MOR_DELETE_MODES
            )
            if not safe and not self.skip_rewrites:
                raise ValueError(
                    f"streaming read crossed a {cur.operation!r} commit "
                    f"({cur.snapshot_id}); rewrites cannot be consumed as "
                    "appends — set skip_rewrite_commits=true to pass over "
                    "them"
                )
            parent = cur.parent_snapshot_id
            cur = by_id.get(parent) if parent is not None else None
        if start_id is not None and cur is None:
            raise ValueError(
                f"offset snapshot {start_id} is not an ancestor of {end_id}"
            )
        if cur is not None and not self.skip_rewrites:
            # fast-append structural delta: micro-batch planning opens only
            # the manifests ADDED in the window — O(new files), independent
            # of table history (the 100 TB tail-read property).  None ⇒ a
            # replace commit or segment merge inside the window; fall back
            # to the full set diff below.
            delta = ops.read_manifest_delta(
                end_snap.manifest_list, cur.manifest_list
            )
            if delta is not None:
                return [
                    _FileSlice(p, self._columns)
                    for p in sorted(_entry_paths(delta))
                ]
        base_paths: set[str] = set()
        if cur is not None:
            base_paths = set(_entry_paths(ops.read_manifest(cur.manifest_list)))
        if self.skip_rewrites:
            # exclude file churn introduced by any rewrite commit in the
            # window: only files appended by clean append commits emit
            rewritten: set[str] = set()
            walk = end_snap
            while walk is not None and walk.snapshot_id != start_id:
                safe = walk.operation == "append" or (
                    walk.operation == "delete"
                    and walk.summary.get("mode") in _MOR_DELETE_MODES
                )
                if not safe:
                    rewritten |= set(
                        _entry_paths(ops.read_manifest(walk.manifest_list))
                    )
                parent = walk.parent_snapshot_id
                walk = by_id.get(parent) if parent is not None else None
            base_paths |= rewritten
        new = [
            p
            for p in _entry_paths(ops.read_manifest(end_snap.manifest_list))
            if p not in base_paths
        ]
        return [_FileSlice(p, self._columns) for p in sorted(new)]

    # -- execution (runs in executor python workers) ----------------------
    def read(self, partition: InputPartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        cols = []
        n = tbl.num_rows
        for name in partition.columns:
            if name in tbl.column_names:
                cols.append(tbl.column(name).to_pylist())
            else:  # schema evolved since the file was written
                cols.append([None] * n)
        return iter(zip(*cols)) if n else iter([])

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing engine-side


class EngineTableStreamDataSource(DataSource):
    """``spark.readStream.format("iceberg_table")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_table"

    def schema(self):
        location = self.options.get("location") or self.options.get("path")
        meta = _ops(location).load()
        return _current_schema(meta).to_spark()

    def streamReader(self, schema) -> EngineTableStreamReader:
        return EngineTableStreamReader(dict(self.options))


def register_stream_source(spark) -> None:
    """Register the ``iceberg_table`` streaming format on a session."""
    spark.dataSource.register(EngineTableStreamDataSource)

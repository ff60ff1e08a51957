"""Structured Streaming surface for the events table (SURVEY.md §2 Tier C /
§7.7 — the reference is batch-only; `events` is its stream-shaped table).

Patterns provided: bounded replay of the events parquet as a stream
(``availableNow`` trigger), event-time tumbling windows with watermarks,
session windows, and ``dropDuplicatesWithinWatermark``.  At scale the same
plans run unmodified against an unbounded source (Kafka / file arrival) —
the trigger is the only difference.
"""

from iceberg_ruby_spark.streaming.events import (
    dedup_events_stream,
    read_events_stream,
    run_to_memory_table,
    session_windows,
    stream_to_table,
    stream_upsert_to_table,
    user_activity_stateful,
    windowed_counts,
)
from iceberg_ruby_spark.streaming.dedup import stream_dedup_ingest
from iceberg_ruby_spark.streaming.cdc import (
    stream_changelog_apply,
    stream_changelog_scd2,
)

from iceberg_ruby_spark.streaming.source import (
    EngineTableStreamDataSource,
    register_stream_source,
)

__all__ = [
    "stream_dedup_ingest",
    "stream_changelog_apply",
    "stream_changelog_scd2",
    "EngineTableStreamDataSource",
    "register_stream_source",
    "read_events_stream",
    "windowed_counts",
    "session_windows",
    "dedup_events_stream",
    "run_to_memory_table",
    "stream_to_table",
    "stream_upsert_to_table",
    "user_activity_stateful",
]

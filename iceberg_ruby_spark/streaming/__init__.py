"""Structured Streaming surface for the events table (SURVEY.md §2 Tier C /
§7.7 — the reference is batch-only; `events` is its stream-shaped table).

Patterns provided: bounded replay of the events parquet as a stream
(``availableNow`` trigger), event-time tumbling windows with watermarks,
session windows, and ``dropDuplicatesWithinWatermark``.  At scale the same
plans run unmodified against an unbounded source (Kafka / file arrival) —
the trigger is the only difference.

Exports resolve lazily (PEP 562, see ``iceberg_ruby_spark._lazy``): the
streaming source/sink runner forks import this package on unpickle and
should not pay for the sibling modules they never call.
"""

from iceberg_ruby_spark._lazy import lazy_attrs as _lazy_attrs

_LAZY = {
    "dedup_events_stream": "iceberg_ruby_spark.streaming.events",
    "read_events_stream": "iceberg_ruby_spark.streaming.events",
    "run_to_memory_table": "iceberg_ruby_spark.streaming.events",
    "session_windows": "iceberg_ruby_spark.streaming.events",
    "stream_to_table": "iceberg_ruby_spark.streaming.events",
    "stream_upsert_to_table": "iceberg_ruby_spark.streaming.events",
    "user_activity_stateful": "iceberg_ruby_spark.streaming.events",
    "windowed_counts": "iceberg_ruby_spark.streaming.events",
    "stream_dedup_ingest": "iceberg_ruby_spark.streaming.dedup",
    "stream_changelog_apply": "iceberg_ruby_spark.streaming.cdc",
    "stream_changelog_scd2": "iceberg_ruby_spark.streaming.cdc",
    "EngineTableStreamDataSource": "iceberg_ruby_spark.streaming.source",
    "register_stream_source": "iceberg_ruby_spark.streaming.source",
}

__getattr__, __dir__ = _lazy_attrs(__name__, _LAZY)

__all__ = list(_LAZY)

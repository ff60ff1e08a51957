"""Streaming ingestion into catalog tables (foreachBatch sink with
exactly-once batch-id tracking)."""

import pyspark.sql.functions as F


def test_stream_to_table_ingests_events(catalog, spark, tmp_path):
    from iceberg_ruby_spark.streaming import read_events_stream, stream_to_table

    sf_dir = "/root/testdata/sf0.001"
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = batch.count()

    t = catalog.create_table(
        "events_ingest",
        schema={
            "event_id": "long",
            "ts": "timestamp",
            "user_id": "long",
            "event_type": "string",
            "value": "double",
        },
    )
    stream = read_events_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    q = stream_to_table(stream, t, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()
    t = t.refresh()
    assert len(t.to_a()) == expected
    # commit carries the streaming batch id
    assert any(
        s.summary.get("streaming-batch-id") is not None for s in t.snapshots
    )


def test_stream_to_table_skips_replayed_batch(catalog, spark, tmp_path):
    from iceberg_ruby_spark.streaming import read_events_stream, stream_to_table

    sf_dir = "/root/testdata/sf0.001"
    t = catalog.create_table(
        "events_replay",
        schema={
            "event_id": "long",
            "ts": "timestamp",
            "user_id": "long",
            "event_type": "string",
            "value": "double",
        },
    )
    # same checkpoint run twice: second run sees no new files AND any
    # replayed epoch is skipped by the batch-id guard
    for _ in range(2):
        stream = read_events_stream(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        q = stream_to_table(stream, t, checkpoint_dir=str(tmp_path / "ck2"))
        q.awaitTermination()
    t = t.refresh()
    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(t.to_a()) == expected

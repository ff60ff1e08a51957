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


def test_stream_upsert_to_table(catalog, spark, tmp_path):
    """CDC upsert sink: per-batch merge-on-read MERGE — keyed rows update
    in place, new keys insert, and in-batch duplicate keys collapse to the
    last occurrence."""
    import os

    from iceberg_ruby_spark.streaming import stream_upsert_to_table

    t = catalog.create_table("ups", schema={"k": "long", "v": "string"})
    t.append([{"k": 1, "v": "old1"}, {"k": 2, "v": "old2"}])

    src_dir = tmp_path / "cdc"
    os.makedirs(src_dir)
    spark.createDataFrame(
        [(1, "mid1"), (1, "new1"), (3, "new3")], "k long, v string"
    ).coalesce(1).write.parquet(str(src_dir / "batch1"))
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "batch1"))
    )
    q = stream_upsert_to_table(stream, t, on="k", checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination()
    t = t.refresh()
    rows = {r["k"]: r["v"] for r in t.to_a()}
    assert rows == {1: "new1", 2: "old2", 3: "new3"}
    # upsert wrote an equality delete, not a rewrite
    assert any(
        e.get("content") == "equality-deletes" for e in t._current_entries()
    )
    # replay with the same checkpoint is a no-op
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "batch1"))
    )
    q = stream_upsert_to_table(stream, t, on="k", checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination()
    t = t.refresh()
    assert {r["k"]: r["v"] for r in t.to_a()} == {1: "new1", 2: "old2", 3: "new3"}

"""Structured Streaming SOURCE over engine tables (Python Data Source
API): snapshot-offset micro-batches, checkpoint restart, rewrite guard."""

import pytest


def _rows(reader, parts):
    """Flatten a reader's RecordBatch emission back to row tuples — the
    executor boundary is Arrow-batched (r11), tests assert on rows."""
    import pyarrow as pa

    out = []
    for p in parts:
        for b in reader.read(p):
            assert isinstance(b, pa.RecordBatch), type(b)
            cols = [b.column(i).to_pylist() for i in range(b.num_columns)]
            out += list(zip(*cols))
    return out


def _start(spark, t, name, tmp_path=None, **opts):
    from iceberg_ruby_spark.streaming import register_stream_source

    register_stream_source(spark)
    reader = spark.readStream.format("iceberg_table").option(
        "location", t.ops.location
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    w = reader.load().writeStream.format("memory").queryName(name).trigger(
        processingTime="0 seconds"
    )
    if tmp_path is not None:
        w = w.option("checkpointLocation", str(tmp_path))
    return w.start()


def test_stream_source_tails_appends(catalog, spark):
    t = catalog.create_table("src1", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    q = _start(spark, t, "src1_sink")
    try:
        q.processAllAvailable()
        got = lambda: sorted(
            tuple(r) for r in spark.sql("SELECT * FROM src1_sink").collect()
        )
        assert got() == [(1, "a"), (2, "b")]
        t.append([{"k": 3, "v": "c"}])
        q.processAllAvailable()
        assert got() == [(1, "a"), (2, "b"), (3, "c")]
        # MoR deletes add no data files: passed over silently
        t.delete_where("k = 1", mode="merge-on-read")
        t.append([{"k": 4, "v": "d"}])
        q.processAllAvailable()
        assert got() == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
        assert q.exception() is None
    finally:
        q.stop()


def test_stream_source_checkpoint_restart_exactly_once(catalog, spark, tmp_path):
    from iceberg_ruby_spark.streaming import register_stream_source

    t = catalog.create_table("src2", schema={"k": "int"})
    t.append([{"k": 1}])
    register_stream_source(spark)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("iceberg_table")
            .option("location", t.ops.location)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == [1]
    # rows arriving while the stream is DOWN are picked up on restart,
    # and already-consumed rows are NOT re-emitted (offset = snapshot id
    # in the checkpoint)
    t.append([{"k": 2}])
    run()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == [1, 2]


def test_stream_source_rewrite_guard(catalog, spark):
    t = catalog.create_table("src3", schema={"k": "int"})
    t.append([{"k": 1}])
    q = _start(spark, t, "src3_sink")
    try:
        q.processAllAvailable()
        t.delete_where("k = 1")  # copy-on-write rewrite
        t.append([{"k": 2}])
        with pytest.raises(Exception, match="rewrite|StreamingQuery"):
            q.processAllAvailable()
            if q.exception() is not None:
                raise q.exception()
    finally:
        q.stop()
    # with the skip option the rewrite's churn is passed over and only the
    # clean append after it emits
    q = _start(spark, t, "src3_skip", skip_rewrite_commits="true")
    try:
        q.processAllAvailable()
        rows = sorted(r[0] for r in spark.sql("SELECT * FROM src3_skip").collect())
        assert rows == [2]
        assert q.exception() is None
    finally:
        q.stop()


def test_stream_table_to_table_pipeline(catalog, spark, tmp_path):
    """Source + sink compose into a table→table streaming pipeline
    (bronze appends flow into a transformed silver table, exactly-once
    on both ends)."""
    import pyspark.sql.functions as F

    from iceberg_ruby_spark.streaming import register_stream_source, stream_to_table

    bronze = catalog.create_table("bronze", schema={"k": "int", "v": "string"})
    silver = catalog.create_table("silver", schema={"k": "int", "vlen": "int"})
    bronze.append([{"k": 1, "v": "aa"}, {"k": 2, "v": "bbb"}])
    register_stream_source(spark)

    def run():
        stream = (
            spark.readStream.format("iceberg_table")
            .option("location", bronze.ops.location)
            .load()
            .select("k", F.length("v").cast("int").alias("vlen"))
        )
        q = stream_to_table(
            stream,
            silver,
            checkpoint_dir=str(tmp_path / "ckpt"),
            trigger_available_now=False,
        )
        q.processAllAvailable()
        q.stop()

    run()
    assert sorted((r["k"], r["vlen"]) for r in silver.refresh().to_a()) == [
        (1, 2), (2, 3)
    ]
    bronze.append([{"k": 3, "v": "c"}])
    run()
    assert sorted((r["k"], r["vlen"]) for r in silver.refresh().to_a()) == [
        (1, 2), (2, 3), (3, 1)
    ]


def test_max_files_per_trigger_offset_walk(catalog):
    """Admission control at the reader level: a simulated micro-batch loop
    (latestOffset → partitions → commit) must emit every file exactly once
    in ≤N-file batches, with canonical offsets (no pos=0 / pos=len)."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("srcmf", schema={"k": "int", "v": "string"})
    # commits of 3, 1, 7, 2 rows → one file per row locally isn't
    # guaranteed; use per-commit file counts from the reader itself
    for rows in ([3, 1, 7, 2]):
        t.append([{"k": i, "v": "x"} for i in range(rows)])
    reader = EngineTableStreamReader(
        {"location": t.ops.location, "max_files_per_trigger": "5"}
    )
    off = reader.initialOffset()
    seen: list[str] = []
    batches = 0
    while True:
        new = reader.latestOffset()
        if new == off:
            break
        parts = reader.partitions(off, new)
        assert 0 < len(parts) <= 5
        if "pos" in new:
            assert new["pos"] > 0
        seen += [p.path for p in parts]
        off = new
        batches += 1
        assert batches < 50
    full = EngineTableStreamReader({"location": t.ops.location})
    all_parts = full.partitions(
        {"snapshot_id": None}, {"snapshot_id": t.current_snapshot().snapshot_id}
    )
    assert sorted(seen) == sorted(p.path for p in all_parts)
    assert len(seen) == len(set(seen)), "a file was emitted twice"
    assert batches >= 2


def test_max_files_per_trigger_restart_resyncs(catalog):
    """After a 'restart' (fresh reader), the replayed batch's end offset
    re-seeds the admission bracket via partitions()."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("srcmf2", schema={"k": "int"})
    t.append([{"k": i} for i in range(6)])
    r1 = EngineTableStreamReader(
        {"location": t.ops.location, "max_files_per_trigger": "2"}
    )
    off0 = r1.initialOffset()
    off1 = r1.latestOffset()
    batch1 = [p.path for p in r1.partitions(off0, off1)]
    # restart: a fresh reader replays (off0, off1) from the checkpoint
    r2 = EngineTableStreamReader(
        {"location": t.ops.location, "max_files_per_trigger": "2"}
    )
    replay = [p.path for p in r2.partitions(off0, off1)]
    assert replay == batch1
    off2 = r2.latestOffset()
    batch2 = [p.path for p in r2.partitions(off1, off2)]
    assert len(batch2) <= 2
    assert not set(batch1) & set(batch2), "replayed bracket not re-synced"


def test_max_files_per_trigger_end_to_end(catalog, spark):
    t = catalog.create_table("srcmf3", schema={"k": "int", "v": "string"})
    t.append([{"k": i, "v": "a"} for i in range(8)])
    q = _start(spark, t, "srcmf3_sink", max_files_per_trigger="1")
    try:
        q.processAllAvailable()
        rows = sorted(
            r["k"] for r in spark.sql("SELECT * FROM srcmf3_sink").collect()
        )
        assert rows == list(range(8))
        assert q.lastProgress["batchId"] >= 2, "bounding produced one batch"
        assert q.exception() is None
    finally:
        q.stop()


def test_stream_source_follows_branch(catalog, spark, tmp_path):
    """option('ref', branch): the source tails the BRANCH head — staged
    WAP appends stream before they're published to main."""
    import pyspark.sql.functions as F

    from iceberg_ruby_spark.streaming import register_stream_source

    t = catalog.create_table("br_src", schema={"k": "int"})
    t.append([{"k": 1}])
    t.create_branch("audit")
    t.append([{"k": 2}], branch="audit")  # main does NOT see this
    register_stream_source(spark)
    got = []

    def run(ref):
        q = (
            spark.readStream.format("iceberg_table")
            .option("location", t.ops.location)
            .option("ref", ref)
            .load()
            .writeStream.format("memory")
            .queryName(f"brq_{ref}")
            .option("checkpointLocation", str(tmp_path / f"ck_{ref}"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return sorted(
            r["k"] for r in spark.sql(f"SELECT * FROM brq_{ref}").collect()
        )

    assert run("audit") == [1, 2]
    assert run("main") == [1]


def test_max_files_per_trigger_clean_restart(catalog):
    """Clean restart (all batches committed): Spark calls latestOffset()
    on the fresh reader BEFORE any partitions() call, so the bracket
    re-bases from starting_snapshot_id and can land BEHIND the
    checkpointed start.  partitions(checkpointed_start, stale_end) must
    not wedge the query ('not an ancestor'): it emits an empty batch,
    re-seeds from the committed start, and the floor prevents the next
    window from replaying consumed files (ADVICE r7 medium)."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("srcmf4", schema={"k": "int"})
    for i in range(6):
        t.append([{"k": i}])
    r1 = EngineTableStreamReader(
        {"location": t.ops.location, "max_files_per_trigger": "2"}
    )
    off0 = r1.initialOffset()
    off1 = r1.latestOffset()
    batch1 = [p.path for p in r1.partitions(off0, off1)]
    off2 = r1.latestOffset()
    batch2 = [p.path for p in r1.partitions(off1, off2)]
    consumed = set(batch1) | set(batch2)
    # batches fully committed; clean restart ⇒ fresh reader, latestOffset
    # first — it returns a bracket BEHIND the checkpointed start off2
    r2 = EngineTableStreamReader(
        {"location": t.ops.location, "max_files_per_trigger": "2"}
    )
    stale = r2.latestOffset()
    assert stale == off1  # two files past table creation = first bracket
    # Spark plans (checkpointed_start=off2, stale): must NOT raise
    assert r2.partitions(off2, stale) == []
    # next window: Spark's start is the stale end; the floor clamps it
    nxt = r2.latestOffset()
    batch3 = [p.path for p in r2.partitions(stale, nxt)]
    assert not consumed & set(batch3), "restart replayed committed files"
    assert len(batch3) <= 2
    # drain the remainder and verify exactly-once coverage of all 6 files
    seen = consumed | set(batch3)
    prev = nxt
    for _ in range(10):
        cur = r2.latestOffset()
        if cur == prev:
            break
        batch = [p.path for p in r2.partitions(prev, cur)]
        assert not seen & set(batch)
        seen |= set(batch)
        prev = cur
    assert len(seen) == 6


def test_stream_source_reads_orc_imports(catalog, spark, tmp_path):
    """add_files(format='orc') commits ORC files as ordinary append
    entries; the executor-side read must dispatch on extension instead of
    failing with an opaque parquet error (ADVICE r7 low)."""
    import glob

    ext = str(tmp_path / "orcstream")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(4)], "k int, v string"
    ).coalesce(1).write.orc(ext)
    files = sorted(glob.glob(f"{ext}/*.orc"))
    t = catalog.create_table("srcorc", schema={"k": "int", "v": "string"})
    t.append([{"k": 100, "v": "parquet-row"}])
    assert t.add_files(files, format="orc") == 1
    q = _start(spark, t, "srcorc_sink")
    try:
        q.processAllAvailable()
        rows = sorted(
            r["k"] for r in spark.sql("SELECT * FROM srcorc_sink").collect()
        )
        assert rows == [0, 1, 2, 3, 100]
        assert q.exception() is None
    finally:
        q.stop()


def _changelog_events(spark, t, name):
    from iceberg_ruby_spark.streaming import register_stream_source

    register_stream_source(spark)
    q = (
        spark.readStream.format("iceberg_table")
        .option("location", t.ops.location)
        .option("mode", "changelog")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    return sorted(
        (r["k"], r["v"], r["_change_type"], r["_change_ordinal"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    )


def test_changelog_stream_events(catalog, spark):
    """mode=changelog emits inserts per append and full-content delete
    rows for merge-on-read equality deletes, at per-commit ordinals;
    compaction (replace) emits nothing."""
    t = catalog.create_table("clsrc", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    t.append([{"k": 3, "v": "c"}])
    t.delete_by_keys([{"k": 2}], "k")
    ev = _changelog_events(spark, t, "clsrc_sink")
    assert ev == [
        (1, "a", "insert", 0),
        (2, "b", "delete", 2),
        (2, "b", "insert", 0),
        (3, "c", "insert", 1),
    ]
    # a pure rewrite emits nothing: compact + one more append → only the
    # append's insert arrives
    t.compact()
    t.append([{"k": 4, "v": "d"}])
    ev2 = _changelog_events(spark, t, "clsrc_sink2")
    # fresh stream replays everything; compaction contributed zero events
    kinds = [(k, ty) for k, _v, ty, _o in ev2]
    assert kinds.count((4, "insert")) == 1
    assert len(ev2) == len(ev) + 1


def test_changelog_stream_prior_delete_masking(catalog, spark):
    """A row already dead under an earlier equality delete is NOT
    re-emitted when a later delete matches it again."""
    t = catalog.create_table("clmask", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 3, "v": "c"}])
    t.delete_by_keys([{"k": 2}], "k")
    t.delete_by_keys([{"k": 2}, {"k": 3}], "k")  # 2 is already dead
    ev = _changelog_events(spark, t, "clmask_sink")
    deletes = [(k, o) for k, _v, ty, o in ev if ty == "delete"]
    assert deletes == [(2, 1), (3, 2)]


def test_changelog_stream_mode_validation(catalog, spark):
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("clref", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": "a"}])
    with pytest.raises(ValueError, match="expected 'append' or 'changelog'"):
        EngineTableStreamReader({"location": t.ops.location, "mode": "bogus"})


def test_changelog_stream_cow_and_predicate_fallback(catalog, spark):
    """CoW rewrites, predicate deletes, and prior-predicate masking
    stream through mode=changelog via the per-commit content-diff
    fallback (r9) — correct events, no refusal.  A CoW UPDATE emits
    delete+insert for the touched row and NOTHING for rows the rewrite
    merely copied."""
    t = catalog.create_table("clcow", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 3, "v": "c"}])
    t.update_where({"v": "'B'"}, "k = 2")             # CoW UPDATE rewrite
    t.delete_where("k = 3", mode="merge-on-read")     # predicate delete
    t.delete_where("k = 1")                           # CoW DELETE rewrite
    ev = _changelog_events(spark, t, "clcow_sink")
    assert ev == [
        (1, "a", "delete", 3),
        (1, "a", "insert", 0),
        (2, "B", "insert", 1),
        (2, "b", "delete", 1),
        (2, "b", "insert", 0),
        (3, "c", "delete", 2),
        (3, "c", "insert", 0),
    ]
    # prior-predicate masking: an equality delete AFTER the predicate
    # delete must not re-emit rows the predicate already killed — the
    # commit routes through the content diff and emits only newly-dead
    t2 = catalog.create_table("clprior", schema={"k": "int", "v": "string"})
    t2.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 3, "v": "c"}])
    t2.delete_where("k = 2", mode="merge-on-read")    # predicate delete
    t2.delete_by_keys([{"k": 2}, {"k": 3}], "k")      # 2 already dead
    ev2 = _changelog_events(spark, t2, "clprior_sink")
    deletes = sorted((k, o) for k, _v, ty, o in ev2 if ty == "delete")
    assert deletes == [(2, 1), (3, 2)]


def test_changelog_stream_apply_replication(catalog, spark, tmp_path):
    """stream_changelog_apply keeps a replica ≡ source across mutation
    waves, restart-safe (same checkpoint, including a no-new-data run)."""
    from iceberg_ruby_spark.streaming import stream_changelog_apply

    src = catalog.create_table("clrep_src", schema={"k": "int", "v": "string"})
    rep = catalog.create_table("clrep_dst", schema={"k": "int", "v": "string"})
    ckpt = str(tmp_path / "ckpt")

    def sync():
        q = stream_changelog_apply(spark, src.refresh(), rep, "k", ckpt)
        q.awaitTermination()

    def state(t):
        return sorted((r["k"], r["v"]) for r in t.refresh().to_a())

    src.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    src.append([{"k": 3, "v": "c"}])
    src.delete_by_keys([{"k": 2}], "k")
    sync()
    assert state(rep) == state(src) == [(1, "a"), (3, "c")]
    # update = CDC delete+insert; plus a fresh append
    src.delete_by_keys([{"k": 1}], "k")
    src.append([{"k": 1, "v": "a2"}, {"k": 4, "v": "d"}])
    sync()
    assert state(rep) == state(src) == [(1, "a2"), (3, "c"), (4, "d")]
    # restart with no new data: idempotent, replica unchanged
    sync()
    assert state(rep) == [(1, "a2"), (3, "c"), (4, "d")]


def test_changelog_stream_reissued_predicate_delete(catalog, spark):
    """A byte-identical predicate re-issued in a later commit is a NEW
    delete (its applies-to scope covers the newer files) — the old
    text-only _del_id made the second commit stream ZERO events while
    the batch changelog_scan emitted them (r9 review finding #1)."""
    t = catalog.create_table("clre", schema={"k": "int", "v": "int"})
    t.append([{"k": 1, "v": 1}, {"k": 2, "v": 9}])
    t.delete_where("v > 5", mode="merge-on-read")      # kills k=2
    t.append([{"k": 3, "v": 3}, {"k": 4, "v": 9}])
    t.delete_where("v > 5", mode="merge-on-read")      # same text: kills k=4
    ev = _changelog_events(spark, t, "clre_sink")
    deletes = sorted((k, o) for k, _v, ty, o in ev if ty == "delete")
    assert deletes == [(2, 1), (4, 3)]
    inserts = sorted((k, o) for k, _v, ty, o in ev if ty == "insert")
    assert inserts == [(1, 0), (2, 0), (3, 2), (4, 2)]


def test_changelog_stream_cow_replication_converges(catalog, spark, tmp_path):
    """Continuous CDC replication over a source mutated with CoW
    rewrites AND predicate deletes: the replica converges to the source
    through the content-diff fallback, restart-safe on one checkpoint."""
    from iceberg_ruby_spark.streaming import stream_changelog_apply

    src = catalog.create_table("clcowrep_src", schema={"k": "int", "v": "string"})
    rep = catalog.create_table("clcowrep_dst", schema={"k": "int", "v": "string"})
    ckpt = str(tmp_path / "ckpt")

    def sync():
        q = stream_changelog_apply(spark, src.refresh(), rep, "k", ckpt)
        q.awaitTermination()

    def state(t):
        return sorted((r["k"], r["v"]) for r in t.refresh().to_a())

    src.append([{"k": i, "v": f"v{i}"} for i in range(1, 5)])
    src.update_where({"v": "'V2'"}, "k = 2")              # CoW UPDATE
    sync()
    assert state(rep) == state(src) == [
        (1, "v1"), (2, "V2"), (3, "v3"), (4, "v4"),
    ]
    src.delete_where("k = 3", mode="merge-on-read")       # predicate delete
    src.delete_where("k = 1")                             # CoW DELETE
    src.append([{"k": 5, "v": "v5"}])
    sync()
    assert state(rep) == state(src) == [(2, "V2"), (4, "v4"), (5, "v5")]
    # restart with no new data: idempotent
    sync()
    assert state(rep) == [(2, "V2"), (4, "v4"), (5, "v5")]


def test_changelog_stream_apply_bounded_waves(catalog, spark, tmp_path):
    """Replication with admission budgets (r9): max_rows_per_trigger
    forwards to the source's commit-granular changelog admission, so the
    backlog drains as SEVERAL right-sized micro-batches — each one
    apply-merge on the replica — and converges to the same state as an
    unbounded drain."""
    from iceberg_ruby_spark.streaming import stream_changelog_apply

    src = catalog.create_table("clbw_src", schema={"k": "int", "v": "string"})
    rep = catalog.create_table("clbw_dst", schema={"k": "int", "v": "string"})
    for i in range(4):  # 4 append commits of 5 rows each
        src.append([{"k": 10 * i + j, "v": f"v{10 * i + j}"} for j in range(5)])
    src.delete_by_keys([{"k": 0}, {"k": 10}], "k")
    q = stream_changelog_apply(
        spark, src, rep, "k", str(tmp_path / "ck"),
        max_rows_per_trigger=5,   # one source commit per batch
    )
    q.awaitTermination()
    want = sorted((r["k"], r["v"]) for r in src.to_a())
    got = sorted((r["k"], r["v"]) for r in rep.refresh().to_a())
    assert got == want and len(got) == 18
    # several apply commits, not one giant batch: each non-empty batch
    # lands >= 1 replica commit; 5 source commits -> > 2 replica commits
    assert len(rep.refresh().snapshots) > 2


def test_changelog_stream_mor_update_dv(catalog, spark):
    """A merge-on-read UPDATE commit (new data files + deletion vectors,
    ONE commit) streams as delete(old row) + insert(new row); a later DV
    REPLACEMENT on the same file emits only the newly-dead positions."""
    t = catalog.create_table(
        "cldv", schema={"k": "int", "v": "string"},
        properties={"write.update.mode": "merge-on-read-dv",
                    "write.delete.mode": "merge-on-read-dv"},
    )
    t.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 3, "v": "c"}])
    t.update_where({"v": "'B'"}, "k = 2")        # DV + new file, one commit
    t.delete_where("k = 3", mode="merge-on-read-dv")  # DV replacement path
    ev = _changelog_events(spark, t, "cldv_sink")
    deletes = sorted((k, v, o) for k, v, ty, o in ev if ty == "delete")
    inserts = sorted((k, v, o) for k, v, ty, o in ev if ty == "insert")
    assert deletes == [(2, "b", 1), (3, "c", 2)]
    assert (2, "B", 1) in inserts
    assert [(k, o) for k, _v, o in inserts if o == 0] == [(1, 0), (2, 0), (3, 0)]


def test_changelog_stream_mor_positional(catalog, spark):
    """Positional-delete (v2) merge-on-read commits stream their
    coordinates as delete events, masked against prior positional
    deletes on the same file."""
    t = catalog.create_table(
        "clpos", schema={"k": "int", "v": "string"},
        properties={
            "format-version": "2",
            "write.delete.mode": "merge-on-read-positional",
        },
    )
    t.append([{"k": i, "v": f"x{i}"} for i in range(6)])
    t.delete_where("k = 1", mode="merge-on-read-positional")
    t.delete_where("k <= 2", mode="merge-on-read-positional")  # k=1 already dead
    ev = _changelog_events(spark, t, "clpos_sink")
    deletes = sorted((k, o) for k, _v, ty, o in ev if ty == "delete")
    assert deletes == [(0, 2), (1, 1), (2, 2)]
    # replica replication over the positional feed converges
    from iceberg_ruby_spark.streaming import stream_changelog_apply
    import tempfile

    rep = catalog.create_table("clpos_rep", schema={"k": "int", "v": "string"})
    q = stream_changelog_apply(spark, t, rep, "k", tempfile.mkdtemp())
    q.awaitTermination()
    assert sorted(r["k"] for r in rep.refresh().to_a()) == [3, 4, 5]


def _file_rows(paths):
    import pyarrow.parquet as pq

    return {p: pq.ParquetFile(p).metadata.num_rows for p in paths}


def test_max_rows_per_trigger_offset_walk(catalog):
    """Rows-budget admission: every batch's manifest-weighted row total
    stays within the budget (except a first-file-oversized batch), every
    file is emitted exactly once, and offsets stay canonical."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("srcmr", schema={"k": "int", "v": "string"})
    for rows in (3, 1, 7, 2):
        t.append([{"k": i, "v": "x"} for i in range(rows)])
    reader = EngineTableStreamReader(
        {"location": t.ops.location, "max_rows_per_trigger": "4"}
    )
    full = EngineTableStreamReader({"location": t.ops.location})
    all_parts = full.partitions(
        {"snapshot_id": None}, {"snapshot_id": t.current_snapshot().snapshot_id}
    )
    rows_by_file = _file_rows([p.path for p in all_parts])
    off = reader.initialOffset()
    seen: list[str] = []
    batches = 0
    while True:
        new = reader.latestOffset()
        if new == off:
            break
        parts = reader.partitions(off, new)
        assert parts, "bounded walk emitted an empty non-terminal batch"
        total = sum(rows_by_file[p.path] for p in parts)
        # within budget, or a single oversized file admitted for progress
        assert total <= 4 or len(parts) == 1, (total, len(parts))
        if "pos" in new:
            assert new["pos"] > 0
        seen += [p.path for p in parts]
        off = new
        batches += 1
        assert batches < 50
    assert sorted(seen) == sorted(p.path for p in all_parts)
    assert len(seen) == len(set(seen)), "a file was emitted twice"
    assert batches >= 3  # 13 rows / 4-row budget can't fit in 2 batches


def test_max_bytes_per_trigger_one_file_batches(catalog):
    """A bytes budget smaller than any file degenerates to one file per
    batch via the first-file progress guarantee — the stream never
    stalls on an oversized file."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("srcmb", schema={"k": "int"})
    for i in range(3):
        t.append([{"k": i}])
    reader = EngineTableStreamReader(
        {"location": t.ops.location, "max_bytes_per_trigger": "1"}
    )
    off = reader.initialOffset()
    sizes = []
    for _ in range(10):
        new = reader.latestOffset()
        if new == off:
            break
        sizes.append(len(reader.partitions(off, new)))
        off = new
    assert sizes == [1] * len(sizes) and sum(sizes) >= 3


def test_admission_budgets_compose(catalog):
    """files+rows together: the batch closes when EITHER budget is
    exhausted (min semantics)."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("srcmx", schema={"k": "int"})
    for i in range(4):
        t.append([{"k": j} for j in range(2)])  # ~2 rows per commit
    reader = EngineTableStreamReader(
        {
            "location": t.ops.location,
            "max_files_per_trigger": "10",
            "max_rows_per_trigger": "2",
        }
    )
    full = EngineTableStreamReader({"location": t.ops.location})
    all_parts = full.partitions(
        {"snapshot_id": None}, {"snapshot_id": t.current_snapshot().snapshot_id}
    )
    rows_by_file = _file_rows([p.path for p in all_parts])
    off = reader.initialOffset()
    seen = []
    for _ in range(30):
        new = reader.latestOffset()
        if new == off:
            break
        parts = reader.partitions(off, new)
        total = sum(rows_by_file[p.path] for p in parts)
        assert total <= 2 or len(parts) == 1
        seen += [p.path for p in parts]
        off = new
    assert sorted(seen) == sorted(p.path for p in all_parts)


def test_admission_option_validation(catalog):
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("srcmv", schema={"k": "int"})
    with pytest.raises(ValueError, match="max_rows_per_trigger"):
        EngineTableStreamReader(
            {"location": t.ops.location, "max_rows_per_trigger": "0"}
        )
    # changelog mode accepts admission budgets (commit-granular)
    EngineTableStreamReader(
        {
            "location": t.ops.location,
            "mode": "changelog",
            "max_bytes_per_trigger": "100",
        }
    )


def test_changelog_commit_granular_admission(catalog):
    """mode=changelog + admission budgets: whole commits are admitted
    while budgets last (never a partial pos); every change event is
    emitted exactly once across the bounded walk, including deletes."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("cladm", schema={"k": "int", "v": "string"})
    for i in range(3):
        t.append([{"k": 10 * i + j, "v": "x"} for j in range(2)])
    t.delete_where("k = 0", mode="merge-on-read-positional")
    t.append([{"k": 99, "v": "z"}])
    reader = EngineTableStreamReader(
        {
            "location": t.ops.location,
            "mode": "changelog",
            "max_files_per_trigger": "2",
        }
    )
    full = EngineTableStreamReader(
        {"location": t.ops.location, "mode": "changelog"}
    )
    want = full.partitions(
        {"snapshot_id": None}, {"snapshot_id": t.refresh().current_snapshot_id}
    )
    off = reader.initialOffset()
    got = []
    batches = 0
    while True:
        new = reader.latestOffset()
        if new == off:
            break
        assert "pos" not in new, "changelog offsets must stay commit-granular"
        got += reader.partitions(off, new)
        off = new
        batches += 1
        assert batches < 20
    # ordinal is the commit position WITHIN a window by contract, so the
    # bounded walk renumbers per batch — compare everything else
    def key(p):
        d = {k: v for k, v in vars(p).items() if k != "ordinal"}
        return (p.snapshot_id, getattr(p, "kind", ""), str(sorted(d.items())))

    assert sorted(map(key, got)) == sorted(map(key, want))
    assert batches >= 2


def test_changelog_stream_survives_rename(catalog, spark):
    """Positional delete file_paths are absolute under the WRITE-TIME
    location; after rename_table the changelog stream must still match
    them via base-location rebasing (the batch reader's contract)."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table(
        "clren", schema={"k": "int", "v": "string"},
        properties={"write.delete.mode": "merge-on-read-positional"},
    )
    t.append([{"k": i, "v": f"x{i}"} for i in range(4)])
    t.delete_where("k = 1", mode="merge-on-read-positional")
    catalog.rename_table("clren", "clren2")
    t2 = catalog.load_table("clren2")
    r = EngineTableStreamReader({"location": t2.ops.location, "mode": "changelog"})
    parts = r.partitions(
        {"snapshot_id": None}, {"snapshot_id": t2.current_snapshot().snapshot_id}
    )
    events = _rows(r, parts)
    deletes = [(e[0], e[-3]) for e in events if e[-3] == "delete"]
    assert deletes == [(1, "delete")], events


def test_changelog_refuses_partial_offsets(catalog):
    """Reusing an append-mode (file-granular) checkpoint with
    mode=changelog must refuse, not silently drop the mid-commit pos."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("clpart", schema={"k": "int"})
    t.append([{"k": 1}])
    t.append([{"k": 2}])
    r = EngineTableStreamReader({"location": t.ops.location, "mode": "changelog"})
    head = t.current_snapshot().snapshot_id
    with pytest.raises(ValueError, match="partial"):
        r.partitions({"snapshot_id": None}, {"snapshot_id": head, "pos": 1})


def test_changelog_cow_diff_distributes(catalog, spark):
    """r10: a CoW UPDATE touching several bounds-disjoint files plans >1
    content-diff slice (the r9 single-task-per-commit ceiling), and the
    distributed plan's events equal both the single-slice plan's and the
    batch changelog_scan's."""
    from iceberg_ruby_spark.streaming.source import (
        EngineTableStreamReader,
        _ContentDiffSlice,
    )

    t = catalog.create_table(
        "clsplit",
        schema={"k": "int", "v": "string"},
        partition_spec=[("k", "truncate[100]")],
    )
    rows = [
        {"k": base + i, "v": f"v{base + i}"}
        for base in (0, 100, 200)
        for i in range(1, 6)
    ]
    t.append(rows)
    # one CoW commit rewriting one row in each of the 3 partitions
    t.update_where({"v": "'X'"}, "k = 2 OR k = 102 OR k = 202")
    head = t.refresh().current_snapshot().snapshot_id
    r = EngineTableStreamReader({"location": t.ops.location, "mode": "changelog"})
    parts = r.partitions({"snapshot_id": None}, {"snapshot_id": head})
    diffs = [p for p in parts if isinstance(p, _ContentDiffSlice)]
    assert len(diffs) >= 3, [type(p).__name__ for p in parts]
    # the groups partition the commit's files — no file diffed twice
    seen_paths = [s["path"] for p in diffs for s in p.prev_specs]
    assert len(seen_paths) == len(set(seen_paths))

    def drain(name, **opts):
        q = _start(spark, t, name, mode="changelog", **opts)
        try:
            q.processAllAvailable()
            assert q.exception() is None
        finally:
            q.stop()
        return sorted(
            (row["k"], row["v"], row["_change_type"])
            for row in spark.sql(f"SELECT * FROM {name}").collect()
        )

    split_ev = drain("clsplit_sink")
    single_ev = drain("clsplit_sink1", content_diff_split="false")
    batch = sorted(
        (row["k"], row["v"], row["_change_type"])
        for row in t.changelog_scan().collect()
    )
    assert split_ev == single_ev == batch
    # the CoW UPDATE's events: delete+insert per touched key, nothing for
    # the rows the rewrite merely copied
    touched = [(k, v, ty) for k, v, ty in split_ev if ty == "delete"]
    assert touched == [(2, "v2", "delete"), (102, "v102", "delete"), (202, "v202", "delete")]


def test_changelog_refuses_nonansi_stored_predicate(catalog, spark):
    """A stored MoR delete predicate outside the shared-ANSI subset (here
    RLIKE, Spark-only) must refuse at planning with a typed error instead
    of silently handing Spark-dialect text to the executor's DuckDB
    evaluation (r9 ADVICE medium).  The batch changelog falls back to the
    relational diff (Spark evaluates the predicate natively) and still
    consumes the window.  IN lists are ANSI — bit-identical in DuckDB —
    so they stream (r10: the predicate parser gained [NOT] IN)."""
    from iceberg_ruby_spark.errors import InvalidDataError
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("clansi", schema={"k": "int", "v": "string"})
    t.append([{"k": i, "v": f"v{i}"} for i in range(1, 5)])
    t.delete_where("v RLIKE 'v[23]'", mode="merge-on-read")
    head = t.refresh().current_snapshot().snapshot_id
    r = EngineTableStreamReader({"location": t.ops.location, "mode": "changelog"})
    with pytest.raises(InvalidDataError, match="shared-ANSI"):
        r.partitions({"snapshot_id": None}, {"snapshot_id": head})
    batch = sorted(
        (row["k"], row["_change_type"]) for row in t.changelog_scan().collect()
    )
    assert [(k, ty) for k, ty in batch if ty == "delete"] == [(2, "delete"), (3, "delete")]
    # ANSI IN streams: planning accepts and the events are exact
    t2 = catalog.create_table("clansi_in", schema={"k": "int", "v": "string"})
    t2.append([{"k": i, "v": f"v{i}"} for i in range(1, 5)])
    t2.delete_where("k IN (2, 3)", mode="merge-on-read")
    ev = _changelog_events(spark, t2, "clansi_in_sink")
    assert [(k, ty) for k, _v, ty, _o in ev if ty == "delete"] == [(2, "delete"), (3, "delete")]


def test_changelog_skip_keeps_structural_deletes_in_mixed_commit(catalog, spark):
    """skip_rewrite_commits=true over a commit window carrying BOTH a
    predicate delete and an equality delete: the predicate is passed over
    but the equality delete still streams (r9 ADVICE: the skip path
    under-emitted mixed commits by returning inserts only)."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("clmixed", schema={"k": "int", "v": "string"})
    t.append([{"k": i, "v": f"v{i}"} for i in range(1, 5)])
    t.delete_where("k = 3", mode="merge-on-read")      # predicate delete
    t.delete_by_keys([{"k": 2}], "k")                   # equality delete
    head = t.refresh().current_snapshot().snapshot_id
    meta = t.ops.load()
    first = next(s for s in meta.snapshots if s.parent_snapshot_id is None)
    r = EngineTableStreamReader(
        {
            "location": t.ops.location,
            "mode": "changelog",
            "skip_rewrite_commits": "true",
        }
    )
    # collapse the two delete commits into one planning window against the
    # append state: added_deletes then carries the predicate AND the
    # equality entry in a single _commit_change_slices call
    snap = t.current_snapshot()
    parts = r._commit_change_slices(
        t.ops, first, snap, 0
    )
    kinds = sorted(p.kind for p in parts)
    assert "delete-eq" in kinds, kinds
    events = _rows(r, parts)
    deletes = sorted(e[0] for e in events if e[-3] == "delete")
    assert deletes == [2], events  # equality delete streamed, predicate skipped


def test_changelog_delete_planning_is_delta_based(catalog, spark):
    """r10: MoR delete commits chain their manifest segments (superset
    commit) and plan from the structural delta + the incremental
    delete-view cache — the whole multi-delete window costs ONE full
    manifest read (the window start), however many delete commits follow."""
    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader
    from iceberg_ruby_spark.table import FsTableOps

    t = catalog.create_table("cldelta", schema={"k": "int", "v": "string"})
    t.append([{"k": i, "v": f"v{i}"} for i in range(1, 9)])
    t.append([{"k": i, "v": f"v{i}"} for i in range(9, 12)])
    t.delete_by_keys([{"k": 2}], "k")
    t.delete_by_keys([{"k": 9}], "k")
    t.delete_by_keys([{"k": 4}, {"k": 10}], "k")
    head = t.refresh().current_snapshot().snapshot_id
    r = EngineTableStreamReader({"location": t.ops.location, "mode": "changelog"})
    calls = {"full": 0}
    orig = FsTableOps.read_manifest

    def counting(self, manifest_list):
        calls["full"] += 1
        return orig(self, manifest_list)

    FsTableOps.read_manifest = counting
    try:
        parts = r.partitions({"snapshot_id": None}, {"snapshot_id": head})
    finally:
        FsTableOps.read_manifest = orig
    assert calls["full"] == 1, calls  # only the window-start commit
    events = _rows(r, parts)
    deletes = sorted(e[0] for e in events if e[-3] == "delete")
    assert deletes == [2, 4, 9, 10]
    inserts = sorted(e[0] for e in events if e[-3] == "insert")
    assert inserts == list(range(1, 12))


def test_stream_ending_snapshot_pin(catalog, spark):
    """r10 (r9 ADVICE): ending_snapshot_id pins the stream head — a drain
    consumes the backlog as of the pin and never chases later commits
    (what makes stream_changelog_apply's budgeted drain terminate under
    concurrent writes)."""
    t = catalog.create_table("clpin", schema={"k": "int"})
    t.append([{"k": 1}])
    pinned = t.current_snapshot().snapshot_id
    t.append([{"k": 2}])  # lands AFTER the pin: must not stream
    q = _start(
        spark, t, "clpin_sink", mode="changelog",
        ending_snapshot_id=str(pinned),
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    got = sorted(r["k"] for r in spark.sql("SELECT * FROM clpin_sink").collect())
    assert got == [1]


def test_stream_from_timestamp(catalog):
    """r11: Iceberg's stream-from-timestamp — the stream starts at the
    first commit whose timestamp is >= the given epoch-ms; before table
    creation = full history, future = only new commits; combining with
    starting_snapshot_id or ref refuses."""
    import time

    from iceberg_ruby_spark.streaming.source import EngineTableStreamReader

    t = catalog.create_table("srcts", schema={"k": "int"})
    t.append([{"k": 1}])
    t = t.refresh()
    first_ts = t.current_snapshot().timestamp_ms
    time.sleep(0.01)
    t.append([{"k": 2}])
    t = t.refresh()
    second_ts = t.current_snapshot().timestamp_ms
    t.append([{"k": 3}])
    t = t.refresh()
    head = t.current_snapshot().snapshot_id

    def drained(**opts):
        r = EngineTableStreamReader({"location": t.ops.location, **opts})
        parts = r.partitions(r.initialOffset(), {"snapshot_id": head})
        return sorted(row[0] for row in _rows(r, parts))

    # at the second commit's ts: commits 2 and 3 emit
    assert drained(starting_timestamp=str(second_ts)) == [2, 3]
    # strictly after the first commit but before the second: same window
    assert drained(starting_timestamp=str(first_ts + 1)) == [2, 3]
    # before table creation: full history
    assert drained(starting_timestamp="0") == [1, 2, 3]
    # in the future: nothing already-committed emits
    assert drained(starting_timestamp=str(second_ts + 10_000)) == []
    # iceberg's option spelling is accepted
    assert drained(stream_from_timestamp=str(second_ts)) == [2, 3]
    with pytest.raises(ValueError, match="not both"):
        EngineTableStreamReader(
            {
                "location": t.ops.location,
                "starting_snapshot_id": "1",
                "starting_timestamp": "2",
            }
        )
    with pytest.raises(ValueError, match="MAIN snapshot log"):
        EngineTableStreamReader(
            {
                "location": t.ops.location,
                "starting_timestamp": "0",
                "branch": "audit",
            }
        )

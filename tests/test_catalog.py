"""Table DDL + SQL entry point — mirrors reference ``test/catalog_test.rb``,
``test/create_table_test.rb``, ``test/sql_test.rb``."""

import os

import pytest

import iceberg_ruby_spark as ice
from iceberg_ruby_spark.errors import (
    InvalidDataError,
    NoSuchNamespaceError,
    NoSuchTableError,
    TableAlreadyExistsError,
    UnsupportedFeatureError,
)


def test_create_table_hash_schema(catalog):
    t = catalog.create_table("t1", schema={"a": "int", "b": "string"})
    names = [f.name for f in t.schema.fields]
    assert names == ["a", "b"]
    assert catalog.table_exists("t1")


def test_create_table_requires_namespace(catalog):
    with pytest.raises(NoSuchNamespaceError):
        catalog.create_table("missing.t", schema={"a": "int"})


def test_create_duplicate_raises(catalog):
    catalog.create_table("t1", schema={"a": "int"})
    with pytest.raises(TableAlreadyExistsError):
        catalog.create_table("t1", schema={"a": "int"})
    t = catalog.create_table("t1", schema={"a": "int"}, if_not_exists=True)
    assert t is not None


def test_create_table_without_schema_is_empty(catalog):
    # reference behavior (test/create_table_test.rb:108-111): no schema →
    # an empty-schema table, not an error
    t = catalog.create_table("t1")
    assert t.schema.fields == []


def test_create_table_from_struct_type(catalog):
    import pyspark.sql.types as T

    st = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    t = catalog.create_table("t2", schema=st)
    assert [f.name for f in t.schema.fields] == ["id", "name"]


def test_create_table_from_pyarrow_schema(catalog):
    import pyarrow as pa

    t = catalog.create_table(
        "t3", schema=pa.schema([("x", pa.int64()), ("y", pa.string())])
    )
    assert [f.name for f in t.schema.fields] == ["x", "y"]


def test_load_missing_raises(catalog):
    with pytest.raises(NoSuchTableError):
        catalog.load_table("nope")


def test_list_tables(catalog):
    catalog.create_table("t1", schema={"a": "int"})
    catalog.create_table("t2", schema={"a": "int"})
    tables = catalog.list_tables()
    assert ["default", "t1"] in tables and ["default", "t2"] in tables


def test_drop_table(catalog):
    catalog.create_table("t1", schema={"a": "int"})
    catalog.drop_table("t1")
    assert not catalog.table_exists("t1")
    with pytest.raises(NoSuchTableError):
        catalog.drop_table("t1")
    catalog.drop_table("t1", if_exists=True)  # no raise


def test_rename_table(catalog):
    t = catalog.create_table("old", schema={"a": "int"})
    t.append([{"a": 5}])
    catalog.rename_table("old", "new")
    assert not catalog.table_exists("old")
    assert catalog.load_table("new").to_a() == [{"a": 5}]


def test_register_table_attaches_without_copy(catalog):
    t = catalog.create_table("src", schema={"a": "int"})
    t.append([{"a": 1}])
    meta_loc = t.location
    reg = catalog.register_table("attached", meta_loc)
    assert reg.to_a() == [{"a": 1}]
    # pointer attach, not a tree copy: no duplicated data dir on disk
    attached_dir = os.path.join(catalog.warehouse, "default", "attached")
    assert not os.path.isdir(os.path.join(attached_dir, "data"))


def test_custom_location_stays_reachable(catalog, tmp_path):
    loc = str(tmp_path / "elsewhere")
    t = catalog.create_table("ext", schema={"a": "int"}, location=loc)
    t.append([{"a": 7}])
    assert catalog.table_exists("ext")
    assert catalog.load_table("ext").to_a() == [{"a": 7}]
    with pytest.raises(TableAlreadyExistsError):
        catalog.create_table("ext", schema={"a": "int"})


# -- sql() ------------------------------------------------------------------


def test_sql_select_and_params(catalog):
    t = catalog.create_table("ev", schema={"a": "int", "b": "string"})
    t.append([{"a": 1, "b": "one"}, {"a": 2, "b": "two"}, {"a": 3, "b": "three"}])
    res = catalog.sql("SELECT * FROM ev WHERE a >= $1 ORDER BY a", [2])
    assert res.rows == [[2, "two"], [3, "three"]]
    # extra params ignored (reference test/sql_test.rb:29-43)
    res = catalog.sql("SELECT * FROM ev WHERE a = $1", [1, 99, 98])
    assert res.rows == [[1, "one"]]


def test_sql_scalar_no_table(catalog):
    assert catalog.sql("SELECT 1 + 1 AS v").rows == [[2]]


def test_sql_create_insert_routes_to_warehouse(catalog):
    catalog.sql("CREATE TABLE sq (a int, b string)")
    assert catalog.table_exists("sq")
    catalog.sql("INSERT INTO sq VALUES (1, 'one'), (2, 'two')")
    t = catalog.load_table("sq")
    assert sorted(t.to_a(), key=lambda r: r["a"]) == [
        {"a": 1, "b": "one"},
        {"a": 2, "b": "two"},
    ]
    res = catalog.sql("SELECT b FROM sq WHERE a = 2")
    assert res.rows == [["two"]]


def test_sql_update_delete(catalog):
    t = catalog.create_table("ud", schema={"a": "int", "b": "string"})
    t.append([{"a": 1, "b": "one"}, {"a": 2, "b": "two"}])
    catalog.sql("UPDATE ud SET b = 'ONE' WHERE a = 1")
    catalog.sql("DELETE FROM ud WHERE a = 2")
    assert catalog.load_table("ud").to_a() == [{"a": 1, "b": "ONE"}]


def test_sql_update_set_with_commas_in_call(catalog):
    """SET expressions may contain multi-arg calls and quoted commas —
    the assignment splitter must be depth/quote-aware (round-2 advisory)."""
    t = catalog.create_table("ud2", schema={"a": "int", "b": "string"})
    t.append([{"a": 1, "b": "one"}, {"a": 2, "b": "two"}])
    catalog.sql("UPDATE ud2 SET b = concat(b, ', ', 'x') WHERE a = 1")
    rows = {r["a"]: r["b"] for r in catalog.load_table("ud2").to_a()}
    assert rows == {1: "one, x", 2: "two"}
    # multiple assignments still split on the top-level comma
    catalog.sql("UPDATE ud2 SET b = concat('p,q', b), a = a + 10 WHERE a = 2")
    rows = {r["a"]: r["b"] for r in catalog.load_table("ud2").to_a()}
    assert rows == {1: "one, x", 12: "p,qtwo"}


def test_sql_update_bad_set_assignment_raises(catalog):
    t = catalog.create_table("ud3", schema={"a": "int", "b": "string"})
    t.append([{"a": 1, "b": "one"}])
    with pytest.raises(UnsupportedFeatureError):
        catalog.sql("UPDATE ud3 SET WHERE a = 1")


def test_expire_snapshots_noop_keeps_version(catalog):
    t = catalog.create_table("ex1", schema={"a": "int"})
    t.append([{"a": 1}])
    v = t.ops.load().version
    assert t.expire_snapshots(keep_last=5) == 0
    assert t.ops.load().version == v  # no-op expire must not bump metadata
    t.append([{"a": 2}])
    assert t.expire_snapshots(keep_last=1) == 1


def test_sql_unsupported_write_raises(catalog):
    with pytest.raises(UnsupportedFeatureError):
        catalog.sql("REPLACE TABLE x USING parquet AS SELECT 1")
    with pytest.raises(UnsupportedFeatureError):
        catalog.sql("ALTER TABLE x SET LOCATION '/elsewhere'")
    # TRUNCATE is supported since round 6; a missing table is a
    # catalog error, not an unsupported statement
    from iceberg_ruby_spark.errors import NoSuchTableError

    with pytest.raises(NoSuchTableError):
        catalog.sql("TRUNCATE TABLE nope")


def test_sql_alter_table_ddl(catalog):
    t = catalog.create_table("alt", schema={"a": "int"})
    t.append([{"a": 1}])
    catalog.sql("ALTER TABLE alt ADD COLUMN b string")
    catalog.sql("ALTER TABLE alt RENAME COLUMN a TO total")
    t = catalog.load_table("alt")
    assert [f.name for f in t.schema.fields] == ["total", "b"]
    assert t.to_a() == [{"total": 1, "b": None}]
    catalog.sql("ALTER TABLE alt DROP COLUMN b")
    assert catalog.load_table("alt").to_a() == [{"total": 1}]
    catalog.sql("ALTER TABLE alt SET TBLPROPERTIES ('owner'='me', 'note'='x')")
    assert catalog.load_table("alt").properties["owner"] == "me"
    catalog.sql("ALTER TABLE alt UNSET TBLPROPERTIES ('note')")
    props = catalog.load_table("alt").properties
    assert props["owner"] == "me" and "note" not in props
    catalog.sql("ALTER TABLE alt RENAME TO alt2")
    assert catalog.table_exists("alt2") and not catalog.table_exists("alt")
    assert catalog.sql("SELECT total FROM alt2").rows == [[1]]


def test_default_namespace_resolution():
    cat = ice.MemoryCatalog()  # no default namespace
    try:
        cat.create_namespace("ns")
        cat.create_table("ns.t", schema={"a": "int"})
        assert cat.table_exists(["ns", "t"])
        with pytest.raises(InvalidDataError):
            cat.create_table("bare", schema={"a": "int"})
    finally:
        import shutil

        shutil.rmtree(cat.warehouse, ignore_errors=True)


def test_create_view_persisted_and_queryable(catalog):
    t = catalog.create_table("ev2", schema={"a": "long", "b": "string"})
    t.append([{"a": 1, "b": "one"}, {"a": 2, "b": "two"}])
    catalog.sql("CREATE VIEW ev2_view AS SELECT a AS c, b AS d FROM ev2 WHERE a > 1")
    res = catalog.sql("SELECT * FROM ev2_view ORDER BY c")
    assert res.rows == [[2, "two"]]
    assert ["default", "ev2_view"] in catalog.list_views()
    # view tracks table updates (re-resolved per query, not materialized)
    t.append([{"a": 3, "b": "three"}])
    assert catalog.sql("SELECT count(*) AS n FROM ev2_view").rows == [[2]]
    with pytest.raises(TableAlreadyExistsError):
        catalog.sql("CREATE VIEW ev2_view AS SELECT 1 AS x")
    catalog.sql("CREATE OR REPLACE VIEW ev2_view AS SELECT a FROM ev2")
    assert len(catalog.sql("SELECT * FROM ev2_view").rows) == 3
    catalog.sql("DROP VIEW ev2_view")
    assert ["default", "ev2_view"] not in catalog.list_views()
    with pytest.raises(NoSuchTableError):
        catalog.drop_view("ev2_view")


def test_sql_multi_statement_rejected(catalog):
    with pytest.raises(InvalidDataError):
        catalog.sql("SELECT 1; SELECT 2")
    # semicolon inside a string literal is fine; so is a trailing one
    assert catalog.sql("SELECT 'a;b' AS v").rows == [["a;b"]]
    assert catalog.sql("SELECT 1 AS v;").rows == [[1]]


def test_sql_duplicate_output_names_rejected(catalog):
    with pytest.raises(InvalidDataError):
        catalog.sql("SELECT 123 AS a, 123 AS a")


def test_sql_insert_with_column_list(catalog):
    catalog.sql("CREATE TABLE cl (a int, b string, c double)")
    catalog.sql("INSERT INTO cl (b, a) VALUES ('one', 1)")
    assert catalog.load_table("cl").to_a() == [{"a": 1, "b": "one", "c": None}]
    with pytest.raises(InvalidDataError):
        catalog.sql("INSERT INTO cl (a) VALUES (1, 'extra')")


def test_sql_merge_into(catalog):
    """MERGE INTO routed through table.merge_into: matched rows update,
    unmatched insert; aliases in SET rewrite to the engine's t/s."""
    catalog.sql("CREATE TABLE mt (k INT, v STRING)")
    catalog.sql("INSERT INTO mt VALUES (1, 'a'), (2, 'b')")
    catalog.sql("CREATE TABLE ms (k INT, v STRING)")
    catalog.sql("INSERT INTO ms VALUES (2, 'B'), (3, 'c')")
    catalog.sql(
        "MERGE INTO mt AS t USING ms AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = {tuple(r) for r in catalog.sql("SELECT k, v FROM mt").rows}
    assert rows == {(1, "a"), (2, "B"), (3, "c")}
    # subquery source + update-only merge
    catalog.sql(
        "MERGE INTO mt t USING (SELECT 1 AS k, 'z' AS v) s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v"
    )
    rows = {tuple(r) for r in catalog.sql("SELECT k, v FROM mt").rows}
    assert rows == {(1, "z"), (2, "B"), (3, "c")}


def test_sql_time_travel(catalog):
    catalog.sql("CREATE TABLE tt (a INT)")
    catalog.sql("INSERT INTO tt VALUES (1)")
    t = catalog.load_table("tt")
    s1 = t.current_snapshot().snapshot_id
    ts1 = t.metadata.snapshot_log[-1]["timestamp-ms"]
    import datetime as dt

    iso = dt.datetime.fromtimestamp(ts1 / 1000, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    catalog.sql("INSERT INTO tt VALUES (2)")
    assert sorted(r[0] for r in catalog.sql("SELECT a FROM tt").rows) == [1, 2]
    assert catalog.sql(f"SELECT a FROM tt VERSION AS OF {s1}").rows == [[1]]
    assert catalog.sql(f"SELECT a FROM tt TIMESTAMP AS OF '{iso}'").rows == [[1]]
    # Spark's FOR SYSTEM_VERSION / FOR SYSTEM_TIME spellings
    assert catalog.sql(
        f"SELECT a FROM tt FOR SYSTEM_VERSION AS OF {s1}"
    ).rows == [[1]]
    assert catalog.sql(
        f"SELECT a FROM tt FOR SYSTEM_TIME AS OF '{iso}'"
    ).rows == [[1]]
    # composes inside a larger query
    n = catalog.sql(
        f"SELECT COUNT(*) AS n FROM tt x JOIN tt VERSION AS OF {s1} y ON x.a = y.a"
    ).rows[0][0]
    assert n == 1


def test_sql_version_as_of_quoted_ref(catalog):
    """VERSION AS OF accepts a quoted branch/tag name (Iceberg SQL), and
    the rewriter must not touch time-travel-looking text inside string
    literals (round-3 advisory)."""
    catalog.sql("CREATE TABLE ttr (a INT)")
    catalog.sql("INSERT INTO ttr VALUES (1)")
    t = catalog.load_table("ttr")
    t.create_tag("v1", t.current_snapshot_id)
    catalog.sql("INSERT INTO ttr VALUES (2)")
    assert catalog.sql("SELECT a FROM ttr VERSION AS OF 'v1'").rows == [[1]]
    # inside a string literal: no rewrite, the literal comes back verbatim
    lit = catalog.sql("SELECT 'ttr VERSION AS OF 99' AS s").rows
    assert lit == [["ttr VERSION AS OF 99"]]


def test_sql_show_tables_and_describe(catalog):
    catalog.create_table("st1", schema={"a": "int", "b": "string"})
    catalog.create_table("st2", schema={"a": "int"})
    names = {r[0] for r in catalog.sql("SHOW TABLES").rows}
    assert {"default.st1", "default.st2"} <= names
    desc = catalog.sql("DESCRIBE st1").rows
    assert [d[0] for d in desc] == ["a", "b"]
    assert [d[1] for d in desc] == ["int", "string"]


def test_sql_call_system_procedures(catalog):
    t = catalog.create_table("proc", schema={"a": "int"})
    for i in range(3):
        t.append([{"a": i}])
    # iceberg-spark stored-procedure surface: named and positional args
    n_files_before = len([e for e in t._current_entries() if "path" in e])
    assert catalog.sql(
        "CALL system.expire_snapshots(table => 'proc', retain_last => 1)"
    ).rows == [[2, 0, 0]]  # all files still referenced by the head snapshot
    rw = catalog.sql("CALL system.rewrite_data_files('proc')")
    assert rw.columns == ["rewritten_data_files_count", "added_data_files_count"]
    t = catalog.load_table("proc")
    n_files_after = len([e for e in t._current_entries() if "path" in e])
    assert rw.rows == [[n_files_before, n_files_after]]
    assert n_files_after == 1  # compacted
    # counts come straight from the commit summary
    s = t.current_snapshot().summary
    assert s["rewritten-data-files-count"] == n_files_before
    assert s["added-data-files-count"] == 1
    # expiring the pre-compaction history now deletes the rewritten files
    expired = catalog.sql(
        "CALL system.expire_snapshots(table => 'proc', retain_last => 1)"
    ).rows[0]
    assert expired[0] >= 1 and expired[1] >= n_files_before
    sid = t.current_snapshot_id
    assert catalog.sql(
        f"CALL system.rollback_to_snapshot('proc', {sid})"
    ).rows == [[sid]]
    assert catalog.sql("CALL system.compute_table_stats('proc')").rows == [[3]]
    assert catalog.sql("CALL system.remove_orphan_files('proc')").rows[0][0] >= 0
    assert sorted(r["a"] for r in catalog.load_table("proc").to_a()) == [0, 1, 2]
    with pytest.raises(UnsupportedFeatureError):
        catalog.sql("CALL system.nope('proc')")


def test_sql_alter_partition_sort_and_column_type(catalog):
    """iceberg-spark DDL extensions: ADD/DROP PARTITION FIELD, WRITE
    ORDERED BY, ALTER COLUMN ... TYPE (widening)."""
    t = catalog.create_table(
        "alt3", schema={"id": "long", "ts": "timestamp", "v": "int"}
    )
    catalog.sql("ALTER TABLE alt3 ADD PARTITION FIELD bucket(8, id)")
    catalog.sql("ALTER TABLE alt3 ADD PARTITION FIELD days(ts) AS ts_day")
    t = catalog.load_table("alt3")
    spec = t.partition_spec_by_id(t.default_spec_id)
    assert [(f["source"], f["transform"]) for f in spec["fields"]] == [
        ("id", "bucket[8]"), ("ts", "day"),
    ]
    assert spec["fields"][1]["name"] == "ts_day"
    catalog.sql("ALTER TABLE alt3 DROP PARTITION FIELD bucket(8, id)")
    t = catalog.load_table("alt3")
    spec = t.partition_spec_by_id(t.default_spec_id)
    assert [(f["source"], f["transform"]) for f in spec["fields"]] == [("ts", "day")]
    # dropped-then-readded fields keep their spec-wide unique field id
    assert spec["fields"][0]["field-id"] == 1001
    with pytest.raises(InvalidDataError):
        catalog.sql("ALTER TABLE alt3 DROP PARTITION FIELD bucket(8, id)")
    catalog.sql("ALTER TABLE alt3 WRITE ORDERED BY v DESC NULLS LAST, id")
    t = catalog.load_table("alt3")
    so = t.default_sort_order()
    assert [(f["source"], f["direction"], f["null_order"]) for f in so["fields"]] == [
        ("v", "desc", "last"), ("id", "asc", "first"),
    ]
    catalog.sql("ALTER TABLE alt3 ALTER COLUMN v TYPE long")
    t = catalog.load_table("alt3")
    assert type(t.schema.field_by_name("v").field_type).__name__ == "LongType"
    import datetime

    t.append([{"id": 1, "ts": datetime.datetime(2026, 1, 2, 3, 4, 5), "v": 9}])
    assert t.to_a()[0]["v"] == 9


def test_sql_call_create_changelog_view(catalog):
    t = catalog.create_table("clv", schema={"a": "int"})
    t.append([{"a": 1}])
    s1 = t.current_snapshot_id
    t.append([{"a": 2}])
    t.delete_where("a = 1")
    res = catalog.sql(
        f"CALL system.create_changelog_view(table => 'clv',"
        f" start_snapshot_id => {s1})"
    )
    assert res.rows == [["clv_changes"]]
    rows = catalog.sql(
        "SELECT a, _change_type FROM clv_changes ORDER BY _change_ordinal, a"
    ).rows
    assert sorted((r[0], r[1]) for r in rows) == [
        (1, "delete"), (2, "insert")
    ]


def test_sql_call_add_files(catalog, spark, tmp_path):
    ext = str(tmp_path / "ext")
    spark.range(5).selectExpr("CAST(id AS INT) AS a").coalesce(1).write.parquet(ext)
    catalog.create_table("addf", schema={"a": "int"})
    res = catalog.sql(
        f"CALL system.add_files(table => 'addf',"
        f" source_table => 'parquet.`{ext}/*.parquet`')"
    )
    assert res.rows == [[1]]
    assert catalog.sql("SELECT count(*) AS n FROM addf").rows == [[5]]


def test_sql_call_register_snapshot_ancestors(catalog, spark, tmp_path):
    # ancestors_of
    t = catalog.create_table("anc", schema={"a": "int"})
    t.append([{"a": 1}])
    t.append([{"a": 2}])
    sids = [s.snapshot_id for s in t.snapshots]
    rows = catalog.sql("CALL system.ancestors_of(table => 'anc')").rows
    assert [r[0] for r in rows] == [sids[1], sids[0]]  # head-first walk
    rows = catalog.sql(
        f"CALL system.ancestors_of('anc', {sids[0]})"
    ).rows
    assert [r[0] for r in rows] == [sids[0]]
    # snapshot: create-from-parquet migration
    ext = str(tmp_path / "src")
    spark.range(4).selectExpr("CAST(id AS INT) AS a").coalesce(1).write.parquet(ext)
    res = catalog.sql(
        f"CALL system.snapshot(table => 'snapped',"
        f" source_table => 'parquet.`{ext}/*.parquet`')"
    )
    assert res.rows == [[1]]
    assert catalog.sql("SELECT count(*) AS n FROM snapped").rows == [[4]]
    # register_table: attach the snapped table under a second name
    loc = catalog.load_table("snapped").location
    res = catalog.sql(
        f"CALL system.register_table(table => 'attached2',"
        f" metadata_file => '{loc}')"
    )
    assert res.rows[0][1] == 1 and res.rows[0][2] == 1
    assert catalog.sql("SELECT count(*) AS n FROM attached2").rows == [[4]]


def test_sql_branch_tag_ddl(catalog):
    t = catalog.create_table("refddl", schema={"a": "int"})
    t.append([{"a": 1}])
    sid1 = t.current_snapshot_id
    t.append([{"a": 2}])
    catalog.sql(
        "ALTER TABLE refddl CREATE BRANCH dev RETAIN 30 DAYS"
        " WITH SNAPSHOT RETENTION 5 SNAPSHOTS 2 DAYS"
    )
    catalog.sql(f"ALTER TABLE refddl CREATE TAG v1 AS OF VERSION {sid1}")
    t = catalog.load_table("refddl")
    assert t.refs["dev"]["min-snapshots-to-keep"] == 5
    assert t.refs["dev"]["max-snapshot-age-ms"] == 2 * 86_400_000
    assert t.refs["dev"]["max-ref-age-ms"] == 30 * 86_400_000
    assert t.refs["v1"]["snapshot-id"] == sid1
    # idempotent with IF NOT EXISTS; bare CREATE on an existing ref errors
    catalog.sql("ALTER TABLE refddl CREATE TAG IF NOT EXISTS v1")
    assert catalog.load_table("refddl").refs["v1"]["snapshot-id"] == sid1
    with pytest.raises(InvalidDataError):
        catalog.sql("ALTER TABLE refddl CREATE TAG v1")
    catalog.sql("ALTER TABLE refddl DROP TAG v1")
    assert "v1" not in catalog.load_table("refddl").refs
    catalog.sql("ALTER TABLE refddl DROP BRANCH IF EXISTS nope")  # no raise
    with pytest.raises(InvalidDataError):
        catalog.sql("ALTER TABLE refddl DROP BRANCH nope")
    # the branch DDL composes with VERSION AS OF reads
    rows = catalog.sql("SELECT count(*) AS n FROM refddl VERSION AS OF 'dev'").rows
    assert rows == [[2]]


def test_create_or_replace_table(catalog):
    t = catalog.create_table(
        "cor",
        schema={"a": "int", "b": "string"},
        partition_spec=[("a", "identity")],
        properties={"k": "v"},
    )
    t.append([{"a": 1, "b": "x"}])
    s_old = t.current_snapshot_id
    v_before = t.ops.load().version
    t2 = catalog.create_table("cor", schema={"c": "long"}, or_replace=True)
    # same table, new definition: UUID and history survive, data cleared
    assert t2.uuid == t.uuid
    assert t2.to_a() == []
    assert len(t2.snapshots) >= 2
    # ATOMIC: data clear + definition swap land in ONE metadata commit —
    # no intermediate version shows a truncated table under the old schema
    assert t2.ops.load().version == v_before + 1
    # the replace snapshot is stamped with the NEW schema id
    assert t2.current_snapshot().schema_id == t2.current_schema_id
    # column ids are fresh (never reused), schema id bumped
    assert [f.field_id for f in t2.current_schema().fields] == [3]
    assert t2.current_schema_id > 0
    # time travel to the pre-replace snapshot reads the OLD schema
    assert t2.to_a(snapshot_id=s_old) == [{"a": 1, "b": "x"}]
    # spec reset to unpartitioned (new spec id), properties replaced
    assert t2.default_partition_spec()["fields"] == []
    assert t2.properties == {}
    t2.append([{"c": 7}])
    assert t2.to_a() == [{"c": 7}]
    # SQL spelling
    catalog.sql("CREATE OR REPLACE TABLE cor (z double)")
    t3 = catalog.load_table("cor")
    assert [(f.name, f.field_type.name) for f in t3.current_schema().fields] == [
        ("z", "double")
    ]
    # plain CREATE TABLE on an existing table still errors
    import pytest

    from iceberg_ruby_spark.errors import TableAlreadyExistsError

    with pytest.raises(TableAlreadyExistsError):
        catalog.create_table("cor", schema={"q": "int"})


def test_show_create_table(catalog):
    catalog.create_table(
        "sct",
        schema={"a": "int", "ts": "timestamp", "s": "string"},
        partition_spec=[("a", "bucket[4]"), ("ts", "day")],
        sort_order=[("s", "asc")],
        properties={"x": "1"},
    )
    ddl = catalog.sql("SHOW CREATE TABLE sct").rows[0][0]
    assert "CREATE TABLE sct (" in ddl
    assert "a int" in ddl and "ts timestamp" in ddl
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (bucket(4, a), days(ts))" in ddl
    assert "SORTED BY (s ASC)" in ddl
    assert "TBLPROPERTIES" in ddl and "'x' = '1'" in ddl


def test_version_hint_recovery(catalog):
    """Losing or corrupting version-hint.text must not brick the table:
    the reader recovers the highest committed v{N}.json (Iceberg
    HadoopTableOperations' listing fallback) and heals the hint."""
    import os

    t = catalog.create_table("hintless", schema={"k": "int"})
    t.append([{"k": 1}])
    t.append([{"k": 2}])
    hint = os.path.join(t.ops.metadata_dir, "version-hint.text")
    v = int(open(hint).read().strip())
    os.remove(hint)
    t2 = catalog.load_table("hintless")
    assert sorted(r["k"] for r in t2.to_a()) == [1, 2]
    assert int(open(hint).read().strip()) == v  # healed
    # corrupt hint recovers too, and commits continue from the real head
    with open(hint, "w") as f:
        f.write("garbage")
    t3 = catalog.load_table("hintless")
    t3.append([{"k": 3}])
    assert sorted(r["k"] for r in t3.refresh().to_a()) == [1, 2, 3]


def test_hint_recovery_list_and_drop(catalog):
    """A hint-lost table stays listable and droppable, not just loadable."""
    import os

    t = catalog.create_table("hintless2", schema={"k": "int"})
    t.append([{"k": 1}])
    os.remove(os.path.join(t.ops.metadata_dir, "version-hint.text"))
    assert ["hintless2"] in [i[-1:] for i in catalog.list_tables()]
    catalog.drop_table("hintless2")
    assert not catalog.table_exists("hintless2")
    assert ["hintless2"] not in [i[-1:] for i in catalog.list_tables()]


def test_show_partitions(catalog):
    """r12: Spark's SHOW PARTITIONS spelling over the partitions metadata
    table — name=value strings + per-partition counts, metadata-only."""
    t = catalog.create_table(
        "shp",
        schema={"pr": "string", "k": "long"},
        partition_spec=[("pr", "identity")],
    )
    t.append([{"pr": f"p{i % 2}", "k": i} for i in range(10)])
    assert catalog.sql("SHOW PARTITIONS shp").to_a() == [
        {"partition": "pr=p0", "record_count": 5, "file_count": 1},
        {"partition": "pr=p1", "record_count": 5, "file_count": 1},
    ]
    u = catalog.create_table("shp_un", schema={"k": "long"})
    u.append([{"k": 1}])
    rows = catalog.sql("SHOW PARTITIONS shp_un").to_a()
    assert rows == [{"partition": "", "record_count": 1, "file_count": 1}]

"""Multi-operation single-commit transactions (Iceberg's
``Table.newTransaction`` / PyIceberg ``table.transaction()``): staged
isolation, one published metadata version, abort, conflict detection."""

import pytest

from iceberg_ruby_spark.errors import InvalidDataError


def test_transaction_publishes_one_version(catalog):
    t = catalog.create_table("txn1", schema={"k": "int", "v": "string"})
    t.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    v0 = t.ops.current_version()
    n_snaps0 = len(t.metadata.snapshots)
    with t.transaction() as tx:
        tx.append([{"k": 3, "v": "c"}])
        tx.delete_where("k = 1", mode="merge-on-read")
        tx.update_schema().add_column("note", "string").commit()
        tx.update_properties({"owner": "me"})
        # staged reads compose: the txn sees its own chain
        assert sorted(r["k"] for r in tx.to_a()) == [2, 3]
        # isolation: outside readers see NOTHING until publish
        assert sorted(r["k"] for r in t.refresh().to_a()) == [1, 2]
        assert "note" not in [f.name for f in t.schema.fields]
    # ONE atomic metadata version for the whole block
    assert t.ops.current_version() == v0 + 1
    t.refresh()
    assert sorted((r["k"], r["note"]) for r in t.to_a()) == [(2, None), (3, None)]
    assert t.properties.get("owner") == "me"
    # history keeps each staged snapshot (append + MoR delete)
    assert len(t.metadata.snapshots) == n_snaps0 + 2
    # staged intermediates never existed on storage: not in the lineage log
    assert all(
        "staged://" not in str(e.get("metadata-file", ""))
        for e in t.metadata.metadata_log
    )
    # every snapshot's manifest list is readable from the published state
    for s in t.metadata.snapshots:
        t.ops.read_manifest(s.manifest_list)


def test_transaction_abort_discards(catalog):
    t = catalog.create_table("txn2", schema={"k": "int"})
    t.append([{"k": 1}])
    v0 = t.ops.current_version()
    with t.transaction() as tx:
        tx.append([{"k": 9}])
        tx.abort()
    assert t.ops.current_version() == v0
    assert sorted(r["k"] for r in t.refresh().to_a()) == [1]


def test_transaction_exception_discards(catalog):
    t = catalog.create_table("txn3", schema={"k": "int"})
    t.append([{"k": 1}])
    v0 = t.ops.current_version()
    with pytest.raises(RuntimeError, match="boom"):
        with t.transaction() as tx:
            tx.append([{"k": 9}])
            raise RuntimeError("boom")
    assert t.ops.current_version() == v0
    assert sorted(r["k"] for r in t.refresh().to_a()) == [1]


def test_transaction_conflict_detection(catalog):
    t = catalog.create_table("txn4", schema={"k": "int"})
    t.append([{"k": 1}])
    tx = t.transaction()
    tx.append([{"k": 2}])
    # a concurrent commit wins while the txn is open
    t2 = catalog.load_table("txn4")
    t2.append([{"k": 3}])
    with pytest.raises(InvalidDataError, match="transaction commit conflict"):
        tx.commit()
    # the concurrent commit survives; the txn's rows do not
    assert sorted(r["k"] for r in t.refresh().to_a()) == [1, 3]


def test_transaction_double_commit_refused(catalog):
    t = catalog.create_table("txn5", schema={"k": "int"})
    tx = t.transaction()
    tx.append([{"k": 1}])
    tx.commit()
    with pytest.raises(InvalidDataError, match="already committed"):
        tx.commit()
    assert sorted(r["k"] for r in t.refresh().to_a()) == [1]


def test_transaction_partitioned_cow_update(catalog):
    """CoW update + compaction staged together over a partitioned table:
    the partition layout and rewritten files publish as one commit."""
    t = catalog.create_table(
        "txn6", schema={"k": "int", "p": "string"}, partition_spec=["p"]
    )
    t.append([{"k": i, "p": "a" if i % 2 else "b"} for i in range(6)])
    v0 = t.ops.current_version()
    with t.transaction() as tx:
        tx.update_where({"p": "'c'"}, "k = 5")
        tx.compact()
    assert t.ops.current_version() == v0 + 1
    got = sorted((r["k"], r["p"]) for r in t.refresh().to_a())
    assert got == [(0, "b"), (1, "a"), (2, "b"), (3, "a"), (4, "b"), (5, "c")]


def test_transaction_scan_and_time_travel_inside(catalog):
    """Snapshot-pinned reads inside the block address staged snapshots."""
    t = catalog.create_table("txn7", schema={"k": "int"})
    t.append([{"k": 1}])
    with t.transaction() as tx:
        tx.append([{"k": 2}])
        mid = tx.current_snapshot().snapshot_id
        tx.append([{"k": 3}])
        assert sorted(r["k"] for r in tx.to_a(snapshot_id=mid)) == [1, 2]
        assert sorted(r["k"] for r in tx.to_a()) == [1, 2, 3]
    assert sorted(r["k"] for r in t.refresh().to_a()) == [1, 2, 3]


def test_transaction_over_sql_catalog(spark, tmp_path):
    """Transactions work over any ops backend with the load/commit/CAS
    contract — here the SQL registry (CAS via UPDATE ... WHERE version)."""
    import iceberg_ruby_spark as ice

    wh = str(tmp_path / "wh")
    cat = ice.SqlCatalog(
        uri=f"sqlite:///{tmp_path}/catalog.db",
        warehouse=wh,
        namespace="default",
        spark=spark,
    )
    cat.create_namespace("default")
    t = cat.create_table("txsql", schema={"k": "int"})
    t.append([{"k": 1}])
    v0 = t.ops.current_version()
    with t.transaction() as tx:
        tx.append([{"k": 2}])
        tx.delete_where("k = 1", mode="merge-on-read")
        assert sorted(r["k"] for r in t.refresh().to_a()) == [1]
    assert t.ops.current_version() == v0 + 1
    assert sorted(r["k"] for r in t.refresh().to_a()) == [2]

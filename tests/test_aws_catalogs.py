"""Glue and S3 Tables catalog backends against in-process fakes — the
DDL/write/read/mutation matrix the reference gates its AWS backends on
(``lib/iceberg/glue_catalog.rb``, ``lib/iceberg/s3_tables_catalog.rb``),
plus the commit-CAS semantics each service documents (Glue VersionId,
S3 Tables versionToken)."""

from __future__ import annotations

import shutil
import tempfile
import threading

import pytest

from iceberg_ruby_spark.aws import GlueCatalog, S3TablesCatalog
from iceberg_ruby_spark.errors import (
    InvalidDataError,
    NamespaceAlreadyExistsError,
    NoSuchNamespaceError,
    NoSuchTableError,
    TableAlreadyExistsError,
)
from tests.support.aws_stubs import FakeGlueClient, FakeS3TablesClient

ARN = "arn:aws:s3tables:us-east-1:000000000000:bucket/test-bucket"


@pytest.fixture(params=["glue", "s3tables"])
def awscat(request, spark):
    wh = tempfile.mkdtemp(prefix=f"{request.param}_wh_")
    if request.param == "glue":
        cat = GlueCatalog(
            warehouse=wh, client=FakeGlueClient(page_size=2),
            namespace="default", spark=spark,
        )
    else:
        cat = S3TablesCatalog(
            arn=ARN, client=FakeS3TablesClient(page_size=2),
            warehouse=wh, namespace="default", spark=spark,
        )
    cat.create_namespace("default")
    yield cat
    shutil.rmtree(wh, ignore_errors=True)


def test_namespace_crud(awscat):
    awscat.create_namespace("ns1")
    assert awscat.namespace_exists("ns1")
    assert ["ns1"] in awscat.list_namespaces()
    with pytest.raises(NamespaceAlreadyExistsError):
        awscat.create_namespace("ns1")
    awscat.create_namespace("ns1", if_not_exists=True)  # no raise
    with pytest.raises(InvalidDataError):
        awscat.create_namespace("nested.ns")  # single-level only
    awscat.drop_namespace("ns1")
    assert not awscat.namespace_exists("ns1")
    with pytest.raises(NoSuchNamespaceError):
        awscat.drop_namespace("ns1")
    awscat.drop_namespace("ns1", if_exists=True)


def test_namespace_pagination(awscat):
    for i in range(5):
        awscat.create_namespace(f"p{i}")
    names = [n[0] for n in awscat.list_namespaces()]
    assert [f"p{i}" for i in range(5)] == [n for n in names if n.startswith("p")]


def test_table_roundtrip_and_mutations(awscat):
    t = awscat.create_table("t1", schema={"a": "int", "b": "string"})
    with pytest.raises(TableAlreadyExistsError):
        awscat.create_table("t1", schema={"a": "int"})
    t.append([{"a": i, "b": "x"} for i in range(10)])
    assert t.delete_where("a < 3") == 3
    assert t.delete_where("a = 5", mode="merge-on-read-positional") == 1
    assert sorted(r["a"] for r in awscat.load_table("t1").to_a()) == [3, 4, 6, 7, 8, 9]
    assert [p[-1] for p in awscat.list_tables("default")] == ["t1"]
    t.compact()
    assert sorted(r["a"] for r in t.to_a()) == [3, 4, 6, 7, 8, 9]
    with pytest.raises(NoSuchTableError):
        awscat.load_table("missing")
    awscat.drop_table("t1")
    assert not awscat.table_exists("t1")


def test_time_travel_and_refs(awscat):
    t = awscat.create_table("tt", schema={"a": "int"})
    t.append([{"a": 1}])
    first = t.current_snapshot().snapshot_id
    t.create_tag("v1", first)
    t.append([{"a": 2}])
    assert sorted(r["a"] for r in t.to_a()) == [1, 2]
    assert [r["a"] for r in t.to_a(ref="v1")] == [1]
    assert [r["a"] for r in t.to_a(snapshot_id=first)] == [1]


def test_concurrent_appends_cas(awscat):
    """Racing writers all land: the service CAS (VersionId/versionToken)
    feeds the engine's optimistic retry loop."""
    awscat.create_table("cc", schema={"w": "int", "i": "int"})
    errors = []

    def writer(w):
        try:
            h = awscat.load_table("cc")
            for i in range(3):
                h.append([{"w": w, "i": i}])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    rows = awscat.load_table("cc").to_a()
    assert len(rows) == 9
    assert {(r["w"], r["i"]) for r in rows} == {(w, i) for w in range(3) for i in range(3)}


def test_rename_table(awscat):
    t = awscat.create_table("old_name", schema={"a": "int"})
    t.append([{"a": 7}])
    awscat.create_namespace("other")
    awscat.rename_table("old_name", "other.new_name")
    assert not awscat.table_exists("old_name")
    got = awscat.load_table("other.new_name")
    assert [r["a"] for r in got.to_a()] == [7]
    with pytest.raises(NoSuchTableError):
        awscat.rename_table("old_name", "other.x")


def test_register_across_backends(awscat, spark):
    """A table written by the FS catalog registers by metadata pointer."""
    import iceberg_ruby_spark as ice

    fs = ice.MemoryCatalog(namespace="src", spark=spark)
    fs.create_namespace("src")
    t = fs.create_table("src.t", schema={"a": "int"})
    t.append([{"a": 41}, {"a": 42}])
    meta_path = t.metadata.metadata_file  # v{N}.json form; dir form below
    got = awscat.register_table("reg", meta_path)
    assert sorted(r["a"] for r in got.to_a()) == [41, 42]
    with pytest.raises(TableAlreadyExistsError):
        awscat.register_table("reg", meta_path)
    got2 = awscat.register_table("reg2", t.location)  # dir form
    assert sorted(r["a"] for r in got2.to_a()) == [41, 42]


def test_drop_nonempty_namespace_blocked(awscat):
    awscat.create_namespace("full")
    awscat.create_table("full.t", schema={"a": "int"})
    with pytest.raises(InvalidDataError):
        awscat.drop_namespace("full")


def test_glue_namespace_properties(spark):
    wh = tempfile.mkdtemp(prefix="glueprops_wh_")
    cat = GlueCatalog(warehouse=wh, client=FakeGlueClient(), spark=spark)
    cat.create_namespace("ns", properties={"owner": "a"})
    assert cat.namespace_properties("ns") == {"owner": "a"}
    cat.update_namespace("ns", {"owner": "b", "tier": "gold"})
    assert cat.namespace_properties("ns") == {"owner": "b", "tier": "gold"}
    shutil.rmtree(wh, ignore_errors=True)


def test_s3tables_namespace_properties_rejected(spark):
    wh = tempfile.mkdtemp(prefix="s3tprops_wh_")
    cat = S3TablesCatalog(arn=ARN, client=FakeS3TablesClient(), warehouse=wh, spark=spark)
    cat.create_namespace("ns")
    assert cat.namespace_properties("ns") == {}
    with pytest.raises(InvalidDataError):
        cat.update_namespace("ns", {"x": "y"})
    shutil.rmtree(wh, ignore_errors=True)


def test_avro_manifests_over_pointer_backend(awscat):
    """The write.metadata.manifest-format=avro property routes through the
    pointer backends' delegating table ops (write_manifest ctx
    pass-through): append, MoR delete, and time travel plan from spec
    Avro metadata under Glue/S3Tables exactly as on the FS catalog."""
    t = awscat.create_table(
        "av", schema={"k": "int"},
        properties={"write.metadata.manifest-format": "avro"},
    )
    t.append([{"k": i} for i in range(6)])
    s1 = t.current_snapshot()
    assert s1.manifest_list.endswith(".avro")
    t.delete_where("k >= 5", mode="merge-on-read-positional")
    assert sorted(r["k"] for r in t.to_a()) == [0, 1, 2, 3, 4]
    assert t.scan(snapshot_id=s1.snapshot_id).count() == 6

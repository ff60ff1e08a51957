"""RestCatalog against the local stub REST fixture (tests/support/
rest_server.py) — the same DDL/write/read matrix tests/test_catalog.py
runs on the FS backend, the way reference CI points its suite at
``apache/iceberg-rest-fixture`` (build.yml:6-31)."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest

import iceberg_ruby_spark as ice
from iceberg_ruby_spark.errors import (
    InvalidDataError,
    NamespaceAlreadyExistsError,
    NoSuchNamespaceError,
    NoSuchTableError,
    TableAlreadyExistsError,
)
from tests.support.rest_server import StubRestServer


@pytest.fixture()
def rest(spark):
    wh = tempfile.mkdtemp(prefix="rest_wh_")
    with StubRestServer(warehouse=wh) as srv:
        cat = ice.RestCatalog(srv.uri, warehouse=wh, namespace="default", spark=spark)
        cat.create_namespace("default")
        yield cat
    shutil.rmtree(wh, ignore_errors=True)


def test_namespace_crud(rest):
    rest.create_namespace("ns1", properties={"owner": "a"})
    assert rest.namespace_exists("ns1")
    assert rest.namespace_properties("ns1") == {"owner": "a"}
    rest.update_namespace("ns1", {"owner": "b"})
    assert rest.namespace_properties("ns1") == {"owner": "b"}
    assert ["ns1"] in rest.list_namespaces()
    with pytest.raises(NamespaceAlreadyExistsError):
        rest.create_namespace("ns1")
    rest.create_namespace("ns1.child")
    assert rest.list_namespaces("ns1") == [["ns1", "child"]]
    with pytest.raises(InvalidDataError):
        rest.drop_namespace("ns1")  # non-empty
    rest.drop_namespace("ns1.child")
    rest.drop_namespace("ns1")
    assert not rest.namespace_exists("ns1")
    with pytest.raises(NoSuchNamespaceError):
        rest.create_namespace("missing.child")


def test_table_roundtrip(rest):
    t = rest.create_table("t1", schema={"a": "int", "b": "string"})
    assert rest.table_exists("t1")
    with pytest.raises(TableAlreadyExistsError):
        rest.create_table("t1", schema={"a": "int"})
    t.append([{"a": 1, "b": "one"}, {"a": 2, "b": "two"}])
    t.append([{"a": 3, "b": "three"}])
    assert sorted(r["a"] for r in t.to_a()) == [1, 2, 3]
    assert len(t.snapshots) == 2
    # reload through the catalog — registry state comes from the server
    t2 = rest.load_table("t1")
    assert sorted(r["a"] for r in t2.to_a()) == [1, 2, 3]
    assert [p[-1] for p in rest.list_tables("default")] == ["t1"]
    with pytest.raises(NoSuchTableError):
        rest.load_table("missing")


def test_mutations_and_maintenance(rest):
    t = rest.create_table("t2", schema={"a": "int", "b": "string"})
    t.append([{"a": i, "b": "x"} for i in range(10)])
    assert t.delete_where("a < 3") == 3
    assert t.update_where({"b": "'y'"}, "a >= 8") == 2
    assert t.delete_where("a = 5", mode="merge-on-read") == 1
    rows = {r["a"]: r["b"] for r in t.to_a()}
    assert set(rows) == {3, 4, 6, 7, 8, 9}
    assert rows[9] == "y"
    t.compact()
    assert t.expire_snapshots(keep_last=1) >= 1
    assert set(r["a"] for r in t.to_a()) == {3, 4, 6, 7, 8, 9}


def test_commit_conflict_cas(rest):
    """Two handles racing a commit through the server: the loser retries
    against fresh state (server 409 → FileExistsError → retry loop)."""
    t = rest.create_table("t3", schema={"a": "int"})
    h1 = rest.load_table("t3")
    h2 = rest.load_table("t3")
    h1.append([{"a": 1}])
    h2.append([{"a": 2}])  # h2 committed from a stale version — must rebase
    assert sorted(r["a"] for r in rest.load_table("t3").to_a()) == [1, 2]


def test_time_travel_and_refs(rest):
    t = rest.create_table("t4", schema={"a": "int"})
    t.append([{"a": 1}])
    first = t.current_snapshot_id
    t.create_tag("v1")
    t.append([{"a": 2}])
    assert sorted(r["a"] for r in t.to_a()) == [1, 2]
    assert [r["a"] for r in t.to_a(snapshot_id=first)] == [1]
    assert [r["a"] for r in t.to_a(ref="v1")] == [1]


def test_rename_table(rest):
    rest.create_table("t5", schema={"a": "int"}).append([{"a": 7}])
    rest.create_namespace("other")
    rest.rename_table("t5", "other.t5r")
    assert not rest.table_exists("t5")
    assert [r["a"] for r in rest.load_table("other.t5r").to_a()] == [7]
    with pytest.raises(NoSuchTableError):
        rest.rename_table("t5", "t6")


def test_register_fs_table(rest, spark):
    """An FS-catalog table registers into the REST catalog by reference."""
    fs = ice.MemoryCatalog(namespace="d", spark=spark)
    try:
        fs.create_namespace("d")
        src = fs.create_table("src", schema={"a": "int"})
        src.append([{"a": 42}])
        reg = rest.register_table("reg", src.ops.location)
        assert [r["a"] for r in reg.to_a()] == [42]
        with pytest.raises(TableAlreadyExistsError):
            rest.register_table("reg", src.ops.location)
    finally:
        shutil.rmtree(fs.warehouse, ignore_errors=True)


def test_drop_and_purge(rest):
    t = rest.create_table("t7", schema={"a": "int"})
    t.append([{"a": 1}])
    loc = t.ops.location
    rest.drop_table("t7")
    assert not rest.table_exists("t7")
    rest.drop_table("t7", if_exists=True)  # no-op
    with pytest.raises(NoSuchTableError):
        rest.drop_table("t7")
    # purge removes files too
    t = rest.create_table("t8", schema={"a": "int"})
    t.append([{"a": 1}])
    loc = t.ops.location
    rest.purge_table("t8")
    import os

    assert not os.path.exists(os.path.join(loc, "data"))


def test_sql_over_rest(rest):
    rest.create_table("q", schema={"a": "int", "b": "string"}).append(
        [{"a": 1, "b": "one"}, {"a": 2, "b": "two"}]
    )
    res = rest.sql("SELECT b FROM q WHERE a = $1", [2])
    assert res.rows == [["two"]]


def test_token_auth_passthrough(spark):
    wh = tempfile.mkdtemp(prefix="rest_wh_tok_")
    try:
        with StubRestServer(warehouse=wh, required_token="sekrit") as srv:
            # wrong token → server rejects
            with pytest.raises(InvalidDataError):
                ice.RestCatalog(srv.uri, warehouse=wh, token="wrong", spark=spark)
            cat = ice.RestCatalog(srv.uri, warehouse=wh, token="sekrit", spark=spark)
            cat.create_namespace("ns")
            assert cat.namespace_exists("ns")
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_oauth_client_credentials(spark):
    wh = tempfile.mkdtemp(prefix="rest_wh_oauth_")
    try:
        with StubRestServer(warehouse=wh, required_token="oauth-clientA") as srv:
            cat = ice.RestCatalog(
                srv.uri, warehouse=wh, credential="clientA:topsecret", spark=spark
            )
            cat.create_namespace("ns")
            assert cat.namespace_exists("ns")
    finally:
        shutil.rmtree(wh, ignore_errors=True)


_SPEC_ACTIONS = {
    "assign-uuid", "upgrade-format-version", "add-schema", "set-current-schema",
    "add-spec", "set-default-spec", "add-sort-order", "set-default-sort-order",
    "set-properties", "remove-properties", "add-snapshot", "remove-snapshots",
    "set-snapshot-ref", "remove-snapshot-ref", "set-location",
    "set-statistics", "remove-statistics",
    "set-partition-statistics", "remove-partition-statistics",
    "add-encryption-key", "remove-encryption-key",
}
_SPEC_REQUIREMENTS = {
    "assert-create", "assert-table-uuid", "assert-ref-snapshot-id",
    "assert-current-schema-id", "assert-default-spec-id",
    "assert-default-sort-order-id", "assert-last-assigned-field-id",
    "assert-last-assigned-partition-id",
}


def test_commit_wire_protocol_is_spec_vocabulary(rest):
    """Every commit body sent over the wire uses only Iceberg REST spec
    TableUpdate actions and TableRequirement types — the round-3 advisory
    flagged an invented set-metadata/assert-table-version stub protocol."""
    captured = []
    orig = rest.client.request

    def spy(method, path, body=None, params=None):
        if method == "POST" and body is not None and "updates" in body:
            captured.append(body)
        return orig(method, path, body=body, params=params)

    rest.client.request = spy
    try:
        t = rest.create_table("wire", schema={"k": "int", "v": "string"})
        t.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
        t.delete_where("k = 2")
        t.create_tag("v1")
        t.update_properties({"owner": "x"})
        with t.update_schema() as u:
            u.add_column("extra", "string")
        t.append([{"k": 3, "v": "c", "extra": "e"}])
        t.expire_snapshots(keep_last=1)
    finally:
        rest.client.request = orig

    assert captured, "no commit bodies captured"
    seen_actions = set()
    seen_reqs = set()
    for body in captured:
        for u in body["updates"]:
            assert u["action"] in _SPEC_ACTIONS, u
            seen_actions.add(u["action"])
        for r in body.get("requirements", []):
            assert r["type"] in _SPEC_REQUIREMENTS, r
            seen_reqs.add(r["type"])
        assert "metadata" not in json.dumps(body.get("requirements", []))
    # the matrix above must exercise the core action families
    assert {"add-snapshot", "set-snapshot-ref", "add-schema",
            "set-properties", "remove-snapshots"} <= seen_actions
    assert {"assert-table-uuid", "assert-ref-snapshot-id"} <= seen_reqs


def test_server_owns_derived_metadata(rest):
    """The server derives next-row-id / last-sequence-number / logs from
    the granular updates; the engine adopts the server's document and the
    derived state matches what the FS backend would compute."""
    t = rest.create_table("derived", schema={"k": "int"})
    t.append([{"k": 1}, {"k": 2}, {"k": 3}])
    t.append([{"k": 4}])
    meta = t.metadata.raw
    assert meta["next-row-id"] == 4
    assert meta["last-sequence-number"] == 2
    assert len(meta["snapshot-log"]) == 2
    assert len(meta["snapshots"]) == 2
    # snapshot-log timestamps equal the snapshots' own commit timestamps
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    for e in meta["snapshot-log"]:
        assert e["timestamp-ms"] == by_id[e["snapshot-id"]]["timestamp-ms"]
    # server-assigned uuid is stable across commits
    u0 = meta["table-uuid"]
    t.append([{"k": 5}])
    assert t.metadata.raw["table-uuid"] == u0

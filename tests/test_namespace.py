"""Namespace CRUD — mirrors reference ``test/namespace_test.rb`` (nested
namespaces, duplicate/missing errors, properties)."""

import pytest

from iceberg_ruby_spark.errors import (
    NamespaceAlreadyExistsError,
    NoSuchNamespaceError,
)


def test_create_and_exists(catalog):
    catalog.create_namespace("ns1")
    assert catalog.namespace_exists("ns1")
    assert not catalog.namespace_exists("nope")


def test_create_duplicate_raises(catalog):
    catalog.create_namespace("ns1")
    with pytest.raises(NamespaceAlreadyExistsError):
        catalog.create_namespace("ns1")


def test_create_if_not_exists(catalog):
    catalog.create_namespace("ns1")
    catalog.create_namespace("ns1", if_not_exists=True)  # no raise
    assert catalog.namespace_exists("ns1")


def test_nested_namespaces(catalog):
    catalog.create_namespace("a")
    catalog.create_namespace(["a", "b"])
    catalog.create_namespace("a.b.c")
    assert catalog.namespace_exists(["a", "b"])
    assert catalog.namespace_exists("a.b.c")
    assert ["a", "b"] in catalog.list_namespaces("a")
    assert ["a", "b", "c"] in catalog.list_namespaces(["a", "b"])


def test_nested_requires_parent(catalog):
    with pytest.raises(NoSuchNamespaceError):
        catalog.create_namespace("missing.child")


def test_list_namespaces_top_level(catalog):
    catalog.create_namespace("x")
    catalog.create_namespace("y")
    top = catalog.list_namespaces()
    assert ["x"] in top and ["y"] in top


def test_properties_roundtrip(catalog):
    catalog.create_namespace("p", properties={"owner": "me"})
    assert catalog.namespace_properties("p") == {"owner": "me"}
    catalog.update_namespace("p", {"owner": "you", "tier": "gold"})
    props = catalog.namespace_properties("p")
    assert props["owner"] == "you" and props["tier"] == "gold"


def test_drop_namespace(catalog):
    catalog.create_namespace("d")
    catalog.drop_namespace("d")
    assert not catalog.namespace_exists("d")
    with pytest.raises(NoSuchNamespaceError):
        catalog.drop_namespace("d")
    catalog.drop_namespace("d", if_exists=True)  # no raise


def test_drop_missing_properties_raises(catalog):
    with pytest.raises(NoSuchNamespaceError):
        catalog.namespace_properties("missing")

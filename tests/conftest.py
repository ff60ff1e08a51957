"""Shared fixtures: one SparkSession per test run, a fresh temp-dir
catalog per test (mirrors reference ``test/test_helper.rb``: new
MemoryCatalog with default namespace per test)."""

from __future__ import annotations

import shutil

import pytest

import iceberg_ruby_spark as ice
from iceberg_ruby_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("iceberg_ruby_spark-tests")


@pytest.fixture()
def catalog(spark):
    cat = ice.MemoryCatalog(namespace="default")
    cat.create_namespace("default")
    yield cat
    shutil.rmtree(cat.warehouse, ignore_errors=True)

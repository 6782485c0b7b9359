"""Shared test fixtures: one SparkSession per test session, sf0.001 data."""

from __future__ import annotations

import os

import pytest

from synch_spark.session import get_spark, load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparksynch-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)

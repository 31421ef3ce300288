"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_datastore_app_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
# Oracle-differential tests default to sf0.01 — the driver's gate scale.
# sf0.001 hid a real bug once (agg_ab_test LCG parity surfaced only at
# sf0.01); override with SPARK_GRAFT_TEST_SF_DIR for a faster smoke run.
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # 8 threads is plenty for sf0.001 fixtures and keeps startup/shuffle
    # overhead low; production sizing lives in session.get_spark defaults.
    s = get_spark(app_name="kinesis-datastore-app-spark-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE

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


def kill_restart_stream(spark, tmp_path, n, options):
    """Shared kill/restart harness for the custom kinesis_sim source
    (used by the static-shard test in test_properties and the reshard
    test in test_reshard): start a slow parquet-sink stream, kill it
    mid-run, restart from the checkpoint, and return the final sink
    DataFrame for exactly-once assertions.

    The cadence is deliberately slow — n/records_per_batch batches at a
    500 ms trigger makes the stream take several seconds end to end, so
    the mid-run kill cannot race a fast box into a completed stream
    before stop() lands."""
    import time

    from kinesis_datastore_app_spark.sources.kinesis_sim import _register_source

    _register_source(spark)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def start():
        r = spark.readStream.format("kinesis_sim").option("n", n)
        for k, v in options.items():
            r = r.option(k, v)
        return (
            r.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="500 milliseconds")
            .start()
        )

    def rows():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    q = start()
    deadline = time.time() + 90
    while time.time() < deadline and rows() < 100:
        time.sleep(0.2)
    q.stop()
    assert rows() < n, "stream finished before the kill — lower the cut point"

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline and rows() < n:
        time.sleep(0.3)
    q.stop()
    return spark.read.parquet(out)

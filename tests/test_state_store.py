"""RocksDB state-store axis for the stateful streaming operators.

SCALE.md names RocksDBStateStoreProvider (+ changelog checkpointing) as
THE 100 TB lever for the stateful streaming keys: the default HDFS-backed
provider keeps every state row on the executor HEAP (state volume is
bounded by executor memory), while RocksDB spills to local disk and
checkpoints changelogs incrementally. These tests turn that claim into
exercised code: the provider must actually engage, and every stateful
replay key must produce oracle-identical results under it — state-store
choice is a deployment knob, never a semantics change.

Measured at 16x corpus (tools/scale_probe.py --keys stream_dedup,... with
the provider conf): see the SCALE.md "RocksDB state store" table row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_datastore_app_spark import registry
from tests.oracle_harness import run_check

registry.load_all()

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)

# The keys whose micro-batch replays keep per-key state in a state store
# (dedup key set, session-window merge state, applyInPandasWithState
# rows, watermarked window partials).
STATEFUL_KEYS = [
    "stream_dedup",
    "stream_session",
    "stream_stateful",
    "stream_watermark",
]


@pytest.fixture()
def rocksdb_state_store(spark):
    try:
        prev = spark.conf.get(_PROVIDER_CONF)
    except Exception:
        prev = None
    spark.conf.set(_PROVIDER_CONF, ROCKSDB)
    spark.conf.set(_CHANGELOG_CONF, "true")
    try:
        yield
    finally:
        if prev:
            spark.conf.set(_PROVIDER_CONF, prev)
        else:
            spark.conf.unset(_PROVIDER_CONF)
        spark.conf.unset(_CHANGELOG_CONF)


def test_rocksdb_provider_actually_engages(spark, rocksdb_state_store, tmp_path):
    """Guard against a silently-ignored conf: a stateful query run under
    the provider conf must report RocksDB custom metrics in its progress
    (the HDFS-backed provider emits none of the rocksdb* keys)."""
    src = str(tmp_path / "src")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).write.parquet(src)
    sdf = (
        spark.readStream.schema("k BIGINT, v BIGINT")
        .parquet(src)
        .dropDuplicates(["k"])
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("rocksdb_engage_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert progresses, "no stateful progress recorded"
    metrics = progresses[-1]["stateOperators"][0]["customMetrics"]
    assert any("rocksdb" in m.lower() for m in metrics), sorted(metrics)[:5]
    assert spark.table("rocksdb_engage_probe").count() == 100


@pytest.mark.parametrize("key", STATEFUL_KEYS)
def test_stateful_key_provider_invariant(
    spark, sf_dir, key, rocksdb_state_store
):
    """Each stateful replay key must be oracle-identical under RocksDB —
    the exact differential the driver runs, with only the state-store
    provider swapped."""
    assert key in registry.QUERIES
    run_check(spark, key, sf_dir)

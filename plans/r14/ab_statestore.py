#!/usr/bin/env python
"""Paired state-store experiment (r14 verdict item 4): RocksDB provider
vs the default HDFS-backed store, and STATE_PARTITIONS 8 vs 4, on the
stateful replay keys — one session, interleaved arms, min-of-n.

The provider class is read at query start, so it toggles at runtime;
STATE_PARTITIONS is monkeypatched on source_factory (the keys read it
through run_to_table's conf scope at each invocation).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import SF_DIR, _box_probe  # noqa: E402
from kinesis_datastore_app_spark import registry  # noqa: E402
from kinesis_datastore_app_spark.session import get_spark  # noqa: E402
from kinesis_datastore_app_spark.streaming import source_factory  # noqa: E402

KEYS = ["stream_watermark", "stream_stream_join_outer", "stream_tumbling"]
ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
ARMS = [
    ("hdfs_sp8", HDFS, 8),
    ("rocksdb_sp8", ROCKS, 8),
    ("hdfs_sp4", HDFS, 4),
]
ROUNDS = 3


def main():
    spark = get_spark(app_name="ab-statestore")
    qs = registry.queries()
    for k in KEYS:  # warm (fixtures + JVM)
        qs[k](spark, SF_DIR).count()
    probe0 = _box_probe(spark, SF_DIR)
    samples = {k: {arm: [] for arm, _, _ in ARMS} for k in KEYS}
    sp0 = source_factory.STATE_PARTITIONS
    try:
        for r in range(ROUNDS):
            for arm, provider, sp in ARMS:
                spark.conf.set(PROVIDER_CONF, provider)
                source_factory.STATE_PARTITIONS = sp
                for k in KEYS:
                    t0 = time.perf_counter()
                    qs[k](spark, SF_DIR).count()
                    samples[k][arm].append(time.perf_counter() - t0)
            print(f"round {r} done", flush=True)
    finally:
        source_factory.STATE_PARTITIONS = sp0
        spark.conf.set(PROVIDER_CONF, HDFS)
    probe1 = _box_probe(spark, SF_DIR)
    out = {"box_probe": [round(probe0, 4), round(probe1, 4)], "per_key": {}}
    for k in KEYS:
        out["per_key"][k] = {
            arm: {
                "min": round(min(v), 4),
                "all": [round(x, 3) for x in v],
            }
            for arm, v in samples[k].items()
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

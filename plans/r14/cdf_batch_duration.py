#!/usr/bin/env python
"""Deterministic per-micro-batch durationMs for the stream_cdf_to_table
pipeline (r14 item 3 evidence): replicates run_cdf_to_table but keeps
the query handle so recentProgress survives, printing each batch's
durationMs map. Run from the repo root being measured (tree vs ref
worktree); the fixture + scratch are shared steady-state."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402

from kinesis_datastore_app_spark.session import get_spark  # noqa: E402
from kinesis_datastore_app_spark.sources.cdf_stream import (  # noqa: E402
    CdfStreamDataSource,
    cdf_bucketed_fixture,
)
from kinesis_datastore_app_spark.streaming.queries import (  # noqa: E402
    txnlog_apply_feed_batch,
)
from kinesis_datastore_app_spark.tmpdirs import scratch_tmpdir  # noqa: E402
from kinesis_datastore_app_spark.txnlog import (  # noqa: E402
    data_paths,
    read_latest,
    read_version,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, tag):
    from kinesis_datastore_app_spark.operators.cdc import (
        commit_bucketed_table,
    )

    root_a, _ = cdf_bucketed_fixture(spark, SF_DIR)
    until = read_latest(root_a)[0]
    scratch = scratch_tmpdir("kdas_diagcdf_")
    root_b = f"{scratch}/derived"
    keys = ["o_custkey", "o_orderpriority"]
    vals = ["n_orders", "cents"]
    v1 = spark.read.parquet(
        *data_paths(root_a, read_version(root_a, 1))
    ).select(*keys, *vals)
    commit_bucketed_table(
        spark, root_b, v1, keys, 8, extra={"batch_id": -1, "src_version": 1}
    )
    spark.dataSource.register(CdfStreamDataSource)
    sdf = (
        spark.readStream.format("cdf_stream")
        .option("path", root_a)
        .option("keys", "o_custkey:bigint,o_orderpriority:string")
        .option("vals", "n_orders:bigint,cents:bigint")
        .load()
    )
    q = (
        sdf.writeStream.foreachBatch(
            lambda df, bid: txnlog_apply_feed_batch(
                root_b, df, bid, keys, vals
            )
        )
        .option("checkpointLocation", f"{scratch}/ckpt")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if not q.isActive:
            break
        _, payload = read_latest(root_b)
        if (payload or {}).get("src_version", 0) >= until:
            break
        time.sleep(0.05)
    q.stop()
    q.awaitTermination()
    rows = []
    for p in q.recentProgress:
        d = p["durationMs"]
        rows.append(
            {
                "batch": p["batchId"],
                "rows": p["numInputRows"],
                "addBatch": d.get("addBatch"),
                "trigger": d.get("triggerExecution"),
            }
        )
    print(tag, json.dumps(rows))
    data_batches = [r for r in rows if r["rows"]]
    if data_batches:
        tot = sum(r["addBatch"] or 0 for r in data_batches)
        print(
            f"{tag} data_batches={len(data_batches)} "
            f"addBatch_total_ms={tot} "
            f"mean={tot / len(data_batches):.0f}"
        )


def main():
    spark = get_spark(app_name="cdf-batch-duration")
    for i in range(int(os.environ.get("N_RUNS", "3"))):
        run_once(spark, f"run{i}")


if __name__ == "__main__":
    main()

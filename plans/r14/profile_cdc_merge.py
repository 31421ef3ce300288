#!/usr/bin/env python
"""Profile stream_cdc_merge's per-batch cost (r14 verdict item 5):
run the replay once capturing per-batch durationMs, then time the
sub-steps of cdc_merge_batch in isolation on a static batch frame —
distinct-bucket collect vs staged write vs publish renames."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bench import SF_DIR  # noqa: E402
from kinesis_datastore_app_spark.session import get_spark  # noqa: E402
from kinesis_datastore_app_spark.streaming.queries import (  # noqa: E402
    CDC_N_BUCKETS,
    cdc_merge_batch,
)
from kinesis_datastore_app_spark.streaming.source_factory import (  # noqa: E402
    events_stream,
    events_stream_dir,
)
from kinesis_datastore_app_spark.tmpdirs import scratch_tmpdir  # noqa: E402


def main():
    spark = get_spark(app_name="profile-cdc-merge")

    # 1. the streaming run, with progress capture
    s = events_stream(spark, SF_DIR, files=3, max_files_per_trigger=1)
    root = scratch_tmpdir("kdas_cdcprof_")
    state = f"{root}/state"
    t0 = time.perf_counter()
    q = (
        s.writeStream.foreachBatch(
            lambda df, bid: cdc_merge_batch(state, df, bid)
        )
        .option("checkpointLocation", scratch_tmpdir("kdas_cdcprof_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    prog = [
        {
            "batch": p["batchId"],
            "rows": p["numInputRows"],
            "addBatch": p["durationMs"].get("addBatch"),
            "trigger": p["durationMs"].get("triggerExecution"),
        }
        for p in q.recentProgress
    ]
    print("stream wall", round(wall, 2), json.dumps(prog))

    # 2. sub-step timings on a static copy of one replay file, merged
    # into the state the stream just built (same shape as batch 3)
    d = events_stream_dir(spark, SF_DIR, copies=1, files=3)
    import glob

    f0 = sorted(glob.glob(f"{d}/*.parquet"))[0]
    batch_df = spark.read.parquet(f0)
    sess = spark

    delta = (
        batch_df.withColumn(
            "bucket", F.pmod(F.hash(F.col("user_id")), F.lit(CDC_N_BUCKETS))
        )
        .groupBy("bucket", "user_id")
        .agg(
            F.max_by(
                F.col("event_type"), F.struct(F.col("ts"), F.col("event_id"))
            ).alias("last_status"),
            F.max(F.struct("ts", "event_id")).alias("_last_key"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    for rep in range(3):
        t = time.perf_counter()
        affected = sorted(
            r["bucket"] for r in delta.select("bucket").distinct().collect()
        )
        t_collect = time.perf_counter() - t

        prev_dirs = [
            f"{state}/bucket={b}"
            for b in affected
            if os.path.exists(f"{state}/bucket={b}")
        ]
        merged = delta
        if prev_dirs:
            prev = sess.read.option("basePath", state).parquet(*prev_dirs)
            merged = (
                prev.unionByName(delta)
                .groupBy("bucket", "user_id")
                .agg(
                    F.max_by("last_status", "_last_key").alias("last_status"),
                    F.max("_last_key").alias("_last_key"),
                    F.sum("n_events").alias("n_events"),
                )
            )
        staging = f"{state}.profstage-{rep}"
        t = time.perf_counter()
        merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        t_write = time.perf_counter() - t
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        print(
            f"rep{rep} n_affected={len(affected)} "
            f"collect={t_collect:.3f}s staged_write={t_write:.3f}s"
        )

        # variant: bucket list straight from the batch (no delta agg)
        t = time.perf_counter()
        _ = (
            batch_df.select(
                F.pmod(F.hash("user_id"), F.lit(CDC_N_BUCKETS)).alias("b")
            )
            .distinct()
            .collect()
        )
        print(f"rep{rep} raw_distinct={time.perf_counter() - t:.3f}s")

        # variant: write delta-only staged, then merge from the staged
        # parquet (replaces the second raw-batch agg with a tiny read)
        t = time.perf_counter()
        dstage = f"{state}.profdelta-{rep}"
        delta.write.mode("overwrite").partitionBy("bucket").parquet(dstage)
        t_dwrite = time.perf_counter() - t
        t = time.perf_counter()
        sd = sess.read.option("basePath", dstage).parquet(dstage)
        merged2 = sd
        if prev_dirs:
            prev = sess.read.option("basePath", state).parquet(*prev_dirs)
            merged2 = (
                prev.unionByName(sd)
                .groupBy("bucket", "user_id")
                .agg(
                    F.max_by("last_status", "_last_key").alias("last_status"),
                    F.max("_last_key").alias("_last_key"),
                    F.sum("n_events").alias("n_events"),
                )
            )
        staging2 = f"{state}.profstage2-{rep}"
        merged2.write.mode("overwrite").partitionBy("bucket").parquet(staging2)
        t_merge2 = time.perf_counter() - t
        shutil.rmtree(dstage, ignore_errors=True)
        shutil.rmtree(staging2, ignore_errors=True)
        print(
            f"rep{rep} delta_write={t_dwrite:.3f}s merge_from_staged="
            f"{t_merge2:.3f}s (sum {t_dwrite + t_merge2:.3f} vs "
            f"{t_collect + t_write:.3f})"
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Long-session inflation bisect (r14 verdict item 1).

Protocol, all in ONE session (the regime the full bench runs in):
  1. fresh session, warm + time the probe keys isolated (min-of-3);
  2. run the full 78-key HEADLINE set once (the session-state load);
  3. re-time the probe keys (inflated reading?);
  4. force JVM System.gc() x3 (stands in for ContextCleaner's periodic
     GC, spark.cleaner.periodicGC.interval default 30 min) and re-time;
  5. report JVM/block-manager counters at each step.

If (4) recovers (3) back to (1), the inflation is GC-deferred driver
state (unreleased shuffles/broadcasts/localCheckpoint blocks) and a
periodic-GC conf is the fix; if not, it is something else (codegen
cache, status store, scratch disk), bisect further.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import HEADLINE, SF_DIR, _box_probe  # noqa: E402
from kinesis_datastore_app_spark import registry  # noqa: E402
from kinesis_datastore_app_spark.session import get_spark  # noqa: E402

PROBES = [
    "cdc_sql_table_changes",
    "stream_cdf_to_table",
    "maintenance_vacuum",
    "agg_group",
    "tpch_q5_shape",
]


def time_keys(spark, qs, keys, n=3):
    out = {}
    for k in keys:
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            qs[k](spark, SF_DIR).count()
            samples.append(time.perf_counter() - t0)
        out[k] = round(min(samples), 4)
    return out


def jvm_stats(spark):
    sc = spark.sparkContext
    jvm = sc._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    heap_used = (rt.totalMemory() - rt.freeMemory()) / 1e6
    n_rdds = sc._jsc.sc().getPersistentRDDs().size()
    # spark local dir disk (shuffle/blockmgr files)
    local_mb = 0
    n_files = 0
    for d in os.listdir("/tmp"):
        if d.startswith(("blockmgr-", "spark-")):
            for dp, _, fns in os.walk(os.path.join("/tmp", d)):
                for f in fns:
                    try:
                        local_mb += os.path.getsize(os.path.join(dp, f)) / 1e6
                        n_files += 1
                    except OSError:
                        pass
    return {
        "heap_used_mb": round(heap_used),
        "persistent_rdds": n_rdds,
        "spark_local_mb": round(local_mb),
        "spark_local_files": n_files,
    }


def main():
    spark = get_spark(app_name="diag-inflation")
    qs = registry.queries()
    report = {}
    for k in PROBES:
        qs[k](spark, SF_DIR).count()  # warm
    report["probe_box_0"] = round(_box_probe(spark, SF_DIR), 4)
    report["isolated"] = time_keys(spark, qs, PROBES)
    report["jvm_0"] = jvm_stats(spark)
    print("ISOLATED", json.dumps(report["isolated"]), flush=True)

    t0 = time.perf_counter()
    for k in HEADLINE:
        qs[k](spark, SF_DIR).count()
    report["full_pass_s"] = round(time.perf_counter() - t0, 1)
    report["jvm_1"] = jvm_stats(spark)
    report["probe_box_1"] = round(_box_probe(spark, SF_DIR), 4)
    report["after_full"] = time_keys(spark, qs, PROBES)
    report["jvm_2"] = jvm_stats(spark)
    print("AFTER_FULL", json.dumps(report["after_full"]), flush=True)

    jvm = spark.sparkContext._jvm
    for _ in range(3):
        jvm.java.lang.System.gc()
        time.sleep(1.0)
    time.sleep(3.0)  # let the ContextCleaner drain its ref queue
    report["jvm_3_post_gc"] = jvm_stats(spark)
    report["probe_box_2"] = round(_box_probe(spark, SF_DIR), 4)
    report["after_gc"] = time_keys(spark, qs, PROBES)
    report["jvm_4"] = jvm_stats(spark)
    print("AFTER_GC", json.dumps(report["after_gc"]), flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

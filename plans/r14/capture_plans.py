#!/usr/bin/env python
"""Capture executed (AQE-final) formatted plans for named keys.

Usage: python plans/r14/capture_plans.py <outdir> <suffix> key1,key2,...
Run from the repo root being captured (tree or a ref worktree)."""
from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.getcwd())

from kinesis_datastore_app_spark import registry  # noqa: E402
from kinesis_datastore_app_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    outdir, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    spark = get_spark(app_name="capture-plans")
    qs = registry.queries()
    for k in keys:
        df = qs[k](spark, SF_DIR)
        # collect() executes THIS df's QueryExecution so AQE finalizes
        # it in place (count()/noop-save build a separate QE and the
        # df's own explain would stay isFinalPlan=false); every
        # registered key returns an oracle-bounded result, so the
        # driver transfer is small
        df.collect()
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path, len(txt), "bytes")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Environment-invariance sweep: run every registered query against its
DuckDB oracle under a chosen environment and report MATCH/MISMATCH.

The local pytest suite and the driver both verify at sf0.01 in one fixed
environment; the divergence classes that actually bit this repo (host-TZ
interpretation of Python datetimes, ANSI-mode cast errors, libm-ulp ×
round-then-sum amplification, partitioning-dependent accumulation) only
surface when the environment or scale changes. This tool makes those
sweeps one-liners:

    python tools/sweep.py                          # sf0.01, engine session
    python tools/sweep.py --sf /root/testdata/sf0.1
    TZ=America/New_York python tools/sweep.py --session-tz UTC
    python tools/sweep.py --shuffle-partitions 3
    python tools/sweep.py --plain-session          # driver-like session
    python tools/sweep.py --no-codegen             # interpreted expression path
    python tools/sweep.py --no-aqe                 # static (non-adaptive) plans
    python tools/sweep.py --state-store rocksdb --only stream_
    python tools/sweep.py --plain-session --cores 1 --shuffle-partitions 1

The last form is the fully-serial axis: one scheduler slot and one
shuffle partition make every scan, task, and reduction run in a single
deterministic order — any result that depends on task interleaving or
multi-partition accumulation order diverges here.

Exit status 1 if anything mismatches or errors.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))




def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--session-tz", default=None)
    ap.add_argument(
        "--plain-session",
        action="store_true",
        help="build a bare SparkSession (like the driver) instead of "
        "session.get_spark — catches session-dependence",
    )
    ap.add_argument("--only", help="comma-separated key substrings to run")
    ap.add_argument(
        "--cores",
        type=int,
        default=None,
        help="master thread count (local[N]); --cores 1 with "
        "--shuffle-partitions 1 is the fully-serial axis",
    )
    ap.add_argument(
        "--no-codegen",
        action="store_true",
        help="disable whole-stage codegen (interpreted expression path) "
        "— a distinct evaluation engine for every scalar expression; "
        "divergence here means an expression behaves differently "
        "compiled vs interpreted",
    )
    ap.add_argument(
        "--no-aqe",
        action="store_true",
        help="disable adaptive query execution — AQE rewrites plans at "
        "runtime (partition coalescing, skew-join splitting, "
        "sort-merge→broadcast demotion), so a full sweep with it OFF "
        "verifies every result is invariant to the physical plan AQE "
        "happens to pick",
    )
    ap.add_argument(
        "--state-store",
        choices=["hdfs", "rocksdb"],
        default=None,
        help="streaming state-store provider axis: 'rocksdb' runs every "
        "query (use --only stream_ for just the stateful keys) under "
        "RocksDBStateStoreProvider with changelog checkpointing — the "
        "100 TB lever SCALE.md names for stateful streaming; results "
        "must be provider-independent",
    )
    ap.add_argument(
        "--vocab-dispatch",
        choices=["broadcast", "shuffle"],
        default=None,
        help="force llm/text._gated_broadcast's dispatch (round-9 size "
        "gate): 'shuffle' runs the vocab/df dimension joins on the "
        "over-threshold plan the fixture never triggers naturally — "
        "results must be dispatch-independent (use --only "
        "text_tfidf,text_rarity_score,text_lm_score,text_keyword_extract "
        "for just the gated keys)",
    )
    args = ap.parse_args()

    import __spark_entry__ as e

    if args.plain_session:
        from pyspark.sql import SparkSession

        b = (
            SparkSession.builder.master(f"local[{args.cores or 8}]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
        )
        if args.shuffle_partitions:
            b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        spark = b.getOrCreate()
    else:
        from kinesis_datastore_app_spark.session import get_spark

        # cores and shuffle partitions are SEPARATE axes (round-8
        # review: the old `or` chain silently dropped the master to
        # local[N] whenever --shuffle-partitions N was given alone, so a
        # partitioning-only divergence could hide behind reduced task
        # concurrency — pass --cores explicitly for the serial axis)
        spark = get_spark(app_name="sweep", cpus=args.cores or 16)
        if args.shuffle_partitions:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
            )
    if args.session_tz:
        # catalog._ensure_engine_confs pins the session TZ to UTC on
        # every table() call — part of the engine contract (the DuckDB
        # oracle reads tz-naive timestamps). A non-UTC value here would
        # be silently overridden before the first scan (round-8 review),
        # so refuse it instead of pretending to sweep an axis that
        # cannot engage. The REAL TZ axis is the HOST zone: run
        # `TZ=America/New_York python tools/sweep.py --session-tz UTC`.
        if args.session_tz != "UTC":
            print(
                "sweep: --session-tz only supports UTC (catalog pins the "
                "session TZ per scan); vary the HOST zone via TZ= instead",
                file=sys.stderr,
            )
            return 2
        spark.conf.set("spark.sql.session.timeZone", args.session_tz)
    if args.no_codegen:
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    if args.no_aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    if args.state_store == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )

    if args.vocab_dispatch:
        from kinesis_datastore_app_spark.llm import text as _text

        _text._FORCE_VOCAB_DISPATCH = args.vocab_dispatch

    # THE gate's comparator, not a parallel one (round-10 tooling
    # review: the old hand-rolled `_rows ==` skipped compare()'s
    # column-name and dtype-kind gates, so an uncast HUGEINT or a
    # renamed output column printed MATCH on every axis while failing
    # the driver — the exact class the sweep exists to catch early).
    from tests.oracle_harness import compare, connect_views

    qs, osql = e.queries(), e.oracle_sql()
    if args.only:
        pats = args.only.split(",")
        qs = {k: v for k, v in qs.items() if any(p in k for p in pats)}
        if not qs:
            # fatal, not an empty success footer (same hazard bench.py
            # --only and scale_probe --keys already hard-fail on): a
            # typo'd filter otherwise prints SWEEP-DONE bad=0 with
            # nothing verified
            print(f"sweep: --only {args.only!r} matched no keys",
                  file=sys.stderr)
            return 2
    con = connect_views(args.sf)
    bad = 0
    for k in sorted(qs):
        try:
            sdf = qs[k](spark, args.sf)
            if k in osql:
                odf = con.execute(osql[k]).fetchdf()
                try:
                    compare(sdf, odf, k)
                except AssertionError as ex:
                    print(k, "MISMATCH", str(ex)[:300], flush=True)
                    bad += 1
                else:
                    print(k, "MATCH", len(odf), flush=True)
            else:
                print(k, "rows-only", len(sdf.toPandas()), flush=True)
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(k, "ERROR", repr(ex)[:200], flush=True)
            bad += 1
    print(f"SWEEP-DONE bad={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

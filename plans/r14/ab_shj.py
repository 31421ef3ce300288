#!/usr/bin/env python
"""Paired same-session A/B of spark.sql.join.preferSortMergeJoin
(r14 verdict item 2): the six keys that regressed >10% in BOTH r13
paired halves, plus the keys the conf was adopted for as controls.

preferSortMergeJoin is a runtime SQLConf, so both arms run interleaved
in ONE session (ABAB x rounds), min-of-n per arm — the box's +-45%
drift cancels within each adjacent pair. The AQE SMJ->SHJ threshold
(maxShuffledHashJoinLocalMapThreshold=64m) stays ON in both arms: the
question is only whether the STATIC planner preference is the regressor.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import SF_DIR, _box_probe  # noqa: E402
from kinesis_datastore_app_spark import registry  # noqa: E402
from kinesis_datastore_app_spark.session import get_spark  # noqa: E402

REGRESSORS = [
    "dedup_simhash",
    "dedup_semantic_cluster",
    "embed_generate",
    "join_range_bucketed",
    "stream_stream_join_outer",
    "cdc_read_changes_point",
]
CONTROLS = [
    "cdc_read_changes",
    "cdc_incremental_rollup",
    "join_inner_equi",
    "agg_group_events",
    "tpch_q5_shape",
]
ROUNDS = 4
CONF = "spark.sql.join.preferSortMergeJoin"


def main():
    spark = get_spark(app_name="ab-shj")
    qs = registry.queries()
    keys = REGRESSORS + CONTROLS
    for k in keys:  # warm
        qs[k](spark, SF_DIR).count()
    probe0 = _box_probe(spark, SF_DIR)
    samples: dict[str, dict[str, list[float]]] = {
        k: {"shj": [], "smj": []} for k in keys
    }
    for r in range(ROUNDS):
        for arm, val in (("shj", "false"), ("smj", "true")):
            spark.conf.set(CONF, val)
            for k in keys:
                t0 = time.perf_counter()
                qs[k](spark, SF_DIR).count()
                samples[k][arm].append(time.perf_counter() - t0)
        print(f"round {r} done", flush=True)
    spark.conf.set(CONF, "false")  # restore the session default
    probe1 = _box_probe(spark, SF_DIR)
    out = {
        "box_probe": [round(probe0, 4), round(probe1, 4)],
        "rounds": ROUNDS,
        "per_key": {},
    }
    for k in keys:
        shj = min(samples[k]["shj"])
        smj = min(samples[k]["smj"])
        out["per_key"][k] = {
            "shj_min": round(shj, 4),
            "smj_min": round(smj, 4),
            "shj_over_smj": round(shj / smj, 3),
            "shj_all": [round(x, 3) for x in samples[k]["shj"]],
            "smj_all": [round(x, 3) for x in samples[k]["smj"]],
            "role": "regressor" if k in REGRESSORS else "control",
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

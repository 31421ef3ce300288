"""CLI twin of kinesis_datastore_app_spark.planaudit: run the
no-forced-broadcast-of-growing-sides audit over the whole registry (or
an --only subset) and print one line per violation.

Run:  python tools/broadcast_audit.py [--sf /root/testdata/sf0.001]
The enforcing gate is tests/test_plan_audit.py.
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    # repo root by __file__, not cwd (round-10 tooling review: the old
    # sys.path.insert(0, ".") crashed when launched from any other dir)
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as e
    from kinesis_datastore_app_spark.planaudit import audit_plan
    from kinesis_datastore_app_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="broadcast-audit", cpus=16)
    qs = e.queries()
    if args.only:
        pats = args.only.split(",")
        qs = {k: v for k, v in qs.items() if any(p in k for p in pats)}
        if not qs:
            # fatal (round-10 tooling review): a typo'd filter otherwise
            # prints AUDIT-DONE violations=0 having inspected nothing
            print(f"broadcast_audit: --only {args.only!r} matched no keys",
                  file=sys.stderr)
            return 2
    n_viol = 0
    for k in sorted(qs):
        try:
            df = qs[k](spark, args.sf)
            for v in audit_plan(df):
                print(f"{k}: {v}", flush=True)
                n_viol += 1
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(f"{k}: ERROR {ex!r}"[:250], flush=True)
            n_viol += 1
    print(f"AUDIT-DONE violations={n_viol}")
    return 1 if n_viol else 0


if __name__ == "__main__":
    raise SystemExit(main())

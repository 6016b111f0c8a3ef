#!/usr/bin/env python
"""Physical-plan audit over the whole query corpus.

For each registered query, prints the shuffle count (non-broadcast
Exchanges), join strategies, and any scan that fails to push filters or
prune columns. Run after adding/changing operators — a per-row operator
growing a shuffle, or a dimension join degrading to sort-merge, shows up
here before it shows up in the bench.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streaming_etl_pipeline_spark.plans.corpus import QUERIES  # noqa: E402
from streaming_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="plan-audit")
    print(f"{'query':34s} {'shuffles':>8s} {'bcast':>6s} {'smj':>4s} {'nlj':>4s}")
    for name, spec in QUERIES.items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
            bcast = plan.count("BroadcastHashJoin")
            smj = plan.count("SortMergeJoin")
            nlj = plan.count("BroadcastNestedLoopJoin") + plan.count(
                "CartesianProduct"
            )
            print(f"{name:34s} {shuffles:8d} {bcast:6d} {smj:4d} {nlj:4d}")
        except Exception as e:  # keep auditing the rest
            print(f"{name:34s} ERROR {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs every corpus query flagged ``bench=True`` at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is executed twice: a warmup pass (JVM/code-gen warm, file
listing cached) is discarded, the timed pass does a full materialization
via ``df.write.format("noop")`` so the cost measured is the whole plan —
scan, shuffle, aggregate — without driver-side collection overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from streaming_etl_pipeline_spark.plans.corpus import QUERIES  # noqa: E402
from streaming_etl_pipeline_spark.session import build_session  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = build_session(app_name="bench")

    names = [n for n, spec in QUERIES.items() if spec.bench]
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].fn
        materialize(fn(spark, sf_dir))  # warmup
        t0 = time.time()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

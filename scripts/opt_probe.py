#!/usr/bin/env python
"""Round-11 optimization probe: isolate corpus queries, time them against
the noop sink, and dump ``explain("formatted")`` for the plan evidence in
``plans/r11/``.

Usage:
    python scripts/opt_probe.py plans  [name ...]   # dump *_before/after plans
    python scripts/opt_probe.py time   [name ...]   # isolated timings (median of N)
    python scripts/opt_probe.py stages name         # per-job wall breakdown via listener

``$SPARK_GRAFT_PROBE_RUNS`` overrides the timed-pass count (default 5).
``$SPARK_GRAFT_PROBE_TAG``  overrides the plan-file suffix (default "before").
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streaming_etl_pipeline_spark.plans import corpus  # noqa: E402
from streaming_etl_pipeline_spark.session import build_session  # noqa: E402

PLAN_DIR = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12")
)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def _median(vals):
    return sorted(vals)[len(vals) // 2]


def cmd_plans(names):
    os.makedirs(PLAN_DIR, exist_ok=True)
    tag = os.environ.get("SPARK_GRAFT_PROBE_TAG", "before")
    spark = build_session(app_name="opt-probe-plans")
    for name in names:
        df = corpus.QUERIES[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")


def cmd_time(names):
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "5"))
    spark = build_session(app_name="opt-probe-time")
    out = {}
    for name in names:
        fn = corpus.QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        _materialize(fn(spark, SF_DIR))  # warmup
        passes = []
        for i in range(runs):
            # Mirror bench.py's honest-measurement regime: no timed pass may
            # reuse a previous pass's materialized cache (outside the window).
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}:pass{i}")
            t0 = time.time()
            _materialize(fn(spark, SF_DIR))
            passes.append(round(time.time() - t0, 3))
        out[name] = passes
        print(f"{name:32s} median={_median(passes):6.3f}  {passes}")
    return out


def cmd_stages(name):
    """Break one query's wall time into planning vs job execution."""
    spark = build_session(app_name="opt-probe-stages")
    fn = corpus.QUERIES[name].fn
    _materialize(fn(spark, SF_DIR))  # warm
    t0 = time.time()
    df = fn(spark, SF_DIR)
    t_build = time.time()
    df._jdf.queryExecution().executedPlan()  # force analysis+optimization+planning
    t_plan = time.time()
    _materialize(df)
    t_exec = time.time()
    print(
        f"{name}: build={t_build - t0:.3f}s plan={t_plan - t_build:.3f}s "
        f"exec={t_exec - t_plan:.3f}s total={t_exec - t0:.3f}s"
    )


def main():
    mode = sys.argv[1]
    names = sys.argv[2:] or [n for n, s in corpus.QUERIES.items() if s.bench]
    if mode == "plans":
        cmd_plans(names)
    elif mode == "time":
        cmd_time(names)
    elif mode == "stages":
        for n in names:
            cmd_stages(n)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Run the full differential correctness sweep at a given scale factor.

Usage: python scripts/check_oracle.py [sf_dir]   (default /root/testdata/sf0.01)
This mirrors the driver's CORRECTNESS gate; run it before every round end.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streaming_etl_pipeline_spark.plans import corpus  # noqa: E402
from streaming_etl_pipeline_spark.plans import differential as d  # noqa: E402
from streaming_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = build_session(app_name="check-oracle")
    con = d.duck_connect(sf_dir)
    failures = 0
    for name in only or corpus.QUERIES:
        t0 = time.time()
        try:
            res = d.run_one(spark, con, sf_dir, name)
        except Exception as e:
            res = d.DiffResult(name, False, f"EXCEPTION: {e}")
        failures += 0 if res.ok else 1
        status = "OK  " if res.ok else "FAIL"
        print(f"{status} {name:32s} {time.time() - t0:6.2f}s  {res.detail[:160]}")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(only or corpus.QUERIES)} queries, sf_dir={sf_dir})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

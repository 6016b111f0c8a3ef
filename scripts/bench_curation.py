#!/usr/bin/env python
"""Throughput measurement for the end-to-end curation pipeline
(pipelines/training_data.curate_corpus) on a synthetic corpus with
controlled duplicate injection — numbers recorded in SCALE.md.

Corpus: N base docs of 40 md5-derived pseudo-words each (tuned to pass
the Gopher gates: 2 stopword hits, mean word length 4.5), plus 5% exact
twins and 5% near twins (last token edited). Every doc is otherwise
fully distinct, so dedup does real work without adversarial blowup.

Usage: python scripts/bench_curation.py [n_docs] (default 100000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from streaming_etl_pipeline_spark.pipelines.training_data import (  # noqa: E402
    curate_corpus,
)
from streaming_etl_pipeline_spark.session import build_session  # noqa: E402


def synth_docs(spark, n: int):
    """n distinct Gopher-passing docs + 5% exact + 5% near twins."""
    word = (
        "substr(md5(concat(cast(id as string), '-', cast(i as string))), 1, "
        "4 + pmod(i, 2))"
    )
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat('the data ', "
            f"array_join(transform(sequence(1, 38), i -> {word}), ' '))"
        ).alias("text"),
    )
    exact = (
        base.filter(F.col("doc_id") % 20 == 0)
        .select((F.col("doc_id") + n).alias("doc_id"), "text")
    )
    near = base.filter(F.col("doc_id") % 20 == 10).select(
        (F.col("doc_id") + 2 * n).alias("doc_id"),
        F.expr(
            "concat(substring(text, 1, length(text) - 5), ' nearz')"
        ).alias("text"),
    )
    return base.unionByName(exact).unionByName(near)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    gates = "--gates" in sys.argv
    spark = build_session(app_name="bench-curation")
    docs = synth_docs(spark, n)
    bench = synth_docs(spark, 200).select("text").limit(100)
    out = tempfile.mkdtemp(prefix="bench_curation_")
    try:
        t0 = time.time()
        extra = (
            {"charlm_drop_frac": 0.02, "substring_dup_max": 0.8}
            if gates
            else {}
        )
        res = curate_corpus(
            spark, docs, os.path.join(out, "training"), benchmark=bench,
            **extra,
        )
        wall = time.time() - t0
        m = res.metrics
        print(
            json.dumps(
                {
                    "metric": "curation_pipeline_wall",
                    "value": round(wall, 2),
                    "unit": "sec",
                    "input_docs": m["input_docs"],
                    "docs_per_sec": round(m["input_docs"] / wall),
                    "stages": {k: v for k, v in m.items()},
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Exact duplicated-substring dedup soak (r11, judge r10 task #8).

1M synthetic docs (~300 chars each) with planted duplication: every
20th doc embeds one of 1,000 shared boilerplate passages (~120 chars)
inside otherwise-unique text, and every 200th doc is a full twin of
another. Measures:

- ``exact_stats``  — :func:`dedup.exact_substring_dup_stats` (L=32):
  the exact L-gram → duplicated-gram → island pipeline end-to-end;
- ``fingerprint`` — :func:`dedup.substring_dup_stats` (64/32 chunks):
  the approximate fingerprint profile, for the honest cost ratio the
  operator docstring quotes (exactness costs ~L× the shuffle bytes);
- ``removal``     — :func:`dedup.remove_exact_dup_substrings`: span
  cut + text rebuild, and the corpus-level char reduction.

Sanity: planted passages must be detected (dup coverage on the planted
cohort ≫ the unique cohort), and removal keeps the canonical copy.

Usage: python scripts/soak_exact_substring.py [--n 1000000]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streaming_etl_pipeline_spark.machine_state import machine_state  # noqa: E402
from streaming_etl_pipeline_spark.session import build_session  # noqa: E402


def _arg(name: str, default):
    if name in sys.argv:
        return type(default)(sys.argv[sys.argv.index(name) + 1])
    return default


def main() -> None:
    from pyspark.sql import functions as F

    from streaming_etl_pipeline_spark.operators import dedup as DD

    n = _arg("--n", 1_000_000)
    state = machine_state()
    spark = build_session(app_name="soak_exact_substring")

    # unique filler from hashed id chunks; planted passage from a
    # 1k-passage pool for every 20th doc; full twins every 200th
    def hchunk(i):
        return F.lower(F.hex(F.xxhash64(F.col("id"), F.lit(i))))

    filler = F.concat_ws(" ", *[hchunk(i) for i in range(16)])  # ~270c
    passage_id = F.pmod(F.xxhash64(F.col("id"), F.lit(77)), 1000)
    passage = F.concat_ws(
        " ",
        F.lit("shared boilerplate passage number"),
        passage_id.cast("string"),
        F.lower(F.hex(F.xxhash64(passage_id, F.lit(1)))),
        F.lower(F.hex(F.xxhash64(passage_id, F.lit(2)))),
        F.lit("end of notice"),
    )
    text = F.when(
        F.col("id") % 200 == 199,  # full twin of doc id-199+99
        None,
    ).otherwise(
        F.when(
            F.col("id") % 20 == 7,
            F.concat_ws(" ", F.substring(filler, 1, 120), passage,
                        F.substring(filler, 130, 120)),
        ).otherwise(filler)
    )
    base = spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))
    twin_src = base.filter((F.col("doc_id") % 200 == 99)).select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    corpus_path = "/tmp/soak_exact_sub_docs"
    (
        base.filter(F.col("text").isNotNull())
        .unionByName(twin_src)
        .repartition(64)
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()

    report = {"metric": "exact_substring_soak", "n_docs": n_docs,
              "machine": state, "phases": {}}

    t0 = time.time()
    stats = DD.exact_substring_dup_stats(docs, min_len=32).persist()
    agg = stats.agg(
        F.sum("dup_chars").alias("dup_chars"),
        F.sum("doc_len").alias("chars"),
        F.sum((F.col("dup_chars") > 0).cast("int")).alias("docs_with_dups"),
    ).first()
    report["phases"]["exact_stats"] = round(time.time() - t0, 1)
    report["dup_chars"] = int(agg["dup_chars"])
    report["total_chars"] = int(agg["chars"])
    report["docs_with_dups"] = int(agg["docs_with_dups"])
    # planted cohort must dominate detection
    planted = stats.filter(F.col("doc_id") % 20 == 7).agg(
        F.avg("dup_frac")).first()[0]
    unique = stats.filter(
        (F.col("doc_id") % 20 != 7) & (F.col("doc_id") % 200 != 99)
        & (F.col("doc_id") % 200 != 199)  # the twin copies land here
    ).agg(F.avg("dup_frac")).first()[0]
    report["planted_avg_dup_frac"] = round(float(planted), 4)
    report["unique_avg_dup_frac"] = round(float(unique or 0.0), 4)
    stats.unpersist()

    t0 = time.time()
    DD.substring_dup_stats(docs).write.format("noop").mode(
        "overwrite").save()
    report["phases"]["fingerprint"] = round(time.time() - t0, 1)

    t0 = time.time()
    cleaned = DD.remove_exact_dup_substrings(docs, min_len=32)
    red = cleaned.agg(
        F.sum(F.length("text")).alias("before"),
        F.sum(F.length("cleaned")).alias("after"),
    ).first()
    report["phases"]["removal"] = round(time.time() - t0, 1)
    report["chars_before"] = int(red["before"])
    report["chars_after"] = int(red["after"])
    report["removal_frac"] = round(1 - red["after"] / red["before"], 4)

    print(json.dumps(report))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Throughput measurement for the round-6 document operators on a
synthetic 500k-doc corpus (same scale/shape as SCALE.md's text/dedup
family table) — numbers recorded in SCALE.md.

Corpus: reuses bench_curation.synth_docs (Gopher-passing 40-word docs,
5% exact + 5% near twins), materialized to parquet so every timed plan
reads identical input. Noop sink, min-of-2 wall time per operator.

Usage: python scripts/bench_docs_ops.py [n_docs]   (default 500000)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from bench_curation import synth_docs  # noqa: E402
from streaming_etl_pipeline_spark.operators import classifier as CL  # noqa: E402
from streaming_etl_pipeline_spark.operators import components as CC  # noqa: E402
from streaming_etl_pipeline_spark.operators import dedup as DD  # noqa: E402
from streaming_etl_pipeline_spark.operators import ngram_lm as NL  # noqa: E402
from streaming_etl_pipeline_spark.operators import sketches as SK  # noqa: E402
from streaming_etl_pipeline_spark.operators import retrieval as RT  # noqa: E402
from streaming_etl_pipeline_spark.operators import sampling as SP  # noqa: E402
from streaming_etl_pipeline_spark.operators import text as TX  # noqa: E402
from streaming_etl_pipeline_spark.session import build_session  # noqa: E402


def timed(df, repeats: int = 2) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = build_session(app_name="bench-docs-ops")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "docs")
        synth_docs(spark, n).write.parquet(path)
        docs = spark.read.parquet(path)
        total = docs.count()
        print(f"corpus: {total} docs")

        labeled = TX.gopher_filter(
            docs.filter(F.col("doc_id") % 3 == 0)
        ).select("doc_id", F.col("keep").alias("label"))

        # cluster map for the keep-best measurement: derive from exact
        # twins (id, id+n) so the rep selection runs on a real
        # pair-bounded frame without paying a MinHash build here
        clusters = (
            docs.filter(F.col("doc_id") >= n)
            .filter(F.col("doc_id") < 2 * n)
            .select(
                F.col("doc_id"),
                (F.col("doc_id") - n).alias("canonical_id"),
                F.lit(2).alias("cluster_size"),
            )
            .unionByName(
                docs.filter(F.col("doc_id") % 20 == 0)
                .filter(F.col("doc_id") < n)
                .select(
                    "doc_id",
                    F.col("doc_id").alias("canonical_id"),
                    F.lit(2).alias("cluster_size"),
                )
            )
        )
        scores = docs.select("doc_id", F.length("text").alias("score"))

        from streaming_etl_pipeline_spark.functions.core import tokenize

        toks = tokenize(TX.norm_text("text"))
        bm_queries = docs.filter(F.col("doc_id") % 5000 == 3).select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(F.slice(toks, 1, 8))).alias("qterm"),
        )
        from streaming_etl_pipeline_spark.functions.core import md5_long
        from streaming_etl_pipeline_spark.operators import webcur as WC
        from streaming_etl_pipeline_spark.plans.corpus_docs import (
            _synth_url_col,
        )

        with_urls = docs.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            _synth_url_col().alias("url"),
        ).select(
            "doc_id",
            "n_chars",
            WC.normalize_url("url").alias("url_norm"),
            WC.registrable_domain(WC.url_host("url")).alias("domain"),
        )
        pr_edges = docs.select(
            (F.col("doc_id") % 100_000).alias("src"),
            (md5_long(F.col("doc_id"), "pr") % 100_000).alias("dst"),
        ).filter(F.col("src") != F.col("dst"))

        cases = {
            "script_mix": TX.script_mix(docs),
            "url_normalize+etld1 (0-shuffle)": with_urls,
            "domain_cap (cap=100, skew=8)": WC.domain_cap(
                with_urls, cap=100, skew=8
            ),
            "pagerank (100k nodes, 3 iters)": CC.pagerank(
                pr_edges, iters=3, hint_small=True
            ),
            "label_propagation (100k nodes, 2 iters)": CC.label_propagation(
                pr_edges, iters=2, hint_small=True
            ),
            "char_entropy": TX.char_entropy(docs),
            "kn_lm_scores (self-trained)": NL.kn_lm_scores(docs),
            "global_order_index": SP.global_order_index(docs, "doc_id"),
            "kmv_overlap (6 groups, k=256)": SK.kmv_overlap(
                docs.select(
                    (F.col("doc_id") % 6).cast("string").alias("grp"),
                    F.col("text"),
                ),
                "grp",
                "text",
                k=256,
            ),
            "bm25_topk (100 queries, full index)": RT.bm25_topk(
                docs, bm_queries, k=10
            ),
            "perplexity_buckets": TX.perplexity_buckets(
                docs.withColumn("lang", F.lit("en"))
            ),
            "paragraph_dedup": DD.paragraph_dedup(docs),
            "nb_quality_scores (train+score)": CL.nb_quality_scores(
                docs, labeled
            ),
            "cluster_representatives": CC.cluster_representatives(
                clusters, scores, hint_small=True
            ),
            "strip_html (full wrap, 0-shuffle)": docs.select(
                "doc_id",
                TX.strip_html(
                    F.concat(
                        F.lit("<html><head><script>var x=1;</script>"
                              "</head><body><!-- c --><p>"),
                        "text",
                        F.lit("</p>&amp; &lt;footer&gt;</body></html>"),
                    )
                ).alias("clean"),
            ),
            "sentence_dedup (keep-first, sentence grain)": DD.paragraph_dedup(
                docs,
                chunks=TX.sentence_chunks(
                    docs.select(
                        "doc_id",
                        F.concat(
                            F.lit("Shared intro. "), "text", F.lit(". Tail")
                        ).alias("text"),
                    )
                ),
            ),
            # allocation sized so epochs land fractional (extra-copy
            # hash evaluated for every row, the worst case)
            "materialize_epochs (2.x epochs)": SP.materialize_epochs(
                docs.withColumn("lang", (F.col("doc_id") % 8).cast("string")),
                SP.epoch_allocation(
                    docs.withColumn(
                        "lang", (F.col("doc_id") % 8).cast("string")
                    ).withColumn("n_chars", F.length("text")),
                    budget=2 * n * 220,
                    max_epochs=4,
                ),
            ),
        }
        for name, df in cases.items():
            t = timed(df)
            print(f"{name:36s} {t:7.2f}s  {total / t / 1e6:.2f}M docs/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

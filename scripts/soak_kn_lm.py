#!/usr/bin/env python
"""Corpus-scale soak of the Kneser-Ney trigram LM (train + score).

Two phases, each with the resource envelope recorded for SCALE.md:

1. **self** — train on N docs and score the same corpus (the oracle-
   gated shape): proves the one-explode design (the per-(doc,trigram)
   frame feeds model AND scoring) holds its throughput when the
   trigram-type table is tens of millions of rows.
2. **cross** — train on the first half, score the second half (the
   CCNet deployment: reference-corpus model, crawl scoring): exercises
   the OOV stupid-backoff cascade at scale and proves scoring cost is
   independent of training-corpus size once the model tables exist.

Captured per phase: wall, docs/s, trigram-token and model-type counts,
shuffle read/write GB and spill from the event log (the number that
scales), peak task memory.

Usage: python scripts/soak_kn_lm.py [n_docs]   (default 1_000_000)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_curation import synth_docs  # noqa: E402
from soak_curation import _eventlog_metrics, _java_peak_rss_gb  # noqa: E402

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from streaming_etl_pipeline_spark.operators import ngram_lm as NL  # noqa: E402
from streaming_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    work = tempfile.mkdtemp(prefix="soak_kn_lm_")
    log_dir = os.path.join(work, "eventlog")
    os.makedirs(log_dir)
    spark = build_session(
        app_name="soak-kn-lm",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )

    docs = synth_docs(spark, n).persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = docs.count()

    # --- phase 1: self-trained (the oracle-gated shape) ---------------
    t0 = time.time()
    scored = NL.kn_lm_scores(docs)
    agg = scored.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_trigrams").alias("tri_tokens"),
        F.min("avg_logp").alias("min_lp"),
        F.max("avg_logp").alias("max_lp"),
    ).first()
    wall_self = time.time() - t0
    print(
        f"[self ] {agg['docs']:,} docs scored in {wall_self:.1f}s "
        f"({agg['docs'] / wall_self:,.0f} docs/s), "
        f"{agg['tri_tokens']:,} trigram tokens, "
        f"avg_logp in [{agg['min_lp']:.3f}, {agg['max_lp']:.3f}]"
    )

    # --- phase 2: cross-corpus (train half, score half: OOV path) -----
    train = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)
    t0 = time.time()
    model = NL.kn_lm_fit(train)
    sizes = {
        "tri_types": model.tri.count(),
        "big_types": model.big.count(),
        "uni_types": model.uni.count(),
    }
    wall_fit = time.time() - t0
    t0 = time.time()
    agg2 = NL.kn_lm_scores(score, model=model).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_trigrams").alias("tri_tokens"),
        F.min("avg_logp").alias("min_lp"),
        F.max("avg_logp").alias("max_lp"),
    ).first()
    wall_score = time.time() - t0
    print(
        f"[cross] fit {wall_fit:.1f}s on {n_docs // 2:,} docs "
        f"(types: {sizes}), score {agg2['docs']:,} held-out docs in "
        f"{wall_score:.1f}s ({agg2['docs'] / wall_score:,.0f} docs/s), "
        f"avg_logp in [{agg2['min_lp']:.3f}, {agg2['max_lp']:.3f}]"
    )
    model.unpersist()  # trigram phase done — release before the 5-gram fits

    # --- phase 3 (r9): pruned order-5 — size vs quality ----------------
    # The deployment question pruning answers: how much model do you
    # keep, and what does scoring lose? Fit order-5 unpruned AND with
    # the KenLM-style min_count=2 top-order prune on the train half,
    # score the held-out half with both, report type-table sizes and
    # the held-out avg_logp shift.
    t0 = time.time()
    m5_full = NL.kn_lm_fit_n(train, order=5)
    full_sizes = [t.count() for t in m5_full.tables]
    wall_fit5 = time.time() - t0
    t0 = time.time()
    m5_pruned = NL.kn_lm_fit_n(train, order=5, min_count=2)
    pruned_sizes = [t.count() for t in m5_pruned.tables]
    wall_fit5p = time.time() - t0

    def _score5(model):
        t = time.time()
        a = NL.kn_lm_scores_n(score, order=5, model=model).agg(
            F.count(F.lit(1)).alias("docs"),
            F.avg("avg_logp").alias("mean_lp"),
        ).first()
        return time.time() - t, a

    wall_s5, a5 = _score5(m5_full)
    wall_s5p, a5p = _score5(m5_pruned)
    # release both models' blocks only after BOTH are done (ADVICE r9
    # retention fix) — NOT between the two scorings: the fits' unpruned
    # levels have IDENTICAL plans, Spark's CacheManager dedupes cache
    # entries by plan, and unpersisting one model mid-flight releases
    # the twin's shared levels too (measured: the pruned held-out
    # scoring went 89 s -> ~500 s recomputing the whole chain when an
    # earlier draft unpersisted m5_full first; see KNModelN.unpersist's
    # shared-plan caveat)
    m5_full.unpersist()
    m5_pruned.unpersist()
    top_drop = 1 - pruned_sizes[-1] / max(full_sizes[-1], 1)
    print(
        f"[kn5  ] fit order-5 unpruned {wall_fit5:.1f}s "
        f"types/order {full_sizes}; pruned(min_count=2) "
        f"{wall_fit5p:.1f}s types/order {pruned_sizes} "
        f"(top-order table -{top_drop:.1%})"
    )
    print(
        f"[kn5  ] held-out score: unpruned {wall_s5:.1f}s "
        f"mean avg_logp {a5['mean_lp']:.4f}; pruned {wall_s5p:.1f}s "
        f"mean avg_logp {a5p['mean_lp']:.4f} "
        f"(delta {a5p['mean_lp'] - a5['mean_lp']:+.4f})"
    )

    spark.stop()
    time.sleep(2)
    m = _eventlog_metrics(log_dir)
    m["java_peak_rss_gb"] = _java_peak_rss_gb()
    print(f"[env  ] {m}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

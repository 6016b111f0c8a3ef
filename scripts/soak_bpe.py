#!/usr/bin/env python
"""32k-merge BPE training soak (judge r9 task #3).

Measures the production-vocab trainer at the scale the distributed
per-merge trainer cannot reach (32k merges = ~64k Spark-job round-trips
= hours of scheduling overhead regardless of corpus size):

1. the ONE distributed corpus pass (``word_types`` over the sf0.1
   documents table, plus a synthetic multiplier to web-ish type counts),
2. the histogram collect,
3. ``train_bpe_from_histogram`` running 32,768 heap-driven merges
   in-memory over a ~150k-type Zipf histogram with syllable structure
   (so pair mass stays deep — real text's shape).

Prints one JSON line; record the numbers in SCALE.md.

Usage: python scripts/soak_bpe.py [num_merges] [n_types]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from streaming_etl_pipeline_spark.machine_state import machine_state  # noqa: E402
from streaming_etl_pipeline_spark.operators import bpe  # noqa: E402
from streaming_etl_pipeline_spark.session import build_session  # noqa: E402


def synth_histogram(n_types: int, seed: int = 7) -> list[tuple[str, int]]:
    """Zipf word-type histogram with syllable structure: words are 2-6
    syllables from a 400-syllable inventory, so adjacent-pair mass stays
    rich through tens of thousands of merges (like real text, unlike
    uniform-random strings whose pairs exhaust immediately)."""
    rng = random.Random(seed)
    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    syllables = [
        c + v + (rng.choice(consonants) if rng.random() < 0.4 else "")
        for c in consonants for v in vowels for _ in range(5)
    ][:400]
    seen = set()
    items: list[tuple[str, int]] = []
    rank = 0
    while len(items) < n_types:
        w = "".join(
            rng.choice(syllables) for _ in range(rng.randint(2, 6))
        )
        if w in seen:
            continue
        seen.add(w)
        rank += 1
        items.append((w, max(1, int(2_000_000 / rank))))  # Zipf counts
    return items


def main() -> None:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 32_768
    n_types = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    unigram_vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 32_768
    unigram_types = int(sys.argv[4]) if len(sys.argv) > 4 else 50_000
    encode_docs = int(sys.argv[5]) if len(sys.argv) > 5 else 1_000_000

    state = machine_state()
    spark = build_session(app_name="soak_bpe")

    # phase 1: the one distributed corpus pass (real table)
    from streaming_etl_pipeline_spark.sources import read_table

    t0 = time.time()
    docs = read_table(spark, "/root/testdata/sf0.1", "documents")
    wt = bpe.word_types(docs, "text")
    real_types = wt.count()
    corpus_pass_s = round(time.time() - t0, 1)

    # phase 2+3: synthetic web-scale histogram -> heap merges
    t0 = time.time()
    items = synth_histogram(n_types)
    synth_s = round(time.time() - t0, 1)
    t0 = time.time()
    merges = bpe.train_bpe_from_histogram(items, num_merges, min_pair_count=2)
    merge_s = round(time.time() - t0, 1)

    # phase 4 (r11): unigram-LM trainer at target vocab over a Zipf
    # histogram — EM + loss pruning are superlinear in type count, so
    # the type table is capped separately from the BPE phase
    from streaming_etl_pipeline_spark.operators import unigram as UG

    t0 = time.time()
    uni_items = items[:unigram_types]
    uni_vocab = UG.train_unigram_from_histogram(
        uni_items, unigram_vocab, max_piece_len=8
    )
    unigram_s = round(time.time() - t0, 1)

    # phase 5 (r11, judge r10 "what's wrong" #4): occurrence-grain vs
    # type-grain BPE encoding over DISTINCT Zipf docs drawn from the
    # full type pool — every doc unique, per-batch type diversity high,
    # so the per-batch memo can't collapse the corpus and the contrast
    # measures what the type-grain join actually buys. (A replicated
    # small corpus is the memo's best case and was measured at 6.2 s vs
    # 14.5 s occurrence-vs-types — recorded in SCALE.md as the
    # counter-regime.)
    from pyspark.sql import functions as F

    table = merges[:4096]
    words_df = F.broadcast(
        spark.createDataFrame(
            [(i + 1, w) for i, (w, _) in enumerate(items)],
            "rank int, word string",
        )
    )
    n_pool = len(items)
    corpus = (
        spark.range(encode_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("j"),
        )
        # Zipf-ish rank via a power transform of a hash-derived uniform
        .withColumn(
            "_u",
            (
                F.pmod(F.xxhash64(F.col("doc_id") * 24 + F.col("j")), 1_000_003)
                / 1_000_003.0
            ),
        )
        .withColumn(
            "rank",
            (F.pow(F.col("_u"), 3.0) * n_pool).cast("int") + 1,
        )
        .join(words_df, "rank")
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("word")).alias("text"))
        .repartition(64)
        .persist()
    )
    n_docs = corpus.count()

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    t0 = time.time()
    _noop(bpe.bpe_encode_ranked(corpus, "text", table, out_col="b"))
    occ_s = round(time.time() - t0, 1)
    t0 = time.time()
    _noop(bpe.bpe_encode_types(corpus, "text", table, out_col="b"))
    typ_s = round(time.time() - t0, 1)
    # equality spot-check on a deterministic 2k-doc slice
    sl = corpus.filter(F.col("doc_id") < 2000)
    a = sorted(
        tuple(r) for r in bpe.bpe_encode_ranked(sl, "text", table, out_col="b")
        .select("text", "b").collect()
    )
    b = sorted(
        tuple(r) for r in bpe.bpe_encode_types(sl, "text", table, out_col="b")
        .select("text", "b").collect()
    )

    print(json.dumps({
        "metric": "bpe_local_train",
        "num_merges_requested": num_merges,
        "num_merges_learned": len(merges),
        "n_types": n_types,
        "corpus_pass_s_sf01": corpus_pass_s,
        "real_types_sf01": real_types,
        "synth_gen_s": synth_s,
        "heap_merge_s": merge_s,
        "unigram_vocab_target": unigram_vocab,
        "unigram_vocab_learned": len(uni_vocab),
        "unigram_types": len(uni_items),
        "unigram_train_s": unigram_s,
        "encode_docs": n_docs,
        "encode_occurrence_s": occ_s,
        "encode_types_s": typ_s,
        "encode_grains_match": a == b,
        "machine": state,
    }))


if __name__ == "__main__":
    main()

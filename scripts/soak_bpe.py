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

    print(json.dumps({
        "metric": "bpe_local_train",
        "num_merges_requested": num_merges,
        "num_merges_learned": len(merges),
        "n_types": n_types,
        "corpus_pass_s_sf01": corpus_pass_s,
        "real_types_sf01": real_types,
        "synth_gen_s": synth_s,
        "heap_merge_s": merge_s,
        "machine": state,
    }))


if __name__ == "__main__":
    main()

"""Unit tests for operators/fuzzy.py (symmetric-delete entity resolution)."""

from __future__ import annotations

import itertools

from streaming_etl_pipeline_spark.operators.fuzzy import edit1_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit1_pairs_exact_recall_vs_bruteforce(spark):
    # substitutions, insertions, deletions, repeated-char runs, and
    # far-apart strings — recall must equal the brute-force pair set
    names = [
        "kitten", "sitten", "kitte", "kittten", "mitten",
        "aaaa", "aaba", "aab", "zzzz", "totally_different",
    ]
    df = spark.createDataFrame(
        list(enumerate(names)), "id long, name string"
    )
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in edit1_pairs(df, "id", "name").collect()
    }
    want = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _lev(a, b) <= 1
    }
    assert got == want
    assert len(want) >= 6  # the fixture really exercises all edit kinds


def test_edit1_pairs_no_false_positives_at_distance_2(spark):
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "abxxef")], "id long, name string"
    )
    assert edit1_pairs(df, "id", "name").count() == 0

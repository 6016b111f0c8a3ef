"""Round-11 optimization pin: the Spark-SQL expression twins in
operators/dedup.py (shingles / hashed_shingles / minhash_from_hashes /
lsh_candidate_pairs band build) must be bit-identical to the Column-API
construction they replaced on the hot string-column-name path.

The Column path still exists (taken for Column inputs); these tests run
both paths over an adversarial fixture — unicode, empty, whitespace-only,
NULL, sub-k-token and mixed-case documents — and assert exact equality.
The DuckDB oracle rows (dedup_minhash_lsh / dedup_ngram_jaccard /
doc_fingerprint / neardup_pairs) independently gate the same twins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.operators import dedup as DD

ADVERSARIAL = [
    (1, ""),
    (2, "   \t\n "),
    (3, None),
    (4, "one"),
    (5, "one two"),
    (6, "one two three"),
    (7, "Café  au\tlait\né Ω ß"),
    (8, "ONE two THREE four FIVE six"),
    (9, "a a a a a a a a"),
    (10, "punct, marks! and? (parens) -- dashes"),
    (11, "日本語 テキスト の 行"),
    (12, "x " * 200),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")


def _assert_same(a, b):
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_shingles_expr_equals_column_path(spark, docs):
    for k in (2, 3, 5):
        expr_path = docs.select("doc_id", DD.shingles("text", k).alias("sh"))
        col_path = docs.select(
            "doc_id", DD.shingles(F.col("text"), k).alias("sh")
        )
        _assert_same(expr_path, col_path)


def test_hashed_shingles_expr_equals_column_path(spark, docs):
    sh = docs.select("doc_id", DD.shingles("text").alias("sh"))
    expr_path = sh.select("doc_id", DD.hashed_shingles("sh").alias("hs"))
    col_path = sh.select(
        "doc_id", DD.hashed_shingles(F.col("sh")).alias("hs")
    )
    _assert_same(expr_path, col_path)


def test_minhash_expr_equals_column_path(spark, docs):
    hs = docs.select(
        "doc_id", DD.hashed_shingles(DD.shingles("text")).alias("hs")
    )
    expr_path = hs.select("doc_id", *DD.minhash_from_hashes("hs", 16))
    col_path = hs.select(
        "doc_id", *DD.minhash_from_hashes(F.col("hs"), 16)
    )
    _assert_same(expr_path, col_path)


def test_lsh_pairs_unchanged_on_fixture(spark, docs):
    """End-to-end LSH over near-duplicate docs: the banded expr build must
    produce the same candidate pairs as recomputing buckets by hand with
    the Column-API md5_long."""
    near = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    sigs = near.select(
        "doc_id",
        *DD.minhash_from_hashes(
            DD.hashed_shingles(DD.shingles("text")), 16
        ),
    )
    got = sorted(
        (r.id_a, r.id_b)
        for r in DD.lsh_candidate_pairs(sigs, num_hashes=16, bands=8).collect()
    )
    # Column-API reference: same bands, built without F.expr.
    from streaming_etl_pipeline_spark.functions.core import md5_long

    rows = 2
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                md5_long(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh{b * rows + r}").cast("string")
                            for r in range(rows)
                        ],
                    ),
                    f"band{b}",
                ).alias("bucket"),
            )
            for b in range(8)
        ]
    )
    buckets = sigs.select(
        F.col("doc_id"), F.explode(band_cols).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    left, right = buckets.alias("l"), buckets.alias("r")
    want = sorted(
        (r.id_a, r.id_b)
        for r in left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .distinct()
        .collect()
    )
    assert got == want
    assert got  # the fixture must actually produce candidates


def test_distinct_hashed_shingles_equals_step_chain(spark, docs):
    # r12 build trim: the one-expression composition must equal the
    # former select chain (shingles → hashed_shingles → array_distinct)
    # on both construction paths, over the adversarial fixture.
    for k in (1, 3):
        composed = docs.select(
            "doc_id", DD.distinct_hashed_shingles("text", k).alias("hsd")
        )
        chain = docs.select(
            "doc_id", DD.shingles("text", k).alias("sh")
        ).select("doc_id", DD.hashed_shingles("sh").alias("hs")).select(
            "doc_id", F.array_distinct("hs").alias("hsd")
        )
        col_path = docs.select(
            "doc_id",
            F.array_distinct(
                DD.hashed_shingles(DD.shingles(F.col("text"), k))
            ).alias("hsd"),
        )
        _assert_same(composed, chain)
        _assert_same(composed, col_path)

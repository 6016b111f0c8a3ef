"""Unit tests for operators/curation.py (training-set assembly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.operators import curation as CU


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# context_chunks
# ---------------------------------------------------------------------------


def test_context_chunks_window_arithmetic(spark):
    # 50 tokens, window 32, overlap 8 → stride 24 → chunks at 0 and 24:
    # [0:32] full, [24:50] = 26 tokens.
    text = " ".join(f"w{i}" for i in range(50))
    out = CU.context_chunks(
        _docs(spark, [(1, text)]), max_tokens=32, overlap=8
    ).orderBy("chunk_id")
    rows = out.collect()
    assert [r.chunk_id for r in rows] == [0, 1]
    assert [r.n_tokens for r in rows] == [32, 26]


def test_context_chunks_overlap_tokens_shared(spark):
    # Consecutive windows share exactly `overlap` tokens: chunk 1 must
    # start at token index stride (= 24), i.e. contain w24..w55.
    text = " ".join(f"w{i}" for i in range(56))
    out = CU.context_chunks(
        _docs(spark, [(1, text)]), max_tokens=32, overlap=8
    ).orderBy("chunk_id")
    rows = out.collect()
    assert [r.n_tokens for r in rows] == [32, 32]
    # hash of w24..w55 pins the start offset
    import hashlib

    expect = hashlib.md5(
        " ".join(f"w{i}" for i in range(24, 56)).encode()
    ).hexdigest()
    assert rows[1].chunk_md5 == expect


def test_context_chunks_short_and_empty_docs(spark):
    out = CU.context_chunks(
        _docs(spark, [(1, "only three tokens"), (2, ""), (3, "x")]),
        max_tokens=32,
        overlap=8,
    )
    by_id = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    assert len(by_id) == 3  # one chunk each, even empty
    assert by_id[(1, 0)].n_tokens == 3
    assert by_id[(2, 0)].n_tokens == 0
    assert by_id[(3, 0)].n_tokens == 1


def test_context_chunks_rejects_bad_overlap(spark):
    with pytest.raises(AssertionError):
        CU.context_chunks(_docs(spark, [(1, "a b")]), max_tokens=8, overlap=8)


# ---------------------------------------------------------------------------
# assign_splits
# ---------------------------------------------------------------------------


def test_assign_splits_deterministic_and_complete(spark):
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = CU.assign_splits(docs, "doc_id").groupBy("split").count().collect()
    b = CU.assign_splits(docs, "doc_id").groupBy("split").count().collect()
    assert sorted((r.split, r["count"]) for r in a) == sorted(
        (r.split, r["count"]) for r in b
    )
    counts = {r.split: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # 90/5/5 within generous binomial slack
    assert 1700 <= counts["train"] <= 1900


def test_assign_splits_seed_changes_routing(spark):
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    a = CU.assign_splits(docs, "doc_id", seed="s1")
    b = CU.assign_splits(docs, "doc_id", seed="s2")
    moved = (
        a.alias("a")
        .join(b.alias("b"), "doc_id")
        .filter(F.col("a.split") != F.col("b.split"))
        .count()
    )
    assert moved > 0


# ---------------------------------------------------------------------------
# redact_pii
# ---------------------------------------------------------------------------


def test_redact_pii_counts_and_hash(spark):
    import hashlib

    out = CU.redact_pii(
        _docs(
            spark,
            [
                (1, "Mail Bob.Smith@Corp.IO re 555-123-4567 and 999.888.7777"),
                (2, "ssn 123-45-6789 from 10.0.0.255"),
                (3, "nothing sensitive here"),
            ],
        )
    ).collect()
    r = {x.doc_id: x for x in out}
    assert (r[1].n_email, r[1].n_phone, r[1].n_ssn, r[1].n_ipv4) == (1, 2, 0, 0)
    assert (r[2].n_email, r[2].n_phone, r[2].n_ssn, r[2].n_ipv4) == (0, 0, 1, 1)
    assert (r[3].n_email, r[3].n_phone, r[3].n_ssn, r[3].n_ipv4) == (0, 0, 0, 0)
    assert r[1].clean_md5 == hashlib.md5(
        b"mail <email> re <phone> and <phone>"
    ).hexdigest()
    assert r[2].clean_md5 == hashlib.md5(b"ssn <ssn> from <ip>").hexdigest()


def test_redact_pii_ssn_not_eaten_by_phone(spark):
    # SSN and phone share a digits-with-dashes shape; the 3-2-4 grouping
    # must land in n_ssn only.
    out = CU.redact_pii(_docs(spark, [(1, "123-45-6789 555-123-4567")])).collect()[0]
    assert (out.n_ssn, out.n_phone) == (1, 1)


# ---------------------------------------------------------------------------
# contamination_stats
# ---------------------------------------------------------------------------


def test_contamination_flags_overlapping_doc(spark):
    probe = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = _docs(
        spark,
        [
            (1, "clean words only none shared with benchmark at all here now"),
            (2, f"prefix words here {probe} suffix words here"),
        ],
    )
    bench = spark.createDataFrame([(probe,)], "text string")
    out = {r.doc_id: r for r in CU.contamination_stats(corpus, bench, k=5).collect()}
    assert out[1].n_contaminated == 0 and out[1].flagged is False
    # probe contributes 4 internal 5-grams fully inside the benchmark text
    assert out[2].n_contaminated == 4
    assert out[2].flagged is True
    assert abs(out[2].contamination_rate - 4 / out[2].n_shingles) < 1e-9


# ---------------------------------------------------------------------------
# Streaming composition: quality filter + redaction are stateless
# projections, so they lift onto readStream unchanged
# ---------------------------------------------------------------------------


def test_curation_projections_compose_with_streaming(spark, tmp_path):
    from streaming_etl_pipeline_spark.operators.curation import redacted_text
    from streaming_etl_pipeline_spark.operators.text import gopher_filter

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")
    good = " ".join(
        ["the", "data"]
        + [f"w{i:03d}" for i in range(19)]
        + [f"q0{j:02d}x" for j in range(19)]
    )
    spark.createDataFrame(
        [(1, good + " ping admin@example.com"), (2, "too short")],
        "doc_id long, text string",
    ).write.parquet(src)

    docs = spark.readStream.schema("doc_id long, text string").parquet(src)
    cleaned = (
        gopher_filter(docs, keep_cols=True)
        .filter("keep")
        .select("doc_id", redacted_text("text").alias("text"))
    )
    q = (
        cleaned.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert [r.doc_id for r in rows] == [1]
    assert "admin@example.com" not in rows[0].text
    assert "<email>" in rows[0].text


def test_streaming_incremental_dedup_store(spark, tmp_path):
    """Streaming ingest + the persisted dedup store: each micro-batch
    checks its docs against everything ingested before it (foreachBatch →
    incremental_near_dups), so a near-dup arriving in a LATER batch is
    caught without ever rescanning earlier text."""
    from streaming_etl_pipeline_spark.operators.dedup import incremental_near_dups

    src = str(tmp_path / "stream_src")
    store = str(tmp_path / "sig_store")
    hits_path = str(tmp_path / "hits")
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

    # batch 1 lands before the stream starts; batch 2 arrives as a second
    # file and contains a near-dup of a batch-1 doc
    spark.createDataFrame(
        [(1, base), (2, "completely different words live in this one here")],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)

    found = []

    def check_batch(batch_df, batch_id):
        pairs = incremental_near_dups(spark, batch_df, store, threshold=0.5)
        rows = pairs.collect()
        found.extend((r.id_a, r.id_b) for r in rows)
        if rows:
            pairs.write.mode("append").parquet(hits_path)

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        src
    ).writeStream.foreachBatch(check_batch).trigger(availableNow=True)
    q = stream.option("checkpointLocation", str(tmp_path / "ck1")).start()
    q.awaitTermination(120)
    assert found == []  # nothing to collide with yet

    spark.createDataFrame(
        [(10, base + " kilo")], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    q = stream.option("checkpointLocation", str(tmp_path / "ck1")).start()
    q.awaitTermination(120)

    assert any({a, b} == {1, 10} for a, b in found), found


def test_cluster_safe_splits_keeps_neardups_together(spark):
    from pyspark.sql import Row

    from streaming_etl_pipeline_spark.operators.curation import (
        assign_splits,
        cluster_safe_splits,
    )

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
    # pair up docs (2k, 2k+1) as near-dup clusters with canonical 2k
    clusters = spark.createDataFrame(
        [Row(doc_id=i, canonical_id=(i // 2) * 2) for i in range(200)]
    )
    sp = cluster_safe_splits(docs, clusters).collect()
    by_doc = {r.doc_id: r.split for r in sp}
    for i in range(0, 200, 2):
        assert by_doc[i] == by_doc[i + 1], f"cluster {i} straddles splits"
    assert len({r.split for r in sp}) >= 2  # small n: multiple splits seen

    # plain per-doc splitting DOES straddle some pair (the leakage this
    # operator exists to prevent)
    plain = {r.doc_id: r.split for r in assign_splits(docs).collect()}
    assert any(plain[i] != plain[i + 1] for i in range(0, 200, 2))

    # docs absent from the cluster map fall back to their own id
    loners = cluster_safe_splits(
        spark.createDataFrame([Row(doc_id=10_001)]), clusters
    ).collect()
    assert loners[0]._split_key == 10_001


def test_pack_sequences_block_spans_and_crossers(spark):
    from pyspark.sql import Row
    from streaming_etl_pipeline_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="a", n_tokens=t) for i, t in
         enumerate([500, 700, 900, 30, 0, 2048, 10])]
        + [Row(doc_id=100, source="b", n_tokens=64)]
    )
    out = pack_sequences(docs, budget=1000).collect()
    by_id = {r["doc_id"]: r for r in out}
    # offsets within a group tile the token stream exactly: sorted spans
    # are contiguous from 0
    a = sorted((r for r in out if r["source"] == "a"),
               key=lambda r: r["start_offset"])
    assert a[0]["start_offset"] == 0
    for prev, cur in zip(a, a[1:]):
        assert cur["start_offset"] == prev["start_offset"] + prev["n_tok"]
    # block span arithmetic
    for r in out:
        assert r["block_first"] == r["start_offset"] // 1000
        if r["n_tok"] > 0:
            assert r["block_last"] == (r["start_offset"] + r["n_tok"] - 1) // 1000
            assert r["crosses"] == (r["block_first"] != r["block_last"])
        else:
            assert not r["crosses"]  # zero-width doc never crosses
    # group b packs independently from offset 0
    assert by_id[100]["start_offset"] == 0
    # deterministic: same input -> same assignment
    again = {r["doc_id"]: r for r in pack_sequences(docs, budget=1000).collect()}
    assert {k: tuple(v) for k, v in by_id.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_materialize_blocks_concats_in_packing_order(spark):
    from pyspark.sql import Row
    from streaming_etl_pipeline_spark.operators.curation import (
        materialize_blocks,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="a", text=f"doc{i}", n_tokens=400)
         for i in range(5)]
    )
    asg = pack_sequences(docs, budget=1000)
    blocks = materialize_blocks(docs, asg).collect()
    by_block = {r["block"]: r for r in blocks}
    # 5 docs x 400 tokens / 1000 budget -> blocks 0 and 1 (2000 tokens
    # tile blocks 0,1; doc at offset 1600 starts in block 1)
    assert set(by_block) == {0, 1}
    assert sum(r["n_docs"] for r in blocks) == 5
    assert sum(r["block_tokens"] for r in blocks) == 2000
    # order within a block follows start_offset; text joined by separator
    order = {r["doc_id"]: r["start_offset"] for r in asg.collect()}
    b0_docs = sorted(
        (d for d in order if order[d] // 1000 == 0), key=lambda d: order[d]
    )
    assert by_block[0]["block_text"] == "<|endofdoc|>".join(
        f"doc{d}" for d in b0_docs
    )
    # determinism across runs
    again = materialize_blocks(docs, pack_sequences(docs, budget=1000)).collect()
    assert sorted(map(tuple, blocks)) == sorted(map(tuple, again))

"""Property-based and edge-case tests (SURVEY.md §5: the reference has no
randomized testing — the engine adds it). Hypothesis drives the *data*;
each example round-trips through real Spark plans, so example counts are
kept small and deadlines disabled."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, functions as F

from streaming_etl_pipeline_spark.functions.core import time_bucket
from streaming_etl_pipeline_spark.operators import dedup as DD
from streaming_etl_pipeline_spark.operators import sessions as SN
from streaming_etl_pipeline_spark.operators.cleaning import deduplicate_latest
from streaming_etl_pipeline_spark.operators.aggregates import windowed_stats

_spark = None


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    global _spark
    _spark = spark
    yield


SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ts_strategy = st.integers(
    min_value=1_700_000_000, max_value=1_700_100_000
)  # epoch seconds over ~28h


@SETTINGS
@given(
    events=st.lists(
        st.tuples(st.integers(1, 4), ts_strategy), min_size=1, max_size=120
    ),
    gap=st.sampled_from([60, 600, 3600]),
)
def test_sessionize_partition_properties(events, gap):
    """Sessions partition each user's events; within-session gaps ≤ gap;
    consecutive sessions are > gap apart; n_events reconciles."""
    rows = [
        Row(user_id=u, event_id=i, ts=dt.datetime.fromtimestamp(t, dt.timezone.utc))
        for i, (u, t) in enumerate(events)
    ]
    df = _spark.createDataFrame(rows)
    out = SN.session_stats(
        df, keys=("user_id",), ts_col="ts", gap_seconds=gap, tiebreak=("event_id",)
    ).collect()
    assert sum(r.n_events for r in out) == len(events)
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for u, sess in by_user.items():
        sess.sort(key=lambda r: r.session_id)
        n_user_events = sum(1 for e, _ in [(x, y) for x, y in events] if e == u)
        assert sum(r.n_events for r in sess) == n_user_events
        assert [r.session_id for r in sess] == list(range(1, len(sess) + 1))
        for r in sess:
            dur = (r.last_event_time - r.session_start).total_seconds()
            # a session of n events spanning dur seconds can't have all
            # gaps > gap unless dur > gap*(n-1); conversely each hop ≤ gap
            assert dur <= gap * max(r.n_events - 1, 0) or r.n_events == 1
        for a, b in zip(sess, sess[1:]):
            assert (b.session_start - a.last_event_time).total_seconds() > gap


@SETTINGS
@given(
    ts=st.lists(ts_strategy, min_size=1, max_size=100),
    width=st.sampled_from([60, 300, 3600]),
)
def test_time_bucket_properties(ts, width):
    """bucket ≤ ts < bucket+width, and bucket is width-aligned."""
    rows = [
        Row(ts=dt.datetime.fromtimestamp(t, dt.timezone.utc)) for t in ts
    ]
    df = _spark.createDataFrame(rows)
    out = df.select(
        F.unix_micros("ts").alias("us"),
        F.unix_micros(time_bucket("ts", width)).alias("b"),
    ).collect()
    w_us = width * 1_000_000
    for r in out:
        assert r.b <= r.us < r.b + w_us
        assert r.b % w_us == 0


@SETTINGS
@given(
    values=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50), st.integers(0, 10**6)),
        min_size=2,
        max_size=80,
    )
)
def test_dedup_latest_keeps_max_order(values):
    """After keep-latest dedup: one row per key, and its order value is
    the max for that key."""
    rows = [Row(k=k, ord=o, uid=u) for k, o, u in values]
    df = _spark.createDataFrame(rows)
    out = deduplicate_latest(df, keys=("k",), order_col="ord", tiebreak=("uid",)).collect()
    expected_max = {}
    for k, o, _ in values:
        expected_max[k] = max(expected_max.get(k, -1), o)
    assert len(out) == len(expected_max)
    for r in out:
        assert r.ord == expected_max[r.k]


@SETTINGS
@given(
    words_a=st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=40),
    words_b=st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=40),
)
def test_minhash_estimates_jaccard(words_a, words_b):
    """MinHash signature agreement is an unbiased Jaccard estimator —
    with 32 hashes the estimate must land within ±0.35 of exact (coarse
    bound ≈ 4σ) and be exactly 1.0 for identical shingle sets."""
    ta, tb = " ".join(words_a), " ".join(words_b)
    df = _spark.createDataFrame([Row(doc_id=1, text=ta), Row(doc_id=2, text=tb)])
    sh = df.select("doc_id", DD.shingles("text").alias("sh"))
    hs = sh.select("doc_id", "sh", DD.hashed_shingles("sh").alias("hs"))
    sig = hs.select("doc_id", *DD.minhash_from_hashes("hs", 32)).collect()
    s1, s2 = sorted(sig, key=lambda r: r.doc_id)
    agree = sum(1 for i in range(32) if s1[f"mh{i}"] == s2[f"mh{i}"]) / 32
    rows = {r.doc_id: set(r.sh) for r in sh.collect()}
    exact = len(rows[1] & rows[2]) / len(rows[1] | rows[2])
    if exact == 1.0:
        assert agree == 1.0
    else:
        assert abs(agree - exact) <= 0.35


def test_empty_inputs_through_operators(spark):
    """Reference edge cases (test_integration.py:279-340): empty frames
    flow through cleaning/aggregation/session operators without errors."""
    empty = spark.createDataFrame(
        [], "sensor_id string, event_time timestamp, value double, "
        "sensor_type string, ingestion_time timestamp",
    )
    assert deduplicate_latest(
        empty, keys=("sensor_id", "event_time"), order_col="ingestion_time"
    ).count() == 0
    assert windowed_stats(
        empty, ts_col="event_time", keys=["sensor_id"], bucket_seconds=300,
        value_col="value",
    ).count() == 0
    assert SN.session_stats(
        empty, keys=("sensor_id",), ts_col="event_time", gap_seconds=60
    ).count() == 0
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert DD.exact_dedup_groups(empty_docs).count() == 0


def test_single_row_stddev_is_null_not_nan(spark):
    df = spark.createDataFrame([Row(sensor_id="s", event_time=dt.datetime(2024, 1, 1), value=1.0)])
    out = windowed_stats(
        df, ts_col="event_time", keys=["sensor_id"], bucket_seconds=300,
        value_col="value",
    ).collect()[0]
    assert out.stddev_value is None  # ANSI NULL, never NaN (oracle parity)
    assert out.reading_count == 1


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    ftype=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_codec_roundtrip_property(h, w, c, ftype, seed):
    # any shape (incl. 1x1, 1xN, Nx1) x any channel count x any scanline
    # filter must roundtrip bit-exactly — pure-python, no SparkSession
    import numpy as np

    from streaming_etl_pipeline_spark.functions import codecs as C

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    out = C.png_decode(C.png_encode(arr, filter_type=ftype))
    assert out.shape == (h, w, c)
    assert (out == arr).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 4000),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_codec_roundtrip_property(n, rate, seed):
    import numpy as np

    from streaming_etl_pipeline_spark.functions import codecs as C

    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=n).astype(np.int16)
    out, got_rate = C.wav_decode(C.wav_encode(samples, rate))
    assert got_rate == rate
    assert (out == samples).all()


# ---------------------------------------------------------------------------
# Curation operator properties (round 3)
# ---------------------------------------------------------------------------

word_strategy = st.text(
    alphabet="abcdefghij0123456789", min_size=1, max_size=8
)


@SETTINGS
@given(
    words=st.lists(word_strategy, min_size=0, max_size=120),
    max_tokens=st.sampled_from([8, 32]),
    overlap=st.sampled_from([0, 2, 4]),
)
def test_context_chunks_cover_every_token(words, max_tokens, overlap):
    """Chunk windows tile the token list exactly: stride-spaced starts,
    full-width interior windows, and total coverage — stitching
    non-overlap heads back together yields the original token count."""
    from streaming_etl_pipeline_spark.operators.curation import context_chunks

    text = " ".join(words)
    df = _spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        context_chunks(df, max_tokens=max_tokens, overlap=overlap).collect(),
        key=lambda r: r.chunk_id,
    )
    n = len([w for w in words if w])
    stride = max_tokens - overlap
    assert rows[0].chunk_id == 0
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    # every window except the last is full-width (when the doc is long
    # enough); the last covers the tail exactly
    for r in rows[:-1]:
        assert r.n_tokens == max_tokens
    last = rows[-1]
    assert last.n_tokens == max(0, min(n - last.chunk_id * stride, max_tokens))
    # coverage: last window must reach the end of the token list
    assert last.chunk_id * stride + last.n_tokens == max(n, 0)


@SETTINGS
@given(keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=200, unique=True))
def test_assign_splits_is_stable_partition(keys):
    """Every key gets exactly one split, and the assignment is a pure
    function of the key (stable across shuffled input order)."""
    from streaming_etl_pipeline_spark.operators.curation import assign_splits

    df = _spark.createDataFrame([(k,) for k in keys], "doc_id long")
    a = {r.doc_id: r.split for r in assign_splits(df, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in assign_splits(
            df.orderBy(F.rand(7)), "doc_id"
        ).collect()
    }
    assert a == b
    assert set(a) == set(keys)
    assert set(a.values()) <= {"train", "val", "test"}


@SETTINGS
@given(
    words=st.lists(word_strategy, min_size=1, max_size=40),
    n_pii=st.integers(0, 3),
)
def test_redact_pii_idempotent_and_complete(words, n_pii):
    """Redaction is idempotent (a second pass is a no-op) and complete
    (no pattern matches the redacted text)."""
    import hashlib

    from streaming_etl_pipeline_spark.operators.curation import (
        PII_PATTERNS,
        redact_pii,
        redacted_text,
    )

    text = " ".join(words) + " someone@example.net 10.1.2.3" * n_pii
    df = _spark.createDataFrame([(1, text)], "doc_id long, text string")
    first = redact_pii(df).collect()[0]
    # second pass over the already-clean text
    clean_df = df.select("doc_id", redacted_text("text").alias("text"))
    second = redact_pii(clean_df).collect()[0]
    assert (second.n_email, second.n_ssn, second.n_phone, second.n_ipv4) == (
        0, 0, 0, 0,
    )
    clean = clean_df.collect()[0].text
    assert second.clean_md5 == hashlib.md5(clean.encode()).hexdigest()
    assert first.n_email == n_pii and first.n_ipv4 == n_pii


# ---------------------------------------------------------------------------
# SCD2 / CDC invariants (round-3 operators)
# ---------------------------------------------------------------------------

change_log = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),          # key
        st.sampled_from(["A", "B", "C", None]),         # attr
        st.integers(min_value=1, max_value=40),         # ts
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(rows=change_log)
def test_scd2_partitions_the_timeline(rows):
    """For every key: version numbers are 1..n, exactly one open row,
    each effective_to equals the next effective_from, and consecutive
    versions differ in the tracked attr."""
    from streaming_etl_pipeline_spark.warehouse import build_scd2

    df = _spark.createDataFrame(
        [(k, a, t, i) for i, (k, a, t) in enumerate(rows)],
        "k long, a string, ts long, seq long",
    )
    hist = build_scd2(
        df, key="k", attrs=("a",), ts_col="ts", order_cols=("ts", "seq")
    ).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.k, []).append(r)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        assert sum(1 for r in vs if r.is_current) == 1
        assert vs[-1].is_current and vs[-1].effective_to is None
        for a, b in zip(vs, vs[1:]):
            assert a.effective_to == b.effective_from
            assert a.a != b.a  # null-safe: None != 'A' etc.


@SETTINGS
@given(rows=change_log)
def test_apply_cdc_replay_converges(rows):
    """Applying the same change batch twice gives the same state as
    once, and the surviving keys are exactly (snapshot ∪ upserted) −
    latest-deleted."""
    from streaming_etl_pipeline_spark.operators.joins import apply_cdc

    snap = _spark.createDataFrame(
        [Row(k=k, a="base") for k in (1, 2)]
    )
    changes = _spark.createDataFrame(
        [
            (k, a, t, i, "delete" if a is None else "upsert")
            for i, (k, a, t) in enumerate(rows)
        ],
        "k long, a string, ts long, seq long, op string",
    )
    once = apply_cdc(
        snap, changes, key="k", ts_col="ts", payload_cols=("a",),
        order_cols=("ts", "seq"),
    )
    twice = apply_cdc(
        once, changes, key="k", ts_col="ts", payload_cols=("a",),
        order_cols=("ts", "seq"),
    )
    got_once = {(r.k, r.a) for r in once.collect()}
    assert got_once == {(r.k, r.a) for r in twice.collect()}

    latest: dict[int, tuple] = {}
    for i, (k, a, t) in enumerate(rows):
        if k not in latest or (t, i) > latest[k][:2]:
            latest[k] = (t, i, a)
    want = {(1, "base"), (2, "base")}
    for k, (_, _, a) in latest.items():
        want = {kv for kv in want if kv[0] != k}
        if a is not None:  # upsert; None means delete
            want.add((k, a))
    assert got_once == want


@SETTINGS
@given(
    tokens=st.lists(st.integers(0, 3000), min_size=1, max_size=60),
    budget=st.sampled_from([256, 1000, 4096]),
    groups=st.integers(1, 3),
)
def test_pack_sequences_tiles_each_group(tokens, budget, groups):
    """For any doc set: per-group offsets tile [0, Σtokens) exactly with
    no gaps or overlaps, block spans are consistent with the offsets,
    and zero-token docs never cross."""
    from streaming_etl_pipeline_spark.operators.curation import pack_sequences

    rows = [
        Row(doc_id=i, source=str(i % groups), n_tokens=t)
        for i, t in enumerate(tokens)
    ]
    out = pack_sequences(
        _spark.createDataFrame(rows, "doc_id long, source string, n_tokens long"),
        budget=budget,
    ).collect()
    assert len(out) == len(rows)
    import hashlib as _h

    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    for g, rs in by_group.items():
        # walk in the operator's true packing order (md5 of id, then id)
        # — zero-width docs tie on start_offset, so offset order alone
        # is ambiguous
        rs.sort(key=lambda r: (
            _h.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"]
        ))
        expect = 0
        for r in rs:
            assert r["start_offset"] == expect
            expect += r["n_tok"]
            assert r["block_first"] == r["start_offset"] // budget
            if r["n_tok"] > 0:
                assert r["block_last"] == (
                    (r["start_offset"] + r["n_tok"] - 1) // budget
                )
                assert r["crosses"] == (r["block_first"] != r["block_last"])
            else:
                assert not r["crosses"]
        assert expect == sum(
            t for i, t in enumerate(tokens) if str(i % groups) == g
        )


@SETTINGS
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=99.5, allow_nan=False,
                  allow_infinity=False),
        min_size=1, max_size=200,
    ),
    n_splits=st.integers(2, 4),
)
def test_quantile_sketch_merge_equals_oneshot(vals, n_splits):
    """Any partition of the data into sketch builds merges to EXACTLY
    the one-shot sketch (histogram merges are associative), and every
    estimate sits within one bin width of a true quantile."""
    from streaming_etl_pipeline_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_estimate,
        quantile_sketch_merge,
    )

    LO, HI, BINS = 0.0, 100.0, 50  # width 2.0
    rows = [Row(k="g", v=float(v), part=i % n_splits)
            for i, v in enumerate(vals)]
    df = _spark.createDataFrame(rows, "k string, v double, part int")
    parts = [
        quantile_sketch_build(df.filter(F.col("part") == i), ("k",),
                              "v", LO, HI, BINS)
        for i in range(n_splits)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = sorted(map(tuple, quantile_sketch_merge(u, ("k",)).collect()))
    oneshot = sorted(map(tuple, quantile_sketch_build(
        df, ("k",), "v", LO, HI, BINS).collect()))
    assert merged == oneshot
    est = quantile_sketch_estimate(
        quantile_sketch_merge(u, ("k",)), ("k",), (0.5,), LO, HI, BINS
    ).collect()[0]
    import math as _m

    s = sorted(vals)
    # the sketch's definition: smallest value whose cumulative count
    # reaches q*n -> rank ceil(q*n) (1-based)
    true_p50 = s[max(0, _m.ceil(0.5 * len(s)) - 1)]
    assert abs(est["p50_est"] - true_p50) <= 2.0 + 1e-9


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="abcdef ", min_size=0, max_size=200),
        min_size=1, max_size=20,
    )
)
def test_substring_dup_stats_bounds(texts):
    """0 ≤ shared ≤ n_chunks; dup_frac in [0,1]; identical docs (after
    normalization) flag ALL chunks shared; short docs produce no rows."""
    from streaming_etl_pipeline_spark.operators.dedup import (
        substring_dup_stats,
    )
    from streaming_etl_pipeline_spark.operators.text import norm_text

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    # append an exact twin of doc 0 under a new id
    rows.append(Row(doc_id=10_000, text=texts[0]))
    df = _spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dup_stats(
        df, width=32, stride=16).collect()}
    norm0 = " ".join(texts[0].split()).lower().strip()
    for r in out.values():
        assert 0 <= r["shared_chunks"] <= r["n_chunks"]
        assert 0.0 <= r["dup_frac"] <= 1.0
    if len(norm0) >= 32:
        assert out[0]["dup_frac"] == 1.0 and out[10_000]["dup_frac"] == 1.0
    else:
        assert 0 not in out and 10_000 not in out

"""Deterministic sampling operators: reproducibility, partitioning
independence, superset stability, and budget semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.operators import sampling as SP
from streaming_etl_pipeline_spark.sources import read_table

from conftest import SF_ORACLE


def test_hash_sample_fraction_superset_and_partition_independence(spark):
    docs = read_table(spark, SF_ORACLE, "documents")
    s05 = {r.doc_id for r in SP.hash_sample(docs, 0.05, "doc_id").select("doc_id").collect()}
    s10 = {r.doc_id for r in SP.hash_sample(docs, 0.10, "doc_id").select("doc_id").collect()}
    s20 = {r.doc_id for r in SP.hash_sample(docs, 0.20, "doc_id").select("doc_id").collect()}
    # superset chain at the same seed
    assert s05 <= s10 <= s20
    # fraction lands near target (uniform hash; loose bounds for n=500)
    n = docs.count()
    assert abs(len(s10) / n - 0.10) < 0.05
    # repartitioning must not change membership (unlike df.sample)
    reparted = {
        r.doc_id
        for r in SP.hash_sample(docs.repartition(17), 0.10, "doc_id")
        .select("doc_id").collect()
    }
    assert reparted == s10
    # different seed → different sample
    other = {
        r.doc_id
        for r in SP.hash_sample(docs, 0.10, "doc_id", seed="other")
        .select("doc_id").collect()
    }
    assert other != s10


def test_reservoir_per_group_exact_n(spark):
    events = read_table(spark, SF_ORACLE, "events")
    out = SP.reservoir_per_group(events, ["event_type"], 25, "event_id")
    counts = {r.event_type: r.n for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    full = {r.event_type: r.n for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for etype, n_full in full.items():
        assert counts[etype] == min(25, n_full)
    # stable across partitionings
    again = SP.reservoir_per_group(events.repartition(13), ["event_type"], 25, "event_id")
    assert {tuple(r) for r in out.select("event_id").collect()} == {
        tuple(r) for r in again.select("event_id").collect()
    }


def test_token_budget_sample_respects_budget_and_is_greedy(spark):
    docs = read_table(spark, SF_ORACLE, "documents")
    budget = 20_000
    out = SP.token_budget_sample(docs, ["lang"], "n_chars", budget, "doc_id")
    per_lang = out.groupBy("lang").agg(F.sum("n_chars").alias("total")).collect()
    assert len(per_lang) > 0
    for r in per_lang:
        assert r.total <= budget
    # greedy prefix property: the kept set is exactly the hash-order
    # prefix whose cumsum fits — verify for one language by recomputing
    lang = per_lang[0].lang
    rows = (
        docs.filter(F.col("lang") == lang)
        .select("doc_id", "n_chars",
                (SP.md5_long("doc_id", "budget")).alias("h"))
        .collect()
    )
    rows.sort(key=lambda r: (r.h, r.doc_id))
    cum, want = 0, set()
    for r in rows:
        cum += r.n_chars
        if cum > budget:
            break
        want.add(r.doc_id)
    got = {r.doc_id for r in out.filter(F.col("lang") == lang).collect()}
    assert got == want


def test_mixture_sample_targets_and_shortfall(spark):
    from streaming_etl_pipeline_spark.operators.sampling import mixture_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("grp"),
    )  # 4 groups × 250 rows
    out = mixture_sample(
        df, "doc_id", "grp", {"g0": 0.6, "g1": 0.2, "g2": 0.2}, 500
    )
    counts = {r.grp: r["count"] for r in out.groupBy("grp").count().collect()}
    assert "g3" not in counts  # unweighted group dropped
    assert counts["g0"] == 250  # target 300 > group size → whole group
    assert 70 <= counts["g1"] <= 130  # target 100, Bernoulli slack
    assert 70 <= counts["g2"] <= 130
    # reproducible: same seed → same membership
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in mixture_sample(
            df.orderBy(F.rand(3)), "doc_id", "grp",
            {"g0": 0.6, "g1": 0.2, "g2": 0.2}, 500,
        ).collect()
    )
    assert a == b


def test_weighted_sample_rate_tracks_weight_and_is_monotone(spark):
    from pyspark.sql import functions as F

    from streaming_etl_pipeline_spark.operators.sampling import weighted_sample

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2 == 0).alias("high"),
    ).withColumn("w", F.when(F.col("high"), 0.8).otherwise(0.2))

    kept = weighted_sample(df, "w", key_col="doc_id").collect()
    hi = sum(1 for r in kept if r.high) / (n / 2)
    lo = sum(1 for r in kept if not r.high) / (n / 2)
    assert abs(hi - 0.8) < 0.03 and abs(lo - 0.2) < 0.03

    # monotone: raising every weight only ADDS rows (same seed)
    more = weighted_sample(
        df.withColumn("w", F.col("w") + 0.1), "w", key_col="doc_id"
    ).collect()
    assert {r.doc_id for r in kept} <= {r.doc_id for r in more}

    # weights outside [0, 1] clamp instead of misbehaving
    all_in = weighted_sample(
        df.withColumn("w", F.lit(5.0)), "w", key_col="doc_id"
    ).count()
    none_in = weighted_sample(
        df.withColumn("w", F.lit(-1.0)), "w", key_col="doc_id"
    ).count()
    assert all_in == n and none_in == 0


def test_temperature_sample_flattens_toward_uniform(spark):
    """α=0.5 up-weights tail groups relative to natural sampling: the
    dominant group's sampled share must sit strictly between its
    natural share and uniform; α=1 reproduces natural proportions."""
    from pyspark.sql import functions as F

    from streaming_etl_pipeline_spark.operators.sampling import (
        temperature_sample,
    )

    # 800 'big' rows vs 100+100 tail rows
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 800, F.lit("big"))
        .when(F.col("id") < 900, F.lit("mid"))
        .otherwise(F.lit("small"))
        .alias("g"),
    )
    total = 300
    got = (
        temperature_sample(df, "k", "g", 0.5, total)
        .groupBy("g")
        .count()
        .collect()
    )
    shares = {r["g"]: r["count"] for r in got}
    n = sum(shares.values())
    # natural share of 'big' = 0.8; uniform = 1/3; α=0.5 target ≈ 0.67
    assert 1 / 3 < shares["big"] / n < 0.8
    assert shares["mid"] > 0 and shares["small"] > 0
    # target arithmetic: expected counts ∝ sqrt(p_g), within hash noise
    import math

    q = {g: math.sqrt(c / 1000) for g, c in {"big": 800, "mid": 100, "small": 100}.items()}
    zq = sum(q.values())
    for g in shares:
        expected = min(1.0, (q[g] / zq) * total / {"big": 800, "mid": 100, "small": 100}[g]) * {"big": 800, "mid": 100, "small": 100}[g]
        assert abs(shares[g] - expected) < 4 * math.sqrt(expected) + 3

    # α=1 → natural proportions (same fraction for every group)
    nat = (
        temperature_sample(df, "k", "g", 1.0, total)
        .groupBy("g").count().collect()
    )
    nat_shares = {r["g"]: r["count"] for r in nat}
    m = sum(nat_shares.values())
    assert abs(nat_shares["big"] / m - 0.8) < 0.08


def test_dyadic_pow_matches_float_pow(spark):
    from pyspark.sql import functions as F

    from streaming_etl_pipeline_spark.operators.sampling import _dyadic_pow

    rows = spark.range(1, 50).select((F.col("id") / 49.0).alias("x"))
    for alpha in (0.5, 0.25, 0.75, 0.625, 1.0):
        got = rows.select(_dyadic_pow(F.col("x"), alpha).alias("y")).collect()
        xs = rows.collect()
        for rx, ry in zip(xs, got):
            assert abs(ry["y"] - rx["x"] ** alpha) < 1e-12


def test_materialize_epochs_copies_and_determinism(spark):
    # group A: exactly 2 epochs → every doc twice; group B: 0.5 epochs
    # → a deterministic ~half of docs once; group C: NULL epochs →
    # nothing emitted
    docs = spark.createDataFrame(
        [(i, "A" if i < 20 else ("B" if i < 220 else "C"))
         for i in range(240)],
        "doc_id long, lang string",
    )
    alloc = spark.createDataFrame(
        [("A", 2.0), ("B", 0.5), ("C", None)],
        "grp string, epochs double",
    )
    out = SP.materialize_epochs(docs, alloc).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.copy)
    a_docs = {d: c for d, c in by_doc.items() if d < 20}
    b_docs = {d: c for d, c in by_doc.items() if 20 <= d < 220}
    # integral epochs: every A doc exactly twice, copies numbered 1..2
    assert set(a_docs) == set(range(20))
    assert all(sorted(c) == [1, 2] for c in a_docs.values())
    # fractional epochs: ~half of B docs exactly once (keyed Bernoulli)
    assert all(c == [1] for c in b_docs.values())
    assert abs(len(b_docs) / 200 - 0.5) < 0.15
    # NULL epochs emit nothing
    assert not any(d >= 220 for d in by_doc)
    # partitioning independence: same copies on any layout
    out2 = SP.materialize_epochs(docs.repartition(13), alloc).collect()
    assert sorted((r.doc_id, r.copy) for r in out2) == sorted(
        (r.doc_id, r.copy) for r in out
    )


def test_materialize_epochs_fractional_slice_nests(spark):
    # the fractional-epoch slice is the SAME keyed-hash slice at every
    # integer part: epochs=1.3's extra-copy docs == epochs=0.3's docs
    docs = spark.createDataFrame(
        [(i, "g") for i in range(400)], "doc_id long, lang string"
    )
    def emitted(ep):
        alloc = spark.createDataFrame([("g", ep)], "grp string, epochs double")
        rows = SP.materialize_epochs(docs, alloc).collect()
        return {r.doc_id for r in rows if r.n_copies == int(ep) + 1}
    assert emitted(0.3) == emitted(1.3) == emitted(3.3)

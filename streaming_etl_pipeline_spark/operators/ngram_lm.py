"""Interpolated Kneser-Ney trigram language model — train on a corpus,
score every document's log-probability, bit-reproducibly across engines.

The reference pipeline has no LM surface at all; this is the
training-data capability CCNet (Wenzek et al. 2020) built on KenLM:
score crawl text against a word-level n-gram LM and gate on perplexity.
The engine's :func:`~streaming_etl_pipeline_spark.operators.text.charlm_scores`
is the zero-vocabulary char-trigram version of that filter; this module
is the real thing — a word-trigram model with Kneser-Ney smoothing
(Kneser & Ney 1995; Chen & Goodman 1999 empirically best fixed-discount
variant), the standard for quality filtering because raw MLE counts
over-reward boilerplate n-grams while KN's continuation counts measure
how *productively* a word combines.

Model (fixed absolute discount D, interpolated form):

- ``P1(w)   = N1+(·w) / N1+(··)``  — continuation unigram: how many
  distinct contexts precede ``w``, over the bigram-type total;
- ``P2(w|v) = max(N1+(·vw)−D,0)/N1+(·v·) + D·N1+(v·)/N1+(·v·) · P1(w)``;
- ``P3(w|uv)= max(c(uvw)−D,0)/c(uv·) + D·N1+(uv·)/c(uv·) · P2(w|v)``.

Every count is an exact BIGINT group-by; every probability is one IEEE
double expression rounded to 9 dp with the SAME parenthesization in
Spark and the DuckDB twin, so the model tables are bit-identical and
the differential oracle verifies the whole LM exactly through the
decimal-accumulated ``avg_p``. ``avg_logp`` is engine-NATIVE output:
``ln`` of an arbitrary double is libm-dependent in the last ulp, and
with millions of distinct trigram probabilities the per-evaluation
~1e-6 rounding-boundary risk integrates to near-certainty (the sf0.1
differential sweep caught exactly one flipped 6 dp rounding across
~19M evaluations) — so log-probs round ``ln`` to 6 dp before the
decimal accumulation for cross-run stability WITHIN an engine, but the
oracle gates ``avg_p`` only. (DSIR gets away with in-gate ``ln``
because its arguments are ≤4096 bucket ratios, not per-type values.)

Out-of-vocabulary scoring (model trained on corpus A, scoring corpus
B — the actual CCNet deployment: train on Wikipedia, score the crawl)
falls back a level at a time with fixed stupid-backoff penalties
(Brants et al. 2007): unseen trigram → ``0.4·P2``, unseen bigram →
``0.16·P1``, unseen word → ``0.064/N1+(··)``. Self-scoring never takes
these branches (every scored trigram is in the model), which is what
lets the oracle row gate the KN path itself.

Scale shape (100 TB corpus):

- the text is exploded to trigrams ONCE into a per-(doc, trigram) count
  frame, map-side combined before its only corpus-sized shuffle; that
  frame is persisted and feeds BOTH model estimation and scoring (the
  charlm pattern);
- all model tables are trigram-TYPE grain (≤ distinct trigrams, zipf-
  truncated far below token count) and are built by re-aggregating the
  type table, never rescanning text;
- the scoring join is hash-partitioned on the trigram key — uniform by
  construction (md5-free: the key IS the trigram, and no single
  trigram dominates a deduplicated type table's join because the
  doc-side is count-compressed per doc);
- the only scalar (``N1+(··)``) is one bounded count action embedded as
  a literal — no data collect, no driver loop.

Reference parity: the reference has no analogue (its quality surface is
``src/quality/expectations.py`` row checks); cited for the survey as a
§2.12 training-data extension.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.operators.text import norm_text, norm_text_sql

#: Fixed absolute discount (Chen & Goodman 1999's D≈0.75 for trigrams).
KN_DISCOUNT = 0.75

#: Stupid-backoff penalty per skipped level (Brants et al. 2007).
KN_BACKOFF = 0.4

#: Sentence padding: two BOS so every real token heads one trigram.
_BOS = "<s>"
_EOS = "</s>"


class KNModel(NamedTuple):
    """Trained model state: three probability tables (persisted,
    trigram/bigram/unigram type grain) + the bigram-type total behind
    the unigram denominator. Reusable across scoring runs — train once
    on the reference corpus, score any number of crawl slices."""

    tri: DataFrame  # (u, v, w, p3)  interpolated KN trigram prob, 9 dp
    big: DataFrame  # (v, w, p2)     interpolated KN bigram prob, 9 dp
    uni: DataFrame  # (w, p1)        continuation unigram prob, 9 dp
    n_bigram_types: int  # N1+(··)


def doc_trigrams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-(document, trigram) counts over padded word tokens — the one
    corpus-sized frame both training and scoring consume. Tokens are
    normalized words (lowercase, whitespace-collapsed, empties dropped)
    padded with two BOS and one EOS, so even an empty document emits
    one ``(<s>, <s>, </s>)`` trigram and every document scores. NULL
    text is scored as empty — and must be handled identically on both
    sides of the differential gate (Spark's ``concat`` propagates a
    NULL array, DuckDB's ``list_concat`` ignores it; the coalesce
    removes the divergence)."""
    toks = df.select(
        id_col,
        norm_text(F.coalesce(F.col(text_col), F.lit(""))).alias("_n"),
    ).select(
        id_col,
        F.expr(
            f"concat(array('{_BOS}', '{_BOS}'), "
            f"filter(split(_n, ' '), x -> x <> ''), array('{_EOS}'))"
        ).alias("_p"),
    )
    tri = toks.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(_p) - 2), i -> struct("
                "element_at(_p, i) AS u, element_at(_p, i + 1) AS v, "
                "element_at(_p, i + 2) AS w))"
            )
        ).alias("_g"),
    ).select(id_col, "_g.u", "_g.v", "_g.w")
    return tri.groupBy(id_col, "u", "v", "w").agg(
        F.count(F.lit(1)).alias("c")
    )


def kn_lm_fit(
    df: DataFrame,
    text_col: str = "text",
    discount: float = KN_DISCOUNT,
    doc_tri: DataFrame | None = None,
) -> KNModel:
    """Estimate the interpolated KN trigram model from a corpus.
    ``doc_tri=`` accepts a prebuilt (persisted) :func:`doc_trigrams`
    frame so self-scoring jobs explode the text exactly once."""
    if doc_tri is None:
        doc_tri = doc_trigrams(
            df.select(F.lit(0).alias("_id"), text_col), "_id", text_col
        )
    # trigram TYPE counts — everything below re-aggregates this frame
    t3 = doc_tri.groupBy("u", "v", "w").agg(F.sum("c").alias("c3"))
    return kn_model_from_counts(t3, discount=discount)


def kn_model_from_counts(
    t3: DataFrame, discount: float = KN_DISCOUNT
) -> KNModel:
    """Derive the full interpolated KN model from a trigram-type count
    frame ``(u, v, w, c3)`` — the shared tail of :func:`kn_lm_fit` and
    the streaming-count-store path (``streaming/ingest.py``
    ``kn_lm_fit_from_store``): n-gram counts are ADDITIVE corpus state,
    so any partitioning of the corpus that sums to the same type counts
    yields the bit-identical model."""
    from pyspark import StorageLevel

    t3 = t3.persist(StorageLevel.MEMORY_AND_DISK)
    uv = t3.groupBy("u", "v").agg(
        F.sum("c3").alias("cuv"),  # c(uv·)
        F.count(F.lit(1)).alias("nuv"),  # N1+(uv·)
    )
    cvw = (
        t3.groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("n1_vw"))  # N1+(·vw)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vv = cvw.groupBy("v").agg(
        F.sum("n1_vw").alias("cv_tot"),  # N1+(·v·)
        F.count(F.lit(1)).alias("cv_types"),  # N1+(v·)
    )
    n_types = cvw.count()  # N1+(··): bounded scalar, embedded as literal
    d = float(discount)
    nt = float(n_types)
    uni = cvw.groupBy("w").agg(F.count(F.lit(1)).alias("cw")).select(
        "w",
        F.round(F.col("cw").cast("double") / F.lit(nt), 9).alias("p1"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    big = (
        cvw.join(vv, "v")
        .join(uni, "w")
        .select(
            "v",
            "w",
            F.round(
                (
                    F.greatest(
                        F.col("n1_vw").cast("double") - F.lit(d), F.lit(0.0)
                    )
                    / F.col("cv_tot").cast("double")
                )
                + (
                    (F.lit(d) * F.col("cv_types").cast("double"))
                    / F.col("cv_tot").cast("double")
                )
                * F.col("p1"),
                9,
            ).alias("p2"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tri = (
        t3.join(uv, ["u", "v"])
        .join(big, ["v", "w"])
        .select(
            "u",
            "v",
            "w",
            F.round(
                (
                    F.greatest(
                        F.col("c3").cast("double") - F.lit(d), F.lit(0.0)
                    )
                    / F.col("cuv").cast("double")
                )
                + (
                    (F.lit(d) * F.col("nuv").cast("double"))
                    / F.col("cuv").cast("double")
                )
                * F.col("p2"),
                9,
            ).alias("p3"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return KNModel(tri=tri, big=big, uni=uni, n_bigram_types=n_types)


def kn_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: KNModel | None = None,
    discount: float = KN_DISCOUNT,
) -> DataFrame:
    """Per-document KN trigram log-probability. With ``model=None`` the
    model is trained on ``df`` itself (the oracle-gated path — no OOV
    branch can fire); pass a :class:`KNModel` trained elsewhere for the
    cross-corpus CCNet deployment, where unseen n-grams take the
    stupid-backoff cascade.

    Output: ``(id_col, n_trigrams, avg_p, avg_logp)`` — token-weighted
    mean trigram probability (6 dp; higher = more model-typical) and
    mean log-prob (6 dp; ``exp(-avg_logp)`` is the perplexity — kept in
    log space because ``exp`` is not bit-portable). Both accumulate in
    DECIMAL over pre-rounded per-trigram values, so partial-aggregation
    order cannot diverge within an engine; ``avg_p`` is additionally
    bit-portable ACROSS engines (pure IEEE arithmetic) and is what the
    differential oracle gates, while ``avg_logp`` inherits libm's
    last-ulp ``ln`` variation (see the module docstring)."""
    from pyspark import StorageLevel

    dt = doc_trigrams(df, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    self_trained = model is None
    if self_trained:
        model = kn_lm_fit(df, text_col, discount, doc_tri=dt)
    b = float(KN_BACKOFF)
    floor_p = F.round(
        F.lit(b * b * b) / F.lit(float(model.n_bigram_types)), 9
    )
    if self_trained:
        # every scored trigram is in the model by construction — the
        # backoff levels can never fire, so skip their joins entirely
        # (also exactly the shape of the DuckDB twin, which scores with
        # the trigram table alone)
        joined = dt.join(model.tri, ["u", "v", "w"])
        p = F.col("p3")
    else:
        joined = (
            dt.join(model.tri, ["u", "v", "w"], "left")
            .join(model.big, ["v", "w"], "left")
            .join(model.uni, ["w"], "left")
        )
        p = F.coalesce(
            F.col("p3"),
            F.round(F.lit(b) * F.col("p2"), 9),
            F.round(F.lit(b * b) * F.col("p1"), 9),
            floor_p,
        )
    scored = (
        joined
        .select(
            id_col,
            "c",
            p.cast("decimal(12,9)").alias("_p"),
            F.round(F.log(p), 6).cast("decimal(16,6)").alias("_lp"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_trigrams"),
            F.sum(F.col("c") * F.col("_p")).alias("_sp"),
            F.sum(F.col("c") * F.col("_lp")).alias("_slp"),
        )
    )
    return scored.select(
        id_col,
        "n_trigrams",
        F.round(
            F.col("_sp").cast("double") / F.col("n_trigrams").cast("double"),
            6,
        ).alias("avg_p"),
        F.round(
            F.col("_slp").cast("double") / F.col("n_trigrams").cast("double"),
            6,
        ).alias("avg_logp"),
    )


def kn_lm_scores_sql(
    docs_sql: str, id_sql: str = "doc_id", discount: float = KN_DISCOUNT
) -> str:
    """DuckDB twin of the self-trained :func:`kn_lm_scores` path over
    ``docs_sql`` (a relation with ``doc_id`` and ``text``): identical
    counts, identical 9-dp probability expressions (same
    parenthesization — IEEE ops are correctly rounded in both engines,
    so matching trees give matching bits), identical 6-dp-rounded
    ``ln`` before the decimal accumulation."""
    norm_c = norm_text_sql("coalesce(text, '')")
    d = float(discount)
    return f"""
    WITH toks AS (
      SELECT {id_sql},
             list_concat(list_concat(['{_BOS}', '{_BOS}'],
               list_filter(string_split({norm_c}, ' '), x -> x <> '')),
               ['{_EOS}']) AS p
      FROM {docs_sql}
    ),
    pos AS (
      SELECT {id_sql}, p, unnest(range(1, len(p) - 1)) AS i FROM toks
    ),
    tg AS (
      SELECT {id_sql}, p[i] AS u, p[i + 1] AS v, p[i + 2] AS w FROM pos
    ),
    doc_tri AS (
      SELECT {id_sql}, u, v, w, count(*) AS c
      FROM tg GROUP BY {id_sql}, u, v, w
    ),
    t3 AS (
      SELECT u, v, w, CAST(sum(c) AS BIGINT) AS c3
      FROM doc_tri GROUP BY u, v, w
    ),
    uv AS (
      SELECT u, v, CAST(sum(c3) AS BIGINT) AS cuv,
             count(*) AS nuv
      FROM t3 GROUP BY u, v
    ),
    cvw AS (
      SELECT v, w, count(*) AS n1_vw FROM t3 GROUP BY v, w
    ),
    vv AS (
      SELECT v, CAST(sum(n1_vw) AS BIGINT) AS cv_tot,
             count(*) AS cv_types
      FROM cvw GROUP BY v
    ),
    nt AS (SELECT count(*)::DOUBLE AS ntypes FROM cvw),
    uni AS (
      SELECT w, round(count(*)::DOUBLE / ntypes, 9) AS p1
      FROM cvw CROSS JOIN nt GROUP BY w, ntypes
    ),
    big AS (
      SELECT cvw.v, cvw.w,
             round(
               (greatest(n1_vw::DOUBLE - {d!r}, 0.0) / cv_tot::DOUBLE)
               + (({d!r} * cv_types::DOUBLE) / cv_tot::DOUBLE) * p1,
               9) AS p2
      FROM cvw JOIN vv ON cvw.v = vv.v JOIN uni ON cvw.w = uni.w
    ),
    tri AS (
      SELECT t3.u, t3.v, t3.w,
             round(
               (greatest(c3::DOUBLE - {d!r}, 0.0) / cuv::DOUBLE)
               + (({d!r} * nuv::DOUBLE) / cuv::DOUBLE) * p2,
               9) AS p3
      FROM t3 JOIN uv ON t3.u = uv.u AND t3.v = uv.v
              JOIN big ON t3.v = big.v AND t3.w = big.w
    ),
    scored AS (
      SELECT {id_sql}, CAST(sum(c) AS BIGINT) AS n_trigrams,
             sum(c * CAST(p3 AS DECIMAL(12,9))) AS sp,
             sum(c * CAST(round(ln(p3), 6) AS DECIMAL(16,6))) AS slp
      FROM doc_tri JOIN tri USING (u, v, w)
      GROUP BY {id_sql}
    )
    SELECT {id_sql}, n_trigrams,
           round(CAST(sp AS DOUBLE) / n_trigrams::DOUBLE, 6) AS avg_p,
           round(CAST(slp AS DOUBLE) / n_trigrams::DOUBLE, 6) AS avg_logp
    FROM scored
    """


def save_kn_model(model: KNModel, path: str) -> None:
    """Persist a fitted model as three parquet tables + a meta file —
    the serve-side artifact for fit-once/score-many deployments (the
    count store in ``streaming/ingest.py`` is the MAINTAIN-side
    artifact: keep that when the corpus ingests continuously, keep
    this when a frozen reference model scores many crawl slices).
    Probabilities are 9 dp doubles, so the round-trip is bit-exact."""
    import json
    import os

    model.tri.write.mode("overwrite").parquet(os.path.join(path, "tri"))
    model.big.write.mode("overwrite").parquet(os.path.join(path, "big"))
    model.uni.write.mode("overwrite").parquet(os.path.join(path, "uni"))
    meta = {"n_bigram_types": model.n_bigram_types, "format": 1}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_kn_model(spark, path: str) -> KNModel:
    """Load a :func:`save_kn_model` artifact. The tables come back
    persisted (a loaded model exists to be scored against repeatedly)."""
    import json
    import os

    from pyspark import StorageLevel

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format") != 1:
        raise ValueError(f"unsupported kn model format: {meta.get('format')!r}")
    ld = lambda name: (  # noqa: E731
        spark.read.parquet(os.path.join(path, name)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    return KNModel(
        tri=ld("tri"),
        big=ld("big"),
        uni=ld("uni"),
        n_bigram_types=int(meta["n_bigram_types"]),
    )

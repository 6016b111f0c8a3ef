"""Sampling-operator query corpus.

Registered into the full QUERIES registry so ``scripts/check_oracle.py``
hash-verifies each granular query against DuckDB; the driver gate carries
their values through the merged ``sampling_suite`` entry
(``corpus_merged.COVERED_BY``). ``LOCAL_ONLY`` is kept (empty) for the
contract test's three-way membership check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.functions.core import md5_long_sql
from streaming_etl_pipeline_spark.operators import sampling as SP
from streaming_etl_pipeline_spark.plans.corpus import register
from streaming_etl_pipeline_spark.sources import read_table

#: Queries gated locally but not exported to the (full) driver set.
#: Empty since round 3: the sampling trio is driver-gated via the merged
#: ``sampling_suite`` entry.
LOCAL_ONLY: set[str] = set()


@register(
    "sample_docs_hash",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {SP.hash_sample_sql("doc_id", 0.1, seed="sample")}
    """,
)
def q_sample_docs_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli-by-key sample of the documents table —
    partitioning-independent, superset-stable across fractions."""
    docs = read_table(spark, sf_dir, "documents")
    return SP.hash_sample(docs, 0.1, key_col="doc_id").select(
        "doc_id", "lang", "source"
    )


@register(
    "reservoir_events_per_type",
    f"""
    SELECT event_id, event_type, user_id FROM (
      SELECT event_id, event_type, user_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY {md5_long_sql("event_id", "reservoir")}, event_id) AS rn
      FROM events)
    WHERE rn <= 50
    """,
)
def q_reservoir_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 50 events per type by keyed-hash order — the deterministic
    per-group reservoir sample."""
    events = read_table(spark, sf_dir, "events")
    return SP.reservoir_per_group(
        events, keys=["event_type"], n=50, key_col="event_id"
    ).select("event_id", "event_type", "user_id")


@register(
    "char_budget_by_lang",
    f"""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             sum(n_chars) OVER (
               PARTITION BY lang
               ORDER BY {md5_long_sql("doc_id", "budget")}, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents)
    WHERE cum <= 20000
    """,
)
def q_char_budget_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-language character budget (≤ 20k chars/lang, docs
    visited in keyed-hash order) — the mixture-spec capping shape."""
    docs = read_table(spark, sf_dir, "documents")
    return SP.token_budget_sample(
        docs, keys=["lang"], token_col="n_chars", budget=20000, key_col="doc_id"
    ).select("doc_id", "lang", "n_chars")


_MIX_WEIGHTS = {"src1": 0.5, "src2": 0.3, "src3": 0.2}
_MIX_TOTAL = 120


@register(
    "mixture_by_source",
    f"""
    SELECT doc_id, source
    FROM ({SP.mixture_sample_sql("documents", "doc_id", "source",
                                 _MIX_WEIGHTS, _MIX_TOTAL)})
    """,
)
def q_mixture_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture targeting over sources (50/30/20 across
    src1-3, 120-row target): src1/src2 exceed their group size and are
    taken whole (the explicit-shortfall branch); src3's 0.96 fraction
    exercises the Bernoulli branch; every other source drops out."""
    docs = read_table(spark, sf_dir, "documents")
    return SP.mixture_sample(
        docs, "doc_id", "source", _MIX_WEIGHTS, _MIX_TOTAL
    ).select("doc_id", "source")


@register(
    "weighted_quality_sample",
    f"""
    SELECT doc_id, lang, n_chars,
           round(least(n_chars / 1500.0, 1.0), 6) AS weight
    FROM documents
    WHERE {SP.weighted_sample_sql("doc_id", "least(n_chars / 1500.0, 1.0)")}
    """,
)
def q_weighted_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: each document's keep
    probability is its own quality proxy (here length-based,
    min(n_chars/1500, 1)), so long/high-quality docs are kept at a
    higher rate — the per-row weighted selection step of an LLM data
    mix, as a 0-shuffle filter that is a pure function of (doc_id,
    seed, weight)."""
    docs = read_table(spark, sf_dir, "documents")
    w = F.least(F.col("n_chars") / 1500.0, F.lit(1.0))
    return SP.weighted_sample(docs, w, key_col="doc_id").select(
        "doc_id", "lang", "n_chars", F.round(w, 6).alias("weight")
    )


_TEMP_ALPHA = 0.5
_TEMP_TOTAL = 250


@register(
    "temperature_by_lang",
    f"""
    SELECT doc_id, lang
    FROM ({SP.temperature_sample_sql("documents", "doc_id", "lang",
                                     _TEMP_ALPHA, _TEMP_TOTAL)})
    """,
)
def q_temperature_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resampling (α=0.5, 250-row target) over
    the skewed language distribution (en dominates ~2×): √-share
    weights up-weight tail languages relative to natural sampling —
    the UniMax-style knob, data-derived instead of a hand weight table.
    Weights are sqrt-products (portable), normalizer DECIMAL-accumulated;
    every sampled (doc_id, lang) row value-hashed."""
    docs = read_table(spark, sf_dir, "documents")
    return SP.temperature_sample(
        docs, "doc_id", "lang", _TEMP_ALPHA, _TEMP_TOTAL
    ).select("doc_id", "lang")

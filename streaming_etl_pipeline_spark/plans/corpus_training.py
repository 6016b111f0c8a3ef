"""Training-set assembly query corpus: context-window chunking, split
assignment, PII redaction, benchmark decontamination
(operators/curation.py) — hash-gated with the same oracle discipline as
corpus_docs.py.

The synthetic corpus contains no PII and no benchmark overlap, so the
redaction and decontamination queries *inject* deterministic probes
(the corpus_docs twin-injection pattern) — both engines apply the same
injection SQL/expressions, so the operators are exercised on real
positive cases, not vacuously green on zeros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.operators import curation as CU
from streaming_etl_pipeline_spark.operators import fuzzy as FZ
from streaming_etl_pipeline_spark.operators import text as TX
from streaming_etl_pipeline_spark.quality import drift as DR
from streaming_etl_pipeline_spark.plans.corpus import register
from streaming_etl_pipeline_spark.sources import read_table, spread

# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 32
_CHUNK_OVERLAP = 8


@register(
    "context_chunk_stats",
    CU.context_chunks_sql(
        "documents", max_tokens=_CHUNK_TOKENS, overlap=_CHUNK_OVERLAP
    ),
)
def q_context_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context windows (32 tokens, 8 overlap) over every
    document — one row per chunk with its token count and content hash."""
    docs = read_table(spark, sf_dir, "documents")
    return CU.context_chunks(
        docs, max_tokens=_CHUNK_TOKENS, overlap=_CHUNK_OVERLAP
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------


@register(
    "split_assignment",
    f"""
    SELECT split, lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT {CU.assign_splits_sql("doc_id")} AS split, lang, n_chars
          FROM documents)
    GROUP BY 1, 2
    """,
)
def q_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic 90/5/5 split, profiled per (split, lang) — the
    aggregate pins every document's routing (a changed assignment moves a
    doc between groups and breaks both counts and char sums)."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        CU.assign_splits(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction (probe-injected)
# ---------------------------------------------------------------------------

_PII_PROBE = (
    " reach me at jane.doe@example.com or 555-123-4567"
    " ssn 123-45-6789 host 10.0.0.1"
)
_PII_EXTRA = " second.contact@example.org"

_PII_DOCS_SQL = f"""
  SELECT doc_id,
         text
           || CASE WHEN doc_id % 7 = 0 THEN '{_PII_PROBE}' ELSE '' END
           || CASE WHEN doc_id % 21 = 0 THEN '{_PII_EXTRA}' ELSE '' END AS text
  FROM documents
"""


def _pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, _PII_PROBE).otherwise(""),
            F.when(F.col("doc_id") % 21 == 0, _PII_EXTRA).otherwise(""),
        ).alias("text"),
    )


@register(
    "pii_redaction",
    f"WITH docs AS ({_PII_DOCS_SQL})\n{CU.redact_pii_sql('docs')}",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub over the probe-injected corpus: every 7th
    document carries an email + phone + SSN + IPv4 probe (every 21st a
    second email), so match counts and the redacted-text hash are
    exercised on true positives in both engines."""
    return CU.redact_pii(_pii_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Benchmark decontamination (probe-injected)
# ---------------------------------------------------------------------------

_CONTAM_PROBE = (
    " the quick brown fox jumps over the lazy dog benchmark contamination probe"
)
_DECONTAM_K = 5

#: Corpus side: every doc NOT in the benchmark partition; every 9th doc
#: gets the probe phrase appended (the contamination to catch).
_CONTAM_CORPUS_SQL = f"""
  SELECT doc_id,
         text || CASE WHEN doc_id % 9 = 0 THEN '{_CONTAM_PROBE}' ELSE '' END AS text
  FROM documents WHERE doc_id % 13 <> 0
"""

#: Benchmark side: the held-out partition plus one synthetic eval doc
#: containing the probe phrase.
_CONTAM_BENCH_SQL = f"""
  SELECT text FROM documents WHERE doc_id % 13 = 0
  UNION ALL
  SELECT '{_CONTAM_PROBE.strip()}' AS text
"""


@register(
    "decontamination",
    f"""
    WITH corpus AS ({_CONTAM_CORPUS_SQL}),
         benchmark AS ({_CONTAM_BENCH_SQL})
    {CU.contamination_stats_sql("corpus", "benchmark", k=_DECONTAM_K)}
    """,
)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word 5-gram overlap of every corpus document against the benchmark
    partition (doc_id % 13 = 0 plus a synthetic eval doc). Every 9th
    corpus doc carries an injected probe phrase shared with the synthetic
    eval doc, so the contamination path has true positives; rate ≥ 10%
    flags the document."""
    docs = spread(
        read_table(spark, sf_dir, "documents").select("doc_id", "text"), by="doc_id"
    )
    corpus = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 9 == 0, _CONTAM_PROBE).otherwise(""),
        ).alias("text"),
    )
    bench = (
        docs.filter(F.col("doc_id") % 13 == 0)
        .select("text")
        .unionByName(
            spark.range(1).select(F.lit(_CONTAM_PROBE.strip()).alias("text"))
        )
    )
    return CU.contamination_stats(corpus, bench, k=_DECONTAM_K)


# ---------------------------------------------------------------------------
# Fuzzy entity resolution (typo-injected customer names)
# ---------------------------------------------------------------------------

#: Name corpus: every customer plus, for every 10th, a typo twin with the
#: 5th character replaced ('Custxmer#...') — distance exactly 1.
_FUZZY_NAMES_SQL = """
  SELECT c_custkey AS id, c_name AS name FROM customer
  UNION ALL
  SELECT c_custkey + 1000000 AS id,
         substr(c_name, 1, 4) || 'x' || substr(c_name, 6, 1000000) AS name
  FROM customer WHERE c_custkey % 10 = 0
"""


def _fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    twins = cust.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 1000000).alias("id"),
        F.concat(
            F.substring("c_name", 1, 4),
            F.lit("x"),
            F.expr("substring(c_name, 6, 1000000)"),
        ).alias("name"),
    )
    return base.unionByName(twins)


@register(
    "fuzzy_name_pairs",
    FZ.edit1_pairs_sql(
        "names", "id", "name", extra_ctes=f"names AS ({_FUZZY_NAMES_SQL}), "
    ),
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over the typo-injected customer names: ALL pairs
    within Levenshtein distance 1, found by exact-recall symmetric-delete
    blocking (operators/fuzzy.py). Catches both the injected typo twins
    and every naturally-adjacent name (IDs differing in one digit), so
    the pair set is large enough to pin recall, not just precision."""
    return FZ.edit1_pairs(_fuzzy_names(spark, sf_dir), "id", "name")


# ---------------------------------------------------------------------------
# Distribution drift (PSI) between event snapshots
# ---------------------------------------------------------------------------

_PSI_EDGES = [5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0]
_PSI_REF_SQL = "SELECT value FROM events WHERE event_id % 2 = 0"
_PSI_CUR_SQL = "SELECT value FROM events WHERE event_id % 2 = 1"
#: Injected drift: the odd half scaled 1.5× — mass moves up one bin.
_PSI_SHIFT_SQL = "SELECT value * 1.5 AS value FROM events WHERE event_id % 2 = 1"


@register(
    "drift_psi",
    f"""
    SELECT 'same' AS snapshot, psi, n_ref, n_cur, drifted
    FROM ({DR.psi_sql(_PSI_REF_SQL, _PSI_CUR_SQL, "value", _PSI_EDGES)})
    UNION ALL
    SELECT 'scaled_1_5x' AS snapshot, psi, n_ref, n_cur, drifted
    FROM ({DR.psi_sql(_PSI_REF_SQL, _PSI_SHIFT_SQL, "value", _PSI_EDGES)})
    """,
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between event-value snapshots: the
    even/odd halves of the same table are statistically identical (PSI ≈
    0, not drifted); scaling the current half by 1.5× injects real drift
    the metric must flag (quality/drift.py)."""
    events = read_table(spark, sf_dir, "events")
    ref = events.filter(F.col("event_id") % 2 == 0).select("value")
    cur = events.filter(F.col("event_id") % 2 == 1).select("value")
    shifted = cur.select((F.col("value") * 1.5).alias("value"))
    return DR.psi_pairs(
        ref, {"same": cur, "scaled_1_5x": shifted}, "value", _PSI_EDGES
    ).select("snapshot", "psi", "n_ref", "n_cur", "drifted")


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk into 2048-token blocks, per source)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048

_PACK_DOCS_SQL = (
    f"(SELECT doc_id, source, len({TX.bpe_tokens_sql('text')}) AS n_tokens "
    "FROM documents)"
)


@register(
    "sequence_packing",
    CU.pack_sequences_sql(
        _PACK_DOCS_SQL, budget=_PACK_BUDGET
    ),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document packing assignment (operators/curation.py
    ``pack_sequences``): BPE-ish token counts, md5-shuffled concat order
    within each source, 2048-token training blocks. ``crosses`` marks
    documents split across a block boundary — the cost of packing
    without document attention masking."""
    from streaming_etl_pipeline_spark.operators.text import bpe_tokens

    docs = spread(
        read_table(spark, sf_dir, "documents").select("doc_id", "source", "text"), by="doc_id"
    ).select(
        "doc_id", "source", F.size(bpe_tokens("text")).alias("n_tokens")
    )
    return CU.pack_sequences(docs, budget=_PACK_BUDGET)


#: Shared SAX discretization chain (events → complete 8-windows →
#: z-normalize → 4-segment PAA → 4-letter SAX word), used by both the
#: motif (similar-pair) and discord (rarity) oracles.
_TS_SAX_PREFIX = """
    WITH rows0 AS (
      SELECT user_id AS k, CAST(value AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) - 1 AS rn
      FROM events),
    rows1 AS (SELECT k, v, rn % 8 AS pos, rn // 8 AS win FROM rows0),
    complete AS (SELECT k, win FROM rows1 GROUP BY k, win
                 HAVING count(*) = 8),
    wins AS (SELECT r.* FROM rows1 r JOIN complete USING (k, win)),
    stats AS (
      SELECT k, win,
        round(CAST(sum(CAST(v AS DECIMAL(27,12))) AS DOUBLE) / count(*), 9)
          AS m,
        round(sqrt(greatest(
            CAST(sum(CAST(v*v AS DECIMAL(38,12))) AS DOUBLE) / count(*)
            - (CAST(sum(CAST(v AS DECIMAL(27,12))) AS DOUBLE) / count(*))
              * (CAST(sum(CAST(v AS DECIMAL(27,12))) AS DOUBLE) / count(*)),
            0.0)), 9) AS s
      FROM wins GROUP BY k, win),
    z AS (SELECT w.k, w.win, w.pos, round((w.v - st.m) / st.s, 6) AS z
          FROM wins w JOIN stats st USING (k, win) WHERE st.s > 0),
    paa AS (SELECT k, win, CAST(pos // 2 AS INT) AS seg,
                   round(CAST(sum(CAST(z AS DECIMAL(18,6))) AS DOUBLE) / 2, 6)
                     AS paa
            FROM z GROUP BY k, win, pos // 2),
    words AS (SELECT k, win,
                string_agg(CASE WHEN paa < -0.6745 THEN 'a'
                                WHEN paa < 0.0 THEN 'b'
                                WHEN paa < 0.6745 THEN 'c'
                                ELSE 'd' END, '' ORDER BY seg) AS word
              FROM paa GROUP BY k, win)"""

_TS_MOTIFS_SQL = _TS_SAX_PREFIX + """,
    rare AS (SELECT word FROM words GROUP BY word HAVING count(*) <= 200),
    cand AS (SELECT a.k AS k_a, a.win AS win_a, b.k AS k_b, b.win AS win_b,
                    a.word AS word
             FROM (SELECT w.* FROM words w JOIN rare USING (word)) a
             JOIN (SELECT w.* FROM words w JOIN rare USING (word)) b
               ON a.word = b.word
              AND (a.k < b.k OR (a.k = b.k AND a.win < b.win))),
    dist AS (SELECT c.k_a, c.win_a, c.k_b, c.win_b, c.word,
               round(sqrt(CAST(sum(CAST((za.z - zb.z) * (za.z - zb.z)
                                        AS DECIMAL(38,12))) AS DOUBLE)), 6)
                 AS distance
             FROM cand c
             JOIN z za ON za.k = c.k_a AND za.win = c.win_a
             JOIN z zb ON zb.k = c.k_b AND zb.win = c.win_b
                      AND zb.pos = za.pos
             GROUP BY 1, 2, 3, 4, 5)
    SELECT * FROM dist WHERE distance <= 1.5
    ORDER BY distance, k_a, win_a, k_b, win_b LIMIT 50
"""


@register("ts_motifs", _TS_MOTIFS_SQL)
def q_ts_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (operators/timeseries.py): SAX-
    indexed z-normalized window matching over per-user event values —
    windows sharing a discretized SAX word are the only candidates,
    verified with the exact z-normalized Euclidean distance (decimal
    accumulation, one IEEE sqrt). The 50 closest cross-window pairs
    under a strict total order."""
    from streaming_etl_pipeline_spark.operators.timeseries import (
        similar_windows,
    )

    events = read_table(spark, sf_dir, "events")
    return similar_windows(
        events, key_col="user_id", ts_col="ts", value_col="value",
        window_len=8, paa_segments=4, max_distance=1.5,
        max_word_df=200, top_k=50,
    )


# block-grain twin of the pack assignment: the actual bytes a training
# loader would read, pinned per block. Tie-break mirrors Spark's
# array_sort on struct(start_offset, text): offset, then text.
_PACKED_BLOCKS_SQL = f"""
    WITH pk AS ({CU.pack_sequences_sql(_PACK_DOCS_SQL, budget=_PACK_BUDGET)})
    SELECT pk.source, pk.block_first AS block,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pk.n_tok) AS BIGINT) AS block_tokens,
           md5(string_agg(d.text, '<|endofdoc|>'
               ORDER BY pk.start_offset, d.text)) AS block_md5
    FROM pk JOIN documents d USING (doc_id)
    GROUP BY pk.source, pk.block_first
"""


@register("packed_blocks", _PACKED_BLOCKS_SQL)
def q_packed_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-block materialization (operators/curation.py
    ``materialize_blocks``): documents concatenated in packing order with
    the separator token, one row per (source, block). The md5 of every
    block's full text is inside the value hash — a single byte out of
    place in the assembled training sequence fails the gate."""
    from streaming_etl_pipeline_spark.operators.text import bpe_tokens

    docs = spread(
        read_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        ), by="doc_id"
    )
    toks = docs.select(
        "doc_id", "source", F.size(bpe_tokens("text")).alias("n_tokens")
    )
    assignment = CU.pack_sequences(toks, budget=_PACK_BUDGET)
    blocks = CU.materialize_blocks(docs, assignment)
    return blocks.select(
        "source",
        "block",
        "n_docs",
        "block_tokens",
        F.md5("block_text").alias("block_md5"),
    )


_TS_DISCORDS_SQL = _TS_SAX_PREFIX + """,
    dfreq AS (SELECT word, count(*) AS word_df FROM words GROUP BY word)
    SELECT k, win, word, word_df
    FROM words JOIN dfreq USING (word)
    ORDER BY word_df ASC, word ASC, k ASC, win ASC
    LIMIT 20
"""


@register("ts_discords", _TS_DISCORDS_SQL)
def q_ts_discords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discord screening (operators/timeseries.py ``ts_discords``,
    HOT-SAX outer loop): the 20 windows with the rarest SAX words —
    the anomalous-subsequence candidates whose exact nearest-neighbor
    confirmation runs downstream on survivors only. Shares the SAX
    discretization oracle chain with ``ts_motifs``; the rarity ranking
    and the strict (df, word, k, win) cut are pinned exactly."""
    from streaming_etl_pipeline_spark.operators.timeseries import ts_discords

    events = read_table(spark, sf_dir, "events")
    return ts_discords(
        events, key_col="user_id", ts_col="ts", value_col="value",
        window_len=8, paa_segments=4, top_k=20,
    )

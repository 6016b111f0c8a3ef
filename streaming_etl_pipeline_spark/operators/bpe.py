"""Distributed BPE tokenizer training (byte-pair encoding merge learning).

The reference has no tokenizer training; a training-data engine needs one
(SURVEY.md §7 step 7 — token counting ships in ``operators/text.py``; this
learns the merge table itself). Classic BPE (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm): start from characters, repeatedly merge the most frequent
adjacent symbol pair.

Scale design — why this survives 100 TB of text:

- Training runs over the WORD-TYPE table (distinct word + count), not the
  corpus: one corpus-sized aggregation up front, then every iteration
  touches only the vocabulary (~millions of rows at web scale, regardless
  of corpus size).
- Each iteration is: adjacent-pair explode (``zip_with`` on the shifted
  symbol array, 0 shuffles) → pair-count aggregation (map-side combined,
  one small shuffle) → a ONE-ROW collect (the argmax pair) → a pure
  projection applying the merge. The driver holds merge decisions only —
  k rows after k iterations, never data.
- The merge application is an ``F.aggregate`` fold (left-to-right greedy,
  pending-symbol carry) — whole-stage codegen, no Python in the loop.
- Like the k-means trainer (``operators/clustering.py``) the per-round
  lineage is cut with ``localCheckpoint`` so round r doesn't replay
  rounds 1..r-1.
- Ties break deterministically (count DESC, pair ASC) so retraining
  reproduces the same merge table bit-for-bit.

Encoding new text with a learned table (``bpe_encode``) replays merges in
order — fine for bounded merge counts; production encoders with 30k+
merges should use greedy longest-match against the final vocab instead
(same result for prefix-closed vocabularies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.functions.core import tokenize
from streaming_etl_pipeline_spark.operators.text import norm_text

#: Separator between the two halves of a pair key (never appears in
#: symbols because norm_text collapses whitespace).
_SEP = " "


def word_types(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, n) word-type table: the one corpus-sized pass."""
    return (
        df.select(F.explode(tokenize(norm_text(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _chars(col: Column) -> Column:
    # split on the empty pattern yields one element per character plus a
    # trailing "" — filter it out
    return F.filter(F.split(col, ""), lambda s: s != "")


def _adjacent_pairs(sym: Column) -> Column:
    shifted = F.slice(sym, 2, F.size(sym))
    return F.filter(
        F.zip_with(sym, shifted, lambda a, b: F.concat(a, F.lit(_SEP), b)),
        lambda p: p.isNotNull(),
    )


def _apply_merge(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right replacement of adjacent (a, b) with a+b.

    Fold with a pending-symbol carry: pending==a and next==b emit the
    merged symbol (consuming both, so overlapping occurrences like
    'aaa' under (a,a) merge non-overlapping, exactly like reference
    BPE); otherwise the pending symbol is flushed and the cursor moves.
    """
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        merged = acc.pend.isNotNull() & (acc.pend == a) & (x == b)
        return F.when(
            merged,
            F.struct(
                F.concat(acc.out, F.array(F.lit(a + b))).alias("out"),
                F.lit(None).cast("string").alias("pend"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc.pend.isNotNull(), F.concat(acc.out, F.array(acc.pend))
                ).otherwise(acc.out).alias("out"),
                x.alias("pend"),
            )
        )

    def finish(acc):
        return F.when(
            acc.pend.isNotNull(), F.concat(acc.out, F.array(acc.pend))
        ).otherwise(acc.out)

    return F.aggregate(sym, acc0, step, finish)


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges; returns them in learned order.

    Stops early when no adjacent pair reaches ``min_pair_count``.
    """
    words = word_types(df, text_col).select(
        _chars(F.col("word")).alias("sym"), "n"
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            words.select(F.explode(_adjacent_pairs(F.col("sym"))).alias("pair"), "n")
            .groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0].cnt < min_pair_count:
            break
        a, b = top[0].pair.split(_SEP, 1)
        merges.append((a, b))
        words = words.select(
            _apply_merge(F.col("sym"), a, b).alias("sym"), "n"
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]], out_col: str = "bpe"
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: per word, start
    from characters and replay merges in order. Pure projection —
    0 shuffles, whole-stage codegen; cost grows with len(merges)
    (bounded-merge use; see module docstring for the 30k-merge path)."""
    words_arr = tokenize(norm_text(text_col))
    enc = F.flatten(
        F.transform(
            words_arr,
            lambda w: _encode_word(w, merges),
        )
    )
    return df.withColumn(out_col, enc)


def _encode_word(word: Column, merges: list[tuple[str, str]]) -> Column:
    sym = _chars(word)
    for a, b in merges:
        sym = _apply_merge(sym, a, b)
    return sym

"""Time-series similarity search over the event stream.

Distributed SAX-style subsequence matching (the shape of EDBT'19
"Time Series Similarity Search for Streaming Data in Distributed
Systems", re-expressed Spark-first): per-entity tumbling windows are
z-normalized, PAA-compressed and discretized to a small SAX alphabet;
windows sharing a SAX word are the ONLY candidate pairs, and candidates
are verified with the exact z-normalized Euclidean distance. The
all-pairs O(n²) window comparison never materializes — the same
index-then-verify discipline as MinHash/LSH text dedup
(operators/dedup.py).

Oracle parity: every float step is engine-portable — means/stddevs
accumulate in DECIMAL, z-scores and PAA segments are rounded to fixed
precision before any comparison, SAX breakpoints are literals, and the
verify distance sums exact decimals before one IEEE sqrt.

Scale (100 TB): windowing is one shuffle on the entity key; window
stats are one groupBy at (entity, window) grain; the SAX-word join is
uniform *after* the hot-word cutoff (``max_word_df`` drops
constant/flat motifs the way df-cutoff drops stop-shingles — without
it a flat corpus degenerates to all-pairs within one word).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: SAX breakpoints for a 4-symbol alphabet under N(0,1) (equiprobable).
SAX_BREAKS = (-0.6745, 0.0, 0.6745)


def ts_windows(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_len: int = 8,
) -> DataFrame:
    """Complete tumbling windows of ``window_len`` consecutive readings
    per entity: rows ``(key, win, pos, v)`` with pos 0..len-1 in event
    order. Ties on the timestamp break by a second deterministic column
    so both engines order identically."""
    order = [F.col(ts_col).asc(), F.col("event_id").asc()] if (
        "event_id" in df.columns
    ) else [F.col(ts_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    rows = df.select(
        F.col(key_col).alias("k"),
        F.col(value_col).cast("double").alias("v"),
        (F.row_number().over(w) - 1).alias("_rn"),
    )
    rows = rows.select(
        "k",
        "v",
        (F.col("_rn") % window_len).alias("pos"),
        (F.col("_rn") / window_len).cast("long").alias("win"),
    )
    # completeness as an analytic count over the (k, win) partition —
    # one linear chain of two exchanges. The former groupBy+self-join
    # referenced `rows` twice, duplicating the row_number chain in the
    # physical plan (and a third/fourth time via downstream consumers).
    ww = Window.partitionBy("k", "win")
    return (
        rows.withColumn("_n", F.count(F.lit(1)).over(ww))
        .filter(F.col("_n") == window_len)
        .drop("_n")
    )


def sax_words(
    windows: DataFrame, window_len: int = 8, paa_segments: int = 4
) -> DataFrame:
    """Z-normalize each window (decimal-exact mean/std, rounded z), PAA
    to ``paa_segments`` means, discretize on :data:`SAX_BREAKS` → one
    ``(k, win, word, zv)`` row per window (``zv`` = the pos-ordered
    z-profile array, so callers verify distances without joining back)
    plus the rounded z rows for exact verification. Flat windows
    (std = 0) are dropped — their distance is undefined under
    z-normalization. Both returned frames are persisted: every caller
    branch (and a motifs+discords pair in one session, via cache-manager
    substitution) then shares one copy of the window chain."""
    seg_len = window_len // paa_segments
    # per-window mean/std as analytic sums over the (k, win) partition —
    # the windows frame is already partitioned that way by ts_windows,
    # so this adds NO exchange, and the former groupBy+re-join (which
    # referenced `windows` twice, duplicating its whole upstream chain
    # in the plan) disappears. Decimal window sums are exact and
    # associative — bit-identical to the aggregated version.
    ww = Window.partitionBy("k", "win")
    s1 = F.sum(F.col("v").cast("decimal(27,12)")).over(ww).cast("double")
    n = F.count(F.lit(1)).over(ww)
    s2 = (
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)"))
        .over(ww)
        .cast("double")
    )
    # mu*mu as plain multiplication — pow() is not guaranteed correctly
    # rounded across engines
    mu = s1 / n
    _mean = F.round(mu, 9)
    _std = F.round(
        F.sqrt(F.greatest(s2 / n - mu * mu, F.lit(0.0))), 9
    )
    z = (
        windows.withColumn("_mean", _mean)
        .withColumn("_std", _std)
        .filter(F.col("_std") > 0)
        .select(
            "k",
            "win",
            "pos",
            F.round((F.col("v") - F.col("_mean")) / F.col("_std"), 6).alias("z"),
        )
    )
    # persist BEFORE deriving paa/words: every consumer (the word chain
    # here, the z-vector agg and any caller branch downstream) then
    # references the cached relation instead of embedding its own copy
    # of the row_number + analytic-stats chain in the plan
    from pyspark import StorageLevel

    z = z.persist(StorageLevel.MEMORY_AND_DISK)
    # ONE (k, win) aggregation derives everything: the window's ordered
    # z-profile array, the per-segment PAA means (an in-array decimal
    # fold over each pos-ordered slice — decimal addition is exact and
    # associative, so the sums are bit-identical to the former
    # per-segment groupBy), the SAX letters, and the word. The former
    # paa-groupBy → letter → word-groupBy chain planned two exchanges
    # and the callers' z-vector aggregation a third; this is one
    # (r6 carrier trim). ``words`` carries ``zv`` so distance
    # verification joins nothing back.
    def seg_paa(i: int):
        sl = F.slice("zv", i * seg_len + 1, seg_len)
        s = F.aggregate(
            sl,
            F.lit(0).cast("decimal(18,6)"),
            lambda acc, x: (acc + x.cast("decimal(18,6)")).cast(
                "decimal(18,6)"
            ),
        )
        return F.round(s.cast("double") / seg_len, 6)

    def letter(paa):
        return (
            F.when(paa < SAX_BREAKS[0], F.lit("a"))
            .when(paa < SAX_BREAKS[1], F.lit("b"))
            .when(paa < SAX_BREAKS[2], F.lit("c"))
            .otherwise(F.lit("d"))
        )

    words = (
        z.groupBy("k", "win")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "z"))),
                lambda s: s["z"],
            ).alias("zv")
        )
        .select(
            "k",
            "win",
            F.concat_ws(
                "", *[letter(seg_paa(i)) for i in range(paa_segments)]
            ).alias("word"),
            "zv",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return words, z


def similar_windows(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_len: int = 8,
    paa_segments: int = 4,
    max_distance: float = 1.5,
    max_word_df: int = 200,
    top_k: int = 50,
) -> DataFrame:
    """End-to-end similar-subsequence discovery: windows sharing a SAX
    word (hot words above ``max_word_df`` dropped) are verified with the
    exact z-normalized Euclidean distance; the ``top_k`` closest
    cross-entity pairs are returned with a strict total order."""
    wins = ts_windows(df, key_col, ts_col, value_col, window_len)
    # sax_words persists BOTH z and the (k, win, word, zv) frame, so
    # the window chain runs once here and a ts_discords run in the same
    # session substitutes the same caches — the shared-SAX-chain reuse
    # the neardup_pairs carrier counts on. zv rides the word row (r5/r6
    # trims), so per-pair distances are 0-shuffle array folds with no
    # join back onto the z rows.
    wz, _ = sax_words(wins, window_len, paa_segments)
    # Candidate pairs via ONE word-keyed aggregation instead of the
    # former rarity-count + two repartition-on-word self-join sides
    # (3 exchanges → 1): collect each word's windows into a sorted
    # array (bounded by max_word_df — the same index-then-verify cap
    # that keeps hot words from exploding), then expand the strictly
    # i<j combinations in-array. array_sort on (k, win, zv) structs
    # orders by the unique (k, win), so pair orientation matches the
    # old (k_a, win_a) < (k_b, win_b) join predicate exactly.
    # Hot words are dropped BEFORE the array build (an analytic count
    # over the same word partitioning — no extra shuffle): filtering on
    # size(collect_list(...)) would first materialize a flat/periodic
    # signal's word as one giant per-row array. The window count spills
    # rows, never builds arrays, so the cutoff is skew-safe.
    w_word = Window.partitionBy("word")
    byword = (
        wz.withColumn("_df", F.count(F.lit(1)).over(w_word))
        .filter(F.col("_df") <= max_word_df)
        .groupBy("word")
        .agg(F.array_sort(F.collect_list(F.struct("k", "win", "zv"))).alias("ws"))
    )
    combos = F.flatten(
        F.transform(
            "ws",
            lambda x, i: F.transform(
                F.slice(F.col("ws"), i + F.lit(2), F.size("ws")),
                lambda y: F.struct(
                    x["k"].alias("k_a"),
                    x["win"].alias("win_a"),
                    y["k"].alias("k_b"),
                    y["win"].alias("win_b"),
                    x["zv"].alias("zv_a"),
                    y["zv"].alias("zv_b"),
                ),
            ),
        )
    )
    pairs = byword.select("word", F.explode(combos).alias("p")).select(
        F.col("p.k_a").alias("k_a"),
        F.col("p.win_a").alias("win_a"),
        F.col("p.k_b").alias("k_b"),
        F.col("p.win_b").alias("win_b"),
        "word",
        F.col("p.zv_a").alias("zv_a"),
        F.col("p.zv_b").alias("zv_b"),
    )
    # exact z-normalized Euclidean distance as an array fold — decimal
    # accumulation in array (= pos) order; decimal addition is exact and
    # associative, so the result is bit-identical to the former
    # per-row-join sum
    sq = F.zip_with(
        F.col("zv_a"),
        F.col("zv_b"),
        lambda a, b: ((a - b) * (a - b)).cast("decimal(38,12)"),
    )
    dsum = F.aggregate(
        sq,
        F.lit(0).cast("decimal(38,12)"),
        lambda acc, v: (acc + v).cast("decimal(38,12)"),
    )
    dist = pairs.select(
        "k_a", "win_a", "k_b", "win_b", "word",
        F.round(F.sqrt(dsum.cast("double")), 6).alias("distance"),
    )
    return (
        dist.filter(F.col("distance") <= max_distance)
        .orderBy(
            F.col("distance").asc(),
            F.col("k_a").asc(), F.col("win_a").asc(),
            F.col("k_b").asc(), F.col("win_b").asc(),
        )
        .limit(top_k)
    )


def ts_discords(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_len: int = 8,
    paa_segments: int = 4,
    top_k: int = 20,
) -> DataFrame:
    """Anomalous-subsequence candidates (discords), HOT-SAX style: rank
    windows by the rarity of their SAX word — a window whose discretized
    shape is shared by few (or no) other windows is the candidate whose
    nearest-neighbor distance is likely maximal. This is the HOT SAX
    outer-loop heuristic as a standalone screen: exact discord
    confirmation (min distance to any other window) is run downstream on
    only the ``top_k`` survivors, corpus-sized work avoided.

    Output: ``(k, win, word, word_df)`` for the ``top_k`` rarest-shaped
    windows under a strict (df ASC, word, k, win) total order.
    """
    wins = ts_windows(df, key_col, ts_col, value_col, window_len)
    words, _ = sax_words(wins, window_len, paa_segments)
    # rarity as an analytic count over the word partitioning — the
    # former groupBy+join-back planned the words subtree twice and paid
    # a join exchange (r6 carrier trim, same recipe as similar_windows)
    return (
        words.withColumn(
            "word_df", F.count(F.lit(1)).over(Window.partitionBy("word"))
        )
        .orderBy(
            F.col("word_df").asc(), F.col("word").asc(),
            F.col("k").asc(), F.col("win").asc(),
        )
        .limit(top_k)
        .select("k", "win", "word", "word_df")
    )

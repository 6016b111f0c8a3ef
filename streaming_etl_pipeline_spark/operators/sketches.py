"""Portable sketches: approximate algorithms whose results are exactly
reproducible across engines.

Spark's built-in sketches (``approx_count_distinct`` = HyperLogLog++,
``percentile_approx`` = KLL-ish) produce engine-specific estimates a
DuckDB oracle can't reproduce. The K-Minimum-Values (KMV) estimator is
different: its entire state is "the k smallest md5 hashes of the
distinct values" — a deterministic function of the value set — so both
engines compute the *same* estimate bit-for-bit, and the differential
gate can verify an approximate algorithm exactly.

Estimator (Bar-Yossef et al. 2002): with U = hash-space size and
``kth_min`` the k-th smallest distinct hash, distinct ≈ (k−1)·U/kth_min;
relative error ≈ 1/√k. Exact below k distinct values (the sketch holds
them all).

Scale shape: hash → per-key DISTINCT (one shuffle, map-side partial) →
per-key top-k window over the *distinct hashes* (second stage sees at
most the distinct count per key, and Spark's WindowGroupLimit pushes the
rank-k filter into the sort). At 100 TB the distinct pre-aggregation is
the dominant cost — same as exact countDistinct — but the sketch output
(k longs per key) is mergeable across partitions/days: persist per-day
sketches and union+re-top-k to estimate distinct over any date range
without rescanning, which exact countDistinct cannot do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.functions.core import md5_long, md5_long_sql

#: md5_long hash space: 60-bit (15 hex chars).
HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-key KMV distinct-count estimate of ``value_col``.

    Output: keys + ``n_kept`` (sketch fill), ``kth_min`` (sketch
    boundary), ``distinct_est``. ``distinct_est`` is exact when the key
    has < k distinct values.
    """
    hashed = df.select(
        *keys, md5_long(value_col).alias("_h")
    ).distinct()
    w = Window.partitionBy(*keys).orderBy("_h")
    kept = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    agg = kept.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_h").alias("kth_min"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.floor((k - 1) * F.lit(HASH_SPACE) / F.col("kth_min")).cast("double")
    )
    return agg.select(*keys, "n_kept", "kth_min", est.cast("long").alias("distinct_est"))


def kmv_distinct_sql(
    table: str, keys: Sequence[str], value_col: str, k: int = 64
) -> str:
    """DuckDB oracle twin of :func:`kmv_distinct`."""
    keys_sql = ", ".join(keys)
    h = md5_long_sql(value_col)
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {keys_sql}, {h} AS _h FROM {table}
    ),
    kept AS (
      SELECT {keys_sql}, _h,
             row_number() OVER (PARTITION BY {keys_sql} ORDER BY _h) AS _rn
      FROM hashed
    )
    SELECT {keys_sql}, count(*) AS n_kept, max(_h) AS kth_min,
           CAST(CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
                ELSE floor(({k} - 1) * {HASH_SPACE!r} / max(_h)) END AS BIGINT)
             AS distinct_est
    FROM kept WHERE _rn <= {k}
    GROUP BY {keys_sql}
    """

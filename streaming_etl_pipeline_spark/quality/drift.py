"""Distribution-drift detection between two table snapshots.

The reference monitors its pipeline with Prometheus alert rules
(``monitoring/prometheus/alert_rules.yml``) — counters and thresholds.
A data pipeline also needs *distributional* monitoring: has the value
distribution of what we ingest today drifted from the reference window?
The standard industry metric is the Population Stability Index

    PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)

with the usual reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
action required.

Engine shape: both snapshots reduce to per-bin counts with one
map-side-combined aggregation each (fixed literal bin edges, so the
binning is a pure projection); the PSI fold runs over ≤ a few dozen
bin rows. Laplace smoothing (+0.5 per bin) keeps empty bins defined and
is applied identically in the DuckDB twin, so the gate pins the exact
float. At 100 TB each snapshot pass is scan-bound and independent —
run them on partition-pruned date ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_expr(col: str, edges: list[float]) -> Column:
    """0-based bin index with underflow bin 0 and overflow bin len(edges),
    built as a sum of step functions: bin = Σ (c >= edge_i)."""
    c = F.col(col)
    steps = [(c >= F.lit(float(e))).cast("int") for e in edges]
    out = steps[0]
    for s in steps[1:]:
        out = out + s
    return out


def _bin_sql(col: str, edges: list[float]) -> str:
    return " + ".join(
        f"CASE WHEN {col} >= {float(e)!r} THEN 1 ELSE 0 END" for e in edges
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    edges: list[float],
) -> DataFrame:
    """One-row result: ``(psi, n_ref, n_cur, drifted)`` for ``col``
    binned by the fixed ``edges`` (underflow + len(edges) bins)."""
    nbins = len(edges) + 1

    def counts(df: DataFrame, label: str) -> DataFrame:
        return (
            df.select(_bin_expr(col, edges).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(f"cnt_{label}"))
        )

    bins = (
        ref.sparkSession.range(nbins)
        .select(F.col("id").cast("int").alias("bin"))
        .join(counts(ref, "ref"), "bin", "left")
        .join(counts(cur, "cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("cnt_ref", F.lit(0)).alias("cnt_ref"),
            F.coalesce("cnt_cur", F.lit(0)).alias("cnt_cur"),
        )
    )
    tot = bins.agg(
        F.sum("cnt_ref").alias("n_ref"), F.sum("cnt_cur").alias("n_cur")
    )
    smoothed = bins.crossJoin(F.broadcast(tot)).select(
        "n_ref",
        "n_cur",
        (
            (F.col("cnt_ref") + 0.5) / (F.col("n_ref") + 0.5 * nbins)
        ).alias("p_ref"),
        (
            (F.col("cnt_cur") + 0.5) / (F.col("n_cur") + 0.5 * nbins)
        ).alias("p_cur"),
    )
    term = (F.col("p_cur") - F.col("p_ref")) * F.log(
        F.col("p_cur") / F.col("p_ref")
    )
    out = smoothed.groupBy("n_ref", "n_cur").agg(
        F.round(F.sum(term), 6).alias("psi")
    )
    return out.select(
        "psi",
        "n_ref",
        "n_cur",
        (F.col("psi") >= 0.1).alias("drifted"),
    )


def psi_sql(
    ref_sql: str,
    cur_sql: str,
    col: str,
    edges: list[float],
) -> str:
    """DuckDB oracle twin of :func:`psi` (identical smoothing and log)."""
    nbins = len(edges) + 1
    return f"""
    WITH refc AS (
      SELECT {_bin_sql(col, edges)} AS bin, count(*) AS cnt
      FROM ({ref_sql}) GROUP BY 1),
    curc AS (
      SELECT {_bin_sql(col, edges)} AS bin, count(*) AS cnt
      FROM ({cur_sql}) GROUP BY 1),
    bins AS (
      SELECT b.bin,
             coalesce(refc.cnt, 0) AS cnt_ref,
             coalesce(curc.cnt, 0) AS cnt_cur
      FROM (SELECT unnest(range({nbins})) AS bin) b
      LEFT JOIN refc USING (bin) LEFT JOIN curc USING (bin)),
    tot AS (SELECT CAST(sum(cnt_ref) AS BIGINT) AS n_ref,
                   CAST(sum(cnt_cur) AS BIGINT) AS n_cur FROM bins),
    sm AS (
      SELECT n_ref, n_cur,
             (cnt_ref + 0.5) / (n_ref + 0.5 * {nbins}) AS p_ref,
             (cnt_cur + 0.5) / (n_cur + 0.5 * {nbins}) AS p_cur
      FROM bins, tot)
    SELECT round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi,
           n_ref, n_cur,
           round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) >= 0.1 AS drifted
    FROM sm GROUP BY n_ref, n_cur
    """

"""Cleaning operators — the engine's Silver layer (SURVEY.md §2.2/2.5).

Re-expresses ``src/transformations/bronze_to_silver.py`` Spark-first:
keep-latest dedup (W1), required-column null filter (P4), per-type range
anomaly flags (P7), rolling z-score anomaly flags (W2+W3), late-data
union-merge (J1), and lineage columns (P3).

Scale design:
- dedup and z-score both shuffle once on the entity key; at 1000 executors
  a hot entity (one sensor producing most rows) would skew that shuffle —
  AQE skew handling covers joins, and for pathological groupBy skew the
  dedup can run as a two-phase ``max_by`` aggregate instead (exposed as
  ``deduplicate_latest_agg``);
- the rolling z-score is a bounded ROWS frame (trailing N+1 rows), so state
  per partition is O(window), never O(partition);
- row counts for audit come from ``df.observe`` in the pipeline runner, not
  repeated ``count()`` actions (the reference recomputes its plan 5× —
  SURVEY.md §3.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Reference constants, reproduced exactly (bronze_to_silver.py:29-37,72).
ANOMALY_RANGES: dict[str, tuple[float, float]] = {
    "temperature": (-20.0, 60.0),
    "humidity": (5.0, 95.0),
    "pressure": (950.0, 1070.0),
    "vibration": (0.0, 2.0),
}
ZSCORE_WINDOW = 100
ZSCORE_THRESHOLD = 3.0
PIPELINE_VERSION = "1.2.0"


def deduplicate_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
    skew: bool = False,
) -> DataFrame:
    """W1 — keep the latest row per key (latest ``order_col`` wins; the
    reference keeps the newest ``ingestion_time`` per ``(sensor_id,
    event_time)``, ``bronze_to_silver.py:40-52``). Add a unique ``tiebreak``
    column for full determinism when ``order_col`` can tie.

    ``skew=True`` routes to :func:`deduplicate_latest_agg`: the
    ``row_number`` window must SORT every row of a key inside one task,
    so one hot key (a chatty sensor, a default/null id) serializes the
    stage; the ``max_by`` aggregation keeps only one struct per key per
    map task and merges partials, so the hot key costs one struct per
    upstream partition instead of a single-task sort of all its rows.
    Same result either way (measured on a 50 %-hot-key fixture in
    ``tests/test_skew.py``; numbers in SCALE.md)."""
    if skew:
        return deduplicate_latest_agg(df, keys, order_col, tiebreak)
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_row_num", F.row_number().over(w))
        .filter(F.col("_row_num") == 1)
        .drop("_row_num")
    )


def deduplicate_latest_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Skew-robust W1 variant: ``max_by`` over a struct of all columns,
    ordered by ``(order_col, *tiebreak)`` (struct comparison is
    lexicographic, matching the window variant's DESC-major order).
    Partial aggregation happens map-side, so one hot key degrades to a
    single reducer holding one struct, not all duplicate rows."""
    payload = F.struct(*[F.col(c) for c in df.columns])
    rank = F.struct(F.col(order_col), *[F.col(c) for c in tiebreak])
    out = df.groupBy(*keys).agg(F.max_by(payload, rank).alias("_p"))
    return out.select(*[F.col(f"_p.{c}").alias(c) for c in df.columns])


def drop_null_required(df: DataFrame, required: Sequence[str]) -> DataFrame:
    """P4 — drop rows with nulls in required columns
    (``bronze_to_silver.py:118-124``)."""
    return df.na.drop(subset=list(required))


def flag_out_of_range(
    df: DataFrame,
    type_col: str,
    value_col: str,
    ranges: dict[str, tuple[float, float]] | None = None,
    flag_col: str = "is_anomaly",
) -> DataFrame:
    """P7 — per-type range anomaly flag (``bronze_to_silver.py:55-69``).

    The per-type bounds are folded into one boolean expression at plan
    build time — Catalyst constant-folds and codegens it; for hundreds of
    types prefer ``flag_out_of_range_join`` (broadcast bounds table)."""
    ranges = ranges if ranges is not None else ANOMALY_RANGES
    cond: Column = F.lit(False)
    for stype, (lo, hi) in ranges.items():
        cond = cond | (
            (F.col(type_col) == stype)
            & ((F.col(value_col) < lo) | (F.col(value_col) > hi))
        )
    return df.withColumn(flag_col, F.when(cond, True).otherwise(False))


def flag_out_of_range_join(
    df: DataFrame,
    bounds: DataFrame,
    type_col: str,
    value_col: str,
    flag_col: str = "is_anomaly",
) -> DataFrame:
    """P7 at scale — bounds as a broadcast dimension ``(type, lo, hi)``:
    no plan blow-up when the rule table is large or data-driven."""
    b = F.broadcast(bounds)
    joined = df.join(b, df[type_col] == bounds["type"], "left")
    flagged = joined.withColumn(
        flag_col,
        F.when(
            (F.col(value_col) < F.col("lo")) | (F.col(value_col) > F.col("hi")),
            True,
        ).otherwise(False),
    )
    return flagged.drop("type", "lo", "hi")


def flag_zscore(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    window_size: int = ZSCORE_WINDOW,
    threshold: float = ZSCORE_THRESHOLD,
    flag_col: str = "is_anomaly",
) -> DataFrame:
    """W2+W3 — rolling z-score anomaly detection
    (``bronze_to_silver.py:87-115``): trailing ``window_size+1``-row mean and
    sample stddev per entity; |z| > threshold flags the row; OR-merged into
    an existing ``flag_col`` if present."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-window_size, 0)
    )
    v = F.col(value_col)
    rolling_avg = F.avg(v).over(w)
    rolling_std = F.stddev(v).over(w)
    z = F.abs((v - rolling_avg) / rolling_std)
    is_z_anom = (
        F.when(rolling_std.isNull() | (rolling_std == 0), False)
        .otherwise(z > threshold)
    )
    merged = (
        (F.col(flag_col) | is_z_anom) if flag_col in df.columns else is_z_anom
    )
    return (
        df.withColumn("_rolling_avg", rolling_avg)
        .withColumn("_rolling_std", rolling_std)
        .withColumn(flag_col, merged)
        .drop("_rolling_avg", "_rolling_std")
    )


def merge_late_data(
    existing: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """J1 — late-data upsert (``bronze_to_silver.py:145-159``): schema-
    tolerant union then keep-latest dedup, so a corrected late row with a
    newer ``order_col`` replaces the original."""
    unioned = existing.unionByName(new, allowMissingColumns=True)
    return deduplicate_latest(unioned, keys, order_col, tiebreak)


def add_lineage(
    df: DataFrame,
    source_file: str = "kafka-stream",
    pipeline_version: str = PIPELINE_VERSION,
) -> DataFrame:
    """P3 — lineage columns (``bronze_to_silver.py:127-142``)."""
    return (
        df.withColumn("ingestion_timestamp", F.current_timestamp())
        .withColumn("source_file", F.lit(source_file))
        .withColumn("processing_timestamp", F.current_timestamp())
        .withColumn("pipeline_version", F.lit(pipeline_version))
    )

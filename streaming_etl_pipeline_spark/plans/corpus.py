"""The engine's query corpus: every operator exposed as a named query with
a DuckDB-oracle SQL twin.

This is the correctness contract (SURVEY.md §5): the driver runs each
``queries()[name]`` on Spark and the matching ``oracle_sql()[name]`` on
DuckDB over the same parquet tables and compares row count + schema +
order-insensitive value hash. Parity rules used throughout:

- every computed column is aliased identically on both sides;
- floating aggregates are rounded *inside the query* (both sides) so the
  two engines' accumulation-order differences can't leak into the hash;
- time buckets use exact integer-microsecond arithmetic
  (:func:`streaming_etl_pipeline_spark.functions.time_bucket`);
- content hashes are md5-based (identical across engines);
- any LIMIT/top-k has a total deterministic ordering (unique tiebreaker).

Queries whose semantics SQL can't express (streaming, multimodal) are
registered without an oracle — the driver then records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.functions.core import (
    exact_avg,
    exact_avg_sql,
    exact_stddev_sql,
    exact_sum,
    time_bucket_sql,
)
from streaming_etl_pipeline_spark.operators import aggregates, cleaning
from streaming_etl_pipeline_spark.session import tune
from streaming_etl_pipeline_spark.sources import read_table


@dataclass(frozen=True)
class QuerySpec:
    """One correctness-gated query: a Spark plan builder + its oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, bench: bool = False):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=_tuned(fn), sql=sql, bench=bench)
        return fn

    return deco


def _tuned(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.sql for n, s in QUERIES.items() if s.sql is not None}


# ---------------------------------------------------------------------------
# Gold-layer windowed aggregations (reference silver_to_gold.py:44-161)
# ---------------------------------------------------------------------------

_STATS_ORACLE_AGGS = f"""
  {exact_avg_sql("value")} AS avg_value,
  min(value) AS min_value,
  max(value) AS max_value,
  count(value) AS reading_count,
  {exact_stddev_sql("value")} AS stddev_value,
  round(quantile_cont(value, 0.5), 4) AS p50_value,
  round(quantile_cont(value, 0.95), 4) AS p95_value,
  round(quantile_cont(value, 0.99), 4) AS p99_value
"""


@register(
    "sensor_5min",
    f"""
    SELECT {time_bucket_sql("ts", 300)} AS window_start,
           user_id, event_type,
           {_STATS_ORACLE_AGGS},
           {time_bucket_sql("ts", 300)} + INTERVAL 5 MINUTE AS window_end,
           round(count(value) / 300.0 * 100, 2) AS sensor_health_pct
    FROM events
    GROUP BY 1, 2, 3
    """,
    bench=True,
)
def q_sensor_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold_sensor_5min shape (silver_to_gold.py:44-92): 5-minute tumbling
    stats per entity with exact percentiles and a health metric."""
    events = read_table(spark, sf_dir, "events")
    out = aggregates.windowed_stats(
        events,
        ts_col="ts",
        keys=["user_id", "event_type"],
        bucket_seconds=300,
        value_col="value",
        expected_per_window=300,
    )
    return out


@register(
    "location_hourly",
    f"""
    SELECT {time_bucket_sql("ts", 3600)} AS window_start,
           event_type,
           {_STATS_ORACLE_AGGS},
           count(DISTINCT user_id) AS unique_user_id_count,
           {time_bucket_sql("ts", 3600)} + INTERVAL 1 HOUR AS window_end
    FROM events
    GROUP BY 1, 2
    """,
    bench=True,
)
def q_location_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold_location_hourly shape (silver_to_gold.py:95-134): hourly stats
    per type + exact distinct entity count."""
    events = read_table(spark, sf_dir, "events")
    out = aggregates.windowed_stats(
        events,
        ts_col="ts",
        keys=["event_type"],
        bucket_seconds=3600,
        value_col="value",
        distinct_count_col="user_id",
    )
    return out


@register(
    "daily_summary",
    f"""
    SELECT CAST(ts AS DATE) AS date, event_type,
           {exact_avg_sql("value")} AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value,
           count(value) AS total_readings,
           {exact_stddev_sql("value")} AS stddev_value,
           CAST(sum(CASE WHEN value > 180.0 THEN 1 ELSE 0 END) AS BIGINT) AS anomaly_count,
           count(DISTINCT user_id) AS unique_user_id_count,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date_str
    FROM events
    GROUP BY 1, 2
    """,
)
def q_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold_daily_summary shape (silver_to_gold.py:137-161): calendar-day
    rollup with conditional anomaly count (threshold stands in for the
    reference's is_anomaly flag)."""
    events = read_table(spark, sf_dir, "events").withColumn(
        "is_anomaly", F.col("value") > 180.0
    )
    out = aggregates.daily_summary(
        events,
        ts_col="ts",
        keys=["event_type"],
        value_col="value",
        anomaly_col="is_anomaly",
        distinct_count_col="user_id",
    )
    return out


# ---------------------------------------------------------------------------
# Cleaning operators (reference bronze_to_silver.py)
# ---------------------------------------------------------------------------


@register(
    "dedup_latest",
    """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
    bench=True,
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 keep-latest dedup (bronze_to_silver.py:40-52): latest event per
    (user_id, event_type), event_id as deterministic tiebreaker."""
    events = read_table(spark, sf_dir, "events")
    out = cleaning.deduplicate_latest(
        events, keys=["user_id", "event_type"], order_col="ts", tiebreak=["event_id"]
    )
    return out.select("event_id", "ts", "user_id", "event_type", "value", "props")


@register(
    "range_flags",
    """
    SELECT event_id, user_id, event_type, value,
           CASE WHEN (event_type = 'error'    AND (value < 50.0  OR value > 150.0))
                  OR (event_type = 'purchase' AND (value < 0.0   OR value > 100.0))
                  OR (event_type = 'view'     AND (value < 0.0   OR value > 120.0))
                THEN TRUE ELSE FALSE END AS is_anomaly
    FROM events
    """,
)
def q_range_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 per-type range anomaly flag (bronze_to_silver.py:55-69) over the
    events stand-in types."""
    events = read_table(spark, sf_dir, "events")
    out = cleaning.flag_out_of_range(
        events,
        type_col="event_type",
        value_col="value",
        ranges={
            "error": (50.0, 150.0),
            "purchase": (0.0, 100.0),
            "view": (0.0, 120.0),
        },
    )
    return out.select("event_id", "user_id", "event_type", "value", "is_anomaly")


@register(
    "rolling_zscore",
    """
    SELECT event_id, user_id, ts, value,
           CASE WHEN rolling_std IS NULL OR rolling_std = 0 THEN FALSE
                ELSE abs((value - rolling_avg) / rolling_std) > 3.0 END AS is_anomaly
    FROM (
      SELECT event_id, user_id, ts, value,
             avg(value) OVER w AS rolling_avg,
             stddev(value) OVER w AS rolling_std
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 100 PRECEDING AND CURRENT ROW))
    """,
    bench=True,
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+W3 rolling z-score anomaly flag (bronze_to_silver.py:87-115):
    trailing-101-row mean/stddev per entity, |z| > 3."""
    events = read_table(spark, sf_dir, "events")
    out = cleaning.flag_zscore(
        events,
        partition_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
    )
    return out.select("event_id", "user_id", "ts", "value", "is_anomaly")


# ---------------------------------------------------------------------------
# TPC-H-style relational queries (engine joins/aggregates on the corpus)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))
                    * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
           {exact_avg_sql("l_quantity")} AS avg_qty,
           {exact_avg_sql("l_extendedprice")} AS avg_price,
           {exact_avg_sql("l_discount")} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate groupBy. One shuffle on
    two low-cardinality keys; partial aggregation makes the shuffle tiny.

    Money sums accumulate in DECIMAL (exact → order-independent → identical
    in any engine); the 2-dp inputs make products exact at 4/6-dp scales.
    """
    li = read_table(spark, sf_dir, "lineitem")
    price_d = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_d = (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
    tax_d = (F.lit(1) + F.col("l_tax")).cast("decimal(12,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").cast("double").alias("sum_qty"),
            exact_sum("l_extendedprice").cast("double").alias("sum_base_price"),
            F.sum(price_d * disc_d).cast("double").alias("sum_disc_price"),
            F.sum(price_d * disc_d * tax_d).cast("double").alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

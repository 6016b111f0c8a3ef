"""Warehouse star schema as Spark SQL tables (SURVEY.md §2.1 S7-S9).

Replaces the reference's Redshift layer (``src/loaders/redshift_schema.sql``,
``src/loaders/redshift_loader.py``) with Spark-native equivalents:

- ``build_dim_time`` — the hourly calendar dimension, generated with
  ``sequence()``/``explode`` instead of the reference's ROW_NUMBER-over-
  stl_scan hack (``redshift_schema.sql:59-67``);
- ``build_fact_from_gold`` — fact table shaping + warehouse-style layout:
  DISTKEY → ``repartition(key)``, SORTKEY → ``sortWithinPartitions``;
- idempotent window loads via dynamic partition overwrite (the Spark
  equivalent of delete-then-COPY, ``redshift_loader.py:33-55``);
- dimension upsert delegates to
  :func:`streaming_etl_pipeline_spark.operators.joins.upsert_dimension`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.functions import time_bucket
from streaming_etl_pipeline_spark.sources.io import write_partitioned


def build_dim_time(
    spark: SparkSession,
    start: str = "2024-01-01 00:00:00",
    hours: int = 26280,
) -> DataFrame:
    """Hourly calendar dimension (``redshift_schema.sql:35-68``: 3 years of
    hours, time_key sequence, hour/day/month/year/dow, weekend flag).

    Fully columnar: ``sequence`` + ``explode`` on the executors — no
    driver-side loop, no Python. ``day_of_week`` keeps the reference's
    Redshift convention (0 = Sunday), so ``is_weekend = dow IN (0, 6)``.
    """
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(hours - 1).cast("long"), F.lit(1)
                )
            ).alias("time_key")
        )
        .withColumn(
            "full_timestamp",
            F.timestamp_micros(
                F.unix_micros(F.lit(start).cast("timestamp"))
                + F.col("time_key") * F.lit(3600_000_000)
            ),
        )
        .withColumn("hour", F.hour("full_timestamp"))
        .withColumn("day", F.dayofmonth("full_timestamp"))
        .withColumn("month", F.month("full_timestamp"))
        .withColumn("year", F.year("full_timestamp"))
        # Spark dayofweek: 1=Sunday..7=Saturday → Redshift DOW 0=Sunday..6.
        .withColumn("day_of_week", F.dayofweek("full_timestamp") - F.lit(1))
        .withColumn("is_weekend", F.col("day_of_week").isin(0, 6))
    )


def build_fact(
    gold: DataFrame,
    dist_key: str = "sensor_id",
    sort_key: str = "window_start",
    num_partitions: int | None = None,
) -> DataFrame:
    """Shape a gold aggregate into the warehouse fact layout
    (``redshift_schema.sql:5-22``): DISTKEY → hash repartition on the join
    key (co-locates fact⋈dim work), SORTKEY → sortWithinPartitions (gives
    parquet row-group min/max pruning on the time predicate)."""
    fact = gold.withColumn("loaded_at", F.current_timestamp())
    if num_partitions:
        fact = fact.repartition(num_partitions, dist_key)
    else:
        fact = fact.repartition(dist_key)
    return fact.sortWithinPartitions(sort_key)


def load_fact_window(
    fact: DataFrame,
    path: str,
    window_col: str = "window_start",
    bucket_seconds: int = 3600,
) -> None:
    """S8 — idempotent window load. The reference DELETEs the half-open
    window then COPYs (``redshift_loader.py:84-133``); with a time-bucket
    partition column + dynamic partition overwrite, rewriting the same
    window twice converges to the same table state with no delete pass."""
    bucketed = fact.withColumn("load_window", time_bucket(window_col, bucket_seconds))
    write_partitioned(bucketed, path, partition_by=["load_window"])


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    Bucketing is the storage-level half of the DISTKEY idea in
    ``build_fact``: two tables bucketed on the same key with the same
    bucket count join with NO shuffle exchange on either side (and no
    sort when also ``sortBy`` the key) — at 100 TB this converts every
    recurring fact⋈fact join on the key into a local zip of
    pre-organized buckets. Bucket metadata lives in the session catalog
    (``saveAsTable``; plain Spark, no Hive metastore needed).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)

"""Medallion batch pipelines: the reference's two batch entry points,
composed from the operator library.

- :func:`bronze_to_silver` re-expresses
  ``src/transformations/bronze_to_silver.py:162-221``: date filter →
  required-null drop → keep-latest dedup → range + rolling-z-score
  anomaly flags → lineage → late-data merge → partitioned overwrite.
- :func:`silver_to_gold` re-expresses
  ``src/transformations/silver_to_gold.py:164-215``: three independent
  aggregation plans (5-min per sensor, hourly per location, daily
  summary) off one Silver scan.

The key structural improvement over the reference (SURVEY.md §3.2): the
reference runs ``count()`` five times, re-deriving the whole plan from
the Parquet scan per action. Here every audit number rides along as an
**observed metric** (``df.observe``) on the single write action — one
pass, zero extra jobs, and the numbers are exact for exactly the rows
written. At 100 TB that's the difference between 1 scan and 5.

Scale notes: writes are partitioned (``sensor_type``; add a date column
for time-pruned layouts) with dynamic partition overwrite, so a backfill
of one day/type replaces only those partitions. The dedup/z-score
shuffle on the entity key is the pipeline's only wide stage; AQE handles
its skew.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.operators import aggregates, cleaning
from streaming_etl_pipeline_spark.sources.io import write_partitioned

REQUIRED_COLUMNS = ("sensor_id", "sensor_type", "value", "event_time")
EXPECTED_PER_5MIN = 300  # silver_to_gold.py:41


@dataclass
class PipelineResult:
    """Output paths + single-pass observed metrics of one pipeline run."""

    output_paths: dict[str, str]
    metrics: dict[str, float] = field(default_factory=dict)


def bronze_to_silver(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    run_date: _dt.date | str | None = None,
    merge_with_existing: bool = True,
    partition_by: tuple[str, ...] = ("sensor_type",),
    validate: bool = False,
) -> PipelineResult:
    """Clean Bronze into Silver with one scan and one write.

    Mirrors the reference flow (validate → dedup → flag → lineage →
    late-merge → overwrite) but counts via observed metrics instead of
    five separate actions, and keeps the late-data merge as a union +
    keep-latest dedup so a corrected late row wins
    (``bronze_to_silver.py:145-159``). With ``validate=True`` the written
    Silver is checked against the silver expectation suite (fail-fast,
    like the reference's quality gate in the DAG).
    """
    df = spark.read.parquet(bronze_path)
    if run_date is not None:
        df = df.filter(F.to_date("event_time") == F.lit(str(run_date)))

    obs_in = Observation("bronze_in")
    df = df.observe(
        obs_in,
        F.count(F.lit(1)).alias("input_rows"),
        F.sum(
            F.when(
                F.greatest(*[F.col(c).isNull().cast("int") for c in REQUIRED_COLUMNS])
                == 1,
                1,
            ).otherwise(0)
        ).alias("invalid_rows"),
    )

    df = cleaning.drop_null_required(df, REQUIRED_COLUMNS)
    df = cleaning.deduplicate_latest(
        df, keys=("sensor_id", "event_time"), order_col="ingestion_time"
    )
    df = cleaning.flag_out_of_range(df, "sensor_type", "value")
    df = cleaning.flag_zscore(
        df,
        partition_cols=("sensor_id",),
        order_cols=("event_time",),
        value_col="value",
    )
    df = cleaning.add_lineage(df, source_file=bronze_path)

    if merge_with_existing:
        try:
            existing = spark.read.parquet(silver_path)
            df = cleaning.merge_late_data(
                existing,
                df,
                keys=("sensor_id", "event_time"),
                order_col="ingestion_time",
            )
        except Exception:
            pass  # first run: no existing Silver (reference does the same)

    obs_out = Observation("silver_out")
    df = df.observe(
        obs_out,
        F.count(F.lit(1)).alias("output_rows"),
        F.sum(F.col("is_anomaly").cast("int")).alias("anomaly_rows"),
    )

    write_partitioned(df, silver_path, partition_by=list(partition_by))
    metrics = {**obs_in.get, **obs_out.get}
    if validate:
        from streaming_etl_pipeline_spark.quality.expectations import (
            silver_suite,
            validate_or_raise,
        )

        report = validate_or_raise(spark.read.parquet(silver_path), silver_suite())
        metrics["quality_checks_passed"] = float(len(report))
    return PipelineResult(output_paths={"silver": silver_path}, metrics=metrics)


def silver_to_gold(
    spark: SparkSession,
    silver_path: str,
    gold_path: str,
    run_date: _dt.date | str | None = None,
    oracle_safe: bool = False,
    skew: bool = False,
) -> PipelineResult:
    """Aggregate Silver into the three Gold tables.

    Three independent plans off one scan (scan → partial agg → shuffle →
    final agg → write each); ``oracle_safe=False`` uses the plain double
    aggregation path — the exact-decimal variant exists for differential
    testing and costs ~20% more. ``skew=True`` passes the hot-key knob
    through to the windowed aggregations (mergeable percentile sketches
    instead of exact percentile buffers — see
    ``operators/aggregates.windowed_stats`` and tests/test_skew.py for
    the measured rationale); flip it when one sensor/location dominates
    the feed.
    """
    df = spark.read.parquet(silver_path)
    if run_date is not None:
        df = df.filter(F.to_date("event_time") == F.lit(str(run_date)))

    sensor_5min = aggregates.windowed_stats(
        df,
        ts_col="event_time",
        keys=["sensor_id", "sensor_type", "location"],
        bucket_seconds=300,
        value_col="value",
        expected_per_window=EXPECTED_PER_5MIN,
        oracle_safe=oracle_safe,
        skew=skew,
    )
    location_hourly = aggregates.windowed_stats(
        df,
        ts_col="event_time",
        keys=["location", "sensor_type"],
        bucket_seconds=3600,
        value_col="value",
        distinct_count_col="sensor_id",
        oracle_safe=oracle_safe,
        skew=skew,
    )
    daily = aggregates.daily_summary(
        df,
        ts_col="event_time",
        keys=["sensor_type"],
        value_col="value",
        anomaly_col="is_anomaly",
        distinct_count_col="sensor_id",
        oracle_safe=oracle_safe,
    )

    paths = {
        "sensor_5min": f"{gold_path}/sensor_5min",
        "location_hourly": f"{gold_path}/location_hourly",
        "daily_summary": f"{gold_path}/daily_summary",
    }
    obs = Observation("gold_5min")
    observed = sensor_5min.observe(
        obs, F.count(F.lit(1)).alias("sensor_5min_groups")
    )
    write_partitioned(observed, paths["sensor_5min"], partition_by=["sensor_type"])
    write_partitioned(location_hourly, paths["location_hourly"], partition_by=["sensor_type"])
    write_partitioned(daily, paths["daily_summary"], partition_by=["sensor_type"])
    return PipelineResult(output_paths=paths, metrics={**obs.get})


def backfill(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    gold_path: str,
    start_date: str,
    end_date: str,
    validate: bool = True,
    on_error: str = "continue",
) -> PipelineResult:
    """Historical backfill over a date range — the engine's flavor of the
    reference's Airflow backfill DAG (``dags/batch_pipeline_dag.py``:
    per-date ingest → validate → b2s → s2g with retries and a date-range
    param), without the EMR/MWAA control plane: each date runs
    bronze→silver→gold with date-partition pruning, stage validation
    fail-fast (``validate=True`` runs the silver expectation suite per
    date, the DAG's quality gate), and idempotent convergence — every
    write is a dynamic partition overwrite, so re-running any date (the
    DAG's ``retries: 2``) replaces that date's partitions instead of
    duplicating.

    ``on_error``: 'continue' records the failed date and proceeds (the
    DAG's ``ActionOnFailure: CONTINUE``); 'fail' re-raises immediately.
    Returns per-date metrics flattened as ``{date}.{stage}.{metric}``
    plus ``dates_ok`` / ``dates_failed`` counts.
    """
    import datetime as _dt2

    d0 = _dt2.date.fromisoformat(str(start_date))
    d1 = _dt2.date.fromisoformat(str(end_date))
    if d1 < d0:
        raise ValueError(f"end_date {d1} before start_date {d0}")
    metrics: dict[str, float] = {}
    ok = failed = 0
    day = d0
    while day <= d1:
        try:
            b2s = bronze_to_silver(
                spark, bronze_path, silver_path,
                run_date=day, validate=validate,
            )
            s2g = silver_to_gold(spark, silver_path, gold_path, run_date=day)
            for k, v in b2s.metrics.items():
                metrics[f"{day}.b2s.{k}"] = float(v or 0)
            for k, v in s2g.metrics.items():
                metrics[f"{day}.s2g.{k}"] = float(v or 0)
            ok += 1
        except Exception:
            if on_error == "fail":
                raise
            failed += 1
            metrics[f"{day}.failed"] = 1.0
        day += _dt2.timedelta(days=1)
    metrics["dates_ok"] = float(ok)
    metrics["dates_failed"] = float(failed)
    return PipelineResult(
        output_paths={"silver": silver_path, "gold": gold_path},
        metrics=metrics,
    )

#!/usr/bin/env python
"""Headless rendition of the reference's Streamlit dashboard.

The reference's most user-visible artifact is ``src/dashboard/app.py``:
five Streamlit pages of pandas pivots over the Gold tables. This script
renders the same five panels (``app.py:180-346``) as DISTRIBUTED Spark
plans over a Gold layer built by the engine's own medallion pipeline —
the operator mapping the dashboard relies on:

- last-reading-per-sensor  → ``aggregates.last_per_group``  (A11)
- ``pivot_table``          → ``aggregates.pivot_counts``    (A12)
- ``pd.cut`` health bins   → ``aggregates.histogram``       (A13)
- headline scalar metrics  → one ``agg`` pass               (A14)
- 30-min stale banner      → ``expectations.check_freshness``
  (``app.py:314-317`` — including the cache-TTL idea: the panels all
  read one cached Gold scan per table, not one scan per widget)

Usage:  python scripts/dashboard_queries.py [n_events]

Each panel prints its rows and the smoke assertions a CI run checks;
``tests/test_pipelines.py::test_dashboard_queries_headless`` drives
``render_panels`` directly and asserts the row shapes.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from streaming_etl_pipeline_spark.operators.aggregates import (  # noqa: E402
    histogram,
    last_per_group,
    pivot_counts,
)
from streaming_etl_pipeline_spark.pipelines.medallion import (  # noqa: E402
    bronze_to_silver,
    silver_to_gold,
)
from streaming_etl_pipeline_spark.quality.expectations import (  # noqa: E402
    check_freshness,
)
from streaming_etl_pipeline_spark.sources.generator import (  # noqa: E402
    generate_events,
)

SENSOR_TYPES = ["temperature", "humidity", "pressure", "vibration"]


def build_gold(spark: SparkSession, root: str, n_events: int = 200_000) -> dict:
    """Generate → bronze → silver → gold with the engine's pipeline."""
    bronze = os.path.join(root, "bronze")
    silver = os.path.join(root, "silver")
    gold = os.path.join(root, "gold")
    events = generate_events(spark, n_events).withColumn(
        "ingestion_time", F.col("event_time")
    )
    # the generator derives zone and sensor_type from the same id modulus,
    # so a type-filtered heatmap would collapse to one zone column; remap
    # the zone from a hash of (sensor_id, type) to decorrelate the demo
    events = events.withColumn(
        "location",
        F.concat(
            F.regexp_extract("location", r"(floor-\d+)-", 1),
            F.lit("-zone-"),
            F.element_at(
                F.array(*[F.lit(z) for z in "ABCD"]),
                (
                    F.crc32(F.concat("sensor_id", F.lit("|"), "sensor_type"))
                    % 4
                    + 1
                ).cast("int"),
            ),
        ),
    )
    events.write.mode("overwrite").parquet(bronze)
    bronze_to_silver(spark, bronze, silver, merge_with_existing=False)
    result = silver_to_gold(spark, silver, gold)
    return result.output_paths


def render_panels(spark: SparkSession, paths: dict) -> dict[str, DataFrame]:
    """The five dashboard pages as named DataFrames (collected only by
    the caller — a web tier would serve these directly)."""
    # one cached scan per Gold table = the dashboard's @st.cache_data TTL
    sensor = spark.read.parquet(paths["sensor_5min"]).cache()
    location = spark.read.parquet(paths["location_hourly"]).cache()
    daily = spark.read.parquet(paths["daily_summary"]).cache()

    panels: dict[str, DataFrame] = {}

    # -- Page 1: Overview (app.py:180-209) --------------------------------
    latest = last_per_group(
        sensor, keys=["sensor_id"], order_cols=["window_start", "sensor_type"]
    ).cache()
    panels["overview_metrics"] = latest.agg(
        F.count(F.lit(1)).alias("active_sensors"),
        F.avg(
            F.when(F.col("sensor_type") == "temperature", F.col("avg_value"))
        ).alias("avg_temperature"),
        (F.sum("reading_count") / 5.0).alias("events_per_min"),
        F.avg("sensor_health_pct").alias("avg_health_pct"),
    )
    panels["overview_by_type"] = (
        latest.groupBy("sensor_type")
        .agg(
            F.avg("avg_value").alias("avg"),
            F.min("min_value").alias("min"),
            F.max("max_value").alias("max"),
            F.count(F.lit(1)).alias("sensors"),
        )
        .orderBy("sensor_type")
    )

    # -- Page 2: Sensor Trends (app.py:212-239) ---------------------------
    # last hour of temperature windows, one avg_value column per sensor
    temp = sensor.filter(F.col("sensor_type") == "temperature")
    hi = temp.agg(F.max("window_start")).first()[0]
    recent = temp.filter(
        F.col("window_start") >= F.lit(hi) - F.expr("INTERVAL 1 HOUR")
    )
    ids = [r[0] for r in recent.select("sensor_id").distinct().orderBy("sensor_id").limit(8).collect()]
    panels["trend_chart"] = pivot_counts(
        recent.filter(F.col("sensor_id").isin(ids)),
        index_cols=["window_start"],
        pivot_col="sensor_id",
        pivot_values=ids,
        agg=F.avg("avg_value"),
    ).orderBy("window_start")
    panels["trend_low_health"] = recent.filter(
        F.col("sensor_health_pct") < 90
    ).select("window_start", "sensor_id", "sensor_health_pct")

    # -- Page 3: Location Heatmap (app.py:242-275) ------------------------
    temp_loc = location.filter(F.col("sensor_type") == "temperature")
    latest_hour = temp_loc.agg(F.max("window_start")).first()[0]
    current = temp_loc.filter(F.col("window_start") == F.lit(latest_hour)).select(
        F.regexp_extract("location", r"floor-(\d+)", 1).alias("floor"),
        F.regexp_extract("location", r"zone-([A-D])", 1).alias("zone"),
        "avg_value",
        "unique_sensor_id_count",
    )
    zones = ["A", "B", "C", "D"]
    panels["heatmap_values"] = pivot_counts(
        current, ["floor"], "zone", zones, agg=F.avg("avg_value")
    ).orderBy("floor")
    panels["heatmap_counts"] = pivot_counts(
        current, ["floor"], "zone", zones, agg=F.sum("unique_sensor_id_count")
    ).orderBy("floor")

    # -- Page 4: Anomaly Timeline (app.py:278-302) ------------------------
    panels["anomaly_chart"] = pivot_counts(
        daily, ["date"], "sensor_type", SENSOR_TYPES, agg=F.sum("anomaly_count")
    ).orderBy("date")
    panels["anomaly_metrics"] = daily.agg(
        F.sum("anomaly_count").alias("total_anomalies"),
        F.sum("total_readings").alias("total_readings"),
        (
            F.sum("anomaly_count") * 100.0 / F.sum("total_readings")
        ).alias("anomaly_rate_pct"),
    )

    # -- Page 5: Pipeline Health (app.py:305-346) -------------------------
    panels["health_readings_over_time"] = pivot_counts(
        daily, ["date"], "sensor_type", SENSOR_TYPES, agg=F.sum("total_readings")
    ).orderBy("date")
    panels["health_distribution"] = histogram(
        sensor, "sensor_health_pct", bins=[0.0, 50.0, 75.0, 90.0, 100.0001]
    ).orderBy("bucket")
    return panels


def main(argv: list[str] | None = None) -> int:
    from streaming_etl_pipeline_spark.session import build_session

    n = int((argv or sys.argv[1:] or ["200000"])[0])
    spark = build_session()
    with tempfile.TemporaryDirectory() as root:
        paths = build_gold(spark, root, n)
        # the stale-data banner (app.py:314-317): gold freshness vs now —
        # synthetic data is historical, so assert the mechanism, not "fresh"
        fresh = check_freshness(
            spark.read.parquet(paths["sensor_5min"]), "window_start",
            max_age_seconds=30 * 60,
        )
        banner = (
            "" if fresh["fresh"]
            else f"  [STALE: latest window {fresh['latest']}]"
        )
        print(f"== Pipeline freshness{banner}")
        panels = render_panels(spark, paths)
        for name, df in panels.items():
            rows = df.collect()
            print(f"\n== {name} ({len(rows)} rows)")
            for r in rows[:10]:
                print("  ", r.asDict())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

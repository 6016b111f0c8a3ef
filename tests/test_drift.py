"""Unit + streaming tests for quality/drift.py (PSI monitoring)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.quality.drift import psi

EDGES = [10.0, 20.0, 40.0]


def test_psi_identical_distributions_near_zero(spark):
    df = spark.range(4000).select((F.col("id") % 80).cast("double").alias("v"))
    row = psi(df, df, "v", EDGES).collect()[0]
    assert row.psi == 0.0 and row.drifted is False
    assert row.n_ref == row.n_cur == 4000


def test_psi_flags_shift_and_is_asymmetric_safe(spark):
    ref = spark.range(4000).select((F.col("id") % 40).cast("double").alias("v"))
    cur = ref.select((F.col("v") * 3).alias("v"))  # mass into top bins
    row = psi(ref, cur, "v", EDGES).collect()[0]
    assert row.psi > 0.25 and row.drifted is True
    # empty-bin safety: a snapshot entirely in one bin still yields a
    # finite PSI thanks to Laplace smoothing
    spike = spark.range(100).select(F.lit(15.0).alias("v"))
    row2 = psi(ref, spike, "v", EDGES).collect()[0]
    assert row2.psi == row2.psi  # not NaN
    assert row2.drifted is True


def test_psi_streaming_monitor_per_batch(spark, tmp_path):
    """PSI as a streaming monitor: foreachBatch compares every micro-batch
    against a static reference window — the Spark-native analogue of the
    reference's Prometheus alert rules."""
    src = str(tmp_path / "src")
    ref = spark.range(2000).select((F.col("id") % 40).cast("double").alias("v"))
    spark.range(2000).select(
        ((F.col("id") % 40) * 3.0).alias("v")
    ).write.parquet(src)

    alerts = []

    def monitor(batch_df, batch_id):
        row = psi(ref, batch_df, "v", EDGES).collect()[0]
        if row.drifted:
            alerts.append((batch_id, row.psi))

    q = (
        spark.readStream.schema("v double").parquet(src)
        .writeStream.foreachBatch(monitor)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert alerts and alerts[0][1] > 0.25

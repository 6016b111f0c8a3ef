"""Alert evaluator (quality/alerts.py) — the engine's mirror of the
reference's Prometheus alert rules (monitoring/prometheus/alert_rules.yml),
including the pending→firing `for:` semantics."""

from __future__ import annotations

from streaming_etl_pipeline_spark.quality.alerts import (
    AlertEvaluator,
    reference_rules,
    snapshot_from_progress,
)


def _eval():
    return AlertEvaluator(reference_rules())


def test_producer_down_needs_two_consecutive_empty_triggers():
    ev = _eval()
    assert ev.observe({"num_input_rows": 0}) == []          # pending
    assert ev.pending() == {"ProducerDown": 1}
    fired = ev.observe({"num_input_rows": 0})               # firing
    assert [a.name for a in fired] == ["ProducerDown"]
    # stays asserted while violating, resets on one healthy snapshot
    assert [a.name for a in ev.observe({"num_input_rows": 0})] == ["ProducerDown"]
    assert ev.observe({"num_input_rows": 500}) == []
    assert ev.observe({"num_input_rows": 0}) == []          # streak restarted


def test_quality_failures_fire_immediately_and_latency_needs_streak():
    ev = _eval()
    fired = ev.observe({"quality_failures": 3, "trigger_duration_s": 90.0})
    assert [a.name for a in fired] == ["DataQualityFailures"]
    fired = ev.observe({"quality_failures": 1, "trigger_duration_s": 90.0})
    assert {a.name for a in fired} == {"DataQualityFailures", "HighProcessingLatency"}
    assert fired[0].severity in ("warning", "critical")


def test_lag_and_anomaly_thresholds_match_reference():
    ev = _eval()
    bad = {"backlog_rows": 10_001, "anomaly_rate": 0.11, "num_input_rows": 7}
    assert ev.observe(bad) == []
    assert {a.name for a in ev.observe(bad)} == {"HighConsumerLag", "AnomalyRateSpike"}
    # exactly at threshold = healthy (strict >, as in the reference exprs)
    ev2 = _eval()
    ok = {"backlog_rows": 10_000, "anomaly_rate": 0.10, "num_input_rows": 7}
    assert ev2.observe(ok) == [] and ev2.observe(ok) == []
    assert ev2.pending() == {}


def test_missing_metrics_are_healthy():
    ev = _eval()
    assert ev.observe({}) == []
    assert ev.pending() == {}


def test_snapshot_from_real_streaming_progress(spark, tmp_path):
    """Feed REAL MetricsListener progress events through the adapter and
    evaluator: a healthy availableNow run fires nothing; its final
    snapshots show real input rows and sub-threshold latency."""
    import time

    from pyspark.sql import functions as F

    from streaming_etl_pipeline_spark.streaming.ingest import MetricsListener

    src = str(tmp_path / "src")
    spark.range(1000).select(F.col("id"), (F.col("id") % 5).alias("g")).write.parquet(src)

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.schema("id long, g long").parquet(src)
            .groupBy("g").count()
            .writeStream.format("noop").outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        deadline = time.time() + 30
        while not listener.progress and time.time() < deadline:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    assert listener.progress, "listener saw no progress events"
    ev = _eval()
    fired = []
    for p in listener.progress:
        fired += ev.observe(snapshot_from_progress(p))
    assert fired == []
    snap = snapshot_from_progress(listener.progress[0])
    assert snap["num_input_rows"] == 1000
    assert 0 <= snap["trigger_duration_s"] < 60

#!/usr/bin/env python
"""S1 end-to-end smoke: real Kafka broker → ``read_kafka_stream`` →
``parse_events`` → bronze parquet, with row-level parity against the
producer's events (reference ``src/consumers/spark_streaming.py:79-87``
consumes the same topic shape from ``sensor_simulator.py:120``).

Usage:
    python scripts/kafka_smoke.py <bootstrap-servers> [topic] [n_events]

Runs in its OWN SparkSession/JVM so the Kafka connector can be attached:
``$SPARK_GRAFT_KAFKA_PACKAGES`` (a ``spark.jars.packages`` coordinate,
default ``org.apache.spark:spark-sql-kafka-0-10_2.13:<pyspark version>``,
fetched via ivy) or ``$SPARK_GRAFT_KAFKA_JARS`` (comma-separated local
jar paths — air-gapped clusters). The producer side is Spark's own batch
Kafka sink, so no Python Kafka client is needed.

Prints ONE JSON line: ``{"produced": N, "bronze": N, "dead_letter": 0,
"match": true}`` and exits 0 on full parity. ``tests/test_streaming.py``
invokes this under a skip-unless-broker gate; deployers run it directly
against a real cluster before first rollout.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    bootstrap = sys.argv[1]
    topic = sys.argv[2] if len(sys.argv) > 2 else "sensor-events-smoke"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    import pyspark

    extra: dict[str, str] = {}
    jars = os.environ.get("SPARK_GRAFT_KAFKA_JARS")
    if jars:
        extra["spark.jars"] = jars
    else:
        extra["spark.jars.packages"] = os.environ.get(
            "SPARK_GRAFT_KAFKA_PACKAGES",
            "org.apache.spark:spark-sql-kafka-0-10_2.13:"
            + pyspark.__version__,
        )

    from streaming_etl_pipeline_spark.session import build_session
    from streaming_etl_pipeline_spark.sources.generator import (
        events_as_json,
        generate_events,
    )
    from streaming_etl_pipeline_spark.streaming.ingest import (
        parse_events,
        read_kafka_stream,
        start_bronze_sink,
        start_dead_letter_sink,
    )

    spark = build_session(app_name="kafka-smoke", extra_conf=extra)

    events = generate_events(spark, n).cache()
    produced = events.count()

    # produce via Spark's batch Kafka sink — same connector, no extra client
    (
        events_as_json(events)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )

    with tempfile.TemporaryDirectory() as tmp:
        bronze_path = os.path.join(tmp, "bronze")
        dead_path = os.path.join(tmp, "dead")
        raw = read_kafka_stream(
            spark, bootstrap, topic, starting_offsets="earliest"
        )
        bronze, dead = parse_events(raw)
        q1 = start_bronze_sink(
            bronze, bronze_path, os.path.join(tmp, "ck1"),
            trigger={"availableNow": True},
        )
        q2 = start_dead_letter_sink(
            dead, dead_path, os.path.join(tmp, "ck2"),
            trigger={"availableNow": True},
        )
        q1.awaitTermination(300)
        q2.awaitTermination(300)

        got = spark.read.parquet(bronze_path)
        n_bronze = got.count()
        try:
            n_dead = spark.read.json(dead_path).count()
        except Exception:
            n_dead = 0  # empty dead-letter dir → no files written

        from pyspark.sql import functions as F

        key = ("sensor_id", "sensor_type", "value", "unit", "location")
        want_set = {
            tuple(r)
            for r in events.select(
                *key, F.col("timestamp").cast("timestamp").alias("et")
            ).collect()
        }
        got_set = {
            tuple(r)
            for r in got.select(
                *key, F.col("event_time").alias("et")
            ).collect()
        }
        match = want_set == got_set and n_bronze == produced

    print(
        json.dumps(
            {
                "produced": produced,
                "bronze": n_bronze,
                "dead_letter": n_dead,
                "match": bool(match),
            }
        )
    )
    return 0 if match and n_dead == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

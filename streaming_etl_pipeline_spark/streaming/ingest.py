"""Structured Streaming ingest: raw JSON events → Bronze + dead-letter.

Re-expresses the reference's streaming consumer
(``src/consumers/spark_streaming.py:48-164``) Spark-first:

- S1 source: Kafka in production (``spark.readStream.format("kafka")``) or
  a file/rate source locally — everything downstream sees the same
  ``(raw_value string, source_timestamp timestamp)`` shape, so the source
  is swappable without touching the pipeline (no broker needed in CI);
- P8 parse: ``from_json`` with a declared schema (inference disabled),
  null struct → malformed;
- P5/S4 split: one parsed stream feeds both the Bronze projection and the
  dead-letter projection (error metadata + raw payload);
- T1 watermark (10 min), T2 processing-time trigger / availableNow for
  tests, T3 append mode, T4 per-sink checkpoints (the DLQ checkpoint gets
  the reference's ``_dead_letter`` suffix).

Scale: the only state in this topology is the file-sink commit log; the
parse/split is stateless and scales linearly with partitions. Downstream
windowed aggregation belongs in the batch Gold layer (T7 hybrid design,
``docs/INTERVIEW_PREP.md:29-31``) or a separate watermarked streaming agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

#: Event schema — reference ``spark_streaming.py:26-33``.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType(), False),
        T.StructField("sensor_type", T.StringType(), False),
        T.StructField("timestamp", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("unit", T.StringType(), False),
        T.StructField("location", T.StringType(), True),
    ]
)

WATERMARK = "10 minutes"


def read_json_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """S1 (local flavor): file-based stream of JSON lines with the same
    downstream shape as the Kafka source."""
    reader = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
    )
    raw = reader.load(path)
    return raw.select(
        F.col("value").alias("raw_value"),
        F.current_timestamp().alias("source_timestamp"),
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1 (production flavor) — Kafka source with the reference's options
    (``spark_streaming.py:79-87``). Requires the Kafka connector jars."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .load()
    )
    return raw.select(
        F.col("value").cast("string").alias("raw_value"),
        F.col("timestamp").alias("source_timestamp"),
    )


def parse_events(
    raw: DataFrame, schema: T.StructType = EVENT_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """P8+P5 — parse and split one stream into (bronze, dead_letter).

    Bronze: flattened struct + ``event_time`` cast + ``ingestion_time`` +
    10-minute watermark (``spark_streaming.py:126-141``).
    Dead-letter: unparseable rows with error metadata
    (``spark_streaming.py:100-109``).
    """
    parsed = raw.withColumn("data", F.from_json(F.col("raw_value"), schema))
    # from_json in PERMISSIVE mode yields an all-null struct (not a NULL
    # struct) for malformed input on recent Spark, so "unparseable" means
    # the struct is null OR every required field is null.
    malformed = F.col("data").isNull() | (
        F.col("data.sensor_id").isNull()
        & F.col("data.timestamp").isNull()
        & F.col("data.value").isNull()
    )

    bronze = (
        parsed.filter(~malformed)
        .select("data.*", "source_timestamp")
        .withColumn("event_time", F.col("timestamp").cast("timestamp"))
        .drop("timestamp")
        .withColumn("ingestion_time", F.current_timestamp())
        .withWatermark("event_time", WATERMARK)
    )
    dead_letter = parsed.filter(malformed).select(
        F.col("raw_value"),
        F.current_timestamp().alias("error_time"),
        F.lit("JSON_PARSE_ERROR").alias("error_type"),
    )
    return bronze, dead_letter


def start_bronze_sink(
    bronze: DataFrame,
    path: str,
    checkpoint: str,
    trigger: dict | None = None,
    partition_by: str = "sensor_type",
) -> StreamingQuery:
    """S3 — append-mode partitioned parquet sink with checkpoint
    (``spark_streaming.py:144-153``). ``trigger`` e.g.
    ``{"processingTime": "30 seconds"}`` or ``{"availableNow": True}``."""
    writer = (
        bronze.writeStream.format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(partition_by)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def start_dead_letter_sink(
    dead_letter: DataFrame,
    path: str,
    checkpoint: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """S4 — dead-letter JSON sink; checkpoint suffixed ``_dead_letter``
    like the reference (``spark_streaming.py:112-121``)."""
    writer = (
        dead_letter.writeStream.format("json")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint + "_dead_letter")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def streaming_progress(query: StreamingQuery) -> dict:
    """T6 — rows/sec + batch duration from the last progress event
    (``spark_streaming.py:167-184``)."""
    p = query.lastProgress
    if not p:
        return {}
    return {
        "batchId": p.get("batchId"),
        "numInputRows": p.get("numInputRows"),
        "inputRowsPerSecond": p.get("inputRowsPerSecond"),
        "processedRowsPerSecond": p.get("processedRowsPerSecond"),
        "durationMs": p.get("durationMs", {}).get("triggerExecution"),
    }

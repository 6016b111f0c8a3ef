from streaming_etl_pipeline_spark.streaming.ingest import (  # noqa: F401
    EVENT_SCHEMA,
    KAFKA_WIRE_SCHEMA,
    MetricsListener,
    enrich_stream,
    join_streams,
    kafka_reader_options,
    parse_events,
    project_kafka,
    read_json_stream,
    read_jsonl_stream,
    read_kafka_stream,
    start_bronze_sink,
    start_dead_letter_sink,
    start_gold_jdbc_sink,
    start_gold_upsert_sink,
)
from streaming_etl_pipeline_spark.streaming.stateful import (  # noqa: F401
    dedup_within_watermark,
    streaming_sessionize,
)

"""streaming_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ``jmahotiedu/streaming-etl-pipeline`` (see SURVEY.md), plus
the large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB-scale clusters.

Layout
------
- ``session``     — SparkSession factory + runtime tuning
- ``sources``     — readers/writers (parquet layers, JSON events, generator)
- ``operators``   — relational operator library (cleaning, aggregates, joins,
                    dedup, similarity, text, multimodal)
- ``functions``   — reusable Column expression helpers (time buckets, hashes,
                    vector math) engineered for DuckDB-oracle parity
- ``quality``     — declarative expectation compiler + fail-fast runner
- ``streaming``   — Structured Streaming ingest (parse/DLQ/watermark/sinks)
- ``warehouse``   — star-schema builders (dim_time, idempotent loads, upserts)
"""

__version__ = "0.1.0"

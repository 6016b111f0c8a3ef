from streaming_etl_pipeline_spark.pipelines.medallion import (  # noqa: F401
    bronze_to_silver,
    silver_to_gold,
)

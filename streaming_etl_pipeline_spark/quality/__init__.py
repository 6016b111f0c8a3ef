from streaming_etl_pipeline_spark.quality.expectations import (  # noqa: F401
    Expectation,
    QualityError,
    Suite,
    bronze_suite,
    fk_check,
    row_count_ratio_check,
    silver_suite,
    validate,
    validate_or_raise,
)

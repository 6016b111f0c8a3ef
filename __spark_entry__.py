"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``streaming_etl_pipeline_spark`` package;
this module only adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from streaming_etl_pipeline_spark.plans import corpus  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's gold_sensor_5min shape
    (silver_to_gold.py:44-92) over the events table: 5-minute tumbling
    window stats per entity with exact percentiles.
    """
    return corpus.QUERIES["sensor_5min"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator group from SURVEY.md §2.

    The driver gates at most the first 50 entries, so this exports the
    curated ≤50-name DRIVER_SET (plans/corpus_merged.py): every declared
    operator is either its own entry or value-verified inside a merged
    entry (COVERED_BY documents the mapping). The full granular registry
    remains locally gated via scripts/check_oracle.py."""
    return corpus.driver_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (omitted for genuinely
    non-SQL-expressible ops → rows-only check)."""
    return corpus.driver_oracle_sql()

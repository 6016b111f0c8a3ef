"""Differential gate: every corpus query must hash-match its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from streaming_etl_pipeline_spark.plans import corpus
from streaming_etl_pipeline_spark.plans import differential as d

from conftest import SF_ORACLE


@pytest.fixture(scope="module")
def duck():
    return d.duck_connect(SF_ORACLE)


@pytest.mark.parametrize("name", list(corpus.QUERIES))
def test_query_matches_oracle(spark, duck, name):
    res = d.run_one(spark, duck, SF_ORACLE, name)
    assert res.ok, f"{name}: {res.detail}"

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


def test_uncast_hugeint_sum_fails_driver_parity(spark, duck, monkeypatch):
    """A deliberately uncast ``sum(int)`` oracle twin must FAIL the local
    gate even though fetchall() values match — DuckDB types it HUGEINT, which
    the driver's pandas canonicalizer renders float64 ('1.0' vs Spark '1').
    Round 3 shipped exactly this bug; this pins the guard that stops it."""

    def fn(sp, sf_dir):
        from pyspark.sql import functions as F

        from streaming_etl_pipeline_spark.sources.io import read_table

        return (
            read_table(sp, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(F.sum(F.lit(1)).alias("n"))
        )

    bad = corpus.QuerySpec(
        fn=fn,
        sql="SELECT o_orderstatus, sum(1) AS n FROM orders GROUP BY o_orderstatus",
    )
    monkeypatch.setitem(corpus.QUERIES, "_bad_hugeint_probe", bad)
    res = d.run_one(spark, duck, SF_ORACLE, "_bad_hugeint_probe")
    assert not res.ok
    assert "HUGEINT" in res.detail

    good = corpus.QuerySpec(
        fn=fn,
        sql=(
            "SELECT o_orderstatus, CAST(sum(1) AS BIGINT) AS n "
            "FROM orders GROUP BY o_orderstatus"
        ),
    )
    monkeypatch.setitem(corpus.QUERIES, "_bad_hugeint_probe", good)
    res = d.run_one(spark, duck, SF_ORACLE, "_bad_hugeint_probe")
    assert res.ok, res.detail


def test_uncast_decimal_vs_double_fails_driver_parity(spark, duck, monkeypatch):
    """Oracle DECIMAL against a Spark double must fail the gate even when
    the values agree numerically — Decimal str() keeps scale zeros
    ('2.50' vs repr(2.5)='2.5') in the driver's canonicalizer."""

    def fn(sp, sf_dir):
        from pyspark.sql import functions as F

        from streaming_etl_pipeline_spark.sources.io import read_table

        return (
            read_table(sp, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(F.lit(2.5).alias("x"))
        )

    bad = corpus.QuerySpec(
        fn=fn,
        sql=(
            "SELECT o_orderstatus, 2.5 AS x "  # bare literal → DECIMAL(2,1)
            "FROM orders GROUP BY o_orderstatus"
        ),
    )
    monkeypatch.setitem(corpus.QUERIES, "_bad_decimal_probe", bad)
    res = d.run_one(spark, duck, SF_ORACLE, "_bad_decimal_probe")
    assert not res.ok and "DECIMAL" in res.detail

    good = corpus.QuerySpec(
        fn=fn,
        sql=(
            "SELECT o_orderstatus, 2.5::DOUBLE AS x "
            "FROM orders GROUP BY o_orderstatus"
        ),
    )
    monkeypatch.setitem(corpus.QUERIES, "_bad_decimal_probe", good)
    res = d.run_one(spark, duck, SF_ORACLE, "_bad_decimal_probe")
    assert res.ok, res.detail


def test_double_vs_integral_drift_fails_driver_parity(spark, duck, monkeypatch):
    """Third guard branch (rewritten in r5 to work from the fetched
    (types, tuples) without re-executing the oracle): an oracle DOUBLE
    column against a Spark integral column renders '1.0' vs '1' in the
    driver's pandas canonicalizer — must fail here first. Nullable
    integral columns are exempt (both sides go float64+NaN)."""

    def fn(sp, sf_dir):
        from pyspark.sql import functions as F

        from streaming_etl_pipeline_spark.sources.io import read_table

        return (
            read_table(sp, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))  # Spark long
        )

    bad = corpus.QuerySpec(
        fn=fn,
        sql=(
            "SELECT o_orderstatus, CAST(count(*) AS DOUBLE) AS n "
            "FROM orders GROUP BY o_orderstatus"
        ),
    )
    monkeypatch.setitem(corpus.QUERIES, "_bad_drift_probe", bad)
    res = d.run_one(spark, duck, SF_ORACLE, "_bad_drift_probe")
    assert not res.ok and "float64" in res.detail

    good = corpus.QuerySpec(
        fn=fn,
        sql=(
            "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n "
            "FROM orders GROUP BY o_orderstatus"
        ),
    )
    monkeypatch.setitem(corpus.QUERIES, "_bad_drift_probe", good)
    res = d.run_one(spark, duck, SF_ORACLE, "_bad_drift_probe")
    assert res.ok, res.detail

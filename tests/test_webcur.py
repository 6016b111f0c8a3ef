"""URL/domain curation operators (operators/webcur.py)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from streaming_etl_pipeline_spark.operators import webcur as W


def _norm(spark, url: str) -> str:
    return (
        spark.createDataFrame([Row(url=url)])
        .select(W.normalize_url("url").alias("n"))
        .first()["n"]
    )


def test_normalize_url_rules(spark):
    # case, default port, www., fragment, trailing slash, tracking
    # params stripped, surviving params sorted
    assert (
        _norm(spark, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#f")
        == "https://example.com/a/b?a=1&b=2"
    )
    assert _norm(spark, "http://example.org/") == "http://example.org"
    # all-tracking query drops the '?' entirely
    assert _norm(spark, "https://example.org/p?fbclid=zz") == "https://example.org/p"


def test_registrable_domain_heuristic(spark):
    hosts = [
        ("news.example.co.uk", "example.co.uk"),
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("shop.example.com.au", "example.com.au"),
    ]
    df = spark.createDataFrame([Row(host=h) for h, _ in hosts])
    got = [r.d for r in df.select(W.registrable_domain("host").alias("d")).collect()]
    assert got == [want for _, want in hosts]


def test_domain_cap_orders_and_skew_variant_matches(spark):
    rows = [
        Row(doc_id=i, domain="hot.com" if i < 40 else "cold.com", n_chars=1000 - i)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows)
    plain = W.domain_cap(df, cap=5)
    kept = sorted(r.doc_id for r in plain.filter("kept").collect())
    # highest n_chars = lowest doc_id within each domain
    assert kept == [0, 1, 2, 3, 4, 40, 41, 42, 43, 44]
    skewed = W.domain_cap(df, cap=5, skew=4)
    assert sorted(
        (r.domain, r.doc_id, r.domain_rank) for r in plain.filter("kept").collect()
    ) == sorted(
        (r.domain, r.doc_id, r.domain_rank) for r in skewed.filter("kept").collect()
    )


def test_blocklist_filter_anti_join(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, domain=d) for i, d in enumerate(["a.com", "b.com", "a.com"])]
    )
    bl = spark.createDataFrame([Row(domain="a.com")])
    out = W.blocklist_filter(docs, bl)
    assert [r.domain for r in out.collect()] == ["b.com"]

"""functions/urlcanon.py + perplexity.ppl_buckets semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.urlcanon import (canonical_dedup,
                                                          canonical_url)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", canonical_url(F.col("url")).alias("c")).collect()
    return {r["url"]: r["c"] for r in rows}


def test_canonical_forms(spark):
    got = _canon(spark, [
        "HTTPS://Host3.Example:443/p/9",          # case + default port
        "http://a.example:80/x",                  # http default port
        "http://a.example:8080/x",                # non-default kept
        "https://a.example/p/9#frag",             # fragment dropped
        "https://a.example/p/9/",                 # trailing slash
        "https://a.example/",                     # root slash kept
        "https://a.example",                      # empty path -> /
        "https://a.example/p?utm_source=f&b=2&a=1",  # drop utm, sort
        "https://a.example/p?utm_source=f&gclid=1",  # all tracked -> no ?
        "not-a-url-5",                            # passthrough
    ])
    assert got["HTTPS://Host3.Example:443/p/9"] == \
        "https://host3.example/p/9"
    assert got["http://a.example:80/x"] == "http://a.example/x"
    assert got["http://a.example:8080/x"] == "http://a.example:8080/x"
    assert got["https://a.example/p/9#frag"] == "https://a.example/p/9"
    assert got["https://a.example/p/9/"] == "https://a.example/p/9"
    assert got["https://a.example/"] == "https://a.example/"
    assert got["https://a.example"] == "https://a.example/"
    assert got["https://a.example/p?utm_source=f&b=2&a=1"] == \
        "https://a.example/p?a=1&b=2"
    assert got["https://a.example/p?utm_source=f&gclid=1"] == \
        "https://a.example/p"
    assert got["not-a-url-5"] == "not-a-url-5"


def test_fragment_query_not_resurrected(spark):
    """A '?' inside the fragment must not become a query: the fragment
    is dropped entirely, and the canonical key must not collide with
    the genuinely-querystringed url."""
    got = _canon(spark, [
        "https://h.example/p#frag?x=1",     # ? lives in the fragment
        "https://h.example/p?x=1",          # real query
        "https://h.example/p?a=1#frag?b=2",  # real query + tricky frag
    ])
    assert got["https://h.example/p#frag?x=1"] == "https://h.example/p"
    assert got["https://h.example/p?x=1"] == "https://h.example/p?x=1"
    assert got["https://h.example/p?a=1#frag?b=2"] == \
        "https://h.example/p?a=1"


def test_fragment_query_oracle_parity(spark):
    """Spark and DuckDB canonical forms stay byte-identical on
    fragment-with-question-mark urls."""
    import duckdb

    from nacc_form_validator_spark.functions.urlcanon import (
        canonical_url_sql)
    urls = ["https://h.example/p#frag?x=1",
            "https://h.example/p?a=1#f?b=2",
            "https://h.example/p?utm_source=z&k=v#g?utm_x=1",
            "https://h.example/#?",
            "not-a-url#?x"]
    spark_out = _canon(spark, urls)
    con = duckdb.connect()
    for u in urls:
        duck = con.execute(
            f"SELECT {canonical_url_sql('url')} "
            f"FROM (SELECT ? AS url)", [u]).fetchone()[0]
        assert spark_out[u] == duck, u


def test_canonical_dedup_keeps_smallest_raw(spark):
    df = spark.createDataFrame(
        [("https://a.example/p/9/",),
         ("HTTPS://A.Example:443/p/9",),
         ("https://b.example/q",)], "url string")
    out = {r["url"]: r["url_keep"] for r in canonical_dedup(df).collect()}
    # bytewise-smallest raw url of the collapsed group keeps
    assert out["HTTPS://A.Example:443/p/9"] is True
    assert out["https://a.example/p/9/"] is False
    assert out["https://b.example/q"] is True


def test_ppl_buckets_tertiles_and_nulls(spark):
    from nacc_form_validator_spark.functions.perplexity import ppl_buckets
    rows = [(i, "en", "aaaa " * (i + 1)) for i in range(6)]
    rows.append((6, "en", ""))         # null ppl -> tail
    rows.append((7, "fr", "bbbb"))     # single-doc language -> tail
    df = spark.createDataFrame(rows, "doc_id long, lang string, "
                               "text string")
    out = {r["id"]: r["bucket"] for r in ppl_buckets(df).collect()}
    en = [out[i] for i in range(6)]
    assert sorted(en) == ["head", "head", "middle", "middle", "tail",
                          "tail"]
    assert out[6] == "tail"
    # n=1: rn*3=3 > n=1 and > 2n=2 -> tail
    assert out[7] == "tail"

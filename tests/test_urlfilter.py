"""URL/host blocklist gate (functions/urlfilter.py): host-parse
differential vs DuckDB, domain grouping, list and broadcast-df paths."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.urlfilter import (domain_key,
                                                           domain_key_sql,
                                                           url_host,
                                                           url_host_sql,
                                                           with_url_filter)

URLS = [
    "https://www.example.com/path?q=1",
    "http://sub.deep.example.co.uk:8080/x",
    "https://user:pw@secret.example.org/y",
    "HTTPS://UPPER.EXAMPLE.COM/Z",
    "ftp://files.example.net/a/b",
    "not a url at all",
    "relative/path/only",
    "https://nopath.example",
]


def test_host_parse_differential(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = [r[0] for r in
           df.select(url_host(F.col("url"))).collect()]
    con = duckdb.connect()
    want = [r[0] for r in con.execute(
        f"SELECT {url_host_sql('u')} FROM (SELECT unnest(?) AS u)",
        [URLS]).fetchall()]
    assert got == want
    assert got[0] == "www.example.com"
    assert got[1] == "sub.deep.example.co.uk"   # port stripped
    assert got[2] == "secret.example.org"       # userinfo stripped
    assert got[3] == "upper.example.com"        # lowercased
    assert got[5] == "" and got[6] == ""        # unparseable -> ''


def test_domain_key_differential(spark):
    hosts = ["www.example.com", "a.b.c.d.example.org", "example",
             "x.y", ""]
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = [r[0] for r in df.select(domain_key(F.col("h"))).collect()]
    con = duckdb.connect()
    want = [r[0] for r in con.execute(
        f"SELECT {domain_key_sql('h')} FROM (SELECT unnest(?) AS h)",
        [hosts]).fetchall()]
    assert got == want
    assert got[0] == "example.com"
    assert got[1] == "example.org"
    assert got[2] == "example"   # fewer labels than levels: unchanged
    assert got[3] == "x.y"


def test_blocklist_paths_agree(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    via_list = with_url_filter(
        df, blocked_hosts=["www.example.com", "UPPER.example.com"])
    blk = spark.createDataFrame(
        [("www.example.com",), ("upper.EXAMPLE.com",)], "host string")
    via_df = with_url_filter(df, blocklist_df=blk)
    a = [(r["url"], r["url_blocked"]) for r in
         via_list.orderBy("url").collect()]
    b = [(r["url"], r["url_blocked"]) for r in
         via_df.orderBy("url").collect()]
    assert a == b
    assert dict(a)["https://www.example.com/path?q=1"] is True
    assert dict(a)["HTTPS://UPPER.EXAMPLE.COM/Z"] is True
    assert dict(a)["ftp://files.example.net/a/b"] is False


def test_domain_blocking(spark):
    df = spark.createDataFrame(
        [("https://a.spam.example/x",), ("https://b.spam.example/y",),
         ("https://ok.example/z",)], "url string")
    out = with_url_filter(df, blocked_domains=["spam.example"])
    got = {r["url"]: r["url_blocked"] for r in out.collect()}
    assert got == {"https://a.spam.example/x": True,
                   "https://b.spam.example/y": True,
                   "https://ok.example/z": False}


def test_blocklist_df_is_broadcast(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    blk = spark.createDataFrame([("www.example.com",)], "host string")
    plan = (with_url_filter(df, blocklist_df=blk)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

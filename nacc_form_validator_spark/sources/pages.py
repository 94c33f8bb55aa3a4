"""pages table source (BASELINE.json input_hint shape).

``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — Common-Crawl-style web pages with recrawls of the same
url as the longitudinal dimension (subject ≡ url ≡ the reference's
pk_field, visit order ≡ warc_ts ≡ orderby, quality_check.py:38 /
datastore.py:15-22).

Built deterministically from the driver-provided ``documents`` parquet
(TESTDATA.md) — Spark-native generation, no driver-side loops, no external
data.  Hosts follow a Zipf-ish skew so hot-host salting is exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: hosts with power-law-ish weights: host0 gets ~50% of urls
_HOST_BUCKETS = 16


def pages_from_documents(docs: DataFrame, recrawls: int = 3) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages.

    Each doc becomes 1..recrawls crawls of one url; host skew comes from a
    quadratic bucket mapping (bucket 0 absorbs ~ sqrt share of ids).
    """
    d = docs
    # zipf-ish: host = floor(sqrt(doc_id mod H^2)) concentrates low buckets
    host = F.floor(F.sqrt(F.col("doc_id") % (_HOST_BUCKETS * _HOST_BUCKETS)))
    d = d.withColumn("__host", host.cast("int"))
    d = d.withColumn(
        "url",
        F.concat(F.lit("https://host"), F.col("__host"),
                 F.lit(".example/p/"), F.col("doc_id")))
    n_crawls = (F.col("doc_id") % recrawls + 1).cast("int")
    d = d.withColumn("__crawl", F.explode(F.sequence(F.lit(0),
                                                     n_crawls - 1)))
    base_ts = F.to_timestamp(F.lit("2025-01-01 00:00:00"))
    d = d.withColumn(
        "warc_ts",
        base_ts + F.make_interval(days=F.col("__crawl") * 7,
                                  mins=(F.col("doc_id") % 1440).cast("int")))
    # recrawl text drift: later crawls append a deterministic suffix
    text = F.when(F.col("__crawl") == 0, F.col("text")).otherwise(
        F.concat(F.col("text"), F.lit(" update"), F.col("__crawl")))
    d = d.withColumn("text", text)
    d = d.withColumn(
        "html",
        F.encode(
            F.concat(F.lit("<html><body><p>"), F.col("text"),
                     F.lit("</p></body></html>")), "utf-8"))
    return d.select("url", "warc_ts", "html", "text", "lang")


def synthetic_pages(spark: SparkSession, n_docs: int = 10000,
                    recrawls: int = 3) -> DataFrame:
    """Fully synthetic pages at arbitrary scale via spark.range — used by
    the scaling bench where document count must exceed the testdata size.

    Deterministic in (n_docs, recrawls); text mixes clean word soup,
    short docs, symbol-heavy docs, repeated lines and PII-bearing docs so
    every pipeline stage exercises.
    """
    d = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    words = ("the quick brown fox jumps over the lazy dog and runs to the "
             "old mill with some good text for quality checks").split()
    soup = F.concat_ws(
        " ", *[
            F.element_at(
                F.array(*[F.lit(w) for w in words]),
                ((F.col("doc_id") * (i + 7) + i * i) % len(words) +
                 1).cast("int")) for i in range(40)
        ])
    text = soup
    mod = F.col("doc_id") % 17
    text = F.when(mod == 0, F.lit("short"))\
        .when(mod == 1, F.concat(soup, F.lit(" $$$ ###!!! @@@ %%% ^^^ &&& "
                                             "*** ((( ))) ::: ;;; !!!")))\
        .when(mod == 2, F.concat(soup, F.lit(" contact me at "
                                             "john.doe@example.com now")))\
        .when(mod == 3, F.concat(soup, F.lit(" call 1-555-123-4567 or ssn "
                                             "123-45-6789")))\
        .when(mod == 4, F.concat_ws("\n", soup, soup, soup))\
        .when(mod == 5, F.lit("el la de que y en los del se las palabras "
                              "y frases en el texto de la prueba"))\
        .when(mod == 6, F.lit("der die und das ist von den mit im nicht "
                              "text aus der prüfung heute"))\
        .otherwise(text)
    lang = F.when(mod == 5, "es").when(mod == 6, "de").otherwise(F.lit("en"))
    d = d.withColumn("text", text).withColumn("lang", lang)
    d = d.withColumn("n_chars", F.length("text")).withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 20)))
    return pages_from_documents(d, recrawls=recrawls)


def pages_from_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV record source (the reference's bulk-ingestion shape,
    docs/validate_csv_records.py:90-100): every value arrives as a
    string — exactly the contract the cast stage expects
    (nacc_validator.py:207-257) — so ``html`` is carried as its
    base64/utf8 string form and ``warc_ts`` parses via the engine's
    dateutil-parity cast, not Spark's CSV timestamp inference."""
    return (spark.read.option("header", "true")
            .option("inferSchema", "false")
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path))

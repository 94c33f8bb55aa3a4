"""Corpus TF-IDF keyword extraction.

Per-document top-k terms by tf-idf over the whole corpus — the standard
keyword/fingerprint stage of a training-data pipeline (topic tagging,
cluster labeling, search-side features).  Beyond the reference's
per-record surface (it has no corpus statistics — SURVEY.md §2.7).

Scale shape: words leave the document as (id, word) pairs once; term
frequencies are one partial-agg shuffle keyed (id, word); document
frequencies one agg keyed word (count_distinct id resolves map-side per
word); idf joins back by word (AQE picks broadcast when the vocabulary
fits, shuffle join otherwise — no forced hint, vocabulary is unbounded);
the final top-k is one window over id.  Nothing ever shuffles document
text.

Determinism for the value oracle: idf uses exact integer inputs, the
score is rounded to 6 decimals BEFORE ranking, and rank ties break on
the term string — so Spark and DuckDB rank identically even if their
libm ln() differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.dedup import normalized


def tfidf_topk(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", k: int = 5,
               min_df: int = 1) -> DataFrame:
    """(id, word, tfidf, rank): the ``k`` highest-tf-idf words per doc.

    tf = in-doc occurrences; idf = ln((N + 1) / (df_word + 1)) + 1
    (smoothed, sklearn-style); score rounded to 6.  ``min_df`` drops
    hapax noise before ranking.
    """
    pairs = (df.select(F.col(id_col).alias("id"),
                       F.explode(
                           F.filter(F.split(normalized(F.col(text_col)),
                                            " "),
                                    lambda x: x != "")).alias("word")))
    tf = pairs.groupBy("id", "word").agg(F.count("*").alias("tf"))
    dfreq = (pairs.groupBy("word")
             .agg(F.count_distinct("id").alias("dfw"))
             .where(F.col("dfw") >= min_df))
    n_docs = df.select(
        F.count_distinct(id_col).alias("n_docs"))
    scored = (tf.join(dfreq, "word")
              .crossJoin(F.broadcast(n_docs))
              .select(
                  "id", "word",
                  F.round(
                      F.col("tf") *
                      (F.log((F.col("n_docs") + 1) /
                             (F.col("dfw") + 1)) + 1), 6).alias("tfidf")))
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(),
                                         F.col("word").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .orderBy("id", "rank"))

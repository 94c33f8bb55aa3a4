"""BM25 top-k retrieval over the filtered corpus.

The retrieval workload a RAG-data pipeline runs against the inverted
index it froze (operators/index.py): score every document containing a
query term with Okapi BM25 (Lucene's idf variant) and keep the best k
per query.  Mirrors the reference's "compile once, validate many"
discipline (datastore.py lookups against a frozen index): the corpus
statistics (tf, df, doc length) are the frozen artifact; queries are
the cheap, repeated probes.

Scale shape (10^12 docs, 1000 executors):
- the corpus is touched ONCE: tokenize + explode map-side, then one
  (token, doc) aggregate and one doc-length aggregate — the same two
  shuffles the inverted-index build pays;
- the query-term table is tiny and BROADCAST: joining it against the
  term-frequency table semi-filters the corpus to postings of query
  terms only, so nothing corpus-sized moves after the tf aggregate;
- N and avgdl are 1-row aggregates joined via broadcast, never a
  driver collect;
- per-query ranking windows partition by query id over candidate rows
  only (bounded by the df of the query's terms — ``max_df_ratio`` on
  the index build is the stopword guard that keeps that bounded).

Scores round to 6 decimals BEFORE ranking (the repo-wide fp-tie
idiom, see operators/simsearch.py) so Spark and the DuckDB oracle
rank identically.
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.index import TOKEN_SPLIT_RE


def _tokens(col):
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE),
                    lambda s: s != "")


def bm25_topk(docs: DataFrame, queries: Sequence[Tuple[str, str]],
              k: int = 5, k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id"
              ) -> DataFrame:
    """(q_id, id, score, rank) — best ``k`` documents per query by
    BM25 with idf = ln(1 + (N - df + 0.5) / (df + 0.5)) (Lucene's
    non-negative variant) and the standard tf saturation
    tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)).

    ``queries`` is a small in-driver list of (q_id, query_text) pairs
    — the probe side, tokenized with the index tokenizer and
    deduplicated per query so repeated terms score once (Lucene
    semantics for duplicate query terms is summed, but the DuckDB
    oracle and this operator agree on DISTINCT terms, which is the
    common bag-of-words retrieval form).
    """
    spark = docs.sparkSession
    tok = docs.select(F.col(id_col).alias("id"),
                      _tokens(F.col(text_col)).alias("__t"))
    # doc length BEFORE exploding (free per-row size) + tf after
    dl = tok.select("id", F.size("__t").alias("dl"))
    tf = (tok.select("id", F.explode("__t").alias("token"))
          .groupBy("token", "id").agg(F.count("*").alias("tf")))
    stats = dl.agg(F.count("*").alias("__n"),
                   F.avg("dl").alias("__avgdl"))
    qrows = [(str(qid), t) for qid, qtext in queries
             for t in sorted({w for w in re.split("[^a-z0-9]+",
                                                  qtext.lower()) if w})]
    q = spark.createDataFrame(qrows, "q_id string, token string")
    # df per query term only — count over the (token, id) table after
    # the broadcast semi-filter, so no corpus-wide df table is built
    cand = tf.join(F.broadcast(q.select("token").distinct()), "token")
    df_tbl = cand.groupBy("token").agg(F.countDistinct("id").alias("df"))
    scored = (cand
              .join(F.broadcast(q), "token")
              .join(F.broadcast(df_tbl), "token")
              .join(dl, "id")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) +
                (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.lit(k1) * (F.lit(1 - b) +
                        F.lit(b) * F.col("dl") / F.col("__avgdl"))
    term = idf * F.col("tf") * F.lit(k1 + 1) / (F.col("tf") + norm)
    agg = (scored.groupBy("q_id", "id")
           .agg(F.round(F.sum(term), 6).alias("score")))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(),
                                           F.col("id").asc())
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def bm25_topk_sql(table_sql: str, queries: Sequence[Tuple[str, str]],
                  k: int = 5, k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB mirror of :func:`bm25_topk` over ``table_sql`` (a
    subquery yielding (id, text)) — same tokenizer, same idf/tf
    formula, same round-before-rank tie discipline."""
    qvals = ", ".join(
        f"('{qid}', '{t}')" for qid, qtext in queries
        for t in sorted({w for w in re.split("[^a-z0-9]+",
                                             qtext.lower()) if w}))
    return (
        f"WITH src AS ({table_sql}), "
        f"tok AS (SELECT id, list_filter(string_split_regex("
        f"lower(text), '{TOKEN_SPLIT_RE}'), s -> s <> '') AS t "
        f"FROM src), "
        f"dl AS (SELECT id, len(t) AS dl FROM tok), "
        f"tf AS (SELECT token, id, count(*) AS tf FROM "
        f"(SELECT id, unnest(t) AS token FROM tok) GROUP BY token, id), "
        f"stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl), "
        f"q(q_id, token) AS (VALUES {qvals}), "
        f"cand AS (SELECT tf.* FROM tf "
        f"JOIN (SELECT DISTINCT token FROM q) USING (token)), "
        f"dfs AS (SELECT token, count(DISTINCT id) AS df FROM cand "
        f"GROUP BY token), "
        f"agg AS (SELECT q.q_id, cand.id, round(sum("
        f"ln(1.0 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) "
        f"* cand.tf * {k1 + 1} / (cand.tf + {k1} * ({1 - b} + "
        f"{b} * dl.dl / stats.avgdl))), 6) AS score "
        f"FROM cand JOIN q USING (token) JOIN dfs USING (token) "
        f"JOIN dl USING (id) CROSS JOIN stats "
        f"GROUP BY q.q_id, cand.id), "
        f"ranked AS (SELECT q_id, id, score, row_number() OVER ("
        f"PARTITION BY q_id ORDER BY score DESC, id ASC) AS rank "
        f"FROM agg) "
        f"SELECT q_id, id, score, rank FROM ranked WHERE rank <= {k} "
        f"ORDER BY q_id, rank")

"""Inverted-index build: token -> document-frequency + posting list.

The search-shaped corpus operator every retrieval / RAG-data pipeline
runs after filtering: tokenize, count per-document term frequencies,
and materialize per-token posting lists.  Mirrors the reference's
"compile once, validate many" discipline (the index is the frozen
artifact downstream lookups reuse, like the datastore index in
/root/reference/nacc_form_validator/datastore.py) — built here as two
keyed aggregates, no Python in the row path.

Scale shape (10^12 docs):
- tokenize + explode is map-side; the (token, doc) partial counts
  combine map-side before the first Exchange;
- the ONLY corpus-sized shuffles are the two keyed aggregates
  ((token, doc) then token);
- ``max_df_ratio`` drops tokens present in more than that fraction of
  documents (classic stopword elision) — WITHOUT it the hot-token
  posting lists ("the" in ~every doc) are the skew and memory killer
  at corpus scale; with it every retained posting list is bounded at
  ``max_df_ratio * |corpus|``;
- the total-document count joins in as a broadcast 1-row aggregate,
  never a driver collect.

Posting entries are ``lpad(id, 10, '0') || ':' || tf`` strings so the
lexicographic sort both engines share IS the numeric doc order —
keeping the whole surface under a byte-exact DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tokens are maximal [a-z0-9] runs of the lowercased text
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def inverted_index(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 1,
                   max_df_ratio: float = 1.0) -> DataFrame:
    """(token, df, postings): df = number of documents containing the
    token, postings = sorted '0000000id:tf' strings, one per containing
    document.  Tokens with df < ``min_df`` or df > ``max_df_ratio`` of
    the corpus are elided."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
            lambda s: s != "")).alias("token"))
    tf = tok.groupBy("token", "id").agg(F.count("*").alias("tf"))
    total = docs.agg(F.count("*").alias("__n"))
    posting = F.concat(F.lpad(F.col("id").cast("string"), 10, "0"),
                       F.lit(":"), F.col("tf").cast("string"))
    idx = (tf.groupBy("token")
           .agg(F.count("*").alias("df"),
                F.sort_array(F.collect_list(posting)).alias("postings")))
    return (idx.crossJoin(F.broadcast(total))
            .where((F.col("df") >= min_df) &
                   (F.col("df") <= F.col("__n") * F.lit(max_df_ratio)))
            .select("token", "df", "postings")
            .orderBy("token"))


def inverted_index_sql(table_sql: str, min_df: int = 1,
                       max_df_ratio: float = 1.0) -> str:
    """DuckDB mirror of :func:`inverted_index` over ``table_sql`` (a
    subquery yielding (id, text)) — same tokenizer, same posting
    encoding, same df gates."""
    return (
        f"WITH src AS ({table_sql}), "
        f"tok AS (SELECT id, unnest(list_filter(string_split_regex("
        f"lower(text), '{TOKEN_SPLIT_RE}'), s -> s <> '')) AS token "
        f"FROM src), "
        f"tf AS (SELECT token, id, count(*) AS tf FROM tok "
        f"GROUP BY token, id), "
        f"tot AS (SELECT count(*) AS n FROM src), "
        f"idx AS (SELECT token, count(*) AS df, "
        f"list_sort(list(lpad(CAST(id AS VARCHAR), 10, '0') || ':' || "
        f"CAST(tf AS VARCHAR))) AS postings FROM tf GROUP BY token) "
        f"SELECT token, df, postings FROM idx, tot "
        f"WHERE df >= {min_df} AND df <= n * {max_df_ratio} "
        f"ORDER BY token")

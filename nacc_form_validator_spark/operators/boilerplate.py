"""Corpus-level boilerplate line removal (CCNet-style).

Web pages share navigation/footer/cookie-banner lines across many
documents; the classic cleaning pass (CCNet, Wenzek et al. 2020 —
public method) drops any line whose DOCUMENT FREQUENCY across the
corpus exceeds a threshold, keeping each doc's residual prose.

Plan shape (scales to 10^12 docs):

1. explode docs into (doc_id, pos, line) with a per-line md5 key —
   map-side;
2. document-frequency aggregate on the key (map-side partial count
   distinct via the (key, doc_id) pre-distinct) -> the HOT set, which
   is tiny relative to the corpus (boilerplate is by definition
   repeated, so |hot| <= |lines| / min_df);
3. left-anti join the exploded view against the broadcast hot set;
4. reassemble surviving lines per doc (one groupBy(doc_id) shuffle of
   the surviving lines only).

Deterministic (md5 keys, position-ordered reassembly) — the whole
operator sits under a DuckDB value oracle (plans/oracle.py
boilerplate_removal_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_lines(text) -> "F.Column":
    """Trimmed non-empty lines of a document."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda s: F.trim(s)),
        lambda s: s != "")


def boilerplate_lines(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      min_df: int = 3) -> DataFrame:
    """(line_key, df) for lines appearing in >= min_df distinct docs."""
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.explode(doc_lines(F.col(text_col))).alias("line"))
    # pre-distinct (key, id) so the count-distinct aggregate gets
    # map-side partials instead of shipping every duplicate occurrence
    keyed = ex.select(F.md5(F.lower(F.col("line"))).alias("k"),
                      "id").distinct()
    return (keyed.groupBy("k")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") >= min_df))


def remove_boilerplate(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       min_df: int = 3) -> DataFrame:
    """(id, clean_text): each doc minus its corpus-boilerplate lines
    (empty string when every line was boilerplate)."""
    hot = boilerplate_lines(docs, text_col, id_col, min_df)
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(doc_lines(F.col(text_col))).alias("pos", "line"))
    ex = ex.withColumn("k", F.md5(F.lower(F.col("line"))))
    kept = ex.join(F.broadcast(hot.select("k")), "k", "left_anti")
    rebuilt = (kept.groupBy("id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "line"))),
                       lambda x: x["line"]), "\n").alias("clean_text")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(rebuilt, "id", "left")
            .select("id",
                    F.coalesce("clean_text", F.lit("")).alias(
                        "clean_text"))
            .orderBy("id"))

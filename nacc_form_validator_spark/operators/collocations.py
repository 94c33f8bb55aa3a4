"""Corpus collocation mining — top-k adjacent word bigrams by PMI.

The classic corpus-statistics pass (Church & Hanks 1990) a training-data
pipeline runs to find multi-word expressions worth keeping intact
through tokenization (named entities, idioms) and to spot boilerplate
phrases whose PMI is implausibly high because they come from templated
pages.  Beyond the reference's per-record surface (it has no corpus
statistics — SURVEY.md §2.7).

Scale shape: words leave each document once as adjacent (w1, w2) pairs
built INSIDE the row (``zip_with`` over two array slices — no
positional explode+self-join); bigram counts are one partial-agg
shuffle keyed on the pair, unigram counts one keyed on the word.  The
two count joins run on the VOCABULARY-sized tables (AQE picks broadcast
when they fit); the corpus text itself never shuffles.  The final top-k
is ``orderBy().limit(k)`` — Spark plans that as TakeOrderedAndProject
(per-partition heaps + driver merge of k rows), NOT a single-partition
global sort, so it survives an unbounded collocation table.  At 100 TB
the ``min_count`` filter runs BEFORE ranking, which is what bounds the
ranked set; a production run raises it with corpus size.

Determinism for the value oracle: counts are exact integers; pmi is
rounded to 6 decimals BEFORE ranking and ties break on the bigram
string, so Spark and DuckDB rank identically even if their libm ln()
differ in the last ulp (same convention as operators/tfidf.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.dedup import normalized


def _words(text_col: str):
    return F.filter(F.split(normalized(F.col(text_col)), " "),
                    lambda x: x != "")


def pmi_collocations(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 20,
                     min_count: int = 5) -> DataFrame:
    """(w1, w2, c_xy, pmi, rank): the ``k`` highest-PMI adjacent bigrams.

    pmi = ln( (c_xy / N_bi) / ((c_x / N_uni) * (c_y / N_uni)) ) with
    exact integer counts (N_bi = total bigram tokens, N_uni = total word
    tokens), rounded to 6; only bigrams with c_xy >= ``min_count`` are
    ranked.  Rank ties break on (w1, w2).
    """
    w = df.select(_words(text_col).alias("w"))
    bi = (w.select(F.explode(
        F.zip_with(F.slice(F.col("w"), 1,
                           F.greatest(F.size("w") - 1, F.lit(0))),
                   F.slice(F.col("w"), 2,
                           F.greatest(F.size("w") - 1, F.lit(0))),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))))
        .alias("p"))
        .select("p.w1", "p.w2"))
    uni = (w.select(F.explode("w").alias("word"))
           .groupBy("word").agg(F.count("*").alias("c_w")))
    n_uni = uni.agg(F.sum("c_w").alias("n_uni"))
    bic = bi.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    n_bi = bic.agg(F.sum("c_xy").alias("n_bi"))
    scored = (bic.where(F.col("c_xy") >= min_count)
              .join(uni.select(F.col("word").alias("w1"),
                               F.col("c_w").alias("c_x")), "w1")
              .join(uni.select(F.col("word").alias("w2"),
                               F.col("c_w").alias("c_y")), "w2")
              .crossJoin(F.broadcast(n_bi))
              .crossJoin(F.broadcast(n_uni))
              .select(
                  "w1", "w2", "c_xy",
                  F.round(F.log((F.col("c_xy") / F.col("n_bi")) /
                                ((F.col("c_x") / F.col("n_uni")) *
                                 (F.col("c_y") / F.col("n_uni")))),
                          6).alias("pmi")))
    top = scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(k)
    # rank assigned AFTER the limit: the window runs on <= k rows
    wnd = Window.orderBy(F.col("pmi").desc(), "w1", "w2")
    return (top.withColumn("rank", F.row_number().over(wnd))
            .orderBy("rank"))


#: DuckDB normalized-text expression (mirrors dedup.normalized)
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def pmi_collocations_sql(k: int = 20, min_count: int = 5) -> str:
    """DuckDB oracle for :func:`pmi_collocations` over ``documents``."""
    w = f"list_filter(string_split({_NORM}, ' '), x -> x <> '')"
    return (
        f"WITH w AS (SELECT {w} AS w FROM documents), "
        f"bi AS (SELECT unnest(list_transform(range(0, len(w) - 1), "
        f"i -> struct_pack(w1 := w[i + 1], w2 := w[i + 2]))) AS p "
        f"FROM w), "
        f"bic AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c_xy "
        f"FROM bi GROUP BY ALL), "
        f"uni AS (SELECT unnest(w) AS word FROM w), "
        f"unic AS (SELECT word, count(*) AS c_w FROM uni GROUP BY word), "
        f"n_bi AS (SELECT sum(c_xy) AS n_bi FROM bic), "
        f"n_uni AS (SELECT sum(c_w) AS n_uni FROM unic), "
        f"scored AS (SELECT w1, w2, c_xy, round(ln((c_xy * 1.0 / n_bi) / "
        f"((cx.c_w * 1.0 / n_uni) * (cy.c_w * 1.0 / n_uni))), 6) AS pmi "
        f"FROM bic JOIN unic cx ON bic.w1 = cx.word "
        f"JOIN unic cy ON bic.w2 = cy.word "
        f"CROSS JOIN n_bi CROSS JOIN n_uni "
        f"WHERE c_xy >= {min_count}), "
        f"ranked AS (SELECT w1, w2, c_xy, pmi, row_number() OVER ("
        f"ORDER BY pmi DESC, w1, w2) AS rank FROM scored) "
        f"SELECT w1, w2, c_xy, pmi, rank FROM ranked "
        f"WHERE rank <= {k} ORDER BY rank")

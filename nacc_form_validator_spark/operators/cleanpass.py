"""Fused web-corpus cleaning pass — repair, then gate, in ONE scan.

Composes the round-5 hygiene stages the way a production pipeline runs
them: mojibake damage is measured on the RAW text and repaired; the
junk-phrase and script-mix gates then run on the REPAIRED text (a
repaired ``é`` must not count against the script gate); finally the
dictionary-coverage (OOV) gate runs on the repaired text against a
vocabulary learned from the repaired corpus.  One boolean per stage
plus the conjunction — per-stage lineage in the same spirit as the
main pipeline's rule-hit records (qualityfilter.py).

Scale shape: stages 1-3 (repair + mojibake + junk + script) are a
SINGLE whole-stage-codegen projection — chained replaces and length
arithmetic, zero Python, zero shuffles; the only keyed work is the OOV
stage (one word-keyed agg for the vocabulary, one broadcast probe +
id-keyed agg), so the corpus text is scanned once and shuffled never.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.junkpages import (junk_hits,
                                                           junk_hits_sql)
from nacc_form_validator_spark.functions.mojibake import (
    mojibake_hits, mojibake_hits_sql, repair_mojibake,
    repair_mojibake_sql)
from nacc_form_validator_spark.functions.scriptmix import (
    script_keep_sql, with_script_gate)
from nacc_form_validator_spark.operators.selection import oov_gate


def corpus_clean_pass(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_density: float = 0.05, max_hits: int = 0,
                      min_dominant: float = 0.5,
                      vocab_size: int = 1000,
                      max_oov_ratio: float = 0.2) -> DataFrame:
    """(id, moji_keep, junk_keep, script_keep, oov_keep, keep): the
    fused hygiene verdict per document, one flag per stage."""
    raw = F.col(text_col)
    density = F.round(mojibake_hits(raw) /
                      F.greatest(F.length(raw), F.lit(1)), 6)
    rep = repair_mojibake(raw)
    pre = docs.select(
        F.col(id_col).alias("id"),
        rep.alias("rtext"),
        (density <= F.lit(max_density)).alias("moji_keep"))
    pre = pre.withColumn("junk_keep",
                         junk_hits(F.col("rtext")) <= F.lit(max_hits))
    flags = with_script_gate(pre, "rtext", min_dominant)
    ov = oov_gate(flags.select("id", F.col("rtext").alias("text")),
                  id_col="id", text_col="text",
                  vocab_size=vocab_size, max_oov_ratio=max_oov_ratio)
    return (flags.join(ov.select("id", "oov_keep"), "id")
            .select(
                "id", "moji_keep", "junk_keep", "script_keep",
                "oov_keep",
                (F.col("moji_keep") & F.col("junk_keep") &
                 F.col("script_keep") & F.col("oov_keep"))
                .alias("keep"))
            .orderBy("id"))


def corpus_clean_pass_sql(docs_sql: str, text_expr: str = "text",
                          id_expr: str = "doc_id",
                          max_density: float = 0.05, max_hits: int = 0,
                          min_dominant: float = 0.5,
                          vocab_size: int = 1000,
                          max_oov_ratio: float = 0.2) -> str:
    """DuckDB oracle for :func:`corpus_clean_pass` — the same stage
    composition generated from the same signature tables."""
    density = (f"round({mojibake_hits_sql(text_expr)} * 1.0 / "
               f"greatest(length({text_expr}), 1), 6)")
    rep = repair_mojibake_sql(text_expr)
    norm = "trim(regexp_replace(lower(rtext), '\\s+', ' ', 'g'))"
    w = f"list_filter(string_split({norm}, ' '), x -> x <> '')"
    return (
        f"WITH flags AS (SELECT {id_expr} AS id, {rep} AS rtext, "
        f"{density} <= {max_density} AS moji_keep, "
        f"{junk_hits_sql(rep)} <= {max_hits} AS junk_keep, "
        f"{script_keep_sql(rep, min_dominant)} AS script_keep "
        f"FROM ({docs_sql})), "
        f"pairs AS (SELECT id, unnest({w}) AS word FROM flags), "
        f"counts AS (SELECT word, count(*) AS c FROM pairs "
        f"GROUP BY word), "
        f"vocab AS (SELECT word FROM (SELECT word, row_number() OVER ("
        f"ORDER BY c DESC, word ASC) AS r FROM counts) "
        f"WHERE r <= {vocab_size}), "
        f"per_doc AS (SELECT id, count(*) AS n_words, "
        f"sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_oov "
        f"FROM pairs LEFT JOIN vocab v USING (word) GROUP BY id), "
        f"ov AS (SELECT flags.id, "
        f"round(coalesce(n_oov * 1.0 / n_words, 0.0), 6) "
        f"<= {max_oov_ratio} AS oov_keep "
        f"FROM flags LEFT JOIN per_doc ON flags.id = per_doc.id) "
        f"SELECT flags.id, moji_keep, junk_keep, script_keep, oov_keep, "
        f"moji_keep AND junk_keep AND script_keep AND oov_keep AS keep "
        f"FROM flags JOIN ov ON flags.id = ov.id ORDER BY flags.id")

"""Main-content block extraction: max-sum contiguous line block.

Readability-style extractors pick the contiguous region of a page with
the highest text density and discard the nav/footer fringe around it.
The density recast over extracted text: score every (trimmed,
non-empty) line as ``word_count - penalty`` (short template lines go
negative, prose goes positive) and return the MAXIMUM-SUM CONTIGUOUS
block of lines — Kadane's algorithm, run as a LINEAR ``F.aggregate``
fold inside the row: zero shuffles, zero Python, exact integer
arithmetic throughout (no float-order risk in the oracle hash).

Tie policy (pinned, both engines): Kadane restarts when the running
sum is <= 0 and updates the best only on strictly-greater sums — so
among equal-sum blocks the FIRST (smallest end line) wins, and within
that end the LATEST restart point is the start.  The oracle reproduces
this exactly via prefix sums: cur_j = P_j - min_{i<j} P_i (value is
tie-independent), end = first argmax, start = latest prefix argmin
before the end — provably the fold's block.

Reference parity: none (corpus extraction surface — SURVEY.md §2.7);
the per-line scoring mirrors the line_filter/CCNet-style line ops
already in the engine.

Scale shape: pure projection over the page scan; the block text is
rebuilt with ``F.slice`` on the already-materialized lines array.  At
100 TB this fuses into whatever scan projection runs beside it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.boilerplate import doc_lines


def main_block(text: Column, penalty: int = 4,
               lines: Column = None) -> Column:
    """struct(n_lines, block_start, block_len, block_score,
    block_text) — block_start is the 0-based index of the first block
    line; empty docs get (0, 0, 0, 0, '').

    Pass a pre-materialized ``lines`` column when composing into a
    plan (the aux-column discipline): the expression reads the lines
    array twice (Kadane fold + block slice), and inlining
    ``doc_lines(text)`` makes codegen split the text twice per row."""
    if lines is None:
        lines = doc_lines(text)

    def wc(s):
        return F.size(F.filter(F.split(s, r"\s+"), lambda x: x != ""))

    init = F.struct(
        F.lit(0).alias("j"),
        F.lit(0).cast("long").alias("cur"),
        F.lit(0).alias("cs"),
        F.lit(None).cast("long").alias("best"),
        F.lit(0).alias("bs"),
        F.lit(0).alias("be"))

    def step(acc, x):
        j = acc["j"] + 1
        s = (wc(x) - F.lit(penalty)).cast("long")
        ext = acc["cur"] > 0
        cur2 = F.when(ext, acc["cur"] + s).otherwise(s)
        cs2 = F.when(ext, acc["cs"]).otherwise(j)
        upd = acc["best"].isNull() | (cur2 > acc["best"])
        return F.struct(
            j.alias("j"),
            cur2.alias("cur"),
            cs2.alias("cs"),
            F.when(upd, cur2).otherwise(acc["best"]).alias("best"),
            F.when(upd, cs2).otherwise(acc["bs"]).alias("bs"),
            F.when(upd, j).otherwise(acc["be"]).alias("be"))

    a = F.aggregate(lines, init, step)
    empty = a["j"] == 0
    return F.struct(
        a["j"].cast("long").alias("n_lines"),
        F.when(empty, F.lit(0)).otherwise(a["bs"] - 1).cast("long")
        .alias("block_start"),
        F.when(empty, F.lit(0)).otherwise(a["be"] - a["bs"] + 1)
        .cast("long").alias("block_len"),
        F.coalesce(a["best"], F.lit(0).cast("long"))
        .alias("block_score"),
        F.when(empty, F.lit("")).otherwise(
            F.array_join(F.slice(lines, a["bs"],
                                 a["be"] - a["bs"] + 1), "\n"))
        .alias("block_text"))


def main_block_extract(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       penalty: int = 4) -> DataFrame:
    """One row per doc with the :func:`main_block` fields flattened."""
    pre = docs.select(F.col(id_col).alias("id"),
                      doc_lines(F.col(text_col)).alias("__lines"))
    b = main_block(F.lit(None), penalty, lines=F.col("__lines"))
    return (pre.select(
        F.col("id"),
        b["n_lines"].alias("n_lines"),
        b["block_start"].alias("block_start"),
        b["block_len"].alias("block_len"),
        b["block_score"].alias("block_score"),
        b["block_text"].alias("block_text"))
        .orderBy("id"))


def main_block_sql(penalty: int = 4) -> str:
    """DuckDB mirror via prefix sums over exploded lines: cand_j =
    P_j - min_{i<j} P_i; end = FIRST argmax of cand; start = LATEST
    prefix-argmin strictly before the end (the Kadane restart point).
    Integer arithmetic only."""
    lines = ("list_filter(list_transform(string_split(text, chr(10)), "
             "s -> trim(s)), s -> s <> '')")
    score = (f"CAST(len(list_filter(string_split_regex(line, '\\s+'), "
             f"x -> x <> '')) - {penalty} AS BIGINT)")
    return (
        f"WITH d AS (SELECT doc_id AS id, {lines} AS ls, text "
        f"FROM documents), "
        # prefix row j=0 (P_0 = 0) so the first line's candidate is
        # P_1 - P_0, matching Kadane's first step
        f"ex AS (SELECT id, i AS j, ls[i] AS line FROM d, "
        f"unnest(range(1, len(ls) + 1)) AS u(i)), "
        f"p AS (SELECT id, j, sum({score}) OVER (PARTITION BY id "
        f"ORDER BY j) AS pj FROM ex "
        f"UNION ALL SELECT id, 0 AS j, 0 AS pj FROM d "
        f"WHERE len(ls) > 0), "
        f"c AS (SELECT id, j, pj, min(pj) OVER (PARTITION BY id "
        f"ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
        f"PRECEDING) AS rm FROM p), "
        f"cand AS (SELECT id, j, pj - rm AS cur FROM c WHERE j > 0), "
        f"mx AS (SELECT id, max(cur) AS mc FROM cand GROUP BY id), "
        f"be AS (SELECT cand.id, min(j) AS bend FROM cand JOIN mx "
        f"ON cand.id = mx.id AND cand.cur = mx.mc GROUP BY cand.id), "
        f"bs AS (SELECT c.id, be.bend, max(c.j) AS bstart FROM c "
        f"JOIN be ON c.id = be.id AND c.j < be.bend "
        f"WHERE c.pj = (SELECT rm FROM c c2 WHERE c2.id = c.id AND "
        f"c2.j = be.bend) GROUP BY c.id, be.bend), "
        f"res AS (SELECT bs.id, bs.bstart, bs.bend, "
        f"(SELECT cur FROM cand WHERE cand.id = bs.id AND "
        f"cand.j = bs.bend) AS score FROM bs) "
        f"SELECT d.id AS id, CAST(len(ls) AS BIGINT) AS n_lines, "
        f"CAST(coalesce(res.bstart, 0) AS BIGINT) AS block_start, "
        f"CAST(coalesce(res.bend - res.bstart, 0) AS BIGINT) AS "
        f"block_len, CAST(coalesce(res.score, 0) AS BIGINT) AS "
        f"block_score, CASE WHEN res.id IS NULL THEN '' ELSE "
        f"array_to_string(list_slice(ls, res.bstart + 1, res.bend), "
        f"chr(10)) END AS block_text "
        f"FROM d LEFT JOIN res ON d.id = res.id ORDER BY id")

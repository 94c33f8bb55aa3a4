"""Paragraph-level exact deduplication with document reassembly.

The corpus-cleaning pass used by MassiveText/Gopher (Rae et al. 2021)
and the C4 preparation (Raffel et al. 2020, which drops repeated
three-sentence spans): any paragraph whose exact content already
occurred earlier in the corpus — in a previous document, or earlier in
the same document — is removed, and each document is reassembled from
its surviving paragraphs.  Complements the suite's whole-doc dedup
(dedup.exact_dedup) and substring stats (dedup.exact_substring_stats):
web boilerplate usually repeats at paragraph granularity, not
whole-document and not arbitrary-substring.

Beyond the reference's surface (it has no corpus-level ops — SURVEY.md
§2.7) but first-class for a 100 TB webtext engine.

Plan shape (scales to 10^12 docs):

1. posexplode docs into (id, pos, para) with an md5 paragraph key —
   map-side;
2. first-occurrence aggregate ``min(struct(id, pos))`` on the key —
   min is COMBINABLE, so the corpus's hot paragraphs (a cookie banner
   in 10^9 docs) collapse map-side before the shuffle; this is why the
   operator aggregates + rejoins instead of a row_number window, whose
   hot-key partition would be a straggler with no partial aggregation;
3. equi-join the exploded view back on the key (AQE skew-join splits
   the hot keys) and keep rows equal to their key's first occurrence;
4. reassemble surviving paragraphs per doc (one groupBy(id) shuffle of
   the survivors only — duplicates never travel to reassembly).

Deterministic (md5 keys, (id, pos)-lexicographic first-occurrence
rule, position-ordered reassembly) — the whole operator sits under a
DuckDB value oracle (paragraph_dedup_sql below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_paragraphs(text: Column) -> Column:
    """Trimmed non-empty paragraphs: blocks separated by blank lines."""
    return F.filter(
        F.transform(F.split(text, r"\n\s*\n"), lambda s: F.trim(s)),
        lambda s: s != "")


def paragraph_dedup(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, dedup_text, n_kept, n_dropped): each doc minus every
    paragraph whose exact content already occurred at a smaller
    (id, pos) anywhere in the corpus; ``dedup_text`` rejoins survivors
    with a blank line ('' when nothing survives)."""
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(split_paragraphs(F.col(text_col))).alias(
            "pos", "para"))
    ex = ex.withColumn("k", F.md5(F.col("para")))
    first = (ex.groupBy("k")
             .agg(F.min(F.struct("id", "pos")).alias("f")))
    kept = (ex.join(first, "k")
            .where((F.col("id") == F.col("f.id")) &
                   (F.col("pos") == F.col("f.pos")))
            .select("id", "pos", "para"))
    totals = (docs.select(
        F.col(id_col).alias("id"),
        F.size(split_paragraphs(F.col(text_col))).alias("n_paras")))
    rebuilt = (kept.groupBy("id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "para"))),
                       lambda x: x["para"]), "\n\n").alias("dedup_text"),
                    F.count("*").alias("n_kept")))
    return (totals.join(rebuilt, "id", "left")
            .select(
                "id",
                F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
                F.coalesce("n_kept", F.lit(0)).cast("long").alias(
                    "n_kept"),
                (F.col("n_paras") -
                 F.coalesce("n_kept", F.lit(0))).cast("long").alias(
                     "n_dropped"))
            .orderBy("id"))


def paragraph_dedup_sql(table_sql: str, id_col: str = "id",
                        text_col: str = "text") -> str:
    """DuckDB mirror of :func:`paragraph_dedup` over ``table_sql`` (a
    subquery/CTE body yielding (id, text)) — same md5 keys, same
    (id, pos) first-occurrence rule, same blank-line reassembly."""
    paras = (f"list_filter(list_transform("
             f"string_split_regex({text_col}, '\\n\\s*\\n'), "
             f"s -> trim(s)), s -> s <> '')")
    return (
        f"WITH src AS ({table_sql}), "
        f"p AS (SELECT {id_col} AS id, {paras} AS paras FROM src), "
        f"ex AS (SELECT id, k - 1 AS pos, paras[k] AS para, "
        f"md5(paras[k]) AS key FROM p, "
        f"unnest(range(1, len(paras) + 1)) AS u(k)), "
        f"r AS (SELECT id, pos, para, row_number() OVER ("
        f"PARTITION BY key ORDER BY id, pos) AS rn FROM ex), "
        f"rebuilt AS (SELECT id, string_agg(para, chr(10) || chr(10) "
        f"ORDER BY pos) AS dedup_text, count(*) AS n_kept "
        f"FROM r WHERE rn = 1 GROUP BY id), "
        f"tot AS (SELECT id, len(paras) AS n_paras FROM p) "
        f"SELECT tot.id, coalesce(rebuilt.dedup_text, '') AS dedup_text, "
        f"coalesce(rebuilt.n_kept, 0) AS n_kept, "
        f"tot.n_paras - coalesce(rebuilt.n_kept, 0) AS n_dropped "
        f"FROM tot LEFT JOIN rebuilt ON tot.id = rebuilt.id "
        f"ORDER BY tot.id")

"""Fill-in-the-middle (FIM) pretraining transformation (Bavarian et al.
2022, "Efficient Training of Language Models to Fill in the Middle").

The LLM-pipeline stage this implements: a deterministic fraction of
training documents is rewritten from ``prefix middle suffix`` to
``<PRE> prefix <SUF> suffix <MID> middle`` (PSM order) so the model
learns infilling; the rest pass through untouched.  Real pipelines
randomize the split — here both the apply decision and the split points
derive from md5 of the document key, which makes the transform
resume-stable across retries/partitions (the reference's determinism
requirement for validation, quality_check.py, applied to augmentation)
and value-reproducible in the DuckDB oracle.

Scale shape: pure per-row projection — zero shuffles, zero Python, no
state; cost is two substring copies per transformed row.  Character
(not token) split points are the documented simplification: the
downstream tokenizer sees sentinel strings, exactly as the public FIM
recipe applies it to raw text before tokenization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FIM_PRE = "<|fim_prefix|>"
FIM_SUF = "<|fim_suffix|>"
FIM_MID = "<|fim_middle|>"


def _hash_frac(key: Column, salt: str) -> Column:
    """Uniform [0, 1) from md5(key || salt) — same construction as
    sampling.hash_uniform, salted so the three decisions (apply, cut1,
    cut2) are independent."""
    return (F.conv(F.substring(F.md5(F.concat(key.cast("string"),
                                              F.lit(salt))), 1, 8),
                   16, 10).cast("double") / F.lit(float(16 ** 8)))


def fim_transform(docs: DataFrame, rate: float = 0.5,
                  id_col: str = "doc_id", text_col: str = "text",
                  min_chars: int = 8) -> DataFrame:
    """(id, fim_applied, text): PSM fill-in-the-middle rewrite of a
    deterministic ``rate``-fraction of documents.

    Split points: cut1 = 1 + floor(u1 * (n-2)), cut2 = cut1 + 1 +
    floor(u2 * (n-1-cut1)) over the doc's n chars, guaranteeing
    non-empty prefix/middle ranges and a (possibly empty) suffix.
    Documents shorter than ``min_chars`` or outside the rate never
    transform.  All arithmetic is integer-on-doubles from md5 prefixes,
    so the oracle reproduces every byte."""
    key = F.col(id_col)
    n = F.length(F.col(text_col))
    apply_ = ((_hash_frac(key, "fim") < rate) & (n >= min_chars))
    cut1 = (F.lit(1) +
            F.floor(_hash_frac(key, "cut1") * (n - 2)).cast("int"))
    cut2 = (cut1 + 1 +
            F.floor(_hash_frac(key, "cut2") *
                    (n - 1 - cut1)).cast("int"))
    prefix = F.substring(F.col(text_col), F.lit(1), cut1)
    middle = F.substring(F.col(text_col), cut1 + 1, cut2 - cut1)
    suffix = F.substring(F.col(text_col), cut2 + 1, n - cut2)
    rewritten = F.concat(F.lit(FIM_PRE), prefix, F.lit(FIM_SUF),
                         suffix, F.lit(FIM_MID), middle)
    return (docs.select(
        key.alias("id"),
        apply_.alias("fim_applied"),
        F.when(apply_, rewritten).otherwise(F.col(text_col))
        .alias("text"))
        .orderBy("id"))


def fim_transform_sql(table: str = "documents", rate: float = 0.5,
                      min_chars: int = 8) -> str:
    """DuckDB mirror of :func:`fim_transform` — identical md5-derived
    decisions and substring arithmetic, byte-identical output."""
    def frac(salt: str) -> str:
        return (f"(CAST(concat('0x', substr(md5(CAST(doc_id AS "
                f"VARCHAR) || '{salt}'), 1, 8)) AS BIGINT) / "
                f"{float(16 ** 8)!r})")

    return (
        f"WITH d AS (SELECT doc_id, text, length(text) AS n, "
        f"({frac('fim')} < {rate!r} AND length(text) >= {min_chars}) "
        f"AS ap FROM {table}), "
        f"c AS (SELECT doc_id, text, n, ap, "
        f"CAST(1 + floor({frac('cut1')} * (n - 2)) AS INT) AS cut1 "
        f"FROM d), "
        f"c2 AS (SELECT *, CAST(cut1 + 1 + floor({frac('cut2')} * "
        f"(n - 1 - cut1)) AS INT) AS cut2 FROM c) "
        f"SELECT doc_id AS id, ap AS fim_applied, "
        f"CASE WHEN ap THEN '{FIM_PRE}' || substr(text, 1, cut1) || "
        f"'{FIM_SUF}' || substr(text, cut2 + 1, n - cut2) || "
        f"'{FIM_MID}' || substr(text, cut1 + 1, cut2 - cut1) "
        f"ELSE text END AS text FROM c2 ORDER BY id")

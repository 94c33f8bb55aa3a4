"""Mojibake (encoding-damage) detection and repair.

Web crawls are full of UTF-8 text that was decoded as cp1252/latin-1
somewhere upstream and re-encoded — the ftfy problem: ``é`` arrives as
``Ã©``, ``’`` as ``â€™``.  A quality pipeline needs (a) a per-document
damage DENSITY signal (heavily-garbled pages are drop candidates) and
(b) a deterministic REPAIR for the common two/three-char signatures,
applied before any downstream tokenization.  This is the same
fail-early payload-hygiene stage as the reference's type-cast rules
(/root/reference/nacc_form_validator/quality_check.py cast-before-
validate): fix the representation before rules run.

Scale shape: pure row-side string projection — zero shuffles, zero
Python; chained ``replace`` calls and length arithmetic inside
whole-stage codegen, fused into whatever corpus pass already scans the
text.  The signature table is a compile-time literal list (the
production swap-in is a longer ftfy-derived table, same shape).

Determinism: replacements apply in the FIXED declared order (3-char
``â€x`` family first — they share the ``â€`` prefix, so order is part
of the contract) and both the Spark and DuckDB forms are generated from
the same ``MOJIBAKE_MAP``, so repair is byte-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (damaged sequence, intended char) — ordered; longest-prefix family
#: first.  cp1252 mojibake of the most common non-ASCII chars in web
#: text (curly punctuation, Latin-1 letters).
MOJIBAKE_MAP: tuple = (
    ("â€™", "’"),   # â€™ -> ’
    ("â€œ", "“"),   # â€œ -> “
    ("â€“", "–"),   # â€“ -> –
    ("â€”", "—"),   # â€” -> —
    ("Ã©", "é"),         # Ã© -> é
    ("Ã¨", "è"),         # Ã¨ -> è
    ("Ã¼", "ü"),         # Ã¼ -> ü
    ("Ã¶", "ö"),         # Ã¶ -> ö
    ("Ã¤", "ä"),         # Ã¤ -> ä
    ("Ã±", "ñ"),         # Ã± -> ñ
)


def mojibake_hits(text: Column) -> Column:
    """Total count of damaged sequences in ``text`` (sum over the
    signature table of occurrence counts via length arithmetic —
    no regex engine involved)."""
    total = F.lit(0)
    for bad, _ in MOJIBAKE_MAP:
        total = total + (
            (F.length(text) - F.length(F.replace(text, F.lit(bad))))
            / F.lit(len(bad))).cast("long")
    return total


def repair_mojibake(text: Column) -> Column:
    """``text`` with every signature replaced by its intended char,
    applied in MOJIBAKE_MAP order."""
    out = text
    for bad, good in MOJIBAKE_MAP:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def with_mojibake_stats(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_density: float = 0.05) -> DataFrame:
    """(id, moji_hits, moji_density, moji_keep, text_repaired):
    per-document damage stats + the repaired text.  ``moji_keep`` is
    False when damaged sequences cover more than ``max_density`` of the
    document's chars (pages that garbled are usually mis-decoded
    wholesale — repair can't rescue them)."""
    t = F.col(text_col)
    hits = mojibake_hits(t)
    density = F.round(hits / F.greatest(F.length(t), F.lit(1)), 6)
    return df.select(
        F.col(id_col),
        hits.alias("moji_hits"),
        density.alias("moji_density"),
        (density <= F.lit(max_density)).alias("moji_keep"),
        repair_mojibake(t).alias("text_repaired"))


# ---------------------------------------------------------------------------
# DuckDB mirrors — generated from the same MOJIBAKE_MAP so the repair
# chain and counts are definitionally identical across engines.
# ---------------------------------------------------------------------------

def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def mojibake_hits_sql(text_expr: str) -> str:
    parts = [
        f"CAST((length({text_expr}) - length(replace({text_expr}, "
        f"{_q(bad)}, ''))) / {len(bad)} AS BIGINT)"
        for bad, _ in MOJIBAKE_MAP]
    return "(" + " + ".join(parts) + ")"


def repair_mojibake_sql(text_expr: str) -> str:
    out = text_expr
    for bad, good in MOJIBAKE_MAP:
        out = f"replace({out}, {_q(bad)}, {_q(good)})"
    return out


def mojibake_stats_sql(docs_sql: str, text_expr: str = "text",
                       id_expr: str = "doc_id",
                       max_density: float = 0.05) -> str:
    hits = mojibake_hits_sql(text_expr)
    dens = (f"round({hits} * 1.0 / greatest(length({text_expr}), 1), 6)")
    return (
        f"SELECT {id_expr} AS doc_id, {hits} AS moji_hits, "
        f"{dens} AS moji_density, "
        f"{dens} <= {max_density} AS moji_keep, "
        f"{repair_mojibake_sql(text_expr)} AS text_repaired "
        f"FROM ({docs_sql}) ORDER BY doc_id")

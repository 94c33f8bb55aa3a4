"""Junk-page gate — error/placeholder/wall page detection.

Crawls return megabytes of pages whose TEXT extracted fine but whose
CONTENT is worthless for training: soft-404s ("page not found" served
with HTTP 200), login/paywall walls, JS-required shells, parked
domains, lorem-ipsum placeholders.  URL filtering can't catch these
(the url looks normal); heuristic stats often pass them (they are
grammatical English).  The standard production gate is a phrase
blocklist scanned against the page text — this module.

Scale shape: pure row-side LITERAL substring counting (length
arithmetic over ``replace``, no regex engine), zero shuffles, fused
into whatever corpus pass already scans the text — the same
indexOf-pregate discipline as the scrub stage's contains() guards
(functions/scrub.py).

Cross-engine determinism: both the Spark and DuckDB forms are
generated from the same JUNK_PHRASES table; counting is exact integer
length arithmetic on the lower-cased text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: lower-case phrases whose presence marks a junk page; matched as
#: literal substrings of the lower-cased text
JUNK_PHRASES: tuple = (
    "404 not found",
    "page not found",
    "access denied",
    "please enable javascript",
    "javascript is required",
    "log in to continue",
    "sign in to view",
    "domain is for sale",
    "under construction",
    "lorem ipsum",
)


def junk_hits(text: Column) -> Column:
    """Total occurrence count of junk phrases in ``text``
    (case-insensitive literal matching)."""
    low = F.lower(text)
    total = F.lit(0)
    for p in JUNK_PHRASES:
        total = total + (
            (F.length(low) - F.length(F.replace(low, F.lit(p))))
            / F.lit(len(p))).cast("long")
    return total


def with_junk_gate(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   max_hits: int = 0) -> DataFrame:
    """(id, junk_hits, junk_keep): per-document junk-phrase count and
    the gate (keep while hits <= ``max_hits``; the default 0 drops on
    first hit — junk phrases are near-zero-FP by construction)."""
    hits = junk_hits(F.col(text_col))
    return df.select(
        F.col(id_col),
        hits.alias("junk_hits"),
        (hits <= F.lit(max_hits)).alias("junk_keep"))


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def junk_hits_sql(text_expr: str) -> str:
    low = f"lower({text_expr})"
    parts = [
        f"CAST((length({low}) - length(replace({low}, {_q(p)}, ''))) "
        f"/ {len(p)} AS BIGINT)"
        for p in JUNK_PHRASES]
    return "(" + " + ".join(parts) + ")"


def junk_gate_sql(docs_sql: str, text_expr: str = "text",
                  id_expr: str = "doc_id", max_hits: int = 0) -> str:
    hits = junk_hits_sql(text_expr)
    return (
        f"SELECT {id_expr} AS doc_id, {hits} AS junk_hits, "
        f"{hits} <= {max_hits} AS junk_keep "
        f"FROM ({docs_sql}) ORDER BY doc_id")

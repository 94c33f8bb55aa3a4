"""Checksum-validated PII scrub: credit-card numbers via Luhn.

The regex scrub stage (functions/scrub.py) masks PATTERN-shaped PII;
card numbers need more, because a 16-digit run is usually NOT a card
(ids, timestamps, hashes) and masking every digit run destroys data.
The industry-standard gate is the Luhn mod-10 checksum: only digit
runs of plausible PAN length (13-19, ISO/IEC 7812) that pass Luhn are
masked.  This is the recast of the reference's *compute-then-compare*
rules (compute_gds's checksum-like derived aggregate,
/root/reference/nacc_form_validator/nacc_validator.py compute_gds):
a value is judged by a derived arithmetic property, not its shape.

Scale shape: pure Column algebra — candidate extraction, the Luhn fold
(nested higher-order functions over the candidate's digits), and the
literal-replace fold all run inside the row, whole-stage-codegen
adjacent, zero Python and ZERO shuffles.  At 10^12 docs this stage is
free map work riding whatever partitioning the pipeline already has.

Both engines share the exact fold arithmetic, so scrubbed text stays
byte-identical under the DuckDB oracle (the north_rule's per-row
invariant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: maximal digit runs; PAN length bounds per ISO/IEC 7812
_CAND_RE = "[0-9]+"
MIN_PAN, MAX_PAN = 13, 19
CC_MASK = "<CC>"


def _luhn_sum(x: Column) -> Column:
    """Luhn checksum of a digit-string Column: digits at odd distance
    from the RIGHT double (9-wrapping); valid iff sum % 10 == 0."""
    n = F.length(x)
    return F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0),
        lambda acc, i: acc + F.when(
            (n - i) % 2 == 1,
            F.when((F.ascii(F.substr(x, i, F.lit(1))) - 48) * 2 > 9,
                   (F.ascii(F.substr(x, i, F.lit(1))) - 48) * 2 - 9)
            .otherwise((F.ascii(F.substr(x, i, F.lit(1))) - 48) * 2)
        ).otherwise(F.ascii(F.substr(x, i, F.lit(1))) - 48))


def cc_valid_candidates(text: Column) -> Column:
    """array<string> of Luhn-valid 13-19 digit runs in ``text``."""
    cands = F.regexp_extract_all(text, F.lit(_CAND_RE), F.lit(0))
    return F.filter(
        cands,
        lambda x: (F.length(x) >= MIN_PAN) & (F.length(x) <= MAX_PAN) &
        (_luhn_sum(x) % 10 == 0))


def cc_scrub_expr(text: Column, mask: str = CC_MASK) -> Column:
    """``text`` with every Luhn-valid PAN replaced by ``mask`` —
    literal replace (digits only, no regex metacharacters), folded
    over the valid-candidate list."""
    return F.aggregate(cc_valid_candidates(text), text,
                       lambda acc, x: F.replace(acc, x, F.lit(mask)))


def cc_scrub(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", mask: str = CC_MASK) -> DataFrame:
    """(id, scrubbed_text, n_cc) — n_cc counts valid-PAN candidate
    occurrences (lineage: how many numbers were masked)."""
    text = F.col(text_col)
    return (docs.select(
        F.col(id_col).alias("id"),
        cc_scrub_expr(text, mask).alias("scrubbed_text"),
        F.size(cc_valid_candidates(text)).alias("n_cc"))
        .orderBy("id"))


def _luhn_sum_sql(x: str) -> str:
    """DuckDB Luhn fold over digit string ``x`` — same arithmetic."""
    d = f"(ascii({x}[i:i]) - 48)"
    return (f"list_sum(list_transform(range(1, len({x}) + 1), i -> "
            f"CASE WHEN (len({x}) - i) % 2 = 1 THEN "
            f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 "
            f"ELSE {d} * 2 END) ELSE {d} END))")


def cc_scrub_sql(table_sql: str, mask: str = CC_MASK) -> str:
    """DuckDB mirror of :func:`cc_scrub` over ``table_sql`` (a
    subquery yielding (id, text)) — byte-identical scrubbed text."""
    valid = (f"list_filter(regexp_extract_all(text, '{_CAND_RE}'), "
             f"x -> len(x) BETWEEN {MIN_PAN} AND {MAX_PAN} "
             f"AND {_luhn_sum_sql('x')} % 10 = 0)")
    return (
        f"WITH src AS ({table_sql}), "
        f"v AS (SELECT id, text, {valid} AS valid FROM src) "
        f"SELECT id, list_reduce(list_prepend(text, valid), "
        f"(a, b) -> replace(a, b, '{mask}')) AS scrubbed_text, "
        f"len(valid) AS n_cc FROM v ORDER BY id")

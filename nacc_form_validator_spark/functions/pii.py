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


# ---------------------------------------------------------------------------
# IBAN (ISO 13616): mod-97 checksum-validated account-number scrub
# ---------------------------------------------------------------------------
#: IBAN shape: country code + 2 check digits + 11-30 alphanumerics
#: (total 15-34 per ISO 13616), on word boundaries.  The mod-97 gate
#: then rejects ~96/97 of shape-only matches (ticket codes, SKUs).
_IBAN_RE = r"\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b"
IBAN_MASK = "<IBAN>"


def _iban_mod97(x: Column) -> Column:
    """ISO 13616 checksum of a candidate Column: move the first 4
    chars to the end, map letters A->10..Z->35, and fold the decimal
    expansion mod 97 left-to-right (digits shift by 10, letters by
    100) — valid iff the result is 1.  Integer fold, bit-exact in
    every engine."""
    r = F.concat(F.substr(x, F.lit(5), F.length(x)),
                 F.substr(x, F.lit(1), F.lit(4)))
    a = lambda i: F.ascii(F.substr(r, i, F.lit(1)))  # noqa: E731
    return F.aggregate(
        F.sequence(F.lit(1), F.length(r)), F.lit(0),
        lambda acc, i: F.when(a(i) <= 57,
                              (acc * 10 + (a(i) - 48)) % 97)
        .otherwise((acc * 100 + (a(i) - 55)) % 97))


def iban_valid_candidates(text: Column) -> Column:
    """array<string> of mod-97-valid IBAN-shaped runs in ``text``."""
    cands = F.regexp_extract_all(text, F.lit(_IBAN_RE), F.lit(0))
    return F.filter(cands, lambda x: _iban_mod97(x) == 1)


def iban_scrub_expr(text: Column, mask: str = IBAN_MASK) -> Column:
    """``text`` with every valid IBAN replaced by ``mask``."""
    return F.aggregate(iban_valid_candidates(text), text,
                       lambda acc, x: F.replace(acc, x, F.lit(mask)))


def iban_scrub(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               mask: str = IBAN_MASK) -> DataFrame:
    """(id, scrubbed_text, n_iban): the IBAN analogue of
    :func:`cc_scrub` — same zero-shuffle pure-Column shape, same
    byte-identical-oracle contract."""
    text = F.col(text_col)
    return (docs.select(
        F.col(id_col).alias("id"),
        iban_scrub_expr(text, mask).alias("scrubbed_text"),
        F.size(iban_valid_candidates(text)).alias("n_iban"))
        .orderBy("id"))


def _iban_mod97_sql(x: str) -> str:
    """DuckDB mod-97 fold (same arithmetic; list_reduce with the
    list_prepend-initial idiom — scalar accumulators are safe in
    DuckDB 1.0, unlike struct state)."""
    r = f"({x}[5:] || {x}[1:4])"
    return (f"list_reduce(list_prepend(0, range(1, len({r}) + 1)), "
            f"(acc, i) -> CASE WHEN ascii({r}[i:i]) <= 57 "
            f"THEN (acc * 10 + ascii({r}[i:i]) - 48) % 97 "
            f"ELSE (acc * 100 + ascii({r}[i:i]) - 55) % 97 END)")


def iban_scrub_sql(table_sql: str, mask: str = IBAN_MASK) -> str:
    """DuckDB mirror of :func:`iban_scrub` over ``table_sql``
    ((id, text)) — byte-identical scrubbed text."""
    valid = (f"list_filter(regexp_extract_all(text, '{_IBAN_RE}'), "
             f"x -> {_iban_mod97_sql('x')} = 1)")
    return (
        f"WITH src AS ({table_sql}), "
        f"v AS (SELECT id, text, {valid} AS valid FROM src) "
        f"SELECT id, list_reduce(list_prepend(text, valid), "
        f"(a, b) -> replace(a, b, '{mask}')) AS scrubbed_text, "
        f"len(valid) AS n_iban FROM v ORDER BY id")

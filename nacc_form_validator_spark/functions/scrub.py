"""PII / toxicity regex scrub stage.

Recast of the reference ``regex`` rule + error reporting
(/root/reference/tests/test_rules_cerberus.py:91-120 shape): precompiled
pattern chains applied JVM-side with ``regexp_replace`` (no Python in the
row path), each hit recorded as a finding-shaped lineage entry so scrub
diffs are auditable per document.

Patterns use portable syntax (no backrefs/lookarounds) so the DuckDB
oracle can apply byte-identical replacements.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) applied in order — order is part of the
#: contract (earlier scrubs can change later matches)
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", r"\+?[0-9]{1,2}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
     "<PHONE>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]

#: literal each pattern REQUIRES in any match — a cheap indexOf pre-gate
#: that skips the regex engine entirely on the (overwhelming) majority of
#: documents carrying no such character; cannot change any result
_NEEDLES = {"email": "@", "ssn": "-"}

#: deterministic toxicity lexicon stand-in (swap for a real list at deploy)
TOXIC_WORDS = ("badword1", "badword2", "slur1")
TOXIC_PATTERN = ("(?i)\\b(" + "|".join(TOXIC_WORDS) + ")\\b", "<TOX>")


def scrub_expr(text: Column, include_toxic: bool = True) -> Column:
    out = text
    for name, pat, rep in PII_PATTERNS:
        needle = _NEEDLES.get(name)
        rep_col = F.regexp_replace(out, pat, rep)
        if needle:
            out = F.when(out.contains(needle), rep_col).otherwise(out)
        else:
            out = rep_col
    if include_toxic:
        out = F.regexp_replace(out, TOXIC_PATTERN[0], TOXIC_PATTERN[1])
    return out


def scrub_hits(text: Column) -> Column:
    """array<struct<field,code,rule,msg>> lineage of scrub-stage hits —
    same shape as rule findings so metrics aggregate uniformly."""
    entries = []
    for i, (name, pat, _rep) in enumerate(PII_PATTERNS):
        # regexp_count == size(regexp_extract_all(...)) without
        # materializing the match array — same value, one less allocation
        # per pattern per row; the indexOf pre-gate skips the regex scan
        # when the required literal is absent
        cnt = F.regexp_count(text, F.lit(pat))
        cnt = F.when(_scrub_gates(text)[name], cnt).otherwise(0)
        entries.append(
            F.when(
                cnt > 0,
                F.struct(
                    F.lit("text").alias("field"),
                    F.lit(0x5000 + i).cast("long").alias("code"),
                    F.lit("scrub").alias("rule"),
                    F.format_string(f"scrubbed %s {name} match(es)",
                                    cnt.cast("string")).alias("msg"))))
    return F.array_compact(F.array(*entries))


#: sound cheap gates per pattern, probed on the ORIGINAL text: every
#: replacement token (<EMAIL>/<SSN>/<PHONE>/<IP>/<TOX>) introduces no
#: digit, '@', '-', '.', or toxic needle, so "original text lacks the
#: required character class" implies "no later step can match" — the
#: gate over-approximates matches and can never change a value
_DIGITS = "0123456789"


def _scrub_gates(text: Column) -> dict:
    has_digit = F.length(F.translate(text, _DIGITS, "")) < F.length(text)
    lt = F.lower(text)
    # the toxic gate derives from TOXIC_WORDS itself so a deploy-time
    # lexicon swap can never silently disable scrubbing: each entry is a
    # literal word, and case-insensitive substring containment strictly
    # over-approximates the \b-anchored regex match
    toxic = F.lit(False)
    for w in TOXIC_WORDS:
        toxic = toxic | lt.contains(w.lower())
    return {
        "email": text.contains("@"),
        "ssn": text.contains("-") & has_digit,
        "phone": has_digit,
        "ipv4": text.contains(".") & has_digit,
        "toxic": toxic,
    }


def with_scrub(df: DataFrame, text_col: str = "text",
               out_col: str = "scrubbed_text",
               include_toxic: bool = True) -> DataFrame:
    """Stepped scrub: each pattern is its own projection, so per-step
    gates reference plain column attributes — no nested-when expression
    blowup (see BENCH.md negative result) — and a doc lacking the
    required character class pays ZERO regex for that step.  Byte-
    identical to ``scrub_expr`` (same chain, same patterns)."""
    gates = _scrub_gates(F.col(text_col))
    cur = text_col
    steps = list(PII_PATTERNS)
    if include_toxic:
        steps = steps + [("toxic", TOXIC_PATTERN[0], TOXIC_PATTERN[1])]
    for i, (name, pat, rep) in enumerate(steps):
        nxt = out_col if i == len(steps) - 1 else f"__scrub{i}"
        df = df.withColumn(
            nxt,
            F.when(gates[name],
                   F.regexp_replace(F.col(cur), pat, rep)).otherwise(
                       F.col(cur)))
        if cur.startswith("__scrub"):
            df = df.drop(cur)
        cur = nxt
    return df


def scrub_sql(text_expr: str = "text", include_toxic: bool = True) -> str:
    """Identical scrub chain as nested DuckDB regexp_replace (global)."""
    out = text_expr
    for _, pat, rep in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{rep}', 'g')"
    if include_toxic:
        pat = TOXIC_PATTERN[0].replace("(?i)", "")
        out = (f"regexp_replace({out}, '{pat}', '{TOXIC_PATTERN[1]}', 'gi')")
    return out

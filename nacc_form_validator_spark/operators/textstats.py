"""Text analysis operators: token counting, quality scoring, document
fingerprinting.

All pure Column algebra (SQL-expressible for the oracle); the BPE-ish
tokenizer approximates subword counts with a regex segmentation — the
production swap-in is a real tokenizer behind the same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: GPT-style pretokenizer approximation: word pieces, numbers, punctuation
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.array_remove(F.split(text, r"\s+"), "")).cast("long")


def bpeish_token_count(text: Column) -> Column:
    """Counts regex-segmented pieces, then inflates long words the way BPE
    splits rare words (~1 token per 6 chars beyond the first 6)."""
    pieces = F.regexp_extract_all(text, F.lit(f"({BPE_ISH_PATTERN})"), 1)
    extra = F.aggregate(
        pieces, F.lit(0).cast("long"),
        lambda a, p: a + F.when(F.length(p) > 6,
                                F.floor((F.length(p) - 1) / 6)).otherwise(
                                    F.lit(0).cast("long")))
    return (F.size(pieces) + extra).cast("long")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score from the Gopher-ish stats — the
    engine's single-number doc rating (length, symbol, stopword,
    repetition terms; weights sum to 1)."""
    from nacc_form_validator_spark.functions.heuristics import doc_stats
    s = doc_stats(text)
    length_term = F.least(s["n_words"] / F.lit(100.0), F.lit(1.0))
    symbol_term = F.lit(1.0) - F.least(F.coalesce(s["symbol_ratio"],
                                                  F.lit(1.0)) * 3,
                                       F.lit(1.0))
    stop_term = F.least(F.coalesce(s["stopword_ratio"], F.lit(0.0)) * 8,
                        F.lit(1.0))
    rep_term = F.lit(1.0) - F.coalesce(s["word_rep_ratio"], F.lit(1.0))
    score = (0.3 * length_term + 0.25 * symbol_term + 0.2 * stop_term +
             0.25 * rep_term)
    # floor-based half-up rounding: engine-independent given identical
    # IEEE-double term math (plain round() ties differ between engines)
    return F.floor(score * 1e6 + 0.5) / 1e6


FINGERPRINT_MOD = (1 << 50) - 27


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint: fold 56-bit word
    md5-hashes with a 31x polynomial accumulator.

    Modulus 2^50-27 keeps every intermediate (31*acc + h < 2^57) inside
    int64 on both Spark and the SQL oracle."""
    w = F.array_remove(F.split(F.lower(text), r"\s+"), "")

    def roll(acc, tok):
        h = F.conv(F.substring(F.md5(tok), 1, 14), 16, 10).cast("long")
        return F.pmod(acc * 31 + h, F.lit(FINGERPRINT_MOD))

    return F.aggregate(w, F.lit(0).cast("long"), roll)

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


def char_entropy(text: Column) -> Column:
    """Shannon entropy (bits/char) of the document's character
    distribution — the cheap compressibility proxy quality pipelines
    use to catch keyboard-mash / repeated-boilerplate / base64-blob
    pages (too LOW entropy = degenerate repetition, too HIGH =
    binary-ish noise; natural language sits ~3.5-4.5 bits/char).

    Implementation is pure HOF Column algebra over the row in ONE
    sorted pass: sort the chars, find run starts (i == 1 or
    cs[i] != cs[i-1]), and fold -p*log2(p) over the run lengths —
    O(len log len) per row.  (The previous distinct x count-by-filter
    form was O(len * alphabet) with a nested rescan per distinct
    char; measured 30-90x slower on the bench corpus and the reason
    char_entropy once read 138 s in a suite run.)  A corpus whose
    rows are megabyte blobs would instead explode chars through the
    (id, char) count aggregate; the per-row form keeps the stat
    shuffle-free, which is what a gate column wants."""
    def bind(val, f):
        # evaluate ``val`` ONCE and hand it to ``f`` as a lambda
        # variable: referencing a Column expression from inside an
        # HOF lambda re-evaluates its whole subtree per element
        # (probed: the inline form re-sorted the char array per
        # element, O(n^2 log n) per row in BOTH engines)
        return F.element_at(F.transform(F.array(val), f), 1)

    chars = F.regexp_extract_all(text, F.lit(r"(?s)(.)"), 1)

    def run_p(starts, k, n):
        return ((F.coalesce(F.try_element_at(starts, k + 1), n + 1) -
                 F.element_at(starts, k)).cast("double") /
                n.cast("double"))

    ent = bind(chars, lambda ch: bind(
        F.array_sort(ch), lambda cs: bind(
            F.filter(F.sequence(F.lit(1), F.size(ch)),
                     lambda i: (i == 1) |
                     (F.element_at(cs, i) != F.element_at(cs, i - 1))),
            lambda starts: F.aggregate(
                F.sequence(F.lit(1), F.size(starts)), F.lit(0.0),
                lambda acc, k: acc -
                run_p(starts, k, F.size(ch)) *
                F.log2(run_p(starts, k, F.size(ch)))))))
    n = F.size(chars)
    return F.when(n > 0, F.round(ent, 6)).otherwise(F.lit(0.0))


def quality_score_sql(text_expr: str = "text") -> str:
    """DuckDB mirror of :func:`quality_score` — same terms over the
    same (rounded) gopher_sql stats, same floor-half-up rounding."""
    from nacc_form_validator_spark.functions.heuristics import gopher_sql
    g = gopher_sql(text_expr)
    length_term = f"least({g['n_words']} / 100.0, 1.0)"
    symbol_term = (f"1.0 - least(coalesce({g['symbol_ratio']}, 1.0) * 3, "
                   f"1.0)")
    stop_term = f"least(coalesce({g['stopword_ratio']}, 0.0) * 8, 1.0)"
    rep_term = f"1.0 - coalesce({g['word_rep_ratio']}, 1.0)"
    return (f"floor((0.3 * ({length_term}) + 0.25 * ({symbol_term}) + "
            f"0.2 * ({stop_term}) + 0.25 * ({rep_term})) * 1e6 + 0.5) "
            f"/ 1e6")


def char_entropy_sql(text_expr: str = "text") -> str:
    """DuckDB mirror of :func:`char_entropy` — same sorted-run single
    pass, same log2 arithmetic, same empty-string zero.  Structured
    as a correlated scalar subquery so the sorted char list and the
    run-start list each evaluate ONCE per row: inlining them into the
    lambdas re-evaluates list_sort per ELEMENT in DuckDB (probed —
    O(n^2 log n) per row, minutes at sf0.01)."""
    chars = f"regexp_extract_all({text_expr}, '(?s)(.)', 1)"
    run = (f"(CAST(coalesce(starts[k + 1], n + 1) - starts[k] "
           f"AS DOUBLE) / n)")
    return (
        f"(SELECT CASE WHEN n > 0 THEN round(list_sum(list_transform("
        f"range(1, len(starts) + 1), "
        f"k -> -{run} * log2({run}))), 6) ELSE 0.0 END "
        f"FROM (SELECT cs, n, list_filter(range(1, n + 1), "
        f"i -> i = 1 OR cs[i] <> cs[i - 1]) AS starts "
        f"FROM (SELECT list_sort({chars}) AS cs, "
        f"len({chars}) AS n)))")


def sentence_stats(text: Column) -> Column:
    """struct(n_sents, mean_sent_words, sent_cv): sentence-length
    burstiness — the coefficient of variation (population stddev /
    mean) of per-sentence word counts.

    Human prose is BURSTY (sentence lengths vary widely); templated
    and machine-generated filler is uniform — a low ``sent_cv`` on a
    long doc is the classic cheap generated-text / template signal
    (public heuristic, e.g. GLTR-era burstiness analyses).  Sentences
    split on terminal punctuation runs followed by whitespace; word
    counts, sums and squares are exact integers inside the row, so the
    only float work is two divisions and a sqrt — zero shuffles, zero
    Python, deterministic across engines.
    """
    sents = F.filter(
        F.transform(F.split(text, r"[.!?]+\s+"), lambda s: F.trim(s)),
        lambda s: s != "")
    lens = F.transform(
        sents,
        lambda s: F.size(F.filter(F.split(s, r"\s+"),
                                  lambda x: x != "")))
    n = F.size(lens)
    tot = F.aggregate(lens, F.lit(0).cast("long"), lambda a, x: a + x)
    tot2 = F.aggregate(lens, F.lit(0).cast("long"),
                       lambda a, x: a + x.cast("long") * x)
    mean = tot / n
    var = tot2 / n - mean * mean
    cv = F.when((n > 0) & (mean > 0),
                F.round(F.sqrt(F.greatest(var, F.lit(0.0))) / mean, 6)
                ).otherwise(F.lit(0.0))
    return F.struct(
        n.cast("long").alias("n_sents"),
        F.when(n > 0, F.round(mean, 6)).otherwise(F.lit(0.0))
        .alias("mean_sent_words"),
        cv.alias("sent_cv"))


def sentence_stats_sql(text_expr: str = "text") -> dict:
    """DuckDB mirrors of :func:`sentence_stats`'s three fields."""
    sents = (f"list_filter(list_transform(string_split_regex("
             f"{text_expr}, '[.!?]+\\s+'), s -> trim(s)), "
             f"s -> s <> '')")
    lens = (f"list_transform({sents}, s -> len(list_filter("
            f"string_split_regex(s, '\\s+'), x -> x <> '')))")
    n = f"len({lens})"
    tot = f"list_sum(list_transform({lens}, x -> CAST(x AS BIGINT)))"
    tot2 = (f"list_sum(list_transform({lens}, x -> CAST(x AS BIGINT) "
            f"* x))")
    mean = f"({tot} / {n})"
    var = f"({tot2} / {n} - {mean} * {mean})"
    return {
        "n_sents": f"CAST({n} AS BIGINT)",
        "mean_sent_words": (f"CASE WHEN {n} > 0 THEN round({mean}, 6) "
                            f"ELSE 0.0 END"),
        "sent_cv": (f"CASE WHEN {n} > 0 AND {mean} > 0 THEN "
                    f"round(sqrt(greatest({var}, 0.0)) / {mean}, 6) "
                    f"ELSE 0.0 END"),
    }


def readability(text: Column) -> Column:
    """Flesch reading-ease score with vowel-group syllable counting.

    FRE = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words),
    the classic readability screen (Flesch 1948; public formula) — a
    cheap quality signal that separates prose from keyword-stuffed and
    telegraphic junk.  Syllables are approximated as runs of
    ``[aeiouy]+`` per lowercased word with a 1-syllable floor (the
    standard public approximation); sentences split like
    :func:`sentence_stats` with a 1-sentence floor so headline-only
    docs score instead of dividing by zero.  Pure in-row HOF
    projection — zero shuffles, zero Python; empty docs -> NULL.
    """
    words = F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    sents = F.filter(
        F.transform(F.split(text, r"[.!?]+\s+"), lambda s: F.trim(s)),
        lambda s: s != "")
    n_sents = F.greatest(F.size(sents), F.lit(1))
    syll = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda a, w: a + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)),
            F.lit(1)).cast("long"))
    return F.when(
        n_words > 0,
        F.round(F.lit(206.835)
                - F.lit(1.015) * (n_words.cast("double") / n_sents)
                - F.lit(84.6) * (syll.cast("double") / n_words), 6))


def readability_sql(text_expr: str = "text") -> str:
    """DuckDB mirror of :func:`readability` — same splits, same vowel
    groups, same floors, same rounding."""
    words = (f"list_filter(string_split_regex(lower({text_expr}), "
             f"'\\s+'), x -> x <> '')")
    n_words = f"len({words})"
    sents = (f"list_filter(list_transform(string_split_regex("
             f"{text_expr}, '[.!?]+\\s+'), s -> trim(s)), s -> s <> '')")
    n_sents = f"greatest(len({sents}), 1)"
    syll = (f"list_sum(list_transform({words}, w -> CAST(greatest("
            f"len(regexp_extract_all(w, '[aeiouy]+')), 1) AS BIGINT)))")
    return (f"CASE WHEN {n_words} > 0 THEN "
            f"round(206.835 - 1.015 * (CAST({n_words} AS DOUBLE) / "
            f"{n_sents}) - 84.6 * (CAST({syll} AS DOUBLE) / {n_words}), 6) "
            f"END")

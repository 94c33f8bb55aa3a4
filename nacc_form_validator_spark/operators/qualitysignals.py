"""One-pass quality-signal bundle + gate-threshold calibration sweep.

Production corpus pipelines (Dolma's taggers, RedPajama-v2's quality
signals) separate SIGNAL COMPUTATION from GATING: one expensive pass
over the corpus materializes every per-document signal as a column,
and the keep/drop thresholds are then tuned OFFLINE against that
signals table — re-gating is a cheap filter over precomputed columns
instead of a re-scan of 100 TB of text.  This module provides both
halves:

- :func:`quality_signals` — every expression-level signal the engine
  knows (Gopher stats, language ID, char entropy, mojibake damage,
  junk-phrase hits, the composite quality score) in ONE codegen
  projection over ONE scan of the text.
- :func:`threshold_sweep` — the tuning half: keep-rate at each point
  of a threshold grid in ONE aggregate (T conditional sums folded into
  a single map-side partial agg; the corpus is never exploded by the
  grid and only one 1-row exchange reaches the driver side).

Scale shape: ``quality_signals`` is shuffle-free (pure projection;
signals that need corpus state — perplexity tertiles, NB scores, OOV
vocab — stay in their own modules because they genuinely shuffle).
``threshold_sweep`` aggregates T+1 longs per partition regardless of
corpus size.

Reference parity: the reference validates each record against a rule
schema and reports per-field errors (nacc-form-validator
quality_check.py:24-44); the signals table is the corpus analogue of
its per-record metrics, with the same rules-are-data discipline — the
sweep tunes exactly the thresholds GOPHER_RULES carries.

Plan hygiene (the aux-column discipline, see BENCH.md): word/line
arrays and the packed per-word folds are materialized ONCE as
attributes; every signal reads the named columns, so HOF folds run
once per row and the dominant-stat CASE walks never inline the
exponential subtree expansion that breaks whole-stage codegen.
"""

from __future__ import annotations

from typing import Iterable, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_signals(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, lang, n_chars, n_words, mean_word_len, alpha_ratio,
    digit_ratio, symbol_ratio, stopword_ratio, dup_line_ratio,
    word_rep_ratio, entropy, moji_hits, junk_hits, quality) — the full
    expression-level signal set in one projection.

    Value-identical to calling the individual signal functions
    (``with_doc_stats``, ``langid_expr``, ``char_entropy``,
    ``mojibake_hits``, ``junk_hits``, ``quality_score``) — the bundle
    only changes HOW OFTEN the text is tokenized (once), never a value;
    tests pin that law.
    """
    from nacc_form_validator_spark.functions.heuristics import (
        doc_stats, packed_word_fold, words)
    from nacc_form_validator_spark.functions.junkpages import junk_hits
    from nacc_form_validator_spark.functions.langid import (
        langid_from_packed, langid_packed_folds)
    from nacc_form_validator_spark.functions.mojibake import mojibake_hits
    from nacc_form_validator_spark.operators.textstats import char_entropy

    t = F.col(text_col)
    # stage 1: the shared arrays (case-preserving words for stats,
    # lowered words for the language profiles, lines for dup-line)
    arr = docs.select(
        F.col(id_col), t.alias("__t"),
        words(t).alias("__w"),
        F.array_remove(F.split(F.lower(t), r"\s+"), "").alias("__wl"),
        F.array_remove(F.split(t, r"\n"), "").alias("__l"))
    # stage 2: the per-word folds, each traversing its array ONCE
    p1, p2 = langid_packed_folds(F.col("__wl"))
    folded = arr.select(
        id_col, "__t", "__w", "__l",
        packed_word_fold(F.col("__w")).alias("__p"),
        p1.alias("__p1"), p2.alias("__p2"))
    # stage 3: every signal over the named aux columns
    s = doc_stats(F.col("__t"), w=F.col("__w"), lines=F.col("__l"),
                  packed=F.col("__p"))
    sig = folded.select(
        F.col(id_col).alias("id"),
        langid_from_packed(F.col("__t"), F.col("__p1"),
                           F.col("__p2")).alias("lang"),
        s["n_chars"].alias("n_chars"),
        s["n_words"].alias("n_words"),
        s["mean_word_len"].alias("mean_word_len"),
        s["alpha_ratio"].alias("alpha_ratio"),
        s["digit_ratio"].alias("digit_ratio"),
        s["symbol_ratio"].alias("symbol_ratio"),
        s["stopword_ratio"].alias("stopword_ratio"),
        s["dup_line_ratio"].alias("dup_line_ratio"),
        s["word_rep_ratio"].alias("word_rep_ratio"),
        char_entropy(F.col("__t")).alias("entropy"),
        mojibake_hits(F.col("__t")).alias("moji_hits"),
        junk_hits(F.col("__t")).alias("junk_hits"))
    # stage 4: the composite score over the (rounded) named stats —
    # same formula, operand for operand, as textstats.quality_score
    length_term = F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0))
    symbol_term = F.lit(1.0) - F.least(
        F.coalesce(F.col("symbol_ratio"), F.lit(1.0)) * 3, F.lit(1.0))
    stop_term = F.least(
        F.coalesce(F.col("stopword_ratio"), F.lit(0.0)) * 8, F.lit(1.0))
    rep_term = F.lit(1.0) - F.coalesce(F.col("word_rep_ratio"),
                                       F.lit(1.0))
    score = (0.3 * length_term + 0.25 * symbol_term + 0.2 * stop_term +
             0.25 * rep_term)
    return sig.select(
        "*", (F.floor(score * 1e6 + 0.5) / 1e6).alias("quality"))


def quality_signals_sql(docs_sql: str, id_expr: str = "doc_id",
                        text_expr: str = "text") -> str:
    """DuckDB mirror of :func:`quality_signals` — composed from the
    same per-signal SQL generators the individual oracles use."""
    from nacc_form_validator_spark.functions.heuristics import gopher_sql
    from nacc_form_validator_spark.functions.junkpages import junk_hits_sql
    from nacc_form_validator_spark.functions.langid import langid_sql
    from nacc_form_validator_spark.functions.mojibake import (
        mojibake_hits_sql)
    from nacc_form_validator_spark.operators.textstats import (
        char_entropy_sql, quality_score_sql)

    g = gopher_sql(text_expr)
    cols = [f"{id_expr} AS id", f"{langid_sql(text_expr)} AS lang"]
    for name in ("n_chars", "n_words", "mean_word_len", "alpha_ratio",
                 "digit_ratio", "symbol_ratio", "stopword_ratio",
                 "dup_line_ratio", "word_rep_ratio"):
        cols.append(f"{g[name]} AS {name}")
    cols.append(f"{char_entropy_sql(text_expr)} AS entropy")
    cols.append(f"{mojibake_hits_sql(text_expr)} AS moji_hits")
    cols.append(f"{junk_hits_sql(text_expr)} AS junk_hits")
    cols.append(f"{quality_score_sql(text_expr)} AS quality")
    return (f"SELECT {', '.join(cols)} FROM ({docs_sql}) ORDER BY id")


def threshold_sweep(df: DataFrame, signal: Union[Column, str],
                    thresholds: Sequence[float],
                    direction: str = ">=") -> DataFrame:
    """(threshold, n_kept, n_total, keep_rate) — the keep-rate curve of
    a gate over a threshold grid, computed in ONE aggregate pass.

    ``direction`` is the keep condition: ``">="`` keeps rows whose
    signal is at or above the threshold (higher-is-better signals like
    the quality score), ``"<="`` keeps at-or-below (lower-is-better
    signals like perplexity or symbol_ratio).

    Scale shape: each grid point is one conditional sum inside a single
    ``df.agg`` — T+1 longs per partition in the map-side partial, one
    1-row exchange, then the 1×(T+1) row is unpivoted with ``stack``.
    The corpus is scanned once and never multiplied by the grid (the
    naive form — cross-joining the grid then grouping — shuffles T
    copies of every row's signal).  Null signals count as dropped at
    every threshold (a gate cannot keep what it cannot score).
    """
    if direction not in (">=", "<="):
        raise ValueError(
            f"threshold_sweep: direction must be '>=' or '<=', "
            f"got {direction!r}")
    if not thresholds:
        raise ValueError("threshold_sweep: empty threshold grid")
    sig = F.col(signal) if isinstance(signal, str) else signal
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, thr in enumerate(thresholds):
        keep = (sig >= F.lit(float(thr))) if direction == ">=" else \
            (sig <= F.lit(float(thr)))
        aggs.append(F.sum(F.when(keep, 1).otherwise(0))
                    .cast("long").alias(f"__k{i}"))
    row = df.agg(*aggs)
    pairs = ", ".join(
        f"CAST({float(thr)!r} AS DOUBLE), __k{i}"
        for i, thr in enumerate(thresholds))
    return (row.select(
        F.col("__n"),
        F.expr(f"stack({len(thresholds)}, {pairs}) "
               f"AS (threshold, n_kept)"))
        .select(
            "threshold",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.col("__n").cast("long").alias("n_total"),
            F.round(F.coalesce(F.col("n_kept"), F.lit(0)) /
                    F.greatest(F.col("__n"), F.lit(1)), 6)
            .alias("keep_rate"))
        .orderBy("threshold"))


def threshold_sweep_sql(docs_sql: str, signal_sql: str,
                        thresholds: Sequence[float],
                        direction: str = ">=") -> str:
    """DuckDB mirror of :func:`threshold_sweep` (grid as a VALUES
    relation — fine for the oracle: the grid is tiny and the oracle
    runs at sf0.01)."""
    if direction not in (">=", "<="):
        raise ValueError(
            f"threshold_sweep_sql: direction must be '>=' or '<=', "
            f"got {direction!r}")
    vals = ", ".join(f"(CAST({float(t)!r} AS DOUBLE))" for t in thresholds)
    return (
        f"WITH s AS (SELECT {signal_sql} AS sig FROM ({docs_sql})), "
        f"g AS (SELECT * FROM (VALUES {vals}) AS v(threshold)) "
        f"SELECT threshold, "
        f"CAST(sum(CASE WHEN sig {direction} threshold THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_kept, "
        f"CAST(count(*) AS BIGINT) AS n_total, "
        f"round(sum(CASE WHEN sig {direction} threshold THEN 1 ELSE 0 "
        f"END) * 1.0 / greatest(count(*), 1), 6) AS keep_rate "
        f"FROM s CROSS JOIN g GROUP BY threshold ORDER BY threshold")

"""Multi-signal quality ensemble: the FineWeb/RefinedWeb-style final
verdict that real curation pipelines actually ship.

No production corpus is filtered by ONE signal: the shipped keep/drop
decision is a conjunction of heuristic gates (Gopher bounds), a trained
classifier score (the fastText-stage analogue), a language-model
perplexity cut (CCNet tertiles), and degenerate-content guards
(entropy band) — each recorded per document so curation decisions are
auditable, exactly the reference's findings-per-rule discipline
(quality_check.py errors + error_tree) lifted to signal granularity.

Scale shape (10^12 docs): the heuristic gate and the entropy guard are
computed in ONE projection over the corpus (no join — they are row
algebra over the same text); only the two signals that genuinely need
corpus aggregates join back, and both joins are id-co-keyed (the NB
score table and the perplexity-bucket table), so the ensemble adds two
id-hash joins to whatever its inputs already cost — nothing new is
shuffled by content.  Every signal threshold is a parameter; the
verdict and per-signal booleans are pure projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_ensemble(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", lang_col: str = "lang",
                     nb_threshold: float = 0.0,
                     entropy_band: "tuple[float, float]" = (2.0, 6.0)
                     ) -> DataFrame:
    """(id, gopher_ok, nb_score, ppl_bucket, entropy, g_ok, nb_ok,
    ppl_ok, ent_ok, keep, n_fails): keep iff ALL of — Gopher bounds
    pass, trained-NB score > ``nb_threshold``, CCNet perplexity bucket
    is not 'tail', char entropy inside ``entropy_band``.

    The NB model trains inline here (self-contained query form); a
    production run trains once and scores many
    (selection.train_nb_quality / score_nb_quality), and would swap
    ppl_buckets for the histogram ppl_buckets_approx — both swaps are
    column-compatible."""
    from nacc_form_validator_spark.functions.heuristics import (
        with_doc_stats)
    from nacc_form_validator_spark.functions.perplexity import ppl_buckets
    from nacc_form_validator_spark.operators.selection import (
        gopher_label, nb_quality_scores)
    from nacc_form_validator_spark.operators.textstats import char_entropy

    base = (with_doc_stats(docs, text_col=text_col)
            .withColumn("__g", gopher_label())
            .select(F.col(id_col).alias("id"),
                    F.col("__g").alias("gopher_ok"),
                    char_entropy(F.col(text_col)).alias("entropy")))
    nb = (nb_quality_scores(docs, id_col=id_col, text_col=text_col)
          .select("id", F.col("score").alias("nb_score")))
    pb = (ppl_buckets(docs, id_col=id_col, text_col=text_col,
                      lang_col=lang_col)
          .select("id", F.col("bucket").alias("ppl_bucket")))
    j = base.join(nb, "id").join(pb, "id")
    g_ok = F.col("gopher_ok")
    nb_ok = F.col("nb_score") > nb_threshold
    ppl_ok = F.col("ppl_bucket") != "tail"
    ent_ok = ((F.col("entropy") >= entropy_band[0]) &
              (F.col("entropy") <= entropy_band[1]))
    fails = sum(F.when(ok, 0).otherwise(1)
                for ok in (g_ok, nb_ok, ppl_ok, ent_ok))
    return (j.select(
        "id", "gopher_ok", "nb_score", "ppl_bucket", "entropy",
        g_ok.alias("g_ok"), nb_ok.alias("nb_ok"),
        ppl_ok.alias("ppl_ok"), ent_ok.alias("ent_ok"),
        (g_ok & nb_ok & ppl_ok & ent_ok).alias("keep"),
        fails.cast("long").alias("n_fails"))
        .orderBy("id"))


#: default per-gate relative evaluation costs: the Gopher bounds and
#: the entropy guard are one projection over text already in hand; the
#: perplexity cut pays a token explode + model join; the NB classifier
#: pays tokenize + score join.  Relative units — only ratios matter.
DEFAULT_GATE_COSTS = {"g_ok": 1.0, "ent_ok": 1.0,
                      "ppl_ok": 3.0, "nb_ok": 5.0}


def cascade_plan(ens: DataFrame,
                 gates: "tuple[str, ...]" = ("g_ok", "nb_ok",
                                             "ppl_ok", "ent_ok"),
                 costs: "dict[str, float] | None" = None) -> DataFrame:
    """Cheapest-reject-first evaluation order for conjunctive gates.

    A document is dropped at its FIRST failing gate, so a cascade
    evaluates expensive gates only on documents the cheap gates kept.
    For statistically independent gates the order minimizing expected
    cost per document ranks by drop_rate / cost descending (the
    classic filter-ordering rule from pipelined selection planning) —
    at 10^12 docs the difference between the best and worst order of
    a 5x-cost classifier gate is the classifier's GPU/CPU bill.

    Output per gate: ``n_fail``, ``drop_rate``, ``cost``,
    ``eval_order`` (the plan), ``reach_frac`` (fraction of docs that
    reach the gate under independence — the product of preceding
    gates' pass rates), and ``cum_cost`` (expected per-doc cost of the
    cascade up to and including this gate).  One corpus aggregate
    total; the plan math runs on the |gates|-row result.
    """
    costs = dict(DEFAULT_GATE_COSTS if costs is None else costs)
    from pyspark.sql import Window
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for g in gates:
        aggs.append(F.sum(F.when(~F.col(g), 1).otherwise(0))
                    .alias(f"__f_{g}"))
    row = ens.agg(*aggs)
    arr = F.array(*[F.struct(
        F.lit(g).alias("gate"),
        F.col(f"__f_{g}").cast("long").alias("n_fail"),
        F.lit(float(costs[g])).alias("cost")) for g in gates])
    r = (row.select("n_docs", F.explode(arr).alias("s"))
         .select(F.col("s.gate").alias("gate"),
                 F.col("s.n_fail").alias("n_fail"),
                 F.col("s.cost").alias("cost"),
                 (F.col("s.n_fail") / F.col("n_docs")).alias("__dr")))
    w = Window.orderBy((F.col("__dr") / F.col("cost")).desc(),
                       F.col("gate").asc())
    r = (r.withColumn("eval_order", F.row_number().over(w))
         .withColumn(
             "reach_frac",
             F.exp(F.coalesce(
                 F.sum(F.log(F.greatest(1.0 - F.col("__dr"),
                                        F.lit(1e-300))))
                 .over(w.rowsBetween(Window.unboundedPreceding, -1)),
                 F.lit(0.0)))))
    wo = Window.orderBy("eval_order")
    return (r.withColumn(
        "cum_cost",
        F.sum(F.col("cost") * F.col("reach_frac"))
        .over(wo.rowsBetween(Window.unboundedPreceding, 0)))
        .select("gate", "n_fail", F.round("__dr", 6).alias("drop_rate"),
                "cost", "eval_order",
                F.round("reach_frac", 6).alias("reach_frac"),
                F.round("cum_cost", 6).alias("cum_cost"))
        .orderBy("eval_order"))


def cascade_plan_sql(ens_sql: str,
                     gates: "tuple[str, ...]" = ("g_ok", "nb_ok",
                                                 "ppl_ok", "ent_ok"),
                     costs: "dict[str, float] | None" = None) -> str:
    """DuckDB mirror of :func:`cascade_plan` over an ensemble query."""
    costs = dict(DEFAULT_GATE_COSTS if costs is None else costs)
    fsums = ", ".join(
        f"CAST(sum(CASE WHEN NOT {g} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS f_{g}" for g in gates)
    unions = " UNION ALL ".join(
        f"SELECT '{g}' AS gate, f_{g} AS n_fail, "
        f"CAST({float(costs[g])!r} AS DOUBLE) AS cost, n_docs FROM agg"
        for g in gates)
    ordw = "ORDER BY dr / cost DESC, gate ASC"
    return (
        f"WITH e AS ({ens_sql}), "
        f"agg AS (SELECT count(*) AS n_docs, {fsums} FROM e), "
        f"rows_ AS ({unions}), "
        f"r AS (SELECT gate, n_fail, cost, "
        f"CAST(n_fail AS DOUBLE) / n_docs AS dr FROM rows_), "
        f"o AS (SELECT gate, n_fail, cost, dr, "
        f"row_number() OVER ({ordw}) AS eval_order, "
        f"exp(coalesce(sum(ln(greatest(1.0 - dr, 1e-300))) "
        f"OVER ({ordw} ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"1 PRECEDING), 0.0)) AS reach FROM r) "
        f"SELECT gate, n_fail, round(dr, 6) AS drop_rate, cost, "
        f"eval_order, round(reach, 6) AS reach_frac, "
        f"round(sum(cost * reach) OVER (ORDER BY eval_order "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) "
        f"AS cum_cost FROM o ORDER BY eval_order")


def gate_ablation(ens: DataFrame,
                  gates: "tuple[str, ...]" = ("g_ok", "nb_ok",
                                              "ppl_ok", "ent_ok")
                  ) -> DataFrame:
    """Per-gate ablation report over a :func:`quality_ensemble` output.

    For each gate: ``n_fail`` (docs it fails), ``n_exclusive`` (docs
    ONLY it fails — exactly the docs recovered if the gate were
    dropped), and ``keep_rate_without`` = (n_keep + n_exclusive) /
    n_docs.  This is the curation-review question ("what does each
    gate uniquely buy us?") answered in ONE aggregate: all 2 + 2×gates
    conditional sums ride a single map-side partial over the ensemble
    table; the unpivot happens on the 1-row result.
    """
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep")]
    for g in gates:
        only_g = ~F.col(g)
        for o in gates:
            if o != g:
                only_g = only_g & F.col(o)
        aggs.append(F.sum(F.when(~F.col(g), 1).otherwise(0))
                    .alias(f"__f_{g}"))
        aggs.append(F.sum(F.when(only_g, 1).otherwise(0))
                    .alias(f"__x_{g}"))
    row = ens.agg(*aggs)
    arr = F.array(*[F.struct(
        F.lit(g).alias("gate"),
        F.col(f"__f_{g}").cast("long").alias("n_fail"),
        F.col(f"__x_{g}").cast("long").alias("n_exclusive"))
        for g in gates])
    return (row.select("n_docs", "n_keep", F.explode(arr).alias("s"))
            .select(F.col("s.gate").alias("gate"),
                    F.col("s.n_fail").alias("n_fail"),
                    F.col("s.n_exclusive").alias("n_exclusive"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_keep").cast("long").alias("n_keep"),
                    F.round((F.col("n_keep") + F.col("s.n_exclusive"))
                            / F.col("n_docs"), 6)
                    .alias("keep_rate_without"))
            .orderBy("gate"))

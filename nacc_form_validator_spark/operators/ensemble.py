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

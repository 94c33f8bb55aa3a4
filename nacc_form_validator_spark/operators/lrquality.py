"""Logistic-regression quality classifier over hashed text features.

The GPT-3 / CCNet quality-filter shape (Brown et al. 2020 trained a
logistic classifier over hashed n-gram features to score Common-Crawl
pages against a high-quality reference; fastText's supervised mode is
the same linear-over-hashed-features model): a LINEAR model whose
features need no vocabulary (the hashing trick, operators/features.py)
and whose training is nothing but full-batch gradient descent — per
iteration ONE narrow aggregate produces the (dim+1)-component
gradient, the driver holds only that vector and broadcasts the updated
weights back as literals.  At 10^12 docs the per-iteration cost is a
map-side partial agg + a (dim+1)-double exchange: the same
driver-footprint contract as `simsearch.kmeans_train` and
`bpe.train_bpe_merges`.

Here the default training labels come from one of the engine's own
heuristic gates (stopword density >= 0.04) — the classifier learns to
imitate a hand-written gate from bag-of-hashed-words evidence, which
is the production bootstrap when no curated reference corpus exists
(label with cheap heuristics, train the generalizing classifier, then
score with the model where the heuristics are too brittle).  Any
other 0/1 label column works; note that LENGTH-driven labels are
unlearnable by design — the features are length-normalized, so pick
word-evidence targets.

Determinism (repo-wide law): features round to 6 decimals, every
gradient component rounds to 6 per iteration, and the weight update
rounds to 6 — all inside the engine (Spark HALF_UP == DuckDB round),
never in Python — so the whole train+score path is value-reproducible
in the DuckDB oracle (same IEEE expression tree, same rounding
points).  Rounding is part of the algorithm spec, as in kmeans_train.

Reference analogue: none (recast LLM-corpus surface); public sources:
Brown et al. 2020 appendix A, Joulin et al. 2016 (fastText), Weinberger
et al. 2009 (hashing trick).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.features import (
    _token_codes, _tokens, hashed_doc_vectors_sql)
from nacc_form_validator_spark.operators.index import TOKEN_SPLIT_RE


def lr_features(docs: DataFrame, label: Column, dim: int = 8,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, x, y): x = the dim-length signed hashed-TF vector
    length-normalized by token count (each component rounded to 6)
    plus a trailing 1.0 bias; y = the 0/1 label as double.  One scan,
    pure projection — the corpus keeps its partitioning."""
    t = F.col(text_col)
    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    vec = F.aggregate(
        _token_codes(t, dim), zero,
        lambda acc, c: F.transform(
            acc, lambda x, i: x + F.when(
                F.floor(c / 2) == i,
                1 - 2 * (c % 2)).otherwise(0).cast("long")))
    n = F.greatest(F.size(_tokens(t)), F.lit(1))
    x = F.concat(
        F.transform(vec, lambda v: F.round(v / n, 6)),
        F.array(F.lit(1.0)))
    return docs.select(F.col(id_col).alias("id"), x.alias("x"),
                       label.cast("double").alias("y"))


def lr_standardize(feats: DataFrame, dim: int):
    """Z-score each hashed feature (bias untouched): ONE aggregate
    collects the per-component corpus mean and population stddev
    (rounded to 6; stddev floored at 1e-6 in-engine), then a pure
    projection rebuilds x.  GD over raw normalized-TF features crawls
    — components span two orders of magnitude against a unit bias —
    while the standardized problem converges in ~a dozen steps; the
    standardization IS part of the model (the scorer applies the same
    (m, s))."""
    row = feats.agg(*(
        [F.round(F.avg(F.col("x")[i]), 6).alias(f"m{i}")
         for i in range(dim)] +
        [F.greatest(F.round(F.stddev_pop(F.col("x")[i]), 6),
                    F.lit(0.000001)).alias(f"s{i}")
         for i in range(dim)])).first()
    m = [row[f"m{i}"] for i in range(dim)]
    s = [row[f"s{i}"] for i in range(dim)]
    marr = F.array(*[F.lit(v) for v in m])
    sarr = F.array(*[F.lit(v) for v in s])
    z = F.concat(
        F.transform(
            F.slice(F.col("x"), 1, dim),
            lambda v, i: F.round(
                (v - F.element_at(marr, i + 1)) /
                F.element_at(sarr, i + 1), 6)),
        F.array(F.lit(1.0)))
    return feats.select("id", z.alias("x"), "y"), m, s


def _dot_w(w: List[float]) -> Column:
    """w·x as a left-to-right fold (matches the oracle's + chain)."""
    wlit = F.array(*[F.lit(v) for v in w])
    return F.aggregate(
        F.zip_with(F.col("x"), wlit, lambda a, b: a * b),
        F.lit(0.0), lambda acc, v: acc + v)


def lr_train(feats: DataFrame, dim: int = 8, iters: int = 4,
             lr: float = 2.0) -> List[float]:
    """Full-batch GD: w_i <- round(w_i - lr * round(avg((p-y)*x_i), 6), 6)
    with p = sigmoid(w·x).  Returns the trained (dim+1) weight list
    (bias last).  iters jobs, each ONE narrow aggregate; the driver
    holds dim+1 doubles."""
    w = [0.0] * (dim + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + F.exp(-_dot_w(w)))
        # project the residual ONCE per row: aggregate expressions get
        # no common-subexpression elimination, so leaving (p - y)
        # inline would re-evaluate the dot+sigmoid dim+1 times per row
        row = (feats.select((p - F.col("y")).alias("e"), "x")
               .agg(*[
                   F.round(F.lit(w[i]) - lr * F.round(
                       F.avg(F.col("e") * F.col("x")[i]), 6), 6)
                   .alias(f"w{i}")
                   for i in range(dim + 1)])).first()
        w = [row[f"w{i}"] for i in range(dim + 1)]
    return w


def lr_score(feats: DataFrame, w: List[float]) -> DataFrame:
    """(id, lr_score, pred, label) under a TRAINED weight vector — the
    score-many half; pure projection over the feature scan."""
    p = F.round(1.0 / (1.0 + F.exp(-_dot_w(w))), 6)
    return (feats.select("id", p.alias("lr_score"),
                         (p >= 0.5).alias("pred"),
                         F.col("y").alias("label"))
            .orderBy("id"))


def lr_quality(docs: DataFrame, dim: int = 64, iters: int = 12,
               lr: float = 1.0, id_col: str = "doc_id",
               text_col: str = "text",
               label: Optional[Column] = None) -> DataFrame:
    """Inline featurize+standardize+train+score.  Default label: the
    stopword-density gate (doc_stats stopword_ratio >= 0.04) — a
    WORD-EVIDENCE target the bag-of-hashed-words model can genuinely
    recover (stopwords own specific buckets), unlike length-driven
    gates that normalization erases; at dim=64 the trained model
    agrees with the gate on ~84% of the sf0.01 corpus vs a 67%
    majority baseline.  Call :func:`lr_features` /
    :func:`lr_standardize` / :func:`lr_train` / :func:`lr_score`
    separately to train once and score many."""
    if label is None:
        from nacc_form_validator_spark.functions.heuristics import (
            doc_stats)
        label = doc_stats(F.col(text_col))["stopword_ratio"] >= 0.04
    # the hash fold is the dominant cost (O(tokens x dim) per doc):
    # spread it across cores even when the input is one parquet split
    # — one cheap (id, text) shuffle buys 13+ parallel passes
    par = docs.sparkSession.sparkContext.defaultParallelism
    feats = lr_features(docs.repartition(par), label, dim,
                        id_col, text_col)
    zf, _, _ = lr_standardize(feats, dim)
    # iters+1 passes reuse the SAME feature table: persist it once
    # instead of re-running the hash fold per GD step (caller frees it
    # via dedup.release_intermediates, the repo-wide contract)
    zf = zf.persist()
    out = lr_score(zf, lr_train(zf, dim, iters, lr))
    out._persisted_intermediates = [zf]  # type: ignore[attr-defined]
    return out


def _feats_ctes(dim: int, table: str, id_sql: str,
                text_sql: str, label_sql: str) -> str:
    toks = (f"list_filter(string_split_regex(lower(coalesce({text_sql}, "
            f"'')), '{TOKEN_SPLIT_RE}'), s -> s <> '')")
    return (
        f"hv AS ({hashed_doc_vectors_sql(dim, table, id_sql, text_sql)}), "
        f"nt AS (SELECT {id_sql} AS id, greatest(len({toks}), 1) AS n, "
        f"CAST(CASE WHEN {label_sql} THEN 1 ELSE 0 END AS DOUBLE) AS y "
        f"FROM {table}), "
        f"raw AS (SELECT hv.id, list_append(list_transform(hv.hvec, "
        f"v -> round(CAST(v AS DOUBLE) / nt.n, 6)), 1.0) AS x, nt.y "
        f"FROM hv JOIN nt USING (id))")


def lr_quality_sql(dim: int = 64, iters: int = 12, lr: float = 1.0,
                   table: str = "documents", id_sql: str = "doc_id",
                   text_sql: str = "text",
                   label_sql: Optional[str] = None) -> str:
    """DuckDB mirror of :func:`lr_quality`: standardization as one
    stats CTE, the GD loop unrolled as one CTE per iteration (each a
    1-row weight table), same rounding points, same left-to-right
    dot-product order."""
    if label_sql is None:
        from nacc_form_validator_spark.functions.heuristics import (
            gopher_sql)
        label_sql = f"{gopher_sql(text_sql)['stopword_ratio']} >= 0.04"
    D = dim + 1
    m = ", ".join(f"round(avg(x[{i + 1}]), 6)" for i in range(dim))
    sdev = ", ".join(
        f"greatest(round(stddev_pop(x[{i + 1}]), 6), 0.000001)"
        for i in range(dim))
    parts = [_feats_ctes(dim, table, id_sql, text_sql, label_sql),
             f"st AS (SELECT [{m}] AS m, [{sdev}] AS s FROM raw)",
             f"f AS (SELECT id, list_append(list_transform("
             f"x[1:{dim}], (v, i) -> round((v - st.m[i]) / st.s[i], "
             f"6)), 1.0) AS x, y FROM raw, st)",
             "w0 AS (SELECT " + ", ".join(
                 f"0.0 AS c{i}" for i in range(D)) + ")"]

    def dot(src: str) -> str:
        return " + ".join(f"{src}.c{i} * x[{i + 1}]" for i in range(D))

    for k in range(1, iters + 1):
        p = f"1.0 / (1.0 + exp(-({dot(f'w{k - 1}')})))"
        cols = ", ".join(
            f"round(w{k - 1}.c{i} - {lr!r} * round(avg(({p} - y) * "
            f"x[{i + 1}]), 6), 6) AS c{i}" for i in range(D))
        parts.append(f"w{k} AS (SELECT {cols} FROM f, w{k - 1} "
                     f"GROUP BY {', '.join(f'w{k - 1}.c{i}' for i in range(D))})")
    pfin = f"round(1.0 / (1.0 + exp(-({dot(f'w{iters}')}))), 6)"
    return ("WITH " + ", ".join(parts) +
            f" SELECT f.id, {pfin} AS lr_score, {pfin} >= 0.5 AS pred, "
            f"f.y AS label FROM f, w{iters} ORDER BY f.id")

"""Deterministic sampling operators for training-data pipelines.

Hash-based sampling beats ``df.sample`` for pipeline work because it is
(a) deterministic across retries/resumes — a resumed job keeps exactly
the same sample, no RNG state to checkpoint — and (b) consistent across
tables: sampling users and their events by the same key keeps them
aligned.  Both operators are pure Column algebra and sit under DuckDB
value oracles.

- :func:`hash_sample` — keep a row iff the md5-derived uniform of its
  key falls under ``rate`` (map-side filter, no shuffle, pushes down);
- :func:`stratified_hash_sample` — per-stratum rates (e.g. downsample
  hot languages, keep the long tail);
- :func:`per_group_topk` — quota selection: best ``k`` rows per group
  by a score (one window pass; the partial top-k runs map-side at
  scale via the window's rank filter).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_uniform(key: Column) -> Column:
    """Deterministic uniform in [0, 1): first 8 md5 hex chars / 2^32."""
    return (F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
            .cast("double") / float(1 << 32))


def hash_sample(df: DataFrame, rate: float,
                key_col: str) -> DataFrame:
    """Keep ~rate of rows, deterministically by key hash."""
    return df.where(hash_uniform(F.col(key_col)) < rate)


def stratified_hash_sample(df: DataFrame, rates: Dict[str, float],
                           stratum_col: str, key_col: str,
                           default_rate: float = 1.0) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps ~rates[s] of
    its rows (default_rate for unlisted strata)."""
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == s, F.lit(float(r))) \
            .otherwise(rate)
    return df.where(hash_uniform(F.col(key_col)) < rate)


def per_group_topk(df: DataFrame, group_col: str, score: Column,
                   k: int, tiebreak_col: Optional[str] = None,
                   rank_col: str = "rank") -> DataFrame:
    """Best k rows per group by descending score (quota selection, e.g.
    top-k highest-quality docs per host).  Deterministic via the
    tiebreak column.  The output rank lands in ``rank_col``; a clash
    with an existing input column errors instead of silently emitting
    two same-named columns."""
    if rank_col in df.columns:
        raise ValueError(
            f"per_group_topk: input already has a {rank_col!r} column; "
            f"pass rank_col= to choose a different output name")
    order = [score.desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (df.withColumn("__rank", F.row_number().over(w))
            .where(F.col("__rank") <= k)
            .withColumnRenamed("__rank", rank_col))


def temperature_weights(weights: Dict[str, float],
                        temperature: float) -> Dict[str, float]:
    """Temperature-smoothed domain weights (the multilingual/DoReMi
    alpha-sampling rule): w' proportional to w^(1/T), normalized.
    T > 1 flattens the mixture toward uniform (up-samples scarce
    domains), T < 1 sharpens it, T = 1 is identity up to
    normalization.  Pure driver-side arithmetic — feed the result to
    :func:`mixture_resample` (and the same dict to the oracle
    generator, which embeds identical double literals)."""
    p = {s: float(w) ** (1.0 / temperature) for s, w in weights.items()}
    tot = sum(p.values())
    return {s: v / tot for s, v in p.items()}


def mixture_resample(df: DataFrame, weights: Dict[str, float],
                     stratum_col: str, key_col: str,
                     size_col: Optional[str] = None) -> DataFrame:
    """Resample to a target domain mixture (DoReMi-style static mixing):
    keep the largest deterministic subsample whose stratum proportions
    match ``weights``.

    Feasible output size = min over strata of size_s / w_s (every unit
    of the scarcest stratum is kept); stratum s then keeps
    rate_s = w_s * out_total / size_s of its rows via the same
    md5-uniform as :func:`hash_sample`, so the decision is per-row
    deterministic and resume-stable.  Strata absent from ``weights``
    are dropped (weight 0).  ``size_col`` measures strata in that
    column's sum (e.g. n_chars ~ token budget) instead of row count —
    rates still apply per row, so the size match is in expectation.

    Scale shape: one tiny groupBy(stratum) aggregate, a single-row
    cross join, one broadcast join of the rates table (|strata| rows),
    then a map-side filter.  The corpus is never shuffled.
    """
    total = float(sum(weights.values()))
    wlit = F.lit(None).cast("double")
    for s, wgt in sorted(weights.items()):
        wlit = F.when(F.col(stratum_col) == s,
                      F.lit(float(wgt) / total)).otherwise(wlit)
    sized = (F.count(F.lit(1)) if size_col is None
             else F.sum(size_col)).cast("double").alias("sz")
    cnt = (df.where(wlit.isNotNull())
           .groupBy(stratum_col).agg(sized)
           .withColumn("w", wlit))
    # a weighted stratum with no rows makes the requested mixture
    # infeasible (its proportion would be 0, not w_s) — fail loudly
    # instead of silently returning a wrong mix.  The aggregate is
    # materialized once (|strata| rows) so the check costs no extra
    # corpus pass.
    cnt = cnt.localCheckpoint(eager=True)
    present = {r[0] for r in cnt.select(stratum_col).collect()}
    missing = sorted(set(weights) - present)
    if missing:
        raise ValueError(
            f"mixture_resample: weighted strata absent from the "
            f"input: {missing}; the requested mixture is infeasible")
    tot = cnt.agg(F.min(F.col("sz") / F.col("w")).alias("out_total"))
    rates = cnt.crossJoin(tot).select(
        stratum_col,
        F.round(F.col("w") * F.col("out_total") / F.col("sz"),
                9).alias("rate"))
    return (df.join(F.broadcast(rates), stratum_col)
            .where(hash_uniform(F.col(key_col)) < F.col("rate")))


def importance_sample(weights: DataFrame, rate: float,
                      id_col: str = "id",
                      logweight_col: str = "logweight") -> DataFrame:
    """(id, keep_p) for rows KEPT by importance resampling: keep
    probability = min(1, rate * exp(logweight)), decided by the shared
    md5 uniform of the id — the realization step after DSIR-style
    importance weighting (operators/selection.py dsir_logweights):
    weights say how target-like a document is; this turns them into an
    actual subsample whose expected composition matches the weights at
    overall rate ``rate``.

    Deterministic (resume/retry-stable) like every sampler here; pure
    map-side filter over the (id, logweight) table, zero shuffles —
    at 10^12 docs the decision rides the weights table's partitioning,
    and joining kept ids back to text is an id-co-keyed join.  keep_p
    rounds to 9 decimals BEFORE the comparison (the mixture_resample
    discipline) so Spark and the DuckDB oracle decide identically at
    exp()'s last-ulp boundaries."""
    keep_p = F.round(
        F.least(F.lit(1.0),
                F.lit(float(rate)) * F.exp(F.col(logweight_col))), 9)
    return (weights
            .withColumn("__p", keep_p)
            .where(hash_uniform(F.col(id_col)) < F.col("__p"))
            .select(F.col(id_col).alias("id"),
                    F.col("__p").alias("keep_p"))
            .orderBy("id"))


def importance_sample_sql(weights_sql: str, rate: float) -> str:
    """DuckDB mirror of :func:`importance_sample` over ``weights_sql``
    (a subquery yielding (id, logweight))."""
    u = ("CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8)) "
         "AS BIGINT) / 4294967296.0")
    return (
        f"WITH w AS ({weights_sql}), "
        f"p AS (SELECT id, round(least(1.0, {float(rate)!r} * "
        f"exp(logweight)), 9) AS keep_p FROM w) "
        f"SELECT id, keep_p FROM p WHERE {u} < keep_p ORDER BY id")


def sample_k_per_group(df: DataFrame, k: int, group_col: str,
                       key_col: str) -> DataFrame:
    """Uniform-without-replacement ``k`` rows per group, deterministic:
    the kept rows are the group's k smallest md5 key-hashes (ties by
    key) — reservoir-sampling semantics without RNG state, so retries
    and resumes keep the identical sample and the same keys stay
    sampled as the corpus grows (a group member only leaves the sample
    when a smaller hash arrives, exactly like a k-min-hash sketch).

    Complements :func:`hash_sample` (rate-based; group size unknown)
    when the contract is an exact per-group quota — e.g. "at most k
    eval docs per domain".  One window over (group, hash-rank); at
    scale the rank filter runs map-side partial like per_group_topk."""
    h = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(),
                                              F.col(key_col).asc())
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k)
            .drop("__rk"))


def corpus_shuffle(docs: DataFrame, seed: str = "s0",
                   n_shards: int = 8,
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shard, pos): deterministic seeded global permutation of
    the corpus, published as ``n_shards`` training shards — the
    "shuffle the corpus before an epoch" step.  Changing ``seed``
    produces an independent permutation (a new epoch order) without any
    RNG state; retries/resumes reproduce the identical order.

    key = md5(seed:id) is the permutation rank; shard = first-8-hex of
    the key mod n_shards (so shard assignment IS part of the
    permutation, not a second hash), and ``pos`` is the rank within the
    shard.  A reader consuming shards round-robin by pos sees a
    uniformly shuffled stream.

    Scale: no global sort — the only shuffle is hash(shard), and each
    shard orders independently (n_shards parallel bounded sorts, the
    same law pack_sequences uses).  ``n_shards`` must grow with the
    corpus; the default 8 is fixture-sized.  Reference analogue: none
    (recast LLM-corpus surface)."""
    key = F.md5(F.concat_ws(":", F.lit(seed),
                            F.col(id_col).cast("string")))
    d = docs.select(F.col(id_col).alias("doc_id"), key.alias("__k"))
    shard = F.pmod(
        F.conv(F.substring(F.col("__k"), 1, 8), 16, 10).cast("long"),
        F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy(F.col("__k").asc(),
                                            F.col("doc_id").asc())
    return (d.withColumn("shard", shard)
            .withColumn("pos",
                        (F.row_number().over(w) - 1).cast("long"))
            .select("doc_id", "shard", "pos")
            .orderBy("doc_id"))


def corpus_shuffle_sql(table_sql: str, seed: str = "s0",
                       n_shards: int = 8) -> str:
    """DuckDB mirror of :func:`corpus_shuffle` over ``table_sql`` (a
    subquery yielding doc_id): same md5 permutation key, same
    first-8-hex shard arithmetic, same per-shard rank."""
    key = f"md5('{seed}:' || CAST(doc_id AS VARCHAR))"
    return (
        f"WITH src AS ({table_sql}), "
        f"k AS (SELECT doc_id, {key} AS k, "
        f"CAST(concat('0x', substr({key}, 1, 8)) AS BIGINT) % "
        f"{n_shards} AS shard FROM src) "
        f"SELECT doc_id, shard, CAST(row_number() OVER ("
        f"PARTITION BY shard ORDER BY k ASC, doc_id ASC) - 1 AS BIGINT) "
        f"AS pos FROM k ORDER BY doc_id")


def budget_select(df: DataFrame, budget_frac: float = 0.5,
                  score_col: str = "score",
                  tokens_col: str = "n_tokens",
                  id_col: str = "doc_id",
                  buckets: Optional[int] = 256) -> DataFrame:
    """(doc_id, score, n_tokens, cum_tokens): greedy data selection
    under a token budget — keep the highest-quality documents (by
    ``score_col`` desc, ``id_col`` asc tiebreak) while the running token
    total stays <= floor(total_tokens * budget_frac).  This is the
    "fill the pretraining budget best-first" step every token-capped
    run performs after scoring.

    Two value-identical forms:

    - ``buckets=None`` — the textbook global cumsum: ONE window over
      (score desc, id).  A single-partition global sort — the oracle
      form, correct but a scale anti-pattern.
    - ``buckets=B`` (default) — the distributed form: scores histogram
      into B fixed-width bins (bin 0 = best), per-bin token totals
      (<= B rows) carry an exclusive prefix sum, and the in-bin running
      total is a window PARTITIONED by bin — B-way parallel bounded
      sorts instead of one global sort.  Because equal scores always
      share a bin and the in-bin order is the same (score desc, id),
      cum_tokens — and therefore the selected set — is IDENTICAL to the
      exact form; only the physical plan changes.  The <= B-row bin
      table broadcasts back.  Reference analogue: none (recast
      LLM-corpus surface).
    """
    if not 0.0 < budget_frac <= 1.0:
        raise ValueError("budget_frac must be in (0, 1]")
    d = df.select(F.col(id_col).alias("doc_id"),
                  F.col(score_col).cast("double").alias("score"),
                  F.col(tokens_col).cast("long").alias("n_tokens"))
    budget = d.agg(F.floor(F.sum("n_tokens") * F.lit(budget_frac))
                   .cast("long").alias("__budget"))
    if buckets is None:
        w = (Window.orderBy(F.col("score").desc(), F.col("doc_id"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = d.withColumn("cum_tokens",
                           F.sum("n_tokens").over(w).cast("long"))
    else:
        stats = d.agg(F.min("score").alias("__lo"),
                      F.max("score").alias("__hi"))
        b = d.crossJoin(F.broadcast(stats))
        step = (F.col("__hi") - F.col("__lo")) / F.lit(float(buckets))
        raw = F.least(F.lit(buckets - 1).cast("long"),
                      F.floor((F.col("score") - F.col("__lo")) / step))
        bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)) \
            .otherwise(F.lit(buckets - 1) - raw).cast("int")
        b = b.select("doc_id", "score", "n_tokens", bin_.alias("__bin"))
        wb = (Window.orderBy("__bin")
              .rowsBetween(Window.unboundedPreceding, -1))
        btot = (b.groupBy("__bin").agg(F.sum("n_tokens").alias("__bt"))
                .withColumn("__above",
                            F.coalesce(F.sum("__bt").over(wb),
                                       F.lit(0)).cast("long"))
                .drop("__bt"))
        win = (Window.partitionBy("__bin")
               .orderBy(F.col("score").desc(), F.col("doc_id"))
               .rowsBetween(Window.unboundedPreceding,
                            Window.currentRow))
        out = (b.join(F.broadcast(btot), "__bin")
               .withColumn("cum_tokens",
                           (F.col("__above") +
                            F.sum("n_tokens").over(win)).cast("long"))
               .drop("__bin", "__above"))
    return (out.crossJoin(F.broadcast(budget))
            .where(F.col("cum_tokens") <= F.col("__budget"))
            .select("doc_id", "score", "n_tokens", "cum_tokens")
            .orderBy("doc_id"))


def budget_select_sql(table_sql: str, budget_frac: float = 0.5) -> str:
    """DuckDB mirror of :func:`budget_select` over ``table_sql`` (a
    subquery yielding (doc_id, score, n_tokens)) — the EXACT global
    cumsum form; the histogram form is value-identical by construction,
    so one oracle covers both paths."""
    return (
        f"WITH src AS ({table_sql}), "
        f"d AS (SELECT doc_id, CAST(score AS DOUBLE) AS score, "
        f"CAST(n_tokens AS BIGINT) AS n_tokens FROM src), "
        f"bud AS (SELECT CAST(floor(sum(n_tokens) * {budget_frac}) "
        f"AS BIGINT) AS budget FROM d), "
        f"c AS (SELECT doc_id, score, n_tokens, "
        f"CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        f"AS cum_tokens FROM d) "
        f"SELECT doc_id, score, n_tokens, cum_tokens "
        f"FROM c, bud WHERE cum_tokens <= budget ORDER BY doc_id")


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    key_col: str = "doc_id") -> DataFrame:
    """(key, weight, rank_key): deterministic weighted sampling WITHOUT
    replacement — exactly ``k`` rows, each row's inclusion probability
    proportional to ``weight_col`` (Efraimidis & Spirakis 2006, A-Res):
    rank_key = ln(u) / w with u the md5-derived uniform of the key, and
    the sample is the global top-k by rank_key.  Deterministic across
    retries/resumes like every sampler here — no RNG state — and a new
    "draw" is a new salt on the key, not mutable state.

    Quality-weighted subsampling is the corpus use ("keep 10M docs,
    favor high quality but keep tail diversity" — hard thresholding
    keeps none of the tail; weighted sampling keeps it in proportion).

    Scale: orderBy().limit(k) compiles to TakeOrderedAndProject — a
    per-partition partial top-k with a k-row driver merge, NO global
    sort shuffle.  Rows with weight <= 0 or a zero uniform get
    rank_key -inf and are never selected before any positive-weight
    row.  Reference analogue: none (recast LLM-corpus surface)."""
    if k <= 0:
        raise ValueError("k must be positive")
    u = hash_uniform(F.col(key_col))
    w = F.col(weight_col).cast("double")
    # u > 0 guard: Spark's log returns NULL at 0 where DuckDB's ln
    # returns -inf; pinning both to -inf keeps the engines identical
    # even on the 2^-32 zero-uniform corner
    rank_key = F.when((w > 0) & (u > 0), F.log(u) / w).otherwise(
        F.lit(float("-inf")))
    return (df.select(F.col(key_col).alias("key"),
                      w.alias("weight"),
                      F.round(rank_key, 6).alias("rank_key"),
                      rank_key.alias("__rk"))
            .orderBy(F.col("__rk").desc(), F.col("key"))
            .limit(k)
            .drop("__rk")
            .orderBy("key"))


def weighted_sample_sql(table_sql: str, k: int) -> str:
    """DuckDB mirror of :func:`weighted_sample` over ``table_sql`` (a
    subquery yielding (key, weight)): same md5 uniform, same
    ln(u)/w rank, same top-k + key tiebreak."""
    u = ("CAST(concat('0x', substr(md5(CAST(key AS VARCHAR)), 1, 8)) "
         "AS BIGINT) / 4294967296.0")
    return (
        f"WITH src AS ({table_sql}), "
        f"r AS (SELECT key, CAST(weight AS DOUBLE) AS weight, "
        f"CASE WHEN CAST(weight AS DOUBLE) > 0 AND {u} > 0 "
        f"THEN ln({u}) / CAST(weight AS DOUBLE) "
        f"ELSE CAST('-infinity' AS DOUBLE) END AS rk FROM src) "
        f"SELECT key, weight, round(rk, 6) AS rank_key "
        f"FROM r ORDER BY rk DESC, key LIMIT {k}")


def group_split(df: DataFrame, test_frac: float, group_col: str,
                salt: str = "split") -> DataFrame:
    """Adds ``split`` ('train' | 'test'): a LEAKAGE-SAFE eval split —
    the md5 uniform is computed on the GROUP key (host, domain,
    cluster id), so every row of a group lands on the same side and
    near-duplicate documents within a group can never straddle
    train/test (the eval-contamination failure mode of row-level
    splits).  Deterministic, map-side, no shuffle; a different
    ``salt`` is a fresh independent split."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError("test_frac must be in [0, 1]")
    u = hash_uniform(F.concat_ws(":", F.lit(salt),
                                 F.col(group_col).cast("string")))
    return df.withColumn(
        "split", F.when(u < test_frac,
                        F.lit("test")).otherwise(F.lit("train")))


def group_split_sql(table_sql: str, test_frac: float, group_sql: str,
                    salt: str = "split") -> str:
    """DuckDB mirror of :func:`group_split` over ``table_sql``."""
    key = f"'{salt}:' || CAST({group_sql} AS VARCHAR)"
    u = (f"CAST(concat('0x', substr(md5({key}), 1, 8)) AS BIGINT) "
         f"/ 4294967296.0")
    return (f"SELECT *, CASE WHEN {u} < {test_frac} THEN 'test' "
            f"ELSE 'train' END AS split FROM ({table_sql})")


def host_disjoint_split(df: DataFrame, splits,
                        key_col: str = "host") -> DataFrame:
    """Input rows + a ``split`` column: leakage-safe train/valid/test
    assignment at KEY granularity — the split is a pure function of
    one deterministic md5-uniform of ``key_col``, so every row
    sharing a key (all pages of a host) lands in the SAME split.
    Splitting at host level is the standard defense against
    cross-split contamination from near-duplicate pages, which
    concentrate within hosts (mirrors, templates, recrawls); a
    row-level split would leak them between train and held-out.

    ``splits``: ordered list of (name, fraction) summing to 1; the
    uniform is compared against the running cumulative bounds in the
    given order (first match wins), so assignment is reproducible,
    resume-stable, and growth-stable — new crawls of a known host
    join its existing split.

    Scale shape: ONE map-side projection, zero shuffles — the md5 and
    the when-chain ride whatever partitioning the input already has.
    Reference analogue: none (recast corpus surface)."""
    fracs = [float(f) for _, f in splits]
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(
            f"host_disjoint_split: fractions sum to {sum(fracs)}, "
            f"expected 1.0")
    u = hash_uniform(F.col(key_col))
    chain = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += float(frac)
        cond = u < F.lit(cum)
        chain = (F.when(cond, F.lit(name)) if chain is None
                 else chain.when(cond, F.lit(name)))
    split = (chain.otherwise(F.lit(splits[-1][0]))
             if chain is not None else F.lit(splits[-1][0]))
    return df.withColumn("split", split)

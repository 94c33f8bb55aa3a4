"""UniMax-style water-filling budget allocation across groups.

A 100 TB corpus is never consumed whole: a training run has a document
(or token) budget, and drawing it proportionally to raw group sizes
lets mega-hosts (or mega-languages) drown the tail.  UniMax (Chung et
al., 2023) allocates a fixed budget by *water-filling*: every group
keeps all its documents up to a common cap ``c``, where ``c`` is the
unique level at which sum_g min(n_g, c) = budget — small groups are
never down-sampled, and the budget surplus is split evenly among the
groups that hit the cap.

Exact integer allocation, engine-portable: with group counts sorted
ascending, group i keeps everything iff sum_{j<=i} n_j + (G-i)*n_i <=
budget (that sum IS sum_g min(n_g, n_i), monotone in n_i, so the test
is exact including ties).  The capped groups split the remaining
budget as q = floor(rem / m) each, with the first (rem mod m) capped
groups in group-key order getting one extra — a deterministic
integerization both engines compute identically.

Scale shape (100 TB): the water-fill itself runs on the per-group
COUNT table — G rows (hosts/languages), orders of magnitude smaller
than the corpus; its global sort-window is a G-row single-partition
sort, fine up to ~1e8 groups (beyond that, bin counts first).  Row
selection is ONE corpus shuffle: rank-within-group by md5(id) against
the joined quota (AQE broadcasts the G-row quota table).  A quota'd
hot host still sorts its rows inside one partition — the md5 rank is
deterministic, so at extreme skew the same selection can be done with
the two-pass salted window used by rules_temporal_salted.  Reference
analogue: none (recast LLM-corpus surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def waterfill_quotas(df: DataFrame, group_col: str = "host",
                     budget: int = 100) -> DataFrame:
    """(group, n, quota): exact water-filling allocation of ``budget``
    rows across groups — sum(quota) == min(budget, total rows)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    g = F.col(group_col)
    counts = df.groupBy(g.alias("grp")).agg(
        F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").asc(), F.col("grp").asc())
    c = (counts
         .withColumn("__i", F.row_number().over(w))
         .withColumn("__s", F.sum("n").over(
             w.rowsBetween(Window.unboundedPreceding, 0)))
         .withColumn("__g_total", F.count(F.lit(1)).over(
             Window.partitionBy()))
         .withColumn("__full",
                     (F.col("__s")
                      + (F.col("__g_total") - F.col("__i"))
                      * F.col("n")) <= budget))
    agg = c.agg(
        F.sum(F.when(F.col("__full"), F.col("n"))
              .otherwise(F.lit(0))).alias("__s_full"),
        F.sum(F.when(F.col("__full"), 0).otherwise(1)).alias("__m"))
    c = c.join(F.broadcast(agg), how="cross")
    rem = F.lit(budget) - F.col("__s_full")
    q = F.floor(rem / F.col("__m"))
    extra = rem - q * F.col("__m")
    wk = Window.partitionBy("__full").orderBy(F.col("grp").asc())
    out = (c.withColumn("__k", F.row_number().over(wk))
           .select(
               F.col("grp").alias(group_col), "n",
               F.when(F.col("__full") | (F.col("__m") == 0), F.col("n"))
               .otherwise(q + F.when(F.col("__k") <= extra, 1)
                          .otherwise(0)).cast("long").alias("quota")))
    return out.orderBy(group_col)


def unimax_sample(df: DataFrame, group_col: str = "host",
                  budget: int = 100,
                  id_col: str = "doc_id") -> DataFrame:
    """The budgeted subsample itself: per group, the ``quota`` rows
    with the smallest md5(id) rank — deterministic, resume-stable.
    Returns (id, group, quota, rk)."""
    quotas = waterfill_quotas(df, group_col, budget)
    wr = Window.partitionBy(group_col).orderBy(
        F.md5(F.col("id").cast("string")).asc(),
        F.col("id").asc())
    return (df.select(F.col(id_col).alias("id"), F.col(group_col))
            .withColumn("rk", F.row_number().over(wr))
            .join(quotas.select(group_col, "quota"), group_col)
            .where(F.col("rk") <= F.col("quota"))
            .select("id", group_col, "quota", "rk")
            .orderBy("id"))


def _quota_ctes(table_sql: str, group_sql: str, budget: int) -> str:
    """Shared oracle CTEs ending in quotas(grp, n, quota)."""
    return (
        f"src AS ({table_sql}), "
        f"counts AS (SELECT {group_sql} AS grp, count(*) AS n "
        f"FROM src GROUP BY 1), "
        f"c AS (SELECT grp, n, "
        f"row_number() OVER (ORDER BY n ASC, grp ASC) AS i, "
        f"sum(n) OVER (ORDER BY n ASC, grp ASC ROWS BETWEEN "
        f"UNBOUNDED PRECEDING AND CURRENT ROW) AS s, "
        f"count(*) OVER () AS gt FROM counts), "
        f"f AS (SELECT *, (s + (gt - i) * n) <= {budget} AS isfull "
        f"FROM c), "
        f"agg AS (SELECT coalesce(sum(CASE WHEN isfull THEN n END), 0) "
        f"AS s_full, sum(CASE WHEN isfull THEN 0 ELSE 1 END) AS m "
        f"FROM f), "
        f"quotas AS (SELECT grp, n, CAST(CASE WHEN isfull OR agg.m = 0 "
        f"THEN n ELSE floor(({budget} - agg.s_full) / agg.m) + "
        f"(CASE WHEN row_number() OVER (PARTITION BY isfull "
        f"ORDER BY grp ASC) <= ({budget} - agg.s_full) - "
        f"floor(({budget} - agg.s_full) / agg.m) * agg.m "
        f"THEN 1 ELSE 0 END) END AS BIGINT) AS quota "
        f"FROM f CROSS JOIN agg)")


def waterfill_quotas_sql(table_sql: str, group_sql: str = "host",
                         budget: int = 100) -> str:
    """DuckDB mirror of :func:`waterfill_quotas`."""
    return (f"WITH {_quota_ctes(table_sql, group_sql, budget)} "
            f"SELECT grp AS {group_sql}, n, quota FROM quotas "
            f"ORDER BY {group_sql}")


def unimax_sample_sql(table_sql: str, group_sql: str = "host",
                      budget: int = 100,
                      id_sql: str = "doc_id") -> str:
    """DuckDB mirror of :func:`unimax_sample`."""
    return (
        f"WITH {_quota_ctes(table_sql, group_sql, budget)}, "
        f"ranked AS (SELECT {id_sql} AS id, {group_sql} AS grp, "
        f"row_number() OVER (PARTITION BY {group_sql} "
        f"ORDER BY md5(CAST({id_sql} AS VARCHAR)) ASC, {id_sql} ASC) "
        f"AS rk FROM src) "
        f"SELECT ranked.id, ranked.grp AS {group_sql}, quotas.quota, "
        f"ranked.rk FROM ranked JOIN quotas ON ranked.grp = quotas.grp "
        f"WHERE ranked.rk <= quotas.quota ORDER BY id")


def temperature_quotas(df: DataFrame, group_col: str = "host",
                       alpha: float = 0.5,
                       budget: int = 100) -> DataFrame:
    """(group, n, weight, target, quota): T5-style temperature-scaled
    mixture allocation — sampling weight w_g ∝ n_g^alpha (alpha = 1 is
    proportional, alpha = 0 uniform, alpha ≈ 0.3-0.7 the usual
    multilingual flattening), integerized by largest remainder.

    Temperature sampling classically draws WITH replacement (small
    groups repeat for multiple epochs); this operator samples without
    replacement, so ``quota = least(n, target)`` and a capped group
    honestly under-fills rather than duplicating — the realized total
    can be below ``budget`` when alpha pushes targets past small-group
    sizes (UniMax water-filling is the redistribute-the-surplus
    alternative; compose the two if the budget must be met exactly).

    Engine parity: n^alpha is one libm pow per group; the weight
    denominator is summed as DECIMAL(38,18) so the total is exact and
    association-order-free (a double sum could differ in the last ulp
    between engines and flip a floor at an integer boundary).  Largest-
    remainder ties break by group key.

    Scale shape (100 TB): everything after the per-group COUNT runs on
    the G-row table; selection via :func:`temperature_sample` is the
    same ONE corpus shuffle as unimax_sample.  Reference analogue:
    none (recast LLM-corpus surface).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"))
    c = counts.withColumn(
        "__p", F.pow(F.col("n").cast("double"), F.lit(float(alpha)))
        .cast("decimal(38,18)"))
    tot = c.agg(F.sum("__p").alias("__t"))
    c = c.join(F.broadcast(tot), how="cross")
    w = (F.col("__p").cast("double")
         / F.col("__t").cast("double"))
    tgt = F.lit(budget) * w
    c = (c.withColumn("__w", w)
         .withColumn("__fl", F.floor(tgt).cast("long"))
         .withColumn("__fr", tgt - F.floor(tgt)))
    base = c.agg(F.sum("__fl").alias("__sfl"))
    c = c.join(F.broadcast(base), how="cross")
    wk = Window.orderBy(F.col("__fr").desc(), F.col("grp").asc())
    rem = F.lit(budget) - F.col("__sfl")
    out = (c.withColumn("__k", F.row_number().over(wk))
           .select(
               F.col("grp").alias(group_col), "n",
               F.round(F.col("__w"), 6).alias("weight"),
               (F.col("__fl") + F.when(F.col("__k") <= rem, 1)
                .otherwise(0)).cast("long").alias("target")))
    return (out.withColumn("quota", F.least(F.col("n"),
                                            F.col("target")))
            .orderBy(group_col))


def temperature_sample(df: DataFrame, group_col: str = "host",
                       alpha: float = 0.5, budget: int = 100,
                       id_col: str = "doc_id") -> DataFrame:
    """The temperature-mixed subsample: per group, the ``quota`` rows
    with the smallest md5(id) rank — deterministic, resume-stable.
    Returns (id, group, quota, rk)."""
    quotas = temperature_quotas(df, group_col, alpha, budget)
    wr = Window.partitionBy(group_col).orderBy(
        F.md5(F.col("id").cast("string")).asc(),
        F.col("id").asc())
    return (df.select(F.col(id_col).alias("id"), F.col(group_col))
            .withColumn("rk", F.row_number().over(wr))
            .join(quotas.select(group_col, "quota"), group_col)
            .where(F.col("rk") <= F.col("quota"))
            .select("id", group_col, "quota", "rk")
            .orderBy("id"))


def _temperature_ctes(table_sql: str, group_sql: str, alpha: float,
                      budget: int) -> str:
    """Shared oracle CTEs ending in quotas(grp, n, weight, target,
    quota) — DECIMAL(38,18) denominator, largest remainder."""
    return (
        f"src AS ({table_sql}), "
        f"counts AS (SELECT {group_sql} AS grp, count(*) AS n "
        f"FROM src GROUP BY 1), "
        f"p AS (SELECT grp, n, CAST(pow(CAST(n AS DOUBLE), {alpha!r}) "
        f"AS DECIMAL(38,18)) AS pw FROM counts), "
        f"t AS (SELECT sum(pw) AS tot FROM p), "
        f"w AS (SELECT grp, n, CAST(pw AS DOUBLE) / "
        f"CAST(tot AS DOUBLE) AS w, "
        f"{budget} * (CAST(pw AS DOUBLE) / CAST(tot AS DOUBLE)) AS tgt "
        f"FROM p CROSS JOIN t), "
        f"fl AS (SELECT grp, n, w, CAST(floor(tgt) AS BIGINT) AS fl, "
        f"tgt - floor(tgt) AS fr FROM w), "
        f"b AS (SELECT sum(fl) AS sfl FROM fl), "
        f"quotas AS (SELECT grp, n, round(w, 6) AS weight, "
        f"CAST(fl + (CASE WHEN row_number() OVER (ORDER BY fr DESC, "
        f"grp ASC) <= {budget} - b.sfl THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS target, least(n, fl + (CASE WHEN row_number() OVER ("
        f"ORDER BY fr DESC, grp ASC) <= {budget} - b.sfl THEN 1 "
        f"ELSE 0 END)) AS quota FROM fl CROSS JOIN b)")


def temperature_quotas_sql(table_sql: str, group_sql: str = "host",
                           alpha: float = 0.5,
                           budget: int = 100) -> str:
    """DuckDB mirror of :func:`temperature_quotas`."""
    return (f"WITH {_temperature_ctes(table_sql, group_sql, alpha, budget)} "
            f"SELECT grp AS {group_sql}, n, weight, target, quota "
            f"FROM quotas ORDER BY {group_sql}")


def temperature_sample_sql(table_sql: str, group_sql: str = "host",
                           alpha: float = 0.5, budget: int = 100,
                           id_sql: str = "doc_id") -> str:
    """DuckDB mirror of :func:`temperature_sample`."""
    return (
        f"WITH {_temperature_ctes(table_sql, group_sql, alpha, budget)}, "
        f"ranked AS (SELECT {id_sql} AS id, {group_sql} AS grp, "
        f"row_number() OVER (PARTITION BY {group_sql} "
        f"ORDER BY md5(CAST({id_sql} AS VARCHAR)) ASC, {id_sql} ASC) "
        f"AS rk FROM src) "
        f"SELECT ranked.id, ranked.grp AS {group_sql}, quotas.quota, "
        f"ranked.rk FROM ranked JOIN quotas ON ranked.grp = quotas.grp "
        f"WHERE ranked.rk <= quotas.quota ORDER BY id")


def excess_loss_weights(stats: DataFrame, domain_col: str = "domain",
                        prior_col: str = "prior",
                        loss_col: str = "excess_loss",
                        eta: float = 1.0) -> DataFrame:
    """(domain, prior, excess_loss, weight): ONE exponentiated-
    gradient step of DoReMi's domain reweighting (Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining"): w_i proportional to prior_i * exp(eta * excess_i),
    normalized over domains — domains where the proxy model lags the
    reference (high excess loss) get MORE training mass.  DoReMi
    iterates this under proxy-model training; the update itself — the
    half that belongs in the data engine, feeding
    ``mixture_resample`` — is a domains-sized projection plus one
    1-row sum, no corpus touch at all.

    Determinism: exp() rounds to 9 (absorbing the ~1-ulp libm/JVM
    divergence), the normalizing sum rounds to 9 (absorbing
    aggregation-order drift), the final quotient rounds to 6 — the
    module's shared cross-engine float discipline."""
    g = F.round(
        F.col(prior_col) *
        F.round(F.exp(F.lit(float(eta)) * F.col(loss_col)), 9), 9)
    t = stats.withColumn("__g", g)
    tot = F.broadcast(t.agg(F.round(F.sum("__g"), 9).alias("__t")))
    return (t.crossJoin(tot)
            .select(F.col(domain_col).alias("domain"),
                    F.col(prior_col).alias("prior"),
                    F.col(loss_col).alias("excess_loss"),
                    F.round(F.col("__g") / F.col("__t"), 6)
                    .alias("weight"))
            .orderBy("domain"))


def excess_loss_weights_sql(stats_sql: str, eta: float = 1.0) -> str:
    """DuckDB mirror of :func:`excess_loss_weights` over ``stats_sql``
    ((domain, prior, excess_loss)) — same round-9/round-6 ladder."""
    e = f"CAST({float(eta)!r} AS DOUBLE)"
    return (
        f"WITH s AS ({stats_sql}), "
        f"g AS (SELECT domain, prior, excess_loss, "
        f"round(prior * round(exp({e} * excess_loss), 9), 9) AS g "
        f"FROM s), "
        f"t AS (SELECT round(sum(g), 9) AS t FROM g) "
        f"SELECT domain, prior, excess_loss, "
        f"round(g / t, 6) AS weight FROM g, t ORDER BY domain")

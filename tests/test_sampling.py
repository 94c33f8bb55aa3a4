"""Deterministic sampling operators: statistical + determinism + plan."""

from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.sampling import (
    hash_sample, hash_uniform, per_group_topk, stratified_hash_sample)


def _df(spark, n=4000):
    return (spark.range(n).withColumnRenamed("id", "k")
            .withColumn("stratum", (F.col("k") % 4).cast("string"))
            .withColumn("score", F.pmod(F.col("k") * 37, F.lit(1000))))


def test_hash_sample_rate_and_determinism(spark):
    df = _df(spark)
    a = {r["k"] for r in hash_sample(df, 0.25, "k").collect()}
    b = {r["k"] for r in hash_sample(df, 0.25, "k").collect()}
    assert a == b                      # deterministic across runs
    assert 0.2 < len(a) / 4000 < 0.3   # ~rate
    # monotone: a smaller rate yields a SUBSET (same hash threshold)
    c = {r["k"] for r in hash_sample(df, 0.1, "k").collect()}
    assert c <= a


def test_hash_sample_pushes_down(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _df(spark).write.parquet(p)
    out = hash_sample(spark.read.parquet(p), 0.5, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan      # map-side filter, no shuffle


def test_stratified_rates(spark):
    df = _df(spark)
    out = stratified_hash_sample(df, {"0": 0.1, "1": 0.9},
                                 "stratum", "k")
    got = out.groupBy("stratum").count().collect()
    counts = {r["stratum"]: r["count"] for r in got}
    assert counts["0"] < 180           # ~100 of 1000
    assert counts["1"] > 800           # ~900
    assert counts["2"] == 1000 and counts["3"] == 1000  # default 1.0


def test_per_group_topk(spark):
    df = _df(spark, 400)
    out = per_group_topk(df, "stratum", F.col("score"), k=5,
                         tiebreak_col="k").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["stratum"], []).append(r)
    data = _df(spark, 400).collect()
    for g, rows in by_g.items():
        assert len(rows) == 5
        assert [r["rank"] for r in sorted(
            rows, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
        want = sorted((r for r in data if r["stratum"] == g),
                      key=lambda r: (-r["score"], r["k"]))[:5]
        assert sorted(r["k"] for r in rows) == sorted(
            r["k"] for r in want)


def test_hash_uniform_distribution(spark):
    # crude uniformity: quartile occupancy within 20% of expectation
    u = (_df(spark).select(hash_uniform(F.col("k")).alias("u"))
         .withColumn("q", F.floor(F.col("u") * 4))
         .groupBy("q").count().collect())
    for r in u:
        assert 800 < r["count"] < 1200, u


def test_kmeans_quantizer_training(spark):
    """Lloyd iterations must not increase total within-cluster cost,
    and training is deterministic (md5 init + rounded means)."""
    import math
    import random

    from pyspark.sql import types as T

    from nacc_form_validator_spark.operators.simsearch import (
        train_coarse_quantizer)
    rng = random.Random(5)
    rows = []
    for i in range(300):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, v))
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType()))])
    emb = spark.createDataFrame(rows, schema)

    def cost(cents_rows):
        cents = {r["cell"]: r["centroid"] for r in cents_rows}
        total = 0.0
        for _, v in rows:
            total += min(
                sum((a - b) ** 2 for a, b in zip(v, c))
                for c in cents.values())
        return total

    one = train_coarse_quantizer(emb, dim=16, k=4, iters=1).collect()
    three = train_coarse_quantizer(emb, dim=16, k=4, iters=3).collect()
    again = train_coarse_quantizer(emb, dim=16, k=4, iters=3).collect()
    assert cost(three) <= cost(one) + 1e-6
    assert [r["centroid"] for r in three] == [
        r["centroid"] for r in again]
    assert sum(r["n_members"] for r in three) == 300


def test_mixture_resample_hits_target_proportions(spark):
    from nacc_form_validator_spark.operators.sampling import (
        mixture_resample)
    import pyspark.sql.functions as F

    # skewed input: 6000 a, 3000 b, 1000 c -> target 0.2/0.3/0.5
    df = (spark.range(10000).withColumnRenamed("id", "k")
          .withColumn("dom", F.when(F.col("k") < 6000, "a")
                      .when(F.col("k") < 9000, "b").otherwise("c"))
          .withColumn("junk", F.lit("zzz")))
    df = df.withColumn("dom", F.when(F.col("k") % 97 == 0, "other")
                       .otherwise(F.col("dom")))
    out = mixture_resample(df, {"a": 0.2, "b": 0.3, "c": 0.5},
                           stratum_col="dom", key_col="k")
    got = {r["dom"]: r["n"] for r in
           out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert "other" not in got            # unweighted strata drop
    # c is the scarcest per unit weight -> kept (almost) whole
    assert got["c"] >= 0.97 * 1000
    total = sum(got.values())
    for dom, w in (("a", 0.2), ("b", 0.3), ("c", 0.5)):
        assert abs(got[dom] / total - w) < 0.03
    # deterministic: same rows on a rerun
    again = mixture_resample(df, {"a": 0.2, "b": 0.3, "c": 0.5},
                             stratum_col="dom", key_col="k")
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0


def test_mixture_resample_size_col_budget(spark):
    from nacc_form_validator_spark.operators.sampling import (
        mixture_resample)
    import pyspark.sql.functions as F

    # same row counts but stratum b's rows are 3x heavier; with
    # size_col the mixture targets the SIZE budget, not row counts
    df = (spark.range(2000).withColumnRenamed("id", "k")
          .withColumn("dom", F.when(F.col("k") % 2 == 0, "a")
                      .otherwise("b"))
          .withColumn("sz", F.when(F.col("dom") == "b", 300)
                      .otherwise(100)))
    out = mixture_resample(df, {"a": 0.5, "b": 0.5}, stratum_col="dom",
                           key_col="k", size_col="sz")
    sizes = {r["dom"]: r["s"] for r in
             out.groupBy("dom").agg(F.sum("sz").alias("s")).collect()}
    total = sum(sizes.values())
    assert abs(sizes["a"] / total - 0.5) < 0.05


def test_mixture_resample_missing_stratum_raises(spark):
    """A weights key with no input rows makes the mixture infeasible
    (its proportion would be 0, not w_s) — must raise, not silently
    return a wrong mix."""
    import pytest

    from nacc_form_validator_spark.operators.sampling import (
        mixture_resample)
    df = spark.createDataFrame([(i, "a") for i in range(10)],
                               "k long, dom string")
    with pytest.raises(ValueError, match="absent"):
        mixture_resample(df, {"a": 0.5, "ghost": 0.5},
                         stratum_col="dom", key_col="k")


def test_temperature_weights_flatten_and_identity(spark):
    from nacc_form_validator_spark.operators.sampling import (
        temperature_weights)
    w = {"a": 0.5, "b": 0.3, "c": 0.2}
    t1 = temperature_weights(w, 1.0)
    assert all(abs(t1[s] - w[s]) < 1e-12 for s in w)  # identity
    t2 = temperature_weights(w, 2.0)
    assert abs(sum(t2.values()) - 1.0) < 1e-12
    # T > 1 flattens: scarce domain gains share, dominant loses
    assert t2["c"] > w["c"] and t2["a"] < w["a"]
    # T -> inf approaches uniform
    tb = temperature_weights(w, 1000.0)
    assert all(abs(v - 1 / 3) < 1e-3 for v in tb.values())


def test_mixture_temperature_proportions(spark):
    """Resampling with T=2-smoothed weights hits the SMOOTHED mixture,
    not the raw one."""
    from nacc_form_validator_spark.operators.sampling import (
        mixture_resample, temperature_weights)
    rows = [(i, "a" if i % 10 < 6 else ("b" if i % 10 < 9 else "c"))
            for i in range(30000)]
    df = spark.createDataFrame(rows, "k long, dom string")
    w = temperature_weights({"a": 0.6, "b": 0.3, "c": 0.1}, 2.0)
    out = mixture_resample(df, w, stratum_col="dom", key_col="k")
    got = {r["dom"]: r["n"] for r in
           out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    total = sum(got.values())
    for s in w:
        assert abs(got[s] / total - w[s]) < 0.03, (s, got, w)

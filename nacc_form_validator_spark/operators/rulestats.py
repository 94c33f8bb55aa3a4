"""Rule-hit co-occurrence analytics over validated output.

Which rules fire TOGETHER is the signal a filter-tuning pass actually
reads: a code pair with lift >> 1 marks two thresholds that are largely
redundant (they condemn the same documents — one of them can be relaxed
for free), lift << 1 marks rules that partition the corpus into disjoint
failure modes.  Reference analogue: none as an operator — this is a
recast analytics surface over the engine's findings channel (the
reference exposes per-record errors, nacc_validator.py ``errors`` /
``error_tree``; aggregating them is left to the caller).

Scale shape (100 TB): ONE corpus-sized pass.  The per-document fired-code
set is bounded by the number of rules (tens), so the pair expansion
happens IN-ROW with higher-order functions — the sorted distinct code
array is expanded to its upper triangle INCLUDING the diagonal, and a
per-document sentinel row is appended, so a single explode feeds a
single groupBy whose key space is bounded by codes² + 1.  Map-side
combine collapses that before the shuffle ships anything; the marginals
(diagonal), pair counts (strict upper triangle), and corpus size
(sentinel) all come out of the SAME aggregate, and the lift join runs
entirely on the aggregated ≤ codes²-row table (broadcast)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sentinel code for the per-document row that makes the corpus size N
#: fall out of the same aggregate — real codes are positive (errors.py
#: hex codes 0x42..0x4001), so -1 can never collide
_SENTINEL = -1


def rule_cooccurrence(validated: DataFrame,
                      findings_col: str = "findings",
                      min_n_ab: int = 1) -> DataFrame:
    """Pairwise co-occurrence + lift for every pair of rule codes.

    ``validated`` is any DataFrame carrying an ``array<struct<code, ...>>``
    findings column (the validate() output).  Returns one row per
    unordered code pair (code_a <= code_b) that co-fired on at least
    ``min_n_ab`` documents, with the marginals and
    ``lift = n_ab * n_docs / (n_a * n_b)``.  Diagonal rows
    (code_a = code_b) carry each code's marginal (n_ab = n_a = n_b,
    lift = n_docs / n_a), so the full co-occurrence matrix is one table.
    """
    codes = F.array_sort(F.array_distinct(
        F.transform(F.col(findings_col), lambda f: f["code"])))
    # upper triangle WITH diagonal: slice() is 1-based, so start=i+1 with
    # a 0-based lambda index begins at the element itself
    pairs = F.flatten(F.transform(
        codes,
        lambda x, i: F.transform(
            F.slice(codes, i + 1, F.size(codes)),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    sentinel = F.array(F.struct(
        F.lit(_SENTINEL).cast("long").alias("a"),
        F.lit(_SENTINEL).cast("long").alias("b")))
    counts = (validated
              .select(F.explode(F.concat(pairs, sentinel)).alias("p"))
              .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
              .agg(F.count(F.lit(1)).alias("n")))

    n_docs = (counts.where(F.col("a") == _SENTINEL)
              .select(F.col("n").alias("n_docs")))
    diag = (counts.where((F.col("a") == F.col("b"))
                         & (F.col("a") != _SENTINEL))
            .select(F.col("a").alias("c"), F.col("n").alias("n_c")))
    upper = (counts.where((F.col("a") <= F.col("b"))
                          & (F.col("a") != _SENTINEL))
             .where(F.col("n") >= min_n_ab))

    ma = F.broadcast(diag.select(F.col("c").alias("_ca"),
                                 F.col("n_c").alias("n_a")))
    mb = F.broadcast(diag.select(F.col("c").alias("_cb"),
                                 F.col("n_c").alias("n_b")))
    out = (upper
           .join(ma, upper["a"] == ma["_ca"])
           .join(mb, upper["b"] == mb["_cb"])
           .crossJoin(F.broadcast(n_docs)))
    return (out.select(
        F.col("a").alias("code_a"),
        F.col("b").alias("code_b"),
        F.col("n").alias("n_ab"),
        "n_a", "n_b", "n_docs",
        (F.col("n") * F.col("n_docs")
         / (F.col("n_a") * F.col("n_b"))).cast("double").alias("lift"))
        .orderBy("code_a", "code_b"))

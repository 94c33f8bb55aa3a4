"""Mergeable sketches for corpus statistics: HyperLogLog distinct
counting and count-min heavy hitters.

A 100 TB pipeline cannot afford exact DISTINCT or exact per-token
counts for monitoring (distinct urls per host per day, hottest n-grams
per crawl): both need a corpus-sized shuffle keyed by the counted
value.  The classic answer (Flajolet et al. 2007 HyperLogLog; Cormode
& Muthukrishnan 2005 count-min) is a BOUNDED-size commutative sketch:
build per partition map-side, merge associatively (max per register /
sum per cell), estimate from the merged table.  Both sketches here are
plain DataFrame aggregates whose shuffle payload is bounded by the
sketch size (m registers / d*w cells) per partition — corpus size
never appears in the shuffle, and yesterday's persisted sketch merges
with today's batch without touching either corpus.

Beyond the reference's surface (no corpus-level ops — SURVEY.md §2.7).

Determinism: md5-derived buckets/values, so register and cell contents
are value-reproducible in DuckDB.  The HLL estimate itself is also
EXACT across engines despite being floating-point: every 2^-register
term is a power of two with exponent in [-33, 0], so partial sums of
<= m such terms span < 53 mantissa bits and the harmonic-mean
denominator is order-independent in IEEE double — no rounding fudge
needed (estimates still round to 4 decimals for the hash gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: HLL bias-correction constant alpha_m = 0.7213 / (1 + 1.079 / m)
def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def _hex_long(h: Column, start: int, n: int) -> Column:
    """First ``n`` hex chars of ``h`` from 1-based ``start`` as a long."""
    return F.conv(F.substring(h, start, n), 16, 10).cast("long")


def hll_registers(df: DataFrame, key: Column,
                  group_cols: "list[str] | None" = None,
                  m: int = 64) -> DataFrame:
    """(group..., bucket, reg): the filled HLL registers of ``key``
    per group — bucket = 16 md5 bits mod m, reg = max over keys of
    (leading zeros of the next 32 md5 bits) + 1.  One aggregate,
    map-side combinable (max), output bounded at |groups| * m rows."""
    gc = group_cols or []
    h = F.md5(key)
    bucket = _hex_long(h, 1, 4) % m
    v = _hex_long(h, 5, 8)
    rho = (F.when(v == 0, F.lit(33))
           .otherwise(F.lit(32) - F.length(F.bin(v)) + F.lit(1)))
    return (df.select(*gc, bucket.alias("bucket"), rho.alias("rho"))
            .groupBy(*gc, "bucket")
            .agg(F.max("rho").alias("reg")))


def hll_merge(a: DataFrame, b: DataFrame,
              group_cols: "list[str] | None" = None) -> DataFrame:
    """Merge two register tables (same key domain): max per register.
    Associative + commutative — the property that lets per-day sketches
    roll up to arbitrary windows without re-reading any corpus."""
    gc = group_cols or []
    return (a.unionByName(b)
            .groupBy(*gc, "bucket")
            .agg(F.max("reg").alias("reg")))


def hll_estimate(registers: DataFrame,
                 group_cols: "list[str] | None" = None,
                 m: int = 64) -> DataFrame:
    """(group..., n_filled, est_distinct): the HLL cardinality estimate
    per group, with Flajolet's small-range correction (linear counting
    m*ln(m/zeros) when est <= 2.5m and empty registers remain)."""
    gc = group_cols or []
    alpha = _alpha(m)
    agg = (registers.groupBy(*gc)
           .agg(F.count("*").alias("n_filled"),
                F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s")))
    zeros = (F.lit(m) - F.col("n_filled")).cast("double")
    raw = F.lit(alpha * m * m) / (F.col("s") + zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(m) / zeros)).otherwise(raw)
    return (agg.select(*gc, F.col("n_filled").cast("long").alias(
        "n_filled"), F.round(est, 4).alias("est_distinct"))
        .orderBy(*gc) if gc else
        agg.select(F.col("n_filled").cast("long").alias("n_filled"),
                   F.round(est, 4).alias("est_distinct")))


def hll_distinct(df: DataFrame, key: Column,
                 group_cols: "list[str] | None" = None,
                 m: int = 64) -> DataFrame:
    """Composed register-build + estimate (the self-contained query
    form; production builds registers per batch and merges)."""
    return hll_estimate(hll_registers(df, key, group_cols, m),
                        group_cols, m)


def hll_distinct_sql(table_sql: str, key_sql: str,
                     group_sql: "str | None" = None,
                     m: int = 64) -> str:
    """DuckDB mirror of :func:`hll_distinct` over ``table_sql`` — same
    md5 register arithmetic, same exact power-of-two harmonic sum."""
    # the exact double Spark embeds via F.lit (repr round-trips); the
    # bare literal would bind as DECIMAL in DuckDB and overflow
    amm = f"CAST({_alpha(m) * m * m!r} AS DOUBLE)"
    gsel = f"{group_sql}, " if group_sql else ""
    gby = f"GROUP BY {group_sql}" if group_sql else ""
    ord_ = f"ORDER BY {group_sql}" if group_sql else ""
    return (
        f"WITH src AS ({table_sql}), "
        f"h AS (SELECT {gsel}md5({key_sql}) AS hx FROM src), "
        f"r AS (SELECT {gsel}"
        f"CAST(concat('0x', substr(hx, 1, 4)) AS BIGINT) % {m} AS bucket, "
        f"CASE WHEN CAST(concat('0x', substr(hx, 5, 8)) AS BIGINT) = 0 "
        f"THEN 33 ELSE 32 - length(bin(CAST(concat('0x', "
        f"substr(hx, 5, 8)) AS BIGINT))) + 1 END AS rho FROM h), "
        f"regs AS (SELECT {gsel}bucket, max(rho) AS reg FROM r "
        f"GROUP BY {gsel}bucket), "
        f"agg AS (SELECT {gsel}count(*) AS n_filled, "
        f"sum(pow(2.0, -reg)) AS s FROM regs {gby}) "
        f"SELECT {gsel}n_filled, round(CASE WHEN "
        f"{amm} / (s + CAST({m} - n_filled AS DOUBLE)) "
        f"<= 2.5 * {m} AND CAST({m} - n_filled AS DOUBLE) > 0 "
        f"THEN CAST({m} AS DOUBLE) * ln({m} / CAST({m} - n_filled "
        f"AS DOUBLE)) ELSE {amm} / "
        f"(s + CAST({m} - n_filled AS DOUBLE)) END, 4) AS est_distinct "
        f"FROM agg {ord_}")


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------
def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda s: s != "")


def cms_positions(token: Column, d: int = 4, w: int = 1024) -> Column:
    """The token's (row, col) cells: col_r = 32 md5 bits of (r||token)
    mod w — identical arithmetic in the DuckDB oracle."""
    return F.array(*[
        F.struct(F.lit(r).alias("r"),
                 (_hex_long(F.md5(F.concat(F.lit(str(r)), token)),
                            1, 8) % w).alias("col"))
        for r in range(d)])


def cms_table(docs: DataFrame, text_col: str = "text",
              d: int = 4, w: int = 1024) -> DataFrame:
    """(r, col, c): the corpus token-frequency count-min sketch — one
    aggregate whose map-side partials are bounded at d*w cells per
    partition, so the shuffle never scales with the corpus."""
    tok = docs.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
    cells = tok.select(F.explode(
        cms_positions(F.col("tok"), d, w)).alias("p"))
    return (cells.select("p.r", "p.col")
            .groupBy("r", "col").agg(F.count("*").alias("c")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of the same (d, w) geometry: sum per cell."""
    return (a.unionByName(b)
            .groupBy("r", "col").agg(F.sum("c").alias("c")))


def cms_estimate(tokens: DataFrame, cms: DataFrame, token_col: str = "tok",
                 d: int = 4, w: int = 1024) -> DataFrame:
    """Adds ``est`` = min over rows of the token's cell counts.  The
    sketch is bounded at d*w rows, so it broadcasts unconditionally;
    probing is a map-side join however large the probe set."""
    probe = tokens.withColumn(
        "__p", F.explode(cms_positions(F.col(token_col), d, w)))
    est = (probe.join(F.broadcast(cms),
                      (F.col("__p.r") == cms["r"]) &
                      (F.col("__p.col") == cms["col"]))
           .groupBy(token_col)
           .agg(F.min("c").alias("est")))
    return tokens.join(est, token_col)


def heavy_hitters(docs: DataFrame, text_col: str = "text",
                  k: int = 20, d: int = 4, w: int = 1024) -> DataFrame:
    """(token, est, exact): the top-``k`` corpus tokens by count-min
    estimate (ties broken by token), with the exact count alongside —
    est >= exact always (CMS never underestimates), and the gap IS the
    collision error, which the oracle pins cell-for-cell.

    The exact column doubles as the verification path; a pure
    production probe drops it and pays only the broadcast lookup."""
    tok = docs.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
    exact = tok.groupBy("tok").agg(F.count("*").alias("exact"))
    cms = cms_table(docs, text_col, d, w)
    scored = cms_estimate(exact, cms, "tok", d, w)
    return (scored.orderBy(F.col("est").desc(), F.col("tok"))
            .limit(k)
            .select(F.col("tok").alias("token"), "est", "exact"))


def heavy_hitters_sql(table: str = "documents", text_col: str = "text",
                      k: int = 20, d: int = 4, w: int = 1024) -> str:
    """DuckDB mirror of :func:`heavy_hitters` — identical md5 cells,
    identical min-over-rows estimate, identical (est desc, token) tie
    rule."""
    toks = (f"list_filter(string_split_regex(lower({text_col}), "
            f"'\\s+'), s -> s <> '')")
    cell = ("CAST(concat('0x', substr(md5(CAST(r AS VARCHAR) || tok), "
            f"1, 8)) AS BIGINT) % {w}")
    return (
        f"WITH tok AS (SELECT unnest({toks}) AS tok FROM {table}), "
        f"exact AS (SELECT tok, count(*) AS exact FROM tok GROUP BY 1), "
        f"cells AS (SELECT tok, r, {cell} AS col FROM tok, "
        f"unnest(range(0, {d})) AS u(r)), "
        f"cms AS (SELECT r, col, count(*) AS c FROM cells GROUP BY 1, 2), "
        f"probe AS (SELECT e.tok, r, {cell.replace('tok', 'e.tok')} "
        f"AS col FROM exact e, unnest(range(0, {d})) AS u(r)), "
        f"est AS (SELECT probe.tok, min(cms.c) AS est FROM probe "
        f"JOIN cms ON probe.r = cms.r AND probe.col = cms.col "
        f"GROUP BY probe.tok) "
        f"SELECT exact.tok AS token, est.est AS est, exact.exact AS exact "
        f"FROM exact JOIN est ON exact.tok = est.tok "
        f"ORDER BY est DESC, token LIMIT {k}")


def _est_expr(m: int):
    """(n_filled, s) -> est Column with the small-range correction —
    the same expression hll_estimate builds, factored for reuse."""
    alpha = _alpha(m)
    zeros = (F.lit(m) - F.col("n_filled")).cast("double")
    raw = F.lit(alpha * m * m) / (F.col("s") + zeros)
    return F.when((raw <= 2.5 * m) & (zeros > 0),
                  F.lit(float(m)) * F.log(F.lit(m) / zeros)).otherwise(raw)


def hll_overlap(a: DataFrame, b: DataFrame, key_a: Column,
                key_b: Column, m: int = 256) -> DataFrame:
    """1 row (est_a, est_b, est_union, est_overlap): estimated distinct
    counts of two corpora and of their intersection, from HLL sketches
    alone — est_overlap = max(0, est_a + est_b - est_union) by
    inclusion-exclusion, where the union sketch is the register-wise
    max of the two sides' registers (the merge property).

    This is the corpus-overlap question ("how much of crawl B is
    already in crawl A?", "how much do these two sources share?")
    answered WITHOUT joining either corpus: each side contributes one
    bounded m-register aggregate, and everything after is sketch
    algebra.  A production pipeline persists each batch's registers and
    answers any pairwise overlap later — the self-contained form here
    rebuilds both.  Standard-error caveat: inclusion-exclusion
    compounds the ±1.04/sqrt(m) error of three estimates, so small true
    overlaps need a larger m (default 256 here vs 64 for plain
    distinct).  Reference analogue: none (recast LLM-corpus surface)."""
    ra = hll_registers(a, key_a, m=m)
    rb = hll_registers(b, key_b, m=m)

    def est(regs, name):
        agg = regs.agg(F.count("*").alias("n_filled"),
                       F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s"))
        return agg.select(F.round(_est_expr(m), 4).alias(name))

    ea = est(ra, "est_a")
    eb = est(rb, "est_b")
    eu = est(hll_merge(ra, rb), "est_union")
    out = ea.crossJoin(eb).crossJoin(eu)
    overlap = F.round(
        F.greatest(F.lit(0.0),
                   F.col("est_a") + F.col("est_b") - F.col("est_union")),
        4)
    return out.select("est_a", "est_b", "est_union",
                      overlap.alias("est_overlap"))


def hll_overlap_sql(a_sql: str, b_sql: str, key_sql: str = "k",
                    m: int = 256) -> str:
    """DuckDB mirror of :func:`hll_overlap`: ``a_sql`` / ``b_sql`` are
    subqueries each yielding a key column named by ``key_sql``; same
    register arithmetic, same register-max union, same
    inclusion-exclusion."""
    amm = f"CAST({_alpha(m) * m * m!r} AS DOUBLE)"

    def regs(src: str, name: str) -> str:
        return (
            f"{name}h AS (SELECT md5({key_sql}) AS hx FROM {src}), "
            f"{name} AS (SELECT "
            f"CAST(concat('0x', substr(hx, 1, 4)) AS BIGINT) % {m} "
            f"AS bucket, max(CASE WHEN CAST(concat('0x', substr(hx, 5, "
            f"8)) AS BIGINT) = 0 THEN 33 ELSE 32 - length(bin(CAST("
            f"concat('0x', substr(hx, 5, 8)) AS BIGINT))) + 1 END) "
            f"AS reg FROM {name}h GROUP BY bucket)")

    def est(regs_name: str, col: str) -> str:
        z = f"CAST({m} - n_filled AS DOUBLE)"
        raw = f"{amm} / (s + {z})"
        return (
            f"{col}_agg AS (SELECT count(*) AS n_filled, "
            f"sum(pow(2.0, -reg)) AS s FROM {regs_name}), "
            f"{col}_e AS (SELECT round(CASE WHEN {raw} <= 2.5 * {m} "
            f"AND {z} > 0 THEN CAST({m} AS DOUBLE) * ln({m} / {z}) "
            f"ELSE {raw} END, 4) AS {col} FROM {col}_agg)")

    return (
        f"WITH sa AS ({a_sql}), sb AS ({b_sql}), "
        f"{regs('sa', 'ra')}, {regs('sb', 'rb')}, "
        f"ru AS (SELECT bucket, max(reg) AS reg FROM "
        f"(SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY bucket), "
        f"{est('ra', 'est_a')}, {est('rb', 'est_b')}, "
        f"{est('ru', 'est_union')} "
        f"SELECT est_a, est_b, est_union, "
        f"round(greatest(0.0, est_a + est_b - est_union), 4) "
        f"AS est_overlap FROM est_a_e, est_b_e, est_union_e")


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram + quantile estimation
# ---------------------------------------------------------------------------
def histogram_sketch(df: DataFrame, value: Column, lo: float, hi: float,
                     bins: int = 64) -> DataFrame:
    """(bin, c): the bounded equi-width histogram of ``value`` clamped
    to [lo, hi] — the third mergeable sketch of the family (HLL =
    distincts, CMS = frequencies, histogram = DISTRIBUTION).  One
    aggregate whose map-side partials are bounded at ``bins`` cells per
    partition; merge = cell-sum (histogram_merge), so per-batch
    histograms roll up to any window without re-reading a corpus —
    the production form of what ppl_buckets_approx does inline.

    Fixed [lo, hi] (not data-derived) is what makes the sketch
    mergeable across batches; values outside clamp into the edge bins,
    which is the standard monitoring trade-off."""
    if hi <= lo or bins <= 0:
        raise ValueError("need hi > lo and bins > 0")
    step = (hi - lo) / float(bins)
    v = value.cast("double")
    b = F.least(F.lit(bins - 1),
                F.greatest(F.lit(0),
                           F.floor((v - F.lit(lo)) / F.lit(step)))
                ).cast("int")
    return (df.select(b.alias("bin"))
            .groupBy("bin").agg(F.count("*").alias("c")))


def histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of the same (lo, hi, bins) geometry."""
    return (a.unionByName(b)
            .groupBy("bin").agg(F.sum("c").alias("c")))


def histogram_quantiles(sketch: DataFrame, qs: "list[float]",
                        lo: float, hi: float,
                        bins: int = 64) -> DataFrame:
    """(q, est): quantile estimates from the sketch by linear
    interpolation inside the containing bin — error bounded by one bin
    width, the same guarantee ppl_buckets_approx documents.  Every op
    here runs on the <= ``bins``-row sketch (a window over bins rows,
    a broadcast to |qs| rows); the corpus was touched once, by
    histogram_sketch."""
    step = (hi - lo) / float(bins)
    w = (Window.orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = sketch.withColumn("cum", F.sum("c").over(w))
    total = sketch.agg(F.sum("c").cast("double").alias("__t"))
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double")
    j = (qdf.crossJoin(F.broadcast(total))
         .crossJoin(F.broadcast(cum))
         .where(F.col("cum") >= F.col("q") * F.col("__t")))
    rw = Window.partitionBy("q").orderBy("bin")
    hit = (j.withColumn("__rn", F.row_number().over(rw))
           .where(F.col("__rn") == 1))
    target = F.col("q") * F.col("__t")
    est = (F.lit(lo) + F.col("bin") * F.lit(step) +
           (target - (F.col("cum") - F.col("c"))) / F.col("c") *
           F.lit(step))
    return (hit.select("q", F.round(est, 6).alias("est"))
            .orderBy("q"))


def histogram_quantiles_sql(table_sql: str, value_sql: str,
                            qs: "list[float]", lo: float, hi: float,
                            bins: int = 64) -> str:
    """DuckDB mirror of histogram_sketch + histogram_quantiles over
    ``table_sql`` — same clamp/floor binning, same cumulative
    interpolation arithmetic."""
    step = (hi - lo) / float(bins)
    # CAST inside VALUES: a bare 0.1 binds as DECIMAL in DuckDB and
    # leaks Decimal('0.10') into the compared rows
    qlist = ", ".join(f"(CAST({float(q)!r} AS DOUBLE))" for q in qs)
    return (
        f"WITH src AS ({table_sql}), "
        f"h AS (SELECT CAST(least({bins - 1}, greatest(0, "
        f"floor((CAST({value_sql} AS DOUBLE) - {lo!r}) / {step!r}))) "
        f"AS INT) AS bin, count(*) AS c FROM src GROUP BY bin), "
        f"cu AS (SELECT bin, c, sum(c) OVER (ORDER BY bin "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
        f"FROM h), "
        f"t AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM h), "
        f"qv (q) AS (VALUES {qlist}), "
        f"hit AS (SELECT q, bin, c, cum, tot, row_number() OVER ("
        f"PARTITION BY q ORDER BY bin) AS rn "
        f"FROM qv, t, cu WHERE cum >= q * tot) "
        f"SELECT q, round({lo!r} + bin * {step!r} + "
        f"(q * tot - (cum - c)) / c * {step!r}, 6) AS est "
        f"FROM hit WHERE rn = 1 ORDER BY q")


# --------------------------------------------------------------- Bloom
def bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """The key's ``k`` bit positions: position j = 32 md5 bits of
    (j || key) mod m_bits — identical arithmetic in the oracle."""
    return F.array(*[
        _hex_long(F.md5(F.concat(F.lit(str(j)), key)), 1, 8) % m_bits
        for j in range(k)])


def bloom_build(df: DataFrame, key: Column, m_bits: int = 1 << 16,
                k: int = 4) -> DataFrame:
    """(word, bits): Bloom filter over ``key`` as a table of 64-bit
    words — the fixed-memory membership gate (Bloom 1970) blocklists
    and decontamination probes use when the member set itself is too
    big to broadcast exactly.

    Build is ONE aggregate keyed by word index: each key explodes to k
    (word = pos/64, mask = 1<<(pos%64)) rows, bit_or per word.
    Map-side partials are bounded at m_bits/64 rows per partition, so
    the shuffle never scales with the corpus; two filters of the same
    geometry merge with :func:`bloom_merge` (bit_or is commutative and
    idempotent — yesterday's filter absorbs today's batch without
    touching either corpus).  Spark's shiftleft wraps 1<<63 to the
    sign bit; the oracle spells that mask as BIGINT min since DuckDB's
    << is overflow-checked, and two's-complement bit_or/& then behave
    identically, so word contents are value-reproducible.  Reference
    analogue: none (recast LLM-corpus surface).
    """
    pos = (df.select(F.explode(
        bloom_positions(key, m_bits, k)).alias("p"))
        .select(F.floor(F.col("p") / 64).cast("long").alias("word"),
                F.expr("shiftleft(1L, CAST(p % 64 AS INT))")
                .alias("m")))
    return (pos.groupBy("word").agg(F.expr("bit_or(m)").alias("bits"))
            .orderBy("word"))


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-geometry filters: bit_or per word."""
    return (a.unionByName(b)
            .groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))
            .orderBy("word"))


def bloom_probe(df: DataFrame, key: Column, bloom: DataFrame,
                id_col: str = "doc_id", m_bits: int = 1 << 16,
                k: int = 4) -> DataFrame:
    """(id, might_contain): membership probe — true iff ALL k bit
    positions are set (no false negatives; false-positive rate
    ~(1 - e^{-kn/m})^k, sized by geometry).

    The filter is <= m_bits/64 rows and broadcasts unconditionally;
    probing is a map-side join however large the probe side.  A word
    absent from the sparse filter table means all-zero bits, so the
    left join's NULL coalesces to a miss.
    """
    pos = (df.select(F.col(id_col).alias("id"),
                     F.explode(bloom_positions(key, m_bits, k))
                     .alias("p"))
           .select("id", F.floor(F.col("p") / 64).cast("long").alias("word"),
                   F.expr("shiftleft(1L, CAST(p % 64 AS INT))")
                   .alias("m")))
    hit = (F.col("bits").isNotNull() &
           (F.col("bits").bitwiseAND(F.col("m")) != 0))
    return (pos.join(F.broadcast(bloom), "word", "left")
            .groupBy("id")
            .agg(F.min(hit.cast("int")).alias("__all"))
            .select("id", (F.col("__all") == 1).alias("might_contain"))
            .orderBy("id"))


# DuckDB's << raises on 1<<63 (checked overflow) where Spark's
# shiftleft wraps to the sign bit; spell bit 63 as BIGINT min.
_MASK = ("CASE WHEN p % 64 = 63 THEN CAST(-9223372036854775807 - 1 "
         "AS BIGINT) ELSE CAST(1 AS BIGINT) << "
         "CAST(p % 64 AS INTEGER) END")


def bloom_probe_inrow(df: DataFrame, key: Column, bloom: DataFrame,
                      m_bits: int = 1 << 16, k: int = 4,
                      flag: str = "might_contain") -> DataFrame:
    """Zero-shuffle probe: the filter (<= m_bits/64 longs) is collected
    once and inlined as a dense literal array, so the probe becomes a
    pure codegen projection appended to ``df`` — no explode, no join,
    no per-id aggregate.  This is the shape to compose into a larger
    single-pass gate plan; value-identical to :func:`bloom_probe`.
    For filters too large to inline as a literal (m_bits beyond ~2^27
    the plan string itself gets heavy), keep the broadcast-join path.
    """
    words = {r["word"]: r["bits"] for r in bloom.collect()}
    dense = F.lit([words.get(w, 0) for w in range(m_bits // 64)])

    def hit(pcol: Column) -> Column:
        word = F.element_at(dense, F.floor(pcol / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pcol % 64).cast("int"))
        return word.bitwiseAND(mask) != 0

    return df.withColumn(
        flag, F.forall(bloom_positions(key, m_bits, k), hit))


def _bloom_pos_sql(key_sql: str, m_bits: int, j: str) -> str:
    return (f"CAST(concat('0x', substr(md5(CAST({j} AS VARCHAR) || "
            f"{key_sql}), 1, 8)) AS BIGINT) % {m_bits}")


def bloom_probe_sql(build_sql: str, probe_sql: str,
                    key_sql: str = "k", id_sql: str = "id",
                    m_bits: int = 1 << 16, k: int = 4) -> str:
    """DuckDB mirror: build the filter from ``build_sql`` (one column
    ``{key_sql}``), probe ``probe_sql`` rows — same words, same masks,
    same all-k rule."""
    pos = _bloom_pos_sql(key_sql, m_bits, "u.j")
    return (
        f"WITH b AS ({build_sql}), "
        f"bp AS (SELECT {pos} AS p FROM b, "
        f"unnest(range(0, {k})) AS u(j)), "
        f"bw AS (SELECT CAST(p // 64 AS BIGINT) AS word, "
        f"bit_or({_MASK}) AS bits "
        f"FROM bp GROUP BY 1), "
        f"q AS ({probe_sql}), "
        f"qp AS (SELECT {id_sql} AS id, {pos} AS p FROM q, "
        f"unnest(range(0, {k})) AS u(j)), "
        f"qw AS (SELECT id, CAST(p // 64 AS BIGINT) AS word, "
        f"{_MASK} AS m FROM qp) "
        f"SELECT id, min(CASE WHEN bw.bits IS NOT NULL AND "
        f"(bw.bits & qw.m) <> 0 THEN 1 ELSE 0 END) = 1 "
        f"AS might_contain FROM qw LEFT JOIN bw USING (word) "
        f"GROUP BY id ORDER BY id")

"""Corpus-health statistics: Zipf rank-frequency slope and
inter-slice unigram divergence (KL / Jensen-Shannon).

Two monitoring passes every production corpus pipeline runs between
snapshots: (a) the Zipf slope of the word rank-frequency curve — a
healthy natural-language corpus sits near -1; templated/boilerplate
floods flatten it, spam-keyword floods steepen it — and (b) the
unigram-distribution divergence between two corpus slices (yesterday
vs today, source A vs source B), the drift alarm that catches a
mis-configured extractor or a source going bad BEFORE a model trains
on it (same role as DSIR's importance model, but symmetric and
unconditional).  Beyond the reference's per-record surface (it has no
corpus statistics — SURVEY.md §2.7).

Scale shape: both operators reduce the corpus to its word-count table
in ONE partial-agg shuffle (map-side combine collapses the Zipf head);
everything after runs on the vocabulary-sized table — the regression
aggregate on <= ``max_rank`` rows, the divergence join on the shared
vocab keyed by word.  The corpus text never shuffles.

Determinism for the value oracle: ranks tie-break on the word string;
logs run on exact integer counts; final scalars round to 6 — the
remaining cross-engine risk is float-summation order inside the
aggregates, which at <= 10^5 vocab terms is ~1e-12 relative, far under
the rounding grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.dedup import normalized

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _words(text_col: str):
    return F.filter(F.split(normalized(F.col(text_col)), " "),
                    lambda x: x != "")


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (docs.select(F.explode(_words(text_col)).alias("word"))
            .groupBy("word").agg(F.count("*").alias("c")))


def zipf_slope(docs: DataFrame, text_col: str = "text",
               max_rank: int = 100) -> DataFrame:
    """One row (n_ranked, slope, intercept): least-squares fit of
    ln(freq) against ln(rank) over the corpus's ``max_rank`` most
    frequent words.  slope ~ -1 is the healthy Zipf regime."""
    counts = _word_counts(docs, text_col)
    w = Window.orderBy(F.col("c").desc(), F.col("word").asc())
    ranked = (counts.withColumn("r", F.row_number().over(w))
              .where(F.col("r") <= max_rank)
              .select(F.log(F.col("r").cast("double")).alias("x"),
                      F.log(F.col("c").cast("double")).alias("y")))
    agg = ranked.agg(F.count("*").alias("n_ranked"),
                     F.covar_pop("x", "y").alias("cv"),
                     F.var_pop("x").alias("vx"),
                     F.avg("x").alias("mx"),
                     F.avg("y").alias("my"))
    slope = F.col("cv") / F.col("vx")
    return agg.select(
        "n_ranked",
        F.round(slope, 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), 6).alias("intercept"))


def zipf_slope_sql(max_rank: int = 100) -> str:
    """DuckDB oracle for :func:`zipf_slope` over ``documents``."""
    w = f"list_filter(string_split({_NORM_SQL}, ' '), x -> x <> '')"
    return (
        f"WITH counts AS (SELECT word, count(*) AS c FROM ("
        f"SELECT unnest({w}) AS word FROM documents) GROUP BY word), "
        f"ranked AS (SELECT ln(r) AS x, ln(c) AS y FROM ("
        f"SELECT c, row_number() OVER (ORDER BY c DESC, word ASC) AS r "
        f"FROM counts) WHERE r <= {max_rank}) "
        f"SELECT count(*) AS n_ranked, "
        f"round(covar_pop(x, y) / var_pop(x), 6) AS slope, "
        f"round(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x), 6) "
        f"AS intercept FROM ranked")


def _slice_probs(docs: DataFrame, text_col: str, side: str) -> DataFrame:
    return (_word_counts(docs, text_col)
            .select("word", F.col("c").alias(f"c_{side}")))


def unigram_divergence(docs_a: DataFrame, docs_b: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """One row (n_vocab, kl_ab, kl_ba, js): add-one-smoothed unigram
    KL(A||B), KL(B||A) and Jensen-Shannon divergence between two
    corpus slices, over the UNION vocabulary (so no zero branches).

    p_s(w) = (c_s(w) + 1) / (T_s + V) with V = |union vocab|,
    T_s = slice token count — every word has positive mass on both
    sides, which is what makes KL finite on disjoint tails.
    """
    joined = (_slice_probs(docs_a, text_col, "a")
              .join(_slice_probs(docs_b, text_col, "b"), "word", "full")
              .select(F.coalesce("c_a", F.lit(0)).alias("c_a"),
                      F.coalesce("c_b", F.lit(0)).alias("c_b")))
    tot = joined.agg(F.count("*").alias("v"),
                     F.sum("c_a").alias("ta"),
                     F.sum("c_b").alias("tb"))
    pa = (F.col("c_a") + 1) / (F.col("ta") + F.col("v"))
    pb = (F.col("c_b") + 1) / (F.col("tb") + F.col("v"))
    m = (pa + pb) / 2
    per = (joined.crossJoin(F.broadcast(tot))
           .select((pa * F.log(pa / pb)).alias("kab"),
                   (pb * F.log(pb / pa)).alias("kba"),
                   (pa / 2 * F.log(pa / m) +
                    pb / 2 * F.log(pb / m)).alias("jsw"),
                   F.col("v")))
    return (per.groupBy("v")
            .agg(F.round(F.sum("kab"), 6).alias("kl_ab"),
                 F.round(F.sum("kba"), 6).alias("kl_ba"),
                 F.round(F.sum("jsw"), 6).alias("js"))
            .select(F.col("v").alias("n_vocab"), "kl_ab", "kl_ba", "js"))


def drift_topk(docs_a: DataFrame, docs_b: DataFrame,
               text_col: str = "text", k: int = 15) -> DataFrame:
    """(word, p_a, p_b, kl_term, rank): the ``k`` words contributing
    most KL(A||B) mass — the actionable half of the drift alarm (WHICH
    words exploded in slice A relative to slice B).  Probabilities and
    the contribution are rounded to 6 BEFORE ranking; ties break on the
    word; top-k via TakeOrdered, no global sort."""
    joined = (_slice_probs(docs_a, text_col, "a")
              .join(_slice_probs(docs_b, text_col, "b"), "word", "full")
              .select("word",
                      F.coalesce("c_a", F.lit(0)).alias("c_a"),
                      F.coalesce("c_b", F.lit(0)).alias("c_b")))
    tot = joined.agg(F.count("*").alias("v"),
                     F.sum("c_a").alias("ta"),
                     F.sum("c_b").alias("tb"))
    pa = (F.col("c_a") + 1) / (F.col("ta") + F.col("v"))
    pb = (F.col("c_b") + 1) / (F.col("tb") + F.col("v"))
    scored = (joined.crossJoin(F.broadcast(tot))
              .select("word",
                      F.round(pa, 6).alias("p_a"),
                      F.round(pb, 6).alias("p_b"),
                      F.round(pa * F.log(pa / pb), 6).alias("kl_term")))
    top = scored.orderBy(F.col("kl_term").desc(), "word").limit(k)
    wnd = Window.orderBy(F.col("kl_term").desc(), "word")
    return (top.withColumn("rank", F.row_number().over(wnd))
            .orderBy("rank"))


def _divergence_ctes(slice_a_sql: str, slice_b_sql: str) -> str:
    w = f"list_filter(string_split({_NORM_SQL}, ' '), x -> x <> '')"
    return (
        f"ca AS (SELECT word, count(*) AS c_a FROM (SELECT unnest({w}) "
        f"AS word FROM ({slice_a_sql})) GROUP BY word), "
        f"cb AS (SELECT word, count(*) AS c_b FROM (SELECT unnest({w}) "
        f"AS word FROM ({slice_b_sql})) GROUP BY word), "
        f"j AS (SELECT coalesce(ca.word, cb.word) AS word, "
        f"coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b "
        f"FROM ca FULL JOIN cb ON ca.word = cb.word), "
        f"tot AS (SELECT count(*) AS v, sum(c_a) AS ta, sum(c_b) AS tb "
        f"FROM j)")


def unigram_divergence_sql(slice_a_sql: str, slice_b_sql: str) -> str:
    """DuckDB oracle for :func:`unigram_divergence`; slice SQL must
    yield a ``text`` column."""
    pa = "((c_a + 1) * 1.0 / (ta + v))"
    pb = "((c_b + 1) * 1.0 / (tb + v))"
    m = f"(({pa} + {pb}) / 2)"
    return (
        f"WITH {_divergence_ctes(slice_a_sql, slice_b_sql)} "
        f"SELECT v AS n_vocab, "
        f"round(sum({pa} * ln({pa} / {pb})), 6) AS kl_ab, "
        f"round(sum({pb} * ln({pb} / {pa})), 6) AS kl_ba, "
        f"round(sum({pa} / 2 * ln({pa} / {m}) + "
        f"{pb} / 2 * ln({pb} / {m})), 6) AS js "
        f"FROM j CROSS JOIN tot GROUP BY v")


def drift_topk_sql(slice_a_sql: str, slice_b_sql: str,
                   k: int = 15) -> str:
    """DuckDB oracle for :func:`drift_topk`."""
    pa = "((c_a + 1) * 1.0 / (ta + v))"
    pb = "((c_b + 1) * 1.0 / (tb + v))"
    return (
        f"WITH {_divergence_ctes(slice_a_sql, slice_b_sql)}, "
        f"scored AS (SELECT word, round({pa}, 6) AS p_a, "
        f"round({pb}, 6) AS p_b, "
        f"round({pa} * ln({pa} / {pb}), 6) AS kl_term "
        f"FROM j CROSS JOIN tot), "
        f"ranked AS (SELECT word, p_a, p_b, kl_term, row_number() OVER ("
        f"ORDER BY kl_term DESC, word) AS rank FROM scored) "
        f"SELECT word, p_a, p_b, kl_term, rank FROM ranked "
        f"WHERE rank <= {k} ORDER BY rank")


def shingle_novelty(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, n_shingles, novelty): the fraction of a document's distinct
    n-word shingles that occur in NO other document — the
    original-content signal (templated/syndicated pages score near 0,
    genuinely new text near 1).  The complement of what the dedup
    family measures: instead of finding the pairs, it scores how much
    of each doc is unshared mass.

    Scale shape: shingles leave the doc once as md5-free strings; one
    shingle-keyed agg computes corpus document frequency (map-side
    combine collapses boilerplate shingles); one id-keyed agg folds the
    per-doc fraction.  Documents with zero shingles (shorter than n
    words) score novelty 1.0 — nothing in them is copied.
    """
    from nacc_form_validator_spark.operators.dedup import _with_shingles
    sh = _with_shingles(docs, text_col, id_col, n)
    ex = sh.select("id", F.explode("sh").alias("s"))
    freq = ex.groupBy("s").agg(F.count("*").alias("dfreq"))
    per = (ex.join(freq, "s")
           .groupBy("id")
           .agg(F.count("*").alias("n_shingles"),
                F.sum(F.when(F.col("dfreq") == 1, 1).otherwise(0))
                .alias("novel")))
    base = docs.select(F.col(id_col).alias("id"))
    return (base.join(per, "id", "left")
            .select("id",
                    F.coalesce("n_shingles", F.lit(0))
                    .alias("n_shingles"),
                    F.round(F.coalesce(F.col("novel") /
                                       F.col("n_shingles"),
                                       F.lit(1.0)), 6).alias("novelty"))
            .orderBy("id"))


def shingle_novelty_sql(n: int = 3) -> str:
    """DuckDB oracle for :func:`shingle_novelty` over ``documents``."""
    w = f"list_filter(string_split({_NORM_SQL}, ' '), x -> x <> '')"
    sh = (f"list_distinct(list_filter(list_transform(range(0, "
          f"greatest(len({w}) - {n}, 0) + 1), i -> array_to_string("
          f"list_slice({w}, i + 1, i + {n}), ' ')), s -> s <> ''))")
    return (
        f"WITH ex AS (SELECT doc_id AS id, unnest({sh}) AS s "
        f"FROM documents), "
        f"freq AS (SELECT s, count(*) AS dfreq FROM ex GROUP BY s), "
        f"per AS (SELECT id, count(*) AS n_shingles, "
        f"sum(CASE WHEN dfreq = 1 THEN 1 ELSE 0 END) AS novel "
        f"FROM ex JOIN freq USING (s) GROUP BY id) "
        f"SELECT d.doc_id AS id, coalesce(n_shingles, 0) AS n_shingles, "
        f"round(coalesce(novel * 1.0 / n_shingles, 1.0), 6) AS novelty "
        f"FROM documents d LEFT JOIN per ON d.doc_id = per.id "
        f"ORDER BY id")


def token_fertility(docs: DataFrame, lang_col: str = "lang",
                    text_col: str = "text") -> DataFrame:
    """(lang, n_docs, fertility, chars_per_token): per-language
    tokenizer fertility — subword tokens per whitespace word, and chars
    per subword token, under the corpus's BPE-ish segmentation
    (operators/textstats.py).  THE multilingual-budget metric: a
    language with fertility 3 costs 3x the sequence length per word,
    which mixture planning (operators/sampling.py) must price in.

    One row-side projection (both token counts are in-row expressions)
    + one lang-keyed agg; exact integer sums, ratios rounded to 6.
    """
    from nacc_form_validator_spark.operators.textstats import (
        bpeish_token_count, whitespace_token_count)
    t = F.col(text_col)
    per = docs.select(F.col(lang_col).alias("lang"),
                      whitespace_token_count(t).alias("ws"),
                      bpeish_token_count(t).alias("bpe"),
                      F.length(t).alias("chars"))
    return (per.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.sum("bpe") /
                         F.greatest(F.sum("ws"), F.lit(1)), 6)
                 .alias("fertility"),
                 F.round(F.sum("chars") /
                         F.greatest(F.sum("bpe"), F.lit(1)), 6)
                 .alias("chars_per_token"))
            .orderBy("lang"))


def token_fertility_sql() -> str:
    """DuckDB oracle for :func:`token_fertility` over ``documents``
    (same BPE-ish segmentation as plans/oracle.py tokens_quality_sql)."""
    from nacc_form_validator_spark.operators.textstats import (
        BPE_ISH_PATTERN)
    ws = ("len(list_filter(string_split(regexp_replace(text, '\\s+', "
          "' ', 'g'), ' '), x -> x <> ''))")
    pieces = f"regexp_extract_all(text, '({BPE_ISH_PATTERN})', 1)"
    bpe = (f"(len({pieces}) + coalesce(list_sum(list_transform("
           f"{pieces}, p -> CASE WHEN length(p) > 6 THEN "
           f"CAST(floor((length(p) - 1) / 6) AS BIGINT) "
           f"ELSE 0 END)), 0))")
    return (
        f"SELECT lang, count(*) AS n_docs, "
        f"round(sum({bpe}) * 1.0 / greatest(sum({ws}), 1), 6) "
        f"AS fertility, "
        f"round(sum(length(text)) * 1.0 / greatest(sum({bpe}), 1), 6) "
        f"AS chars_per_token "
        f"FROM documents GROUP BY lang ORDER BY lang")


def source_health(docs: DataFrame, source_col: str = "source",
                  text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str = "lang") -> DataFrame:
    """(source, n_docs, n_langs, dup_ratio, junk_rate, mean_quality,
    mean_chars): the per-SOURCE corpus health dashboard — one row per
    ingest source, the table an operator looks at before deciding to
    re-crawl, re-extract, or drop a feed.

    dup_ratio = 1 - distinct exact-dedup digests / docs (a feed
    re-serving the same pages); junk_rate = fraction of docs with any
    junk-phrase hit (soft-404 floods); mean_quality = mean composite
    quality score; mean_chars is exact-integer arithmetic.

    Reference parity: the per-source recast of the reference's
    validation summaries (its ErrorHandler counts per rule; here per
    SOURCE — SURVEY.md §2.7 corpus surface).

    Scale shape: ONE groupBy(source) aggregate with map-side partials;
    every signal is an expression over the row (digest, junk hits,
    quality score), so the corpus is scanned once and only per-source
    partial aggregates shuffle.  Sources are few (thousands at most) —
    the result is driver-sized.
    """
    from nacc_form_validator_spark.functions.junkpages import junk_hits
    from nacc_form_validator_spark.operators.textstats import (
        quality_score)
    t = F.col(text_col)
    return (docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.md5(normalized(t)).alias("digest"),
        (junk_hits(t) > 0).cast("int").alias("junky"),
        quality_score(t).alias("q"),
        F.length(t).alias("nc"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.count_distinct("lang").cast("long").alias("n_langs"),
             F.round(1 - F.count_distinct("digest") / F.count("*"), 6)
             .alias("dup_ratio"),
             F.round(F.sum("junky") / F.count("*"), 6)
             .alias("junk_rate"),
             F.round(F.avg("q"), 6).alias("mean_quality"),
             F.round(F.avg("nc"), 6).alias("mean_chars"))
        .orderBy("source"))


def source_health_sql() -> str:
    """DuckDB mirror of :func:`source_health` over ``documents``."""
    from nacc_form_validator_spark.functions.junkpages import (
        junk_hits_sql)
    from nacc_form_validator_spark.operators.textstats import (
        quality_score_sql)
    digest = f"md5({_NORM_SQL})"
    return (
        f"SELECT source, count(*) AS n_docs, "
        f"CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, "
        f"round(1 - count(DISTINCT {digest}) * 1.0 / count(*), 6) AS "
        f"dup_ratio, "
        f"round(sum(CASE WHEN {junk_hits_sql('text')} > 0 THEN 1 "
        f"ELSE 0 END) * 1.0 / count(*), 6) AS junk_rate, "
        f"round(avg({quality_score_sql('text')}), 6) AS mean_quality, "
        f"round(avg(length(text)), 6) AS mean_chars "
        f"FROM documents GROUP BY source ORDER BY source")

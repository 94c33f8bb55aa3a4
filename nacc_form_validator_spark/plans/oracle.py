"""ANSI-SQL oracle generators.

Every operator the engine claims is paired with an equivalent DuckDB SQL
form; the driver (and tests/test_entry_oracle.py) run both and compare
row-count + schema + values.  SQL is generated from the same constants the
Spark implementations use, so thresholds/patterns can never drift apart.
"""

from __future__ import annotations

from nacc_form_validator_spark.functions.heuristics import gopher_sql
from nacc_form_validator_spark.functions.langid import langid_sql
from nacc_form_validator_spark.functions.perplexity import (ppl_bigram_sql,
                                                            ppl_unigram_sql)
from nacc_form_validator_spark.functions.scrub import scrub_sql
from nacc_form_validator_spark.operators.textstats import BPE_ISH_PATTERN

NORM = ("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")


def stats_cte(table: str = "documents") -> str:
    g = gopher_sql("text")
    cols = ", ".join(f"{g[k]} AS {k}" for k in [
        "n_chars", "n_words", "mean_word_len", "alpha_ratio", "digit_ratio",
        "symbol_ratio", "stopword_count", "stopword_ratio", "n_lines",
        "dup_line_ratio", "word_rep_ratio"
    ])
    return (f"SELECT doc_id, lang, {cols}, {langid_sql('text')} AS "
            f"lang_pred, {ppl_unigram_sql('text')} AS ppl FROM {table}")


#: per-rule violation predicates over the stats CTE — mirror of
#: qualityfilter.DEFAULT_RULES minus the temporal rule (documents have no
#: recrawl dimension)
VIOLATIONS = {
    0x42: [  # min
        "n_words < 5",
        "mean_word_len IS NOT NULL AND mean_word_len < 2.0",
        "stopword_ratio IS NOT NULL AND stopword_ratio < 0.002",
    ],
    0x44: [  # max
        "n_words > 200000",
        "mean_word_len IS NOT NULL AND mean_word_len > 12.0",
        "symbol_ratio IS NOT NULL AND symbol_ratio > 0.3",
        "dup_line_ratio IS NOT NULL AND dup_line_ratio > 0.5",
        "word_rep_ratio IS NOT NULL AND word_rep_ratio > 0.9",
    ],
    0x1008: [  # compatibility: declared-vs-predicted language
        "lang_pred IN ('en','es','de','fr','zh') AND NOT "
        "(lang IS NULL OR lang = '' OR lang_pred = lang)",
    ],
    0x2003: [  # logic: perplexity threshold
        "ppl IS NOT NULL AND NOT (ppl < 40.0)",
    ],
}


def _n_findings() -> str:
    terms = []
    for preds in VIOLATIONS.values():
        terms += [f"CASE WHEN {p} THEN 1 ELSE 0 END" for p in preds]
    return " + ".join(terms)


def keep_drop_sql() -> str:
    return (f"WITH s AS ({stats_cte()}) SELECT doc_id, "
            f"({_n_findings()}) = 0 AS passed, "
            f"({_n_findings()}) AS n_findings FROM s ORDER BY doc_id")


def metrics_sql() -> str:
    parts = []
    for code, preds in VIOLATIONS.items():
        for p in preds:
            parts.append(f"SELECT {code} AS code, CASE WHEN {p} THEN 1 "
                         f"ELSE 0 END AS hit FROM s")
    union = " UNION ALL ".join(parts)
    return (f"WITH s AS ({stats_cte()}) SELECT CAST(code AS BIGINT) AS "
            f"code, CAST(sum(hit) AS BIGINT) AS hits "
            f"FROM ({union}) GROUP BY code HAVING sum(hit) > 0 "
            f"ORDER BY code")


def cooccurrence_sql() -> str:
    """Pairwise rule-code co-occurrence + lift (operators/rulestats.py):
    per-doc fired codes from the same VIOLATIONS predicates the Spark
    rules compile from, self-joined on doc_id with code_a < code_b."""
    fired = []
    for code, preds in VIOLATIONS.items():
        cond = " OR ".join(f"({p})" for p in preds)
        fired.append(f"SELECT doc_id, {code} AS code FROM s WHERE {cond}")
    c = " UNION ALL ".join(fired)
    return (
        f"WITH s AS ({stats_cte()}), c AS ({c}), "
        f"nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM s), "
        f"m AS (SELECT code, CAST(count(*) AS BIGINT) AS n_c FROM c "
        f"GROUP BY code) "
        f"SELECT CAST(x.code AS BIGINT) AS code_a, "
        f"CAST(y.code AS BIGINT) AS code_b, "
        f"CAST(count(*) AS BIGINT) AS n_ab, ma.n_c AS n_a, mb.n_c AS n_b, "
        f"nd.n_docs AS n_docs, "
        f"CAST(count(*) * nd.n_docs AS DOUBLE) / (ma.n_c * mb.n_c) AS lift "
        f"FROM c x JOIN c y ON x.doc_id = y.doc_id AND x.code <= y.code "
        f"JOIN m ma ON ma.code = x.code JOIN m mb ON mb.code = y.code "
        f"CROSS JOIN nd "
        f"GROUP BY x.code, y.code, ma.n_c, mb.n_c, nd.n_docs "
        f"ORDER BY code_a, code_b")


def doc_stats_sql() -> str:
    g = gopher_sql("text")
    keys = ["n_chars", "n_words", "mean_word_len", "alpha_ratio",
            "digit_ratio", "symbol_ratio", "stopword_count",
            "stopword_ratio", "n_lines", "dup_line_ratio", "word_rep_ratio"]
    cols = ", ".join(f"{g[k]} AS {k}" for k in keys)
    return f"SELECT doc_id, {cols} FROM documents ORDER BY doc_id"


def langid_query_sql() -> str:
    return (f"SELECT doc_id, {langid_sql('text')} AS lang_pred "
            f"FROM documents ORDER BY doc_id")


def ppl_query_sql() -> str:
    return (f"SELECT doc_id, {ppl_unigram_sql('text')} AS ppl "
            f"FROM documents ORDER BY doc_id")


def ppl_bigram_query_sql() -> str:
    return ppl_bigram_sql("text", "documents", "doc_id")


def scrub_query_sql() -> str:
    return (f"SELECT doc_id, {scrub_sql('text')} AS scrubbed_text "
            f"FROM documents ORDER BY doc_id")


def exact_dedup_sql() -> str:
    return (f"SELECT md5({NORM}) AS digest, min(doc_id) AS keep_id, "
            f"count(*) AS dups FROM documents GROUP BY 1 ORDER BY digest")


def incremental_exact_sql() -> str:
    """Oracle for dedup.incremental_exact_dedup over the md5-prefix
    delta split: corpus collapses to its (digest -> min id) index, the
    batch joins it by digest; keep = digest new to the corpus AND first
    within the batch, dup_of = corpus representative else earlier batch
    min."""
    return (
        f"WITH d AS (SELECT doc_id, md5({NORM}) AS digest, "
        f"substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1') "
        f"AS is_new FROM documents), "
        f"cidx AS (SELECT digest, min(doc_id) AS corpus_keep FROM d "
        f"WHERE NOT is_new GROUP BY digest), "
        f"dd AS (SELECT doc_id, digest FROM d WHERE is_new), "
        f"bmin AS (SELECT digest, min(doc_id) AS batch_min FROM dd "
        f"GROUP BY digest) "
        f"SELECT dd.doc_id, dd.digest, "
        f"(cidx.digest IS NULL AND dd.doc_id = bmin.batch_min) AS keep, "
        f"coalesce(cidx.corpus_keep, CASE WHEN bmin.batch_min < "
        f"dd.doc_id THEN bmin.batch_min END) AS dup_of "
        f"FROM dd JOIN bmin USING (digest) "
        f"LEFT JOIN cidx USING (digest) ORDER BY doc_id")


def _shingles(n: int = 3) -> str:
    w = f"list_filter(string_split({NORM}, ' '), x -> x <> '')"
    return (f"list_distinct(list_filter(list_transform(range(0, "
            f"greatest(len({w}) - {n}, 0) + 1), i -> array_to_string("
            f"list_slice({w}, i + 1, i + {n}), ' ')), s -> s <> ''))")


def _minhash_ctes(k: int = 8, bands: int = 4, n: int = 3):
    """(cte_body, pair_select) shared by the pair and component oracles."""
    rows = k // bands
    sh = _shingles(n)
    sig_cols = ", ".join(
        f"list_min(list_transform(sh, s -> md5(s || '#{i}'))) AS s{i}"
        for i in range(k))
    band_rows = []
    for b in range(bands):
        key = " || '|' || ".join(f"s{b * rows + r}" for r in range(rows))
        band_rows.append(f"SELECT id, {b} AS band, md5({key}) AS key "
                         f"FROM sigs")
    banded = " UNION ALL ".join(band_rows)
    ctes = (f"sh AS (SELECT doc_id AS id, {sh} AS sh FROM documents), "
            f"sigs AS (SELECT id, {sig_cols} FROM sh), "
            f"banded AS ({banded})")
    pair_select = (
        "SELECT DISTINCT l.id AS id_a, r.id AS id_b FROM banded l "
        "JOIN banded r ON l.band = r.band AND l.key = r.key AND "
        "l.id < r.id")
    return ctes, pair_select


def minhash_lsh_sql(k: int = 8, bands: int = 4, n: int = 3) -> str:
    ctes, pair_select = _minhash_ctes(k, bands, n)
    return f"WITH {ctes} {pair_select} ORDER BY id_a, id_b"


def minhash_verified_sql(k: int = 8, bands: int = 4, n: int = 3,
                         threshold: float = 0.5) -> str:
    """Oracle for dedup.minhash_verified_pairs: the band-collision
    candidate set, each candidate verified with exact list_intersect
    Jaccard over the same shingle CTE the signatures came from."""
    ctes, pair_select = _minhash_ctes(k, bands, n)
    inter = "len(list_intersect(a.sh, b.sh))"
    union = f"(len(a.sh) + len(b.sh) - {inter})"
    jac = (f"CASE WHEN {union} > 0 THEN round({inter} * 1.0 / {union}, 6) "
           f"ELSE 0.0 END")
    return (
        f"WITH {ctes}, pairs AS ({pair_select}) "
        f"SELECT id_a, id_b, jaccard FROM ("
        f"SELECT id_a, id_b, {jac} AS jaccard "
        f"FROM pairs JOIN sh a ON pairs.id_a = a.id "
        f"JOIN sh b ON pairs.id_b = b.id) "
        f"WHERE jaccard >= {threshold} ORDER BY id_a, id_b")


def minhash_incremental_sql(k: int = 8, bands: int = 4,
                            n: int = 3) -> str:
    """Oracle for dedup.incremental_minhash_pairs over the md5-prefix
    delta split (__spark_entry__._DELTA_HEX): the FULL band-collision
    pair set restricted to pairs touching a delta doc — the exact
    semantics the Spark side reaches via its delta-sized join (the
    oracle self-joins everything; exactness over scale)."""
    ctes, pair_select = _minhash_ctes(k, bands, n)
    return (
        f"WITH {ctes}, "
        f"delta AS (SELECT doc_id AS id FROM documents WHERE "
        f"substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')), "
        f"pairs AS ({pair_select}) "
        f"SELECT id_a, id_b FROM pairs WHERE id_a IN (SELECT id FROM "
        f"delta) OR id_b IN (SELECT id FROM delta) "
        f"ORDER BY id_a, id_b")


def dedup_components_sql(k: int = 8, bands: int = 4, n: int = 3) -> str:
    """Transitive-closure oracle for dedup_components: min reachable id
    per document over the symmetrized MinHash-LSH pair graph, via a
    recursive CTE (the Spark side runs alternating large-star /
    small-star — same fixpoint, different algorithm)."""
    ctes, pair_select = _minhash_ctes(k, bands, n)
    return (
        f"WITH RECURSIVE {ctes}, "
        f"pairs AS ({pair_select}), "
        f"edges AS (SELECT id_a AS u, id_b AS v FROM pairs "
        f"UNION SELECT id_b, id_a FROM pairs), "
        f"reach(u, lab) AS ("
        f"SELECT doc_id, doc_id FROM documents "
        f"UNION "
        f"SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.u) "
        f"SELECT u AS doc_id, min(lab) AS cluster_id, "
        f"min(lab) = u AS keep FROM reach GROUP BY u ORDER BY doc_id")


def soft_dedup_sql(k: int = 8, bands: int = 4, n: int = 3) -> str:
    """Oracle for dedup.soft_dedup_weights: the dedup_components
    transitive closure, a per-cluster count, and the 1.0/csize weight
    (one IEEE division — exact, no rounding)."""
    ctes, pair_select = _minhash_ctes(k, bands, n)
    return (
        f"WITH RECURSIVE {ctes}, "
        f"pairs AS ({pair_select}), "
        f"edges AS (SELECT id_a AS u, id_b AS v FROM pairs "
        f"UNION SELECT id_b, id_a FROM pairs), "
        f"reach(u, lab) AS ("
        f"SELECT doc_id, doc_id FROM documents "
        f"UNION "
        f"SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.u), "
        f"comp AS (SELECT u AS doc_id, min(lab) AS cluster_id "
        f"FROM reach GROUP BY u), "
        f"sz AS (SELECT cluster_id, count(*) AS csize FROM comp "
        f"GROUP BY cluster_id) "
        f"SELECT doc_id, comp.cluster_id, csize, "
        f"CAST(1.0 AS DOUBLE) / csize AS weight "
        f"FROM comp JOIN sz USING (cluster_id) ORDER BY doc_id")


def dedup_keep_best_sql(score_sql: str, k: int = 8, bands: int = 4,
                        n: int = 3) -> str:
    """Oracle for dedup_keep_best: same transitive closure as
    dedup_components_sql, then an argmax window per cluster on
    ``score_sql`` (a scalar expression over a documents row)."""
    ctes, pair_select = _minhash_ctes(k, bands, n)
    return (
        f"WITH RECURSIVE {ctes}, "
        f"pairs AS ({pair_select}), "
        f"edges AS (SELECT id_a AS u, id_b AS v FROM pairs "
        f"UNION SELECT id_b, id_a FROM pairs), "
        f"reach(u, lab) AS ("
        f"SELECT doc_id, doc_id FROM documents "
        f"UNION "
        f"SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.u), "
        f"comp AS (SELECT u AS doc_id, min(lab) AS cluster_id "
        f"FROM reach GROUP BY u), "
        f"q AS (SELECT doc_id, {score_sql} AS quality FROM documents), "
        f"j AS (SELECT comp.doc_id, comp.cluster_id, q.quality, "
        f"row_number() OVER (PARTITION BY comp.cluster_id "
        f"ORDER BY q.quality DESC, comp.doc_id ASC) AS rn "
        f"FROM comp JOIN q USING (doc_id)) "
        f"SELECT doc_id, cluster_id, quality, rn = 1 AS keep "
        f"FROM j ORDER BY doc_id")


def ngram_jaccard_sql(n: int = 3, threshold: float = 0.8) -> str:
    sh = _shingles(n)
    return (
        f"WITH sh AS (SELECT doc_id AS id, unnest({sh}) AS s FROM "
        f"documents), sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP "
        f"BY id), inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS "
        f"shared FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY "
        f"1, 2) SELECT id_a, id_b, round(shared * 1.0 / (na.n_sh + "
        f"nb.n_sh - shared), 6) AS jaccard FROM inter JOIN sizes na ON "
        f"na.id = id_a JOIN sizes nb ON nb.id = id_b WHERE shared * 1.0 / "
        f"(na.n_sh + nb.n_sh - shared) >= {threshold} ORDER BY id_a, id_b")


def simhash_sql(bits: int = 60) -> str:
    w = (f"list_distinct(list_filter(string_split({NORM}, ' '), "
         f"x -> x <> ''))")
    hashes = (f"list_transform({w}, t -> CAST(concat('0x', "
              f"substr(md5(t), 1, 15)) AS BIGINT))")
    bit_terms = []
    for b in range(bits):
        mask = 1 << b
        vote = (f"list_sum(list_transform(h, x -> CASE WHEN (x & {mask}) "
                f"<> 0 THEN 1 ELSE -1 END))")
        bit_terms.append(f"CASE WHEN coalesce({vote}, 0) > 0 THEN "
                         f"{mask}::BIGINT ELSE 0::BIGINT END")
    sig = " + ".join(bit_terms)
    return (f"WITH h AS (SELECT doc_id AS id, {hashes} AS h FROM "
            f"documents) SELECT id, ({sig}) AS sig FROM h ORDER BY id")


def simhash_pairs_sql(max_hamming: int = 3, bands: int = 4,
                      width: int = 20) -> str:
    """EXACT all-pairs hamming oracle for the banded simhash operator:
    the Spark side joins only on (band, width-bit key) buckets, but
    pigeonhole guarantees every hamming<=bands-1 pair shares a band, so
    banded == all-pairs — this oracle proves it on real data.  The
    signature is ``bands`` independent ``width``-bit simhash words,
    band b's token hashes taken from hex chars [b*ceil(width/4)...] of
    one md5 per token (operators/dedup.py with_simhash_bands)."""
    import math as _m
    hexlen = _m.ceil(width / 4)
    mask = (1 << width) - 1
    w = (f"list_distinct(list_filter(string_split({NORM}, ' '), "
         f"x -> x <> ''))")
    hx = f"list_transform({w}, t -> md5(t))"
    word_exprs = []
    for b in range(bands):
        hb = (f"list_transform(hx, x -> CAST(concat('0x', "
              f"substr(x, {1 + b * hexlen}, {hexlen})) AS BIGINT) "
              f"& {mask})")
        bit_terms = []
        for p in range(width):
            m = 1 << p
            vote = (f"list_sum(list_transform(h{b}, x -> CASE WHEN "
                    f"(x & {m}) <> 0 THEN 1 ELSE -1 END))")
            bit_terms.append(f"CASE WHEN coalesce({vote}, 0) > 0 THEN "
                             f"{m}::BIGINT ELSE 0::BIGINT END")
        word_exprs.append((hb, " + ".join(bit_terms)))
    hsel = ", ".join(f"{hb} AS h{b}"
                     for b, (hb, _) in enumerate(word_exprs))
    wsel = ", ".join(f"({expr}) AS w{b}"
                     for b, (_, expr) in enumerate(word_exprs))
    ham = " + ".join(
        f"bit_count(xor(a.w{b}::UBIGINT, b.w{b}::UBIGINT))"
        for b in range(bands))
    return (
        f"WITH hx AS (SELECT doc_id AS id, {hx} AS hx FROM documents), "
        f"hs AS (SELECT id, {hsel} FROM hx), "
        f"sigs AS (SELECT id, {wsel} FROM hs) "
        f"SELECT a.id AS id_a, b.id AS id_b, ({ham}) AS hamming "
        f"FROM sigs a JOIN sigs b ON a.id < b.id "
        f"WHERE ({ham}) <= {max_hamming} ORDER BY id_a, id_b")


def _cosine_sql(a: str, b: str) -> str:
    dot = (f"list_sum(list_transform(range(1, len({a}) + 1), "
           f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")
    na = (f"sqrt(list_sum(list_transform({a}, "
          f"x -> x::DOUBLE * x::DOUBLE)))")
    nb = (f"sqrt(list_sum(list_transform({b}, "
          f"x -> x::DOUBLE * x::DOUBLE)))")
    return f"round({dot} / ({na} * {nb}), 6)"


def brute_topk_sql(k: int = 5, n_queries: int = 5) -> str:
    cos = _cosine_sql("e.embedding", "q.embedding")
    return (
        f"WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings "
        f"WHERE vec_id < {n_queries}), scored AS (SELECT q.q_id, e.vec_id, "
        f"{cos} AS cos FROM embeddings e CROSS JOIN q), ranked AS ("
        f"SELECT q_id, vec_id, cos, row_number() OVER (PARTITION BY q_id "
        f"ORDER BY cos DESC, vec_id) AS rank FROM scored) "
        f"SELECT q_id, vec_id, cos, rank FROM ranked WHERE rank <= {k} "
        f"ORDER BY q_id, rank")


def sq8_topk_sql(k: int = 5, n_queries: int = 5, dim: int = 64) -> str:
    """Oracle for simsearch.sq8_topk: per-dimension min/max codebook,
    floor((v-lo)/step) uint8 codes clamped at 255, bucket-midpoint
    dequantization, full-precision-query dot (ADC) — the identical
    double arithmetic as the Spark form, so values match exactly."""
    code_i = ("CASE WHEN hi[i] = lo[i] THEN 0 ELSE CAST(least(255, "
              "floor((vd[i] - lo[i]) / ((hi[i] - lo[i]) / 255.0))) "
              "AS INT) END")
    dq_i = ("CASE WHEN cb.hi[i] = cb.lo[i] THEN cb.lo[i] ELSE cb.lo[i] "
            "+ (code[i] + 0.5) * ((cb.hi[i] - cb.lo[i]) / 255.0) END")
    return (
        f"WITH e AS (SELECT vec_id, list_transform(embedding, "
        f"x -> x::DOUBLE) AS vd FROM embeddings), "
        f"cbd AS (SELECT i, min(vd[i]) AS lo, max(vd[i]) AS hi "
        f"FROM e, range(1, {dim + 1}) t(i) GROUP BY i), "
        f"cb AS (SELECT list(lo ORDER BY i) AS lo, "
        f"list(hi ORDER BY i) AS hi FROM cbd), "
        f"enc AS (SELECT vec_id, list_transform(range(1, {dim + 1}), "
        f"i -> {code_i}) AS code FROM e, cb), "
        f"q AS (SELECT vec_id AS q_id, vd AS qvd FROM e "
        f"WHERE vec_id < {n_queries}), "
        f"scored AS (SELECT q.q_id, enc.vec_id, "
        f"round(list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> ({dq_i}) * qvd[i])), 6) AS score "
        f"FROM enc, cb CROSS JOIN q), "
        f"ranked AS (SELECT q_id, vec_id, score, row_number() OVER ("
        f"PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank "
        f"FROM scored) "
        f"SELECT q_id, vec_id, score, rank FROM ranked "
        f"WHERE rank <= {k} ORDER BY q_id, rank")


def _lsh_planes_literal(dim: int, n_planes: int) -> str:
    from nacc_form_validator_spark.operators.simsearch import _hyperplanes
    planes = _hyperplanes(dim, n_planes)
    return "[" + ", ".join(
        "[" + ", ".join(repr(v) for v in pl) + "]" for pl in planes) + "]"


def _lsh_bucket_expr(dim: int, n_planes: int,
                     vec: str = "embedding") -> str:
    """Hyperplane signature as SQL (simsearch.lsh_bucket mirror); expects
    a one-row CTE exposing the plane matrix as ``p``."""
    bucket_terms = []
    for p in range(n_planes):
        d = (f"list_sum(list_transform(range(1, {dim} + 1), "
             f"i -> {vec}[i]::DOUBLE * p[{p + 1}][i]))")
        bucket_terms.append(f"(CASE WHEN {d} >= 0 THEN {1 << p} "
                            f"ELSE 0 END)")
    return " + ".join(bucket_terms)


def lsh_topk_sql(k: int = 5, n_queries: int = 5, dim: int = 64,
                 n_planes: int = 8) -> str:
    """Exact oracle for the hyperplane-LSH top-k path
    (operators/simsearch.py:61-114): the md5-seeded planes are
    deterministic, so bucket assignment, multi-probe expansion, and
    within-bucket cosine ranking replicate fully in SQL."""
    nested = _lsh_planes_literal(dim, n_planes)
    bucket = _lsh_bucket_expr(dim, n_planes)
    probes = ", ".join(f"xor(qbucket, {1 << p})" for p in range(n_planes))
    cos = _cosine_sql("c.embedding", "qe.q_vec")
    return (
        f"WITH pl AS (SELECT {nested} AS p), "
        f"c AS (SELECT vec_id, embedding, {bucket} AS bucket "
        f"FROM embeddings, pl), "
        f"q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket AS "
        f"qbucket FROM c WHERE vec_id < {n_queries}), "
        f"qe AS (SELECT q_id, q_vec, unnest([qbucket, {probes}]) AS bucket "
        f"FROM q), "
        f"scored AS (SELECT DISTINCT qe.q_id, c.vec_id, {cos} AS cos "
        f"FROM c JOIN qe USING (bucket)), "
        f"ranked AS (SELECT q_id, vec_id, cos, row_number() OVER ("
        f"PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM scored) "
        f"SELECT q_id, vec_id, cos, rank FROM ranked WHERE rank <= {k} "
        f"ORDER BY q_id, rank")


def ivf_topk_sql(k: int = 5, n_queries: int = 5, dim: int = 64,
                 n_centroids: int = 16, nprobe: int = 3) -> str:
    """Exact oracle for the IVF coarse-quantizer top-k path
    (operators/simsearch.py:ivf_topk): md5-seeded unit centroids are
    deterministic, so cell assignment (ties -> lowest id), nprobe
    expansion, and within-cell ranking replicate fully in SQL."""
    from nacc_form_validator_spark.operators.simsearch import _centroids
    cents = _centroids(dim, n_centroids)
    nested = "[" + ", ".join(
        "[" + ", ".join(repr(v) for v in c) + "]" for c in cents) + "]"
    scores = (f"list_transform(range(1, {n_centroids} + 1), j -> "
              f"round(list_sum(list_transform(range(1, {dim} + 1), "
              f"i -> embedding[i]::DOUBLE * c[j][i])), 6))")
    probes = (f"list_transform(list_slice(list_reverse_sort("
              f"list_transform(range(0, {n_centroids}), "
              f"i -> {{'s': scores[i + 1], 'nk': -i}})), 1, {nprobe}), "
              f"e -> -e.nk)")
    cos = _cosine_sql("c2.embedding", "qe.q_vec")
    return (
        f"WITH ce AS (SELECT {nested} AS c), "
        f"sc AS (SELECT vec_id, embedding, {scores} AS scores "
        f"FROM embeddings, ce), "
        f"corpus AS (SELECT vec_id, embedding, "
        f"list_position(scores, list_max(scores)) - 1 AS cell FROM sc), "
        f"q AS (SELECT vec_id AS q_id, embedding AS q_vec, scores "
        f"FROM sc WHERE vec_id < {n_queries}), "
        f"qe AS (SELECT q_id, q_vec, unnest({probes}) AS cell FROM q), "
        f"scored AS (SELECT DISTINCT qe.q_id, c2.vec_id, {cos} AS cos "
        f"FROM corpus c2 JOIN qe USING (cell)), "
        f"ranked AS (SELECT q_id, vec_id, cos, row_number() OVER ("
        f"PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM scored) "
        f"SELECT q_id, vec_id, cos, rank FROM ranked WHERE rank <= {k} "
        f"ORDER BY q_id, rank")


def embedding_neardup_sql(threshold: float = 0.95) -> str:
    cos = _cosine_sql("a.embedding", "b.embedding")
    return (
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos "
        f"FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        f"WHERE {cos} >= {threshold} ORDER BY id_a, id_b")


def embedding_neardup_lsh_sql(threshold: float = 0.95, dim: int = 64,
                              n_planes: int = 32, bands: int = 4) -> str:
    """Oracle for the banded-LSH embedding near-dup scale path
    (operators/dedup.py embedding_neardup_pairs_lsh): deterministic
    planes -> band keys -> bucket join -> exact cosine verify."""
    nested = _lsh_planes_literal(dim, n_planes)
    rows = n_planes // bands
    bucket = _lsh_bucket_expr(dim, n_planes)
    band_rows = " UNION ALL ".join(
        f"SELECT id, embedding, {b} AS band, "
        f"(bucket >> {b * rows}) & {(1 << rows) - 1} AS key FROM sig"
        for b in range(bands))
    cos = _cosine_sql("a.embedding", "b.embedding")
    return (
        f"WITH pl AS (SELECT {nested} AS p), "
        f"sig AS (SELECT vec_id AS id, embedding, {bucket} AS bucket "
        f"FROM embeddings, pl), "
        f"banded AS ({band_rows}) "
        f"SELECT DISTINCT a.id AS id_a, b.id AS id_b, {cos} AS cos "
        f"FROM banded a JOIN banded b ON a.band = b.band AND "
        f"a.key = b.key AND a.id < b.id "
        f"WHERE {cos} >= {threshold} ORDER BY id_a, id_b")


def tokens_quality_sql() -> str:
    ws = f"len(list_filter(string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' '), x -> x <> ''))"
    pieces = f"regexp_extract_all(text, '({BPE_ISH_PATTERN})', 1)"
    bpe = (f"len({pieces}) + list_sum(list_transform({pieces}, p -> CASE "
           f"WHEN length(p) > 6 THEN CAST(floor((length(p) - 1) / 6) AS "
           f"BIGINT) ELSE 0 END))")
    from nacc_form_validator_spark.operators.textstats import (
        quality_score_sql)
    score = quality_score_sql("text")
    w = f"list_filter(string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ' '), x -> x <> '')"
    from nacc_form_validator_spark.operators.textstats import FINGERPRINT_MOD
    fold = (f"list_reduce(list_prepend(0::BIGINT, list_transform({w}, "
            f"t -> CAST(concat('0x', substr(md5(t), 1, 14)) AS BIGINT))), "
            f"(a, h) -> (a * 31 + h) % {FINGERPRINT_MOD})")
    return (f"SELECT doc_id, CAST({ws} AS BIGINT) AS ws_tokens, "
            f"CAST({bpe} AS BIGINT) AS bpeish_tokens, "
            f"{score} AS quality, {fold} AS fingerprint "
            f"FROM documents ORDER BY doc_id")


def kmeans_ff_sql(dim: int = 64, k: int = 8, iters: int = 2) -> str:
    """Oracle for simsearch.train_quantizer_ff: the Gonzalez
    farthest-first seed chain (seed 0 = smallest vec_id; each next
    seed = argmax of the maintained round-6 min squared distance,
    ties by id) derived IN SQL, then the same unrolled Lloyd
    iterations as kmeans_train_sql from that seed table.  Seed-chain
    CTEs MATERIALIZED (each d{j} references d{j-1})."""
    sq = ("list_sum(list_transform(range(1, {d} + 1), "
          "i -> (dd.vd[i] - s.vd[i]) * (dd.vd[i] - s.vd[i])))"
          ).format(d=dim)
    parts = [
        "e AS (SELECT vec_id, list_transform(embedding, "
        "x -> x::DOUBLE) AS vd FROM embeddings)",
        "fd0 AS MATERIALIZED (SELECT vec_id, vd, "
        "CAST(1e308 AS DOUBLE) AS md FROM e)",
        "fs0 AS MATERIALIZED (SELECT vd FROM e "
        "ORDER BY vec_id LIMIT 1)",
    ]
    for j in range(1, k):
        parts += [
            f"fd{j} AS MATERIALIZED (SELECT vec_id, dd.vd, "
            f"least(md, round({sq}, 6)) AS md "
            f"FROM fd{j - 1} dd, fs{j - 1} s)",
            f"fs{j} AS MATERIALIZED (SELECT vd FROM fd{j} "
            f"ORDER BY md DESC, vec_id ASC LIMIT 1)",
        ]
    seed_union = " UNION ALL ".join(
        f"SELECT {j} AS cell, vd AS c FROM fs{j}" for j in range(k))
    parts.append(f"c0 AS MATERIALIZED ({seed_union})")
    dot = ("list_sum(list_transform(range(1, {d} + 1), "
           "j -> e.vd[j] * c.c[j]))").format(d=dim)
    hn2 = "list_sum(list_transform(c.c, x -> x * x)) / 2.0"
    mcols = ", ".join(f"round(avg(e.vd[{j + 1}]), 6) AS m{j}"
                      for j in range(dim))
    mlist = "[" + ", ".join(f"m{j}" for j in range(dim)) + "]"
    for it in range(iters):
        nxt = it + 1
        parts += [
            f"a{it} AS (SELECT vec_id, cell FROM (SELECT e.vec_id, "
            f"c.cell, row_number() OVER (PARTITION BY e.vec_id "
            f"ORDER BY ({dot} - {hn2}) DESC, c.cell ASC) AS rn "
            f"FROM e, c{it} c) WHERE rn = 1)",
            f"m{it} AS (SELECT a{it}.cell, {mcols}, count(*) AS n "
            f"FROM a{it} JOIN e ON a{it}.vec_id = e.vec_id "
            f"GROUP BY a{it}.cell)",
            f"c{nxt} AS MATERIALIZED (SELECT c{it}.cell, "
            f"CASE WHEN m{it}.cell IS NULL THEN c{it}.c "
            f"ELSE {mlist} END AS c FROM c{it} "
            f"LEFT JOIN m{it} ON c{it}.cell = m{it}.cell)",
        ]
    fin = iters
    flat = ", ".join(f"c[{j + 1}] AS m{j}" for j in range(dim))
    return (
        "WITH " + ", ".join(parts) + ", "
        f"af AS (SELECT vec_id, cell FROM (SELECT e.vec_id, c.cell, "
        f"row_number() OVER (PARTITION BY e.vec_id "
        f"ORDER BY ({dot} - {hn2}) DESC, c.cell ASC) AS rn "
        f"FROM e, c{fin} c) WHERE rn = 1), "
        f"cnt AS (SELECT cell, count(*) AS n_members FROM af "
        f"GROUP BY cell) "
        f"SELECT c{fin}.cell, CAST(coalesce(n_members, 0) AS BIGINT) "
        f"AS n_members, {flat} FROM c{fin} LEFT JOIN cnt "
        f"ON c{fin}.cell = cnt.cell ORDER BY c{fin}.cell")


def kmeans_train_sql(dim: int = 64, k: int = 8, iters: int = 2) -> str:
    """Oracle for simsearch.train_coarse_quantizer: ``iters`` unrolled
    Lloyd iterations from the md5-seeded init.  Assignment is
    argmax(v.c - |c|^2/2) with lowest-cell tie-break; centroid means
    round to 6 decimals per iteration (part of the algorithm spec, so
    the whole training loop is value-reproducible); empty cells keep
    their previous centroid."""
    from nacc_form_validator_spark.operators.simsearch import _centroids
    cents = _centroids(dim, k)
    init_rows = ", ".join(
        f"({c}, [{', '.join(repr(v) for v in cents[c])}])"
        for c in range(k))
    dot = ("list_sum(list_transform(range(1, {d} + 1), "
           "j -> e.vd[j] * c.c[j]))").format(d=dim)
    hn2 = "list_sum(list_transform(c.c, x -> x * x)) / 2.0"
    mcols = ", ".join(f"round(avg(e.vd[{j + 1}]), 6) AS m{j}"
                      for j in range(dim))
    mlist = "[" + ", ".join(f"m{j}" for j in range(dim)) + "]"
    parts = [
        f"e AS (SELECT vec_id, list_transform(embedding, "
        f"x -> x::DOUBLE) AS vd FROM embeddings)",
        f"c0 AS (SELECT * FROM (VALUES {init_rows}) AS t(cell, c))",
    ]
    for it in range(iters):
        nxt = it + 1
        parts += [
            f"a{it} AS (SELECT vec_id, cell FROM (SELECT e.vec_id, "
            f"c.cell, row_number() OVER (PARTITION BY e.vec_id "
            f"ORDER BY ({dot} - {hn2}) DESC, c.cell ASC) AS rn "
            f"FROM e, c{it} c) WHERE rn = 1)",
            f"m{it} AS (SELECT a{it}.cell, {mcols}, count(*) AS n "
            f"FROM a{it} JOIN e ON a{it}.vec_id = e.vec_id "
            f"GROUP BY a{it}.cell)",
            f"c{nxt} AS (SELECT c{it}.cell, CASE WHEN m{it}.cell IS "
            f"NULL THEN c{it}.c ELSE {mlist} END AS c FROM c{it} "
            f"LEFT JOIN m{it} ON c{it}.cell = m{it}.cell)",
        ]
    fin = iters
    return (
        "WITH " + ", ".join(parts) + ", "
        f"af AS (SELECT vec_id, cell FROM (SELECT e.vec_id, c.cell, "
        f"row_number() OVER (PARTITION BY e.vec_id "
        f"ORDER BY ({dot} - {hn2}) DESC, c.cell ASC) AS rn "
        f"FROM e, c{fin} c) WHERE rn = 1), "
        f"cnt AS (SELECT cell, count(*) AS n_members FROM af "
        f"GROUP BY cell) "
        f"SELECT c{fin}.cell AS cell, CAST(coalesce(cnt.n_members, 0) "
        f"AS BIGINT) AS n_members, "
        + ", ".join(f"c{fin}.c[{j + 1}] AS m{j}" for j in range(dim)) +
        f" FROM c{fin} LEFT JOIN cnt ON c{fin}.cell = cnt.cell "
        f"ORDER BY cell")


def pq_encode_sql(dim: int = 64, m: int = 4, ks: int = 8,
                  iters: int = 2) -> str:
    """Oracle for operators/pq.pq_encode: per-subspace unrolled Lloyd
    training (same md5 init, same argmax(dot - |c|²/2) lowest-cell
    tie-break, same round-6 means, empty cells keep previous) followed
    by the final per-subspace assignment, joined on vec_id."""
    from nacc_form_validator_spark.operators.simsearch import _centroids
    sub = dim // m
    parts = []
    finals = []
    for s in range(m):
        p = f"s{s}"
        vd = (f"list_transform(embedding[{s * sub + 1}:{(s + 1) * sub}]"
              f", x -> x::DOUBLE)")
        parts.append(f"e{s} AS (SELECT vec_id, {vd} AS vd "
                     f"FROM embeddings)")
        cents = _centroids(sub, ks)
        init = ", ".join(
            f"({c}, [{', '.join(repr(v) for v in cents[c])}])"
            for c in range(ks))
        parts.append(f"{p}c0 AS (SELECT * FROM (VALUES {init}) "
                     f"AS t(cell, c))")
        dot = (f"list_sum(list_transform(range(1, {sub} + 1), "
               f"j -> ee.vd[j] * c.c[j]))")
        hn2 = "list_sum(list_transform(c.c, x -> x * x)) / 2.0"
        mcols = ", ".join(f"round(avg(ee.vd[{j + 1}]), 6) AS m{j}"
                          for j in range(sub))
        mlist = "[" + ", ".join(f"m{j}" for j in range(sub)) + "]"
        for it in range(iters):
            nxt = it + 1
            parts += [
                f"{p}a{it} AS (SELECT vec_id, cell FROM (SELECT "
                f"ee.vec_id, c.cell, row_number() OVER (PARTITION BY "
                f"ee.vec_id ORDER BY ({dot} - {hn2}) DESC, c.cell ASC) "
                f"AS rn FROM e{s} ee, {p}c{it} c) WHERE rn = 1)",
                f"{p}m{it} AS (SELECT {p}a{it}.cell, {mcols} FROM "
                f"{p}a{it} JOIN e{s} ee ON {p}a{it}.vec_id = ee.vec_id "
                f"GROUP BY {p}a{it}.cell)",
                f"{p}c{nxt} AS (SELECT {p}c{it}.cell, CASE WHEN "
                f"{p}m{it}.cell IS NULL THEN {p}c{it}.c ELSE {mlist} "
                f"END AS c FROM {p}c{it} LEFT JOIN {p}m{it} "
                f"ON {p}c{it}.cell = {p}m{it}.cell)",
            ]
        parts.append(
            f"{p}af AS (SELECT vec_id, cell FROM (SELECT ee.vec_id, "
            f"c.cell, row_number() OVER (PARTITION BY ee.vec_id "
            f"ORDER BY ({dot} - {hn2}) DESC, c.cell ASC) AS rn "
            f"FROM e{s} ee, {p}c{iters} c) WHERE rn = 1)")
        finals.append(f"CAST({p}af.cell AS BIGINT) AS c{s}")
    joins = " ".join(
        f"JOIN s{s}af ON s0af.vec_id = s{s}af.vec_id"
        for s in range(1, m))
    return ("WITH " + ", ".join(parts) +
            f" SELECT s0af.vec_id AS vec_id, {', '.join(finals)} "
            f"FROM s0af {joins} ORDER BY vec_id")


def ivf_trained_topk_sql(dim: int = 64, kc: int = 8, iters: int = 2,
                         k: int = 5, nprobe: int = 3,
                         n_queries: int = 5) -> str:
    """Oracle for the trained-IVF search path: train the quantizer in
    SQL (same unrolled Lloyd CTEs as kmeans_train_sql), then probe each
    query's ``nprobe`` nearest trained cells (euclidean, 6-decimal
    rounded scores) and rank candidates by exact cosine."""
    base = kmeans_train_sql(dim=dim, k=kc, iters=iters)
    # reuse everything up to the final SELECT: the WITH chain ends with
    # af (corpus cell assignment under the final centroids) and cnt
    with_chain = base[:base.index(" SELECT c")]
    fin = iters
    dotq = (f"list_sum(list_transform(range(1, {dim} + 1), "
            f"j -> q.vd[j] * c.c[j]))")
    hn2 = "list_sum(list_transform(c.c, x -> x * x)) / 2.0"
    cos = _cosine_sql("ce.vd", "qe.vd")
    return (
        f"{with_chain}, "
        f"q AS (SELECT vec_id AS q_id, vd FROM e WHERE vec_id < "
        f"{n_queries}), "
        f"probes AS (SELECT q_id, cell FROM (SELECT q.q_id, c.cell, "
        f"row_number() OVER (PARTITION BY q.q_id ORDER BY "
        f"round({dotq} - {hn2}, 6) DESC, c.cell ASC) AS rn "
        f"FROM q, c{fin} c) WHERE rn <= {nprobe}), "
        f"cand AS (SELECT DISTINCT p.q_id, af.vec_id FROM probes p "
        f"JOIN af ON af.cell = p.cell), "
        f"scored AS (SELECT cand.q_id, cand.vec_id, {cos} AS cos "
        f"FROM cand JOIN e ce ON ce.vec_id = cand.vec_id "
        f"JOIN e qe ON qe.vec_id = cand.q_id), "
        f"ranked AS (SELECT q_id, vec_id, cos, row_number() OVER ("
        f"PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank "
        f"FROM scored) "
        f"SELECT q_id, vec_id, cos, rank FROM ranked WHERE rank <= {k} "
        f"ORDER BY q_id, rank")


def semdedup_sql(dim: int = 64, k: int = 8, iters: int = 2,
                 threshold: float = 0.95) -> str:
    """Oracle for operators/semdedup.py: train the quantizer in SQL
    (same unrolled Lloyd CTEs as kmeans_train_sql), pair within trained
    cells, drop any id dominated by a lower-id cell-mate with cosine >=
    threshold (6-decimal rounded, identical to the Spark side)."""
    base = kmeans_train_sql(dim=dim, k=k, iters=iters)
    with_chain = base[:base.index(" SELECT c")]
    cos = _cosine_sql("e1.vd", "e2.vd")
    return (
        f"{with_chain}, "
        f"p AS (SELECT a1.vec_id AS id_a, a2.vec_id AS id_b FROM af a1 "
        f"JOIN af a2 ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id), "
        f"dup AS (SELECT DISTINCT p.id_b FROM p "
        f"JOIN e e1 ON e1.vec_id = p.id_a "
        f"JOIN e e2 ON e2.vec_id = p.id_b "
        f"WHERE {cos} >= {threshold}) "
        f"SELECT af.vec_id AS id, af.cell, (dup.id_b IS NULL) AS keep "
        f"FROM af LEFT JOIN dup ON af.vec_id = dup.id_b ORDER BY id")


def _bloom_pos_sql(digest: str, i: int, m: int) -> str:
    return (f"(CAST(concat('0x', substr(md5({digest} || '{i}'), 1, 8)) "
            f"AS BIGINT) % {m})")


def incremental_exact_bloom_sql(m: int = 65536,
                                k_hashes: int = 4) -> str:
    """Oracle for dedup.incremental_exact_dedup_bloom over the
    md5-prefix delta split: decisions identical to the unfiltered
    incremental operator (a bloom miss implies digest not in corpus, so
    gating the corpus join cannot change them); the bloom_hit column
    pins the filter arithmetic itself, false positives included."""
    probe = "[" + ", ".join(_bloom_pos_sql("digest", i, m)
                            for i in range(k_hashes)) + "]"
    return (
        f"WITH d AS (SELECT doc_id, md5({NORM}) AS digest, "
        f"substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1') "
        f"AS is_new FROM documents), "
        f"bloom AS (SELECT DISTINCT pos FROM (SELECT unnest({probe}) "
        f"AS pos FROM d WHERE NOT is_new)), "
        f"cidx AS (SELECT digest, min(doc_id) AS corpus_keep FROM d "
        f"WHERE NOT is_new GROUP BY digest), "
        f"dd AS (SELECT doc_id, digest FROM d WHERE is_new), "
        f"hits AS (SELECT doc_id, digest, "
        f"(sum(CASE WHEN bloom.pos IS NOT NULL THEN 1 ELSE 0 END) = "
        f"{k_hashes}) AS bloom_hit FROM (SELECT doc_id, digest, "
        f"unnest({probe}) AS p FROM dd) t "
        f"LEFT JOIN bloom ON t.p = bloom.pos GROUP BY doc_id, digest), "
        f"bmin AS (SELECT digest, min(doc_id) AS batch_min FROM dd "
        f"GROUP BY digest) "
        f"SELECT dd.doc_id AS doc_id, dd.digest AS digest, "
        f"(cidx.digest IS NULL AND dd.doc_id = bmin.batch_min) AS keep, "
        f"coalesce(cidx.corpus_keep, CASE WHEN bmin.batch_min < "
        f"dd.doc_id THEN bmin.batch_min END) AS dup_of, h.bloom_hit "
        f"FROM dd JOIN bmin USING (digest) "
        f"LEFT JOIN cidx USING (digest) "
        f"JOIN hits h ON h.doc_id = dd.doc_id ORDER BY dd.doc_id")


def ppl_trained_bigram_sql() -> str:
    """Oracle for functions/perplexity.py ppl_trained_bigram: corpus
    bigram/unigram counts (exact integers) -> add-one-smoothed
    per-doc perplexity, train + score in one query."""
    wexpr = ("list_filter(string_split_regex(lower(text), '\\s+'), "
             "x -> x <> '')")
    return (
        f"WITH w AS (SELECT doc_id, {wexpr} AS w FROM documents), "
        f"pairs AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 "
        f"FROM w, unnest(range(1, greatest(len(w), 1))) AS u(i)), "
        f"bi AS (SELECT w1, w2, count(*) AS c2 FROM pairs "
        f"GROUP BY 1, 2), "
        f"uni AS (SELECT t.w1, count(*) AS c1 FROM "
        f"(SELECT unnest(w) AS w1 FROM w) t GROUP BY t.w1), "
        f"vocab AS (SELECT count(*) AS v FROM uni), "
        f"scored AS (SELECT p.doc_id, ln((coalesce(bi.c2, 0) + 1.0) / "
        f"(coalesce(uni.c1, 0) + vocab.v)) AS logp FROM pairs p "
        f"LEFT JOIN bi ON p.w1 = bi.w1 AND p.w2 = bi.w2 "
        f"LEFT JOIN uni ON p.w1 = uni.w1 CROSS JOIN vocab), "
        f"per AS (SELECT doc_id, round(exp(-avg(logp)), 6) AS ppl, "
        f"count(*) AS n FROM scored GROUP BY doc_id) "
        f"SELECT d.doc_id AS id, CAST(per.n AS BIGINT) AS n_bigrams, "
        f"per.ppl FROM documents d LEFT JOIN per "
        f"ON d.doc_id = per.doc_id ORDER BY id")


def text_normalize_sql() -> str:
    """Oracle for the unicode-normalize pandas UDFs
    (functions/normalize.py): NFC via nfc_normalize, accent-folded
    lowercase via lower(strip_accents(nfc_normalize(x))) — identical
    codepoint semantics (utf8proc vs Python unicodedata, probed in
    tests/test_normalize.py).  Input = documents text prefixed with the
    shared non-ASCII fixture strings."""
    from nacc_form_validator_spark.functions.normalize import (
        UNICODE_FIXTURES)
    cases = " ".join(
        f"WHEN {i} THEN '{fx}' || text"
        for i, fx in enumerate(UNICODE_FIXTURES) if fx)
    aug = (f"CASE doc_id % {len(UNICODE_FIXTURES)} {cases} "
           f"ELSE text END")
    return (
        f"WITH a AS (SELECT doc_id, {aug} AS t FROM documents) "
        f"SELECT doc_id, nfc_normalize(t) AS nfc, "
        f"lower(strip_accents(nfc_normalize(t))) AS folded "
        f"FROM a ORDER BY doc_id")


def pack_sequences_sql(budget: int = 512, shards: int = 8) -> str:
    """Oracle for operators/packing.py pack_sequences: per-shard
    concat-and-chunk packing via a running token cumsum."""
    nt = ("len(list_filter(string_split_regex(text, '\\s+'), "
          "x -> x <> ''))")
    shard = (f"CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), "
             f"1, 8)) AS BIGINT) % {shards}")
    return (
        f"WITH d AS (SELECT doc_id AS id, {shard} AS shard, "
        f"CAST({nt} AS BIGINT) AS n_tokens FROM documents), "
        f"c AS (SELECT id, shard, n_tokens, sum(n_tokens) OVER ("
        f"PARTITION BY shard ORDER BY id ROWS BETWEEN UNBOUNDED "
        f"PRECEDING AND CURRENT ROW) - n_tokens AS strt FROM d) "
        f"SELECT id, shard, n_tokens, "
        f"CAST(floor(strt / {budget}) AS BIGINT) AS seq_id, "
        f"CAST(strt - floor(strt / {budget}) * {budget} AS BIGINT) AS "
        f"seq_offset FROM c ORDER BY id")


def _hash_uniform_sql(key: str) -> str:
    return (f"CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1, "
            f"8)) AS BIGINT) / 4294967296.0")


def hash_sample_sql(rate: float = 0.3) -> str:
    """Oracle for operators/sampling.py hash_sample over documents."""
    u = _hash_uniform_sql("doc_id")
    return (f"SELECT doc_id, lang FROM documents WHERE {u} < {rate} "
            f"ORDER BY doc_id")


def stratified_sample_sql(en_rate: float = 0.2) -> str:
    """Oracle for stratified_hash_sample: downsample 'en', keep rest."""
    u = _hash_uniform_sql("doc_id")
    return (f"SELECT doc_id, lang FROM documents WHERE {u} < "
            f"CASE WHEN lang = 'en' THEN {en_rate} ELSE 1.0 END "
            f"ORDER BY doc_id")


def mixture_resample_sql(weights: dict = None) -> str:
    """Oracle for operators/sampling.py mixture_resample: out_total =
    min(size_s / w_s); stratum keeps rate_s = w_s * out_total / size_s
    by the shared md5 uniform.  The CASE literals are the SAME
    normalized doubles the Spark operator computes (identical Python
    arithmetic, repr round-trip), so rate rounding at 9 decimals
    bit-matches across engines for any weights, temperature-smoothed
    included."""
    weights = weights or {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    total = float(sum(weights.values()))
    u = _hash_uniform_sql("doc_id")
    w = ("CASE source " + " ".join(
        f"WHEN '{s}' THEN {float(wgt) / total!r}"
        for s, wgt in sorted(weights.items())) + " END")
    srcs = ", ".join(f"'{s}'" for s in sorted(weights))
    return (
        f"WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS sz, {w} "
        f"AS w FROM documents WHERE source IN ({srcs}) "
        f"GROUP BY source), "
        f"t AS (SELECT min(sz / w) AS out_total FROM c), "
        f"r AS (SELECT source, round(w * out_total / sz, 9) AS rate "
        f"FROM c CROSS JOIN t) "
        f"SELECT d.doc_id, d.source FROM documents d JOIN r USING (source) "
        f"WHERE {u} < rate ORDER BY d.doc_id")


def topk_per_group_sql(k: int = 3) -> str:
    """Oracle for per_group_topk: best k docs per lang by n_chars."""
    return (f"SELECT doc_id, lang, n_chars, rank FROM ("
            f"SELECT doc_id, lang, n_chars, row_number() OVER ("
            f"PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank "
            f"FROM documents) WHERE rank <= {k} ORDER BY lang, rank")


def boilerplate_removal_sql(min_df: int = 3) -> str:
    """Oracle for operators/boilerplate.py remove_boilerplate: drop any
    trimmed non-empty line whose document frequency >= min_df, rebuild
    each doc's text in line order ('' when everything was
    boilerplate)."""
    lines = ("list_filter(list_transform(string_split(text, chr(10)), "
             "s -> trim(s)), s -> s <> '')")
    return (
        f"WITH d AS (SELECT doc_id, {lines} AS ls FROM documents), "
        f"ex AS (SELECT doc_id, i AS pos, ls[i] AS line FROM d, "
        f"unnest(range(1, len(ls) + 1)) AS u(i)), "
        f"hot AS (SELECT md5(lower(line)) AS k FROM ex "
        f"GROUP BY 1 HAVING count(DISTINCT doc_id) >= {min_df}), "
        f"kept AS (SELECT doc_id, pos, line FROM ex "
        f"WHERE md5(lower(line)) NOT IN (SELECT k FROM hot)), "
        f"rebuilt AS (SELECT doc_id, string_agg(line, chr(10) "
        f"ORDER BY pos) AS clean_text FROM kept GROUP BY doc_id) "
        f"SELECT d.doc_id AS id, coalesce(r.clean_text, '') AS "
        f"clean_text FROM documents d LEFT JOIN rebuilt r "
        f"ON d.doc_id = r.doc_id ORDER BY id")


def windowed_metrics_sql(window_min: int = 10,
                         watermark_min: int = 30) -> str:
    """Batch oracle for the watermarked streaming metrics
    (streaming/pipeline.py windowed_metrics_stream): per 10-min event
    window, per error code, rule-hit counts over the stateless rule
    subset.  Append mode only emits windows the final watermark
    (max event time - delay) has passed: window_end <= max_ts - 30min
    (Spark evicts a window when watermark >= end)."""
    g = gopher_sql("text")
    stat_keys = ["n_words", "mean_word_len", "symbol_ratio",
                 "stopword_ratio", "dup_line_ratio", "word_rep_ratio"]
    stats = ", ".join(f"{g[k]} AS {k}" for k in stat_keys)
    hit_rows = " UNION ALL ".join(
        f"SELECT warc_ts, {code} AS code FROM s WHERE {p}"
        for code, preds in VIOLATIONS.items() for p in preds)
    return (
        f"WITH p AS ({pages_cte(with_ts=True)}), "
        f"s AS (SELECT warc_ts, lang, {stats}, "
        f"{langid_sql('text')} AS lang_pred, "
        f"{ppl_unigram_sql('text')} AS ppl FROM p), "
        f"hits AS ({hit_rows}), "
        f"mx AS (SELECT max(warc_ts) AS m FROM p), "
        f"w AS (SELECT time_bucket(INTERVAL {window_min} MINUTE, "
        f"warc_ts) AS ws, code, count(*) AS hits FROM hits "
        f"GROUP BY 1, 2) "
        f"SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, "
        f"strftime(ws + INTERVAL {window_min} MINUTE, "
        f"'%Y-%m-%d %H:%M:%S') AS window_end, "
        f"CAST(code AS BIGINT) AS code, CAST(hits AS BIGINT) AS hits "
        f"FROM w, mx WHERE ws + INTERVAL {window_min} MINUTE <= "
        f"m - INTERVAL {watermark_min} MINUTE "
        f"ORDER BY window_start, code")


def recrawl_collapse_sql() -> str:
    """Batch oracle for the STATEFUL streaming recrawl monitor
    (streaming/pipeline.py _recrawl_fn): per-url crawl chain == lag()
    window; collapse = word count halved vs the previous crawl.  The
    input is pages_from_documents plus one extra 'tiny doc' recrawl per
    url 100 days later, so real collapses occur."""
    nw = "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))"
    return (
        f"WITH p AS ({pages_cte(with_ts=True)}), "
        f"p2 AS (SELECT url, warc_ts, text FROM p UNION ALL "
        f"SELECT url, min(warc_ts) + INTERVAL 100 DAY, 'tiny doc' "
        f"FROM p GROUP BY url), "
        f"nw AS (SELECT url, warc_ts, CAST({nw} AS BIGINT) AS n_words "
        f"FROM p2), "
        f"lagd AS (SELECT url, warc_ts, n_words, lag(n_words) OVER "
        f"(PARTITION BY url ORDER BY warc_ts) AS prev_n_words FROM nw) "
        f"SELECT url, strftime(warc_ts, '%Y-%m-%d %H:%M:%S') AS ts, "
        f"n_words, prev_n_words, "
        f"coalesce(n_words * 2 < prev_n_words, false) AS collapsed "
        f"FROM lagd ORDER BY url, ts")


def tfidf_topk_sql(k: int = 5, min_df: int = 2) -> str:
    """Oracle for operators/tfidf.py tfidf_topk over documents: smoothed
    idf on exact integer counts, score rounded to 6 BEFORE ranking, rank
    ties broken by the term — identical ranking across engines."""
    w = f"list_filter(string_split({NORM}, ' '), x -> x <> '')"
    return (
        f"WITH pairs AS (SELECT doc_id, unnest({w}) AS word "
        f"FROM documents), "
        f"tf AS (SELECT doc_id, word, count(*) AS tf FROM pairs "
        f"GROUP BY ALL), "
        f"dfreq AS (SELECT word, count(DISTINCT doc_id) AS dfw FROM pairs "
        f"GROUP BY word HAVING count(DISTINCT doc_id) >= {min_df}), "
        f"n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents), "
        f"scored AS (SELECT doc_id AS id, tf.word, round(tf * (ln("
        f"(n_docs + 1) * 1.0 / (dfw + 1)) + 1), 6) AS tfidf "
        f"FROM tf JOIN dfreq USING (word) CROSS JOIN n), "
        f"ranked AS (SELECT id, word, tfidf, row_number() OVER ("
        f"PARTITION BY id ORDER BY tfidf DESC, word ASC) AS rank "
        f"FROM scored) "
        f"SELECT id, word, tfidf, rank FROM ranked WHERE rank <= {k} "
        f"ORDER BY id, rank")


def repetition_stats_sql(top_ns=(2, 3, 4), dup_ns=(5, 6)) -> str:
    """Oracle for functions/repetition.py repetition_stats: per doc, the
    char coverage of the most frequent n-gram (top_ns) and of all
    duplicated n-grams (dup_ns), over normalized-text chars, capped at
    1.  The oracle takes the unnest/GROUP BY road; the engine computes
    the same counts inside the row (sorted-run-length) — value parity is
    the point, plan parity is not."""
    w = f"list_filter(string_split({NORM}, ' '), x -> x <> '')"
    all_ns = sorted(set(top_ns) | set(dup_ns))
    n_vals = ", ".join(f"({n})" for n in all_ns)
    tops = ", ".join(
        f"CASE WHEN denom > 0 THEN least(1.0, round(coalesce("
        f"max(CASE WHEN n = {n} THEN top_chars END), 0) * 1.0 / denom, 6))"
        f" ELSE 0.0 END AS top{n}_frac" for n in top_ns)
    dups = ", ".join(
        f"CASE WHEN denom > 0 THEN least(1.0, round(coalesce("
        f"max(CASE WHEN n = {n} THEN dup_chars END), 0) * 1.0 / denom, 6))"
        f" ELSE 0.0 END AS dup{n}_frac" for n in dup_ns)
    return (
        f"WITH w AS (SELECT doc_id, {w} AS w, length({NORM}) AS denom "
        f"FROM documents), "
        f"g AS (SELECT doc_id, n, unnest(list_transform("
        f"range(0, len(w) - n + 1), i -> array_to_string("
        f"list_slice(w, i + 1, i + n), ' '))) AS gram "
        f"FROM w CROSS JOIN (VALUES {n_vals}) AS t(n)), "
        f"cnt AS (SELECT doc_id, n, gram, count(*) AS c FROM g "
        f"GROUP BY ALL), "
        f"agg AS (SELECT doc_id, n, max(c * length(gram)) AS top_chars, "
        f"sum(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END) "
        f"AS dup_chars FROM cnt GROUP BY ALL) "
        f"SELECT w.doc_id, {tops}, {dups} "
        f"FROM w LEFT JOIN agg USING (doc_id) "
        f"GROUP BY w.doc_id, denom ORDER BY w.doc_id")


def streaming_dedup_sql(flag: str = "first_seen") -> str:
    """Batch oracle for the STATEFUL streaming exact dedup
    (streaming/pipeline.py streaming_exact_dedup): first_seen == the
    (warc_ts, url)-minimal row per content digest.  Input is
    pages_from_documents plus one shared 'tiny doc' recrawl per url 100
    days out, so one fat digest group spans every url.  With
    ``flag='novel'`` this is also the oracle for streaming_bloom_dedup
    — at the query's geometry the Bloom fp probability is ~1e-10, so
    novel must value-match exact first_seen."""
    return (
        f"WITH p AS ({pages_cte(with_ts=True)}), "
        f"p2 AS (SELECT url, warc_ts, text FROM p UNION ALL "
        f"SELECT url, min(warc_ts) + INTERVAL 100 DAY, 'tiny doc' "
        f"FROM p GROUP BY url), "
        f"d AS (SELECT url, warc_ts, md5({NORM}) AS digest FROM p2) "
        f"SELECT url, strftime(warc_ts, '%Y-%m-%d %H:%M:%S') AS ts, "
        f"digest, (row_number() OVER (PARTITION BY digest "
        f"ORDER BY warc_ts, url) = 1) AS {flag} "
        f"FROM d ORDER BY digest, ts, url")


def streaming_minhash_dedup_sql(k: int = 8, bands: int = 4,
                                n: int = 3) -> str:
    """Batch oracle for the STATEFUL streaming near-dup detector
    (streaming/pipeline.py streaming_minhash_dedup): first_seen == the
    (warc_ts, url)-minimal row per (band, key) over the full recrawl
    pages corpus — the same band-key arithmetic as _minhash_ctes,
    keyed by (url, warc_ts) instead of doc_id."""
    rows = k // bands
    sh = _shingles(n)
    sig_cols = ", ".join(
        f"list_min(list_transform(sh, s -> md5(s || '#{i}'))) AS s{i}"
        for i in range(k))
    band_rows = []
    for b in range(bands):
        key = " || '|' || ".join(f"s{b * rows + r}" for r in range(rows))
        band_rows.append(f"SELECT url, warc_ts, {b} AS band, "
                         f"md5({key}) AS key FROM sigs")
    banded = " UNION ALL ".join(band_rows)
    return (
        f"WITH p AS ({pages_cte(with_ts=True)}), "
        f"sh AS (SELECT url, warc_ts, {sh} AS sh FROM p), "
        f"sigs AS (SELECT url, warc_ts, {sig_cols} FROM sh), "
        f"banded AS ({banded}) "
        f"SELECT url, strftime(warc_ts, '%Y-%m-%d %H:%M:%S') AS ts, "
        f"band, key, (row_number() OVER (PARTITION BY band, key "
        f"ORDER BY warc_ts, url) = 1) AS first_seen "
        f"FROM banded ORDER BY band, key, ts, url")


def temporal_events_sql() -> str:
    """compare_with previous_record (ignore_empty) over events: value must
    not drop below half the previous value; first event passes."""
    return (
        "WITH w AS (SELECT event_id, user_id, value, lag(value) OVER "
        "(PARTITION BY user_id ORDER BY ts) AS prev_value FROM events) "
        "SELECT event_id, user_id, "
        "(prev_value IS NULL OR value >= prev_value * 0.5) AS passed "
        "FROM w ORDER BY event_id")


def rules_temporal_sql() -> str:
    """temporalrules battery (nacc_validator.py:759-913) over events.

    Rule order matters: the ignore_empty rule (0) never aborts; the plain
    previous-record rule (1) emits NO_PREV_VISIT on the first visit and
    aborts rules 2-3 for that row (the reference `return`s,
    nacc_validator.py:862-866).  Subschema semantics: a null value fails
    the condition (nullable defaults False inside subschemas), so
    prev/curr validity terms carry explicit IS NOT NULL guards.
    """
    return (
        "WITH d AS (SELECT event_id, user_id, ts, value, "
        "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value2 "
        "FROM events), "
        "w AS (SELECT event_id, user_id, value, value2, "
        "lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev_value, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn, "
        "first_value(value) OVER (PARTITION BY user_id ORDER BY ts) "
        "AS init_value, "
        "last_value(value2 IGNORE NULLS) OVER (PARTITION BY user_id "
        "ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
        "AS ne_value2 FROM d), "
        "f AS (SELECT event_id, user_id, "
        "(CASE WHEN ne_value2 IS NOT NULL AND ne_value2 >= 5.0 AND NOT "
        "(value2 IS NOT NULL AND value2 >= 0.5) THEN 1 ELSE 0 END) + "
        "(CASE WHEN rn = 1 THEN 1 ELSE 0 END) + "
        "(CASE WHEN rn > 1 AND prev_value <= 50.0 AND NOT "
        "(value IS NOT NULL AND value <= 80.0) THEN 1 ELSE 0 END) + "
        "(CASE WHEN rn > 1 AND value IS NOT NULL AND value >= 90.0 AND NOT "
        "(prev_value >= 20.0) THEN 1 ELSE 0 END) + "
        "(CASE WHEN rn > 1 AND init_value <= 95.0 AND NOT "
        "(value IS NOT NULL AND value <= 99.0) THEN 1 ELSE 0 END) "
        "AS n_findings FROM w) "
        "SELECT event_id, user_id, CAST(n_findings AS BIGINT) AS "
        "n_findings, (n_findings = 0) AS passed FROM f ORDER BY event_id")


def tpch_q1_sql() -> str:
    return (
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS "
        "sum_disc_price, "
        "count(*) AS count_order FROM lineitem "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus")


# ---------------------------------------------------------------------------
# Rule-family differential queries over the driver-provided TPC-H-ish tables.
# Each mirrors the exact semantics the compiler emits for one rule family
# (SURVEY.md §2.3-2.4) so the driver's DuckDB comparison exercises the rule
# engine itself, not just the payload stages.

def rules_compatibility_sql() -> str:
    """if/then/else constraint (nacc_validator.py:652-756): urgent orders
    must total >= 50000, others >= 1000; one constraint => one finding."""
    return (
        "SELECT o_orderkey, "
        "(CASE WHEN o_orderpriority = '1-URGENT' "
        "THEN o_totalprice >= 50000.0 "
        "ELSE o_totalprice >= 1000.0 END) AS passed "
        "FROM orders ORDER BY o_orderkey")


def rules_logic_sql() -> str:
    """jsonLogic count/>= formula (json_logic.py:248-249)."""
    return (
        "SELECT l_orderkey, l_linenumber, "
        "(((CASE WHEN l_quantity > 10 THEN 1 ELSE 0 END) + "
        "(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) + "
        "(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END)) >= 2) AS passed "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber")


def rules_compare_with_sql() -> str:
    """field >= base * adjustment (nacc_validator.py:1039-1183)."""
    return (
        "SELECT l_orderkey, l_linenumber, "
        "(l_extendedprice >= l_quantity * 901.0) AS passed "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber")


def rules_compare_age_sql() -> str:
    """age = (visit - birth).days / 365.25 >= 55 (nacc_validator.py:1318)."""
    return (
        "WITH d AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS "
        "visit_date, CAST(1940 + o_orderkey % 60 AS INTEGER) AS byr, "
        "CAST(1 + o_orderkey % 12 AS INTEGER) AS bmo, "
        "CAST(1 + o_orderkey % 28 AS INTEGER) AS bdy FROM orders) "
        "SELECT o_orderkey, "
        "((date_diff('day', make_date(byr, bmo, bdy), visit_date)) "
        "/ 365.25 >= 55.0) AS passed FROM d ORDER BY o_orderkey")


def rules_gds_sql() -> str:
    """Full compute_gds truth table incl. prorating + floor(x+0.5)
    (nacc_validator.py:980-1037); inputs derived from o_orderkey bits."""
    qs = []
    for i in range(15):
        qs.append(
            f"CASE WHEN (o_orderkey + {i * 7}) % 11 = 0 THEN 9 "
            f"ELSE (o_orderkey >> {i}) & 1 END AS q{i}")
    derive = (
        "SELECT o_orderkey, "
        + ", ".join(qs) +
        ", CASE WHEN o_orderkey % 17 = 0 THEN 1 "
        "WHEN o_orderkey % 5 = 0 THEN NULL ELSE 0 END AS nogds, "
        "CASE WHEN o_orderkey % 17 = 0 AND o_orderkey % 3 = 0 THEN 88 "
        "ELSE o_orderkey % 16 END AS gds FROM orders")
    in01 = " + ".join(
        f"(CASE WHEN q{i} IN (0, 1) THEN 1 ELSE 0 END)" for i in range(15))
    ssum = " + ".join(
        f"(CASE WHEN q{i} IN (0, 1) THEN q{i} ELSE 0 END)"
        for i in range(15))
    stats = (f"SELECT o_orderkey, gds, nogds, ({in01}) AS num_valid, "
             f"({ssum}) AS gds_sum FROM d")
    findings = (
        "SELECT o_orderkey, "
        "(CASE WHEN nogds1 AND gds <> 88 THEN 1 ELSE 0 END) + "
        "(CASE WHEN nogds1 AND num_valid >= 12 THEN 1 ELSE 0 END) + "
        "(CASE WHEN (NOT nogds1) AND all15_bad THEN 1 ELSE 0 END) + "
        "(CASE WHEN (NOT nogds1) AND (NOT all15_bad) AND "
        "num_unanswered <= 3 AND prorated <> gds THEN 1 ELSE 0 END) + "
        "(CASE WHEN (NOT nogds1) AND (NOT all15_bad) AND "
        "(nogds IS NULL OR nogds = 0) AND num_valid < 12 "
        "THEN 1 ELSE 0 END) AS n_findings FROM x")
    mid = (
        "SELECT o_orderkey, gds, nogds, num_valid, gds_sum, "
        "coalesce(nogds = 1, FALSE) AS nogds1, "
        "(num_valid = 15 AND gds_sum <> gds) AS all15_bad, "
        "15 - num_valid AS num_unanswered, "
        "CAST(floor(gds_sum + (CAST(gds_sum AS DOUBLE) / num_valid) * "
        "(15 - num_valid) + 0.5) AS BIGINT) AS prorated FROM s")
    return (
        f"WITH d AS ({derive}), s AS ({stats}), x AS ({mid}), "
        f"f AS ({findings}) SELECT o_orderkey, "
        f"CAST(n_findings AS BIGINT) AS n_findings, "
        f"(n_findings = 0) AS passed FROM f ORDER BY o_orderkey")


def rules_score_variables_sql() -> str:
    """score_variables mode=correct + logic formula over the calc var
    (nacc_validator.py:1362-1436)."""
    return (
        "WITH d AS (SELECT p_partkey, p_size % 4 AS val1, "
        "(p_size + 1) % 5 AS val2, p_partkey % 3 AS val3, "
        "p_partkey % 4 AS total FROM part), "
        "s AS (SELECT p_partkey, total, "
        "(CASE WHEN val1 = 1 THEN 1 ELSE 0 END) + "
        "(CASE WHEN val2 = 2 THEN 1 ELSE 0 END) + "
        "(CASE WHEN val3 = 0 THEN 1 ELSE 0 END) AS total_sum FROM d) "
        "SELECT p_partkey, (total = total_sum) AS passed "
        "FROM s ORDER BY p_partkey")


def rules_fields_sql() -> str:
    """Per-field rule battery (allowed/regex-fullmatch/min/max/anyof,
    SURVEY.md §2.2) over customer."""
    n = ("(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING',"
         "'FURNITURE','MACHINERY','HOUSEHOLD') THEN 1 ELSE 0 END) + "
         "(CASE WHEN NOT regexp_full_match(c_name, 'Customer#[0-9]+') "
         "THEN 1 ELSE 0 END) + "
         "(CASE WHEN c_acctbal < -500.0 THEN 1 ELSE 0 END) + "
         "(CASE WHEN c_acctbal > 8000.0 THEN 1 ELSE 0 END) + "
         "(CASE WHEN c_nationkey BETWEEN 10 AND 14 THEN 1 ELSE 0 END)")
    return (f"SELECT c_custkey, CAST({n} AS BIGINT) AS n_findings, "
            f"({n} = 0) AS passed FROM customer ORDER BY c_custkey")


def rules_cast_sql() -> str:
    """String-record cast stage (nacc_validator.py:207-257): '' -> None
    fires nullable; uncastable keeps raw and fires type; castable values
    proceed to min/forbidden."""
    n = ("(CASE WHEN c_custkey % 7 = 0 THEN 1 "
         "WHEN c_custkey % 11 = 0 THEN 1 ELSE 0 END) + "
         "(CASE WHEN c_nationkey < 5 THEN 1 ELSE 0 END) + "
         "(CASE WHEN c_nationkey = 13 THEN 1 ELSE 0 END) + "
         "(CASE WHEN c_custkey % 2 = 1 THEN 1 ELSE 0 END)")
    return (f"SELECT c_custkey, CAST({n} AS BIGINT) AS n_findings, "
            f"({n} = 0) AS passed FROM customer ORDER BY c_custkey")


def rules_membership_sql() -> str:
    """check_adcid-style broadcast membership (nacc_validator.py:1337-1360):
    c_nationkey must be a known reference id 0..19."""
    return ("SELECT c_custkey, (c_nationkey BETWEEN 0 AND 19) AS passed "
            "FROM customer ORDER BY c_custkey")


def pages_cte(with_ts: bool = False) -> str:
    """Reproduce pages_from_documents (sources/pages.py:23-54) in SQL:
    url from the zipf-ish host bucket, 1..3 recrawls per doc with the
    deterministic text drift, html = wrapped text; ``with_ts`` adds the
    warc_ts recrawl timestamp and the declared lang."""
    host = ("'host' || CAST(CAST(floor(sqrt(doc_id % 256)) AS INTEGER) "
            "AS VARCHAR)")
    ts = (", TIMESTAMP '2025-01-01 00:00:00' + (c * 7) * INTERVAL 1 DAY "
          "+ (doc_id % 1440) * INTERVAL 1 MINUTE AS warc_ts, lang"
          if with_ts else "")
    return (
        f"SELECT 'https://' || {host} || '.example/p/' || "
        f"CAST(doc_id AS VARCHAR) AS url, "
        f"CASE WHEN c = 0 THEN text ELSE text || ' update' || "
        f"CAST(c AS VARCHAR) END AS text{ts} "
        f"FROM documents CROSS JOIN unnest(range(0, doc_id % 3 + 1)) "
        f"AS u(c)")


def qf_pipeline_sql(temporal: bool = True,
                    scrubbed_text: bool = True,
                    ppl_mode: str = "unigram",
                    gated: bool = False) -> str:
    """Full-pipeline oracle (QualityFilterPipeline.run over
    pages_from_documents): heuristic stats + langid + unigram ppl +
    DEFAULT_RULES (incl., when ``temporal``, the ignore_empty temporal
    recrawl rule over the per-url window) + scrub lineage counts.

    ``passed`` mirrors the engine exactly: rule findings only
    (qualityfilter.py:run computes passed before concatenating scrub
    findings); ``n_findings`` counts rule + scrub hits.
    ``temporal=False`` is the stateless-rule subset the streaming path
    runs per micro-batch (streaming/pipeline.py:24-50).
    ``ppl_mode='bigram'`` mirrors the pandas-UDF pipeline variant
    (use_udf_stages=True): the ppl column scores the broadcast bigram
    matrix instead of the unigram expression — langid and every other
    stage are output-identical between the variants.
    ``gated=True`` mirrors gate_expensive=True (qualityfilter.py
    _cheap_alive + masked UDF input): model columns are nulled for
    every doc that fails a cheap numeric bound, and the output exposes
    the invariant columns (alive, lang_scored, ppl_scored) so the
    value hash pins "model scored ⇔ cheap-alive" per document.
    """
    from nacc_form_validator_spark.functions.scrub import PII_PATTERNS
    g = gopher_sql("text")
    stat_keys = ["n_words", "mean_word_len", "symbol_ratio",
                 "stopword_ratio", "dup_line_ratio", "word_rep_ratio"]
    stats = ", ".join(f"{g[k]} AS {k}" for k in stat_keys)
    rule_terms = []
    for preds in VIOLATIONS.values():
        rule_terms += [f"CASE WHEN {p} THEN 1 ELSE 0 END" for p in preds]
    if temporal:
        # temporal recrawl rule (ignore_empty [n_words]): previous
        # nonempty n_words >= 5 => current n_words >= 5; n_words is never
        # null, so the nonempty view is a plain lag over the url window
        rule_terms.append(
            "CASE WHEN prev_nw IS NOT NULL AND prev_nw >= 5 AND "
            "NOT (n_words >= 5) THEN 1 ELSE 0 END")
    n_rules = " + ".join(rule_terms)
    scrub_terms = []
    for _, pat, _rep in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        scrub_terms.append(
            f"CASE WHEN len(regexp_extract_all(text, '{sql_pat}')) > 0 "
            f"THEN 1 ELSE 0 END")
    n_scrub = " + ".join(scrub_terms)
    gate_cte = ""
    if gated:
        # same bounds _cheap_alive derives from the rule spec's numeric
        # min/max on natively-computed stat columns (null stats pass)
        from nacc_form_validator_spark.functions.heuristics import (
            GOPHER_RULES)
        terms = []
        for field, spec in GOPHER_RULES.items():
            for key in ("min", "max"):
                b = spec.get(key)
                if isinstance(b, bool) or not isinstance(b, (int, float)):
                    continue
                op = ">=" if key == "min" else "<="
                terms.append(f"({field} IS NULL OR {field} {op} {b})")
        alive = "(" + " AND ".join(terms) + ")"
        gate_cte = (
            f"sg AS (SELECT url, warc_ts, text, lang, "
            f"{', '.join(stat_keys)}, {alive} AS alive, "
            f"CASE WHEN {alive} THEN lang_pred END AS lang_pred, "
            f"CASE WHEN {alive} THEN ppl END AS ppl FROM s), ")
    src = "sg" if gated else "s"
    lagged = (f"w AS (SELECT *, lag(n_words) OVER (PARTITION BY url "
              f"ORDER BY warc_ts) AS prev_nw FROM {src}), " if temporal
              else f"w AS (SELECT * FROM {src}), ")
    scrub_col = (f", {scrub_sql('text')} AS scrubbed_text"
                 if scrubbed_text else "")
    if ppl_mode == "bigram":
        from nacc_form_validator_spark.functions.perplexity import (
            ALPHABET, BIGRAM_LP)
        flat = ", ".join(repr(float(v)) for v in BIGRAM_LP.ravel())
        abc = ALPHABET + " "
        n_sym = len(abc) + 1
        idx = (f"CASE WHEN strpos('{abc}', t[k]) > 0 "
               f"THEN strpos('{abc}', t[k]) - 1 ELSE {n_sym - 1} END")
        ppl = (f"CASE WHEN len(ix) >= 2 THEN round(exp(-("
               f"list_sum(list_transform(range(1, len(ix)), "
               f"k -> m.lp[ix[k] * {n_sym} + ix[k + 1] + 1])) "
               f"/ (len(ix) - 1))), 4) END")
        s_ctes = (
            f"m(lp) AS (SELECT [{flat}]), "
            f"pl AS (SELECT p.*, lower(text) AS t FROM p), "
            f"s1 AS (SELECT url, warc_ts, text, lang, {stats}, "
            f"{langid_sql('text')} AS lang_pred, "
            f"list_transform(range(1, length(t) + 1), k -> {idx}) AS ix "
            f"FROM pl), "
            f"s AS (SELECT url, warc_ts, text, lang, "
            f"{', '.join(stat_keys)}, lang_pred, {ppl} AS ppl "
            f"FROM s1, m), ")
    else:
        s_ctes = (
            f"s AS (SELECT url, warc_ts, text, lang, {stats}, "
            f"{langid_sql('text')} AS lang_pred, "
            f"{ppl_unigram_sql('text')} AS ppl FROM p), ")
    gate_pass = (", alive, (lang_pred IS NOT NULL) AS lang_scored, "
                 "(ppl IS NOT NULL) AS ppl_scored" if gated else "")
    gate_out = (", alive, lang_scored, ppl_scored" if gated else "")
    return (
        f"WITH p AS ({pages_cte(with_ts=True)}), "
        f"{s_ctes}"
        f"{gate_cte}"
        f"{lagged}"
        f"f AS (SELECT url, warc_ts, text, ({n_rules}) AS nr, "
        f"({n_scrub}) AS ns{gate_pass} FROM w) "
        f"SELECT url, strftime(warc_ts, '%Y-%m-%d %H:%M:%S') AS ts, "
        f"CAST(nr + ns AS BIGINT) AS n_findings, (nr = 0) AS passed"
        f"{scrub_col}{gate_out} FROM f ORDER BY url, ts")


def multimodal_features_sql(dim: int = 8) -> str:
    """Oracle for the deterministic-fake decode stage
    (operators/multimodal.py:51-84): feature i = round(md5_byte[i mod 16]
    / 255, 6) over the html payload — pure md5 arithmetic, SQL-expressible."""
    feats = ", ".join(
        f"round(CAST(concat('0x', substr(md5(html), {2 * (i % 16) + 1}, 2)) "
        f"AS INTEGER) / 255.0, 6) AS f{i}" for i in range(dim))
    return (
        f"WITH p AS ({pages_cte()}), "
        f"h AS (SELECT url, '<html><body><p>' || text || "
        f"'</p></body></html>' AS html FROM p) "
        f"SELECT url, CAST(strlen(html) AS BIGINT) AS n_bytes, {feats} "
        f"FROM h ORDER BY url")


def multimodal_real_decode_sql() -> str:
    """Oracle for the REAL decode path (operators/imagecodec.py): the
    Spark side encodes a deterministic 4x4 BMP per doc (md5('img'||id)
    digest tiled x3 into 48 RGB bytes), decodes it back through
    decode_image_batch's real path, and extracts channel-moment
    features.  Because gcd(3, 16) = 1, every channel sees each digest
    byte exactly once, so the per-channel mean/std equal the digest
    moments — pure md5 arithmetic, SQL-expressible.  n_bytes = 54-byte
    BMP header + 4 rows x 12 data bytes (row stride already 4-aligned)
    = 102."""
    f01 = "round(ln(5.0), 6)"  # log1p(width=4) == log1p(height=4)
    return (
        "WITH d AS (SELECT 'img' || CAST(doc_id AS VARCHAR) AS url, "
        "md5('img' || CAST(doc_id AS VARCHAR)) AS hx FROM documents), "
        "b AS (SELECT url, list_transform(range(0, 16), i -> "
        "CAST(concat('0x', substr(hx, 1 + 2*i, 2)) AS INTEGER)) AS bs "
        "FROM d), "
        "m AS (SELECT url, bs, list_avg(bs) AS mu FROM b), "
        "s AS (SELECT url, mu, sqrt(list_avg(list_transform(bs, "
        "x -> (x - mu) * (x - mu)))) AS sd FROM m) "
        f"SELECT url, CAST(102 AS BIGINT) AS n_bytes, "
        f"{f01} AS f0, {f01} AS f1, "
        "round(mu / 255.0, 6) AS f2, round(mu / 255.0, 6) AS f3, "
        "round(mu / 255.0, 6) AS f4, round(sd / 255.0, 6) AS f5, "
        "round(sd / 255.0, 6) AS f6, round(sd / 255.0, 6) AS f7 "
        "FROM s ORDER BY url")


def multimodal_real_decode_gif_sql() -> str:
    """Oracle for the REAL GIF path (operators/imagecodec.py LZW
    decode): the Spark side encodes a 4x4 GIF per doc whose pixel
    INDICES are the md5 digest bytes and whose palette is the gray
    identity (palette[i] = (i,i,i)), so after a real LZW roundtrip the
    channel moments equal the digest-byte moments — pure md5
    arithmetic.  n_bytes is dropped (it depends on the LZW stream
    length, not SQL-expressible)."""
    f01 = "round(ln(5.0), 6)"  # log1p(width=4) == log1p(height=4)
    return (
        "WITH d AS (SELECT 'gif' || CAST(doc_id AS VARCHAR) AS url, "
        "md5('gif' || CAST(doc_id AS VARCHAR)) AS hx FROM documents), "
        "b AS (SELECT url, list_transform(range(0, 16), i -> "
        "CAST(concat('0x', substr(hx, 1 + 2*i, 2)) AS INTEGER)) AS bs "
        "FROM d), "
        "m AS (SELECT url, bs, list_avg(bs) AS mu FROM b), "
        "s AS (SELECT url, mu, sqrt(list_avg(list_transform(bs, "
        "x -> (x - mu) * (x - mu)))) AS sd FROM m) "
        f"SELECT url, {f01} AS f0, {f01} AS f1, "
        "round(mu / 255.0, 6) AS f2, round(mu / 255.0, 6) AS f3, "
        "round(mu / 255.0, 6) AS f4, round(sd / 255.0, 6) AS f5, "
        "round(sd / 255.0, 6) AS f6, round(sd / 255.0, 6) AS f7 "
        "FROM s ORDER BY url")


def multimodal_real_decode_jpeg_sql() -> str:
    """Oracle for the REAL baseline-JPEG path (operators/jpegcodec.py):
    the Spark side encodes a 16x16 grayscale JPEG per doc — four flat
    8x8 blocks valued by the first 4 bytes of md5('jpg'||id) — with
    unit quantization, where the DCT of a flat block is DC-only and
    exact, so decode is LOSSLESS and the channel moments equal the
    4-byte digest moments: pure md5 arithmetic, SQL-expressible.
    f0 = f1 = log1p(16); gray replicates to all three channels."""
    f01 = "round(ln(17.0), 6)"  # log1p(width=16) == log1p(height=16)
    return (
        "WITH d AS (SELECT 'jpg' || CAST(doc_id AS VARCHAR) AS url, "
        "md5('jpg' || CAST(doc_id AS VARCHAR)) AS hx FROM documents), "
        "b AS (SELECT url, list_transform(range(0, 4), i -> "
        "CAST(concat('0x', substr(hx, 1 + 2*i, 2)) AS INTEGER)) AS bs "
        "FROM d), "
        "m AS (SELECT url, bs, list_avg(bs) AS mu FROM b), "
        "s AS (SELECT url, mu, sqrt(list_avg(list_transform(bs, "
        "x -> (x - mu) * (x - mu)))) AS sd FROM m) "
        f"SELECT url, {f01} AS f0, {f01} AS f1, "
        "round(mu / 255.0, 6) AS f2, round(mu / 255.0, 6) AS f3, "
        "round(mu / 255.0, 6) AS f4, round(sd / 255.0, 6) AS f5, "
        "round(sd / 255.0, 6) AS f6, round(sd / 255.0, 6) AS f7 "
        "FROM s ORDER BY url")


def multimodal_resize_sql(width: int = 8, height: int = 8) -> str:
    """Oracle for the fake resize stage: output = first width*height*3
    bytes of the payload (ASCII html, so char slice == byte slice)."""
    cap = width * height * 3
    return (
        f"WITH p AS ({pages_cte()}), "
        f"h AS (SELECT url, '<html><body><p>' || text || "
        f"'</p></body></html>' AS html FROM p) "
        f"SELECT url, {width} AS width, {height} AS height, "
        f"CAST(least(strlen(html), {cap}) AS BIGINT) AS n_out, "
        f"md5(substr(html, 1, {cap})) AS digest FROM h ORDER BY url")


def multimodal_frames_sql(every_n: int = 10) -> str:
    """Oracle for the frame-sampling plan: n_frames = len(html) mod 100
    + 1, indices 0..n_frames-1 step every_n."""
    return (
        f"WITH p AS ({pages_cte()}), "
        f"h AS (SELECT url, strlen('<html><body><p>' || text || "
        f"'</p></body></html>') % 100 + 1 AS nf FROM p) "
        f"SELECT url, CAST(floor((nf - 1) / {every_n}) + 1 AS BIGINT) AS "
        f"n_samples, CAST(({every_n}) * floor((nf - 1) / {every_n}) AS "
        f"BIGINT) AS last_idx FROM h ORDER BY url")


def host_stats_sql() -> str:
    """Per-host page/url counts, derived directly from the deterministic
    pages_from_documents mapping (sources/pages.py): host bucket =
    floor(sqrt(doc_id % 256)), crawls per doc = doc_id % 3 + 1."""
    host = ("'host' || CAST(CAST(floor(sqrt(doc_id % 256)) AS INTEGER) "
            "AS VARCHAR) || '.example'")
    return (f"SELECT {host} AS host, "
            f"CAST(sum(doc_id % 3 + 1) AS BIGINT) AS n_pages, "
            f"CAST(count(*) AS BIGINT) AS n_urls "
            f"FROM documents GROUP BY 1 ORDER BY host")


def html_extract_sql() -> str:
    """Byte-identity oracle for the html->text extraction stage
    (functions/extract.py): re-extracting from the raw payload must
    reproduce the ``text`` column exactly, per (url, warc_ts)."""
    from nacc_form_validator_spark.functions.extract import extract_text_sql
    ext = extract_text_sql("html")
    return (
        f"WITH p AS ({pages_cte(True)}), "
        f"h AS (SELECT url, warc_ts, text, '<html><body><p>' || text || "
        f"'</p></body></html>' AS html FROM p) "
        f"SELECT url, warc_ts, {ext} AS extracted_text, "
        f"({ext} = text) AS byte_identical FROM h ORDER BY url, warc_ts")


def url_filter_sql() -> str:
    """Oracle for the broadcast host-blocklist gate
    (functions/urlfilter.py): shared host-extraction regex + IN list."""
    from nacc_form_validator_spark.functions.urlfilter import url_host_sql
    host = url_host_sql("url")
    return (
        f"WITH p AS ({pages_cte(True)}), "
        f"h AS (SELECT url, warc_ts, {host} AS host FROM p) "
        f"SELECT url, warc_ts, host, "
        f"(host IN ('host3.example', 'host7.example')) AS url_blocked "
        f"FROM h ORDER BY url, warc_ts")


def decontaminate_sql(n: int = 4, probe_mod: int = 97) -> str:
    """Oracle for contamination_report: distinct n-word shingles of each
    document probed against the shingle set of the benchmark subset
    (doc_id % probe_mod == 0), counted per document."""
    sh = _shingles(n)
    return (
        f"WITH d AS (SELECT doc_id AS id, {sh} AS sh FROM documents), "
        f"ps AS (SELECT DISTINCT unnest(sh) AS s FROM d "
        f"WHERE id % {probe_mod} = 0), "
        f"ds AS (SELECT id, unnest(sh) AS s FROM d), "
        f"hits AS (SELECT id, count(*) AS m FROM ds JOIN ps USING (s) "
        f"GROUP BY id) "
        f"SELECT doc_id, CAST(coalesce(m, 0) AS BIGINT) AS matched_ngrams, "
        f"(coalesce(m, 0) > 0) AS contaminated FROM documents "
        f"LEFT JOIN hits ON doc_id = id ORDER BY doc_id")


def full_corpus_sql() -> str:
    """Oracle for operators/corpus.py full_corpus_pass.  Stats and the
    dedup digest are computed over the carried ``text`` column while the
    Spark side re-extracts from the html payload — so a divergent
    extractor fails this hash even though the stats formulas match."""
    from nacc_form_validator_spark.functions.urlfilter import url_host_sql
    g = gopher_sql("text")
    host = url_host_sql("url")
    rules_ok = (
        f"({g['n_words']} >= 5 AND {g['n_words']} <= 200000 "
        f"AND ({g['mean_word_len']} IS NULL OR ({g['mean_word_len']} >= 2.0 "
        f"AND {g['mean_word_len']} <= 12.0)) "
        f"AND ({g['symbol_ratio']} IS NULL OR {g['symbol_ratio']} <= 0.3) "
        f"AND ({g['stopword_ratio']} IS NULL OR "
        f"{g['stopword_ratio']} >= 0.002) "
        f"AND ({g['dup_line_ratio']} IS NULL OR "
        f"{g['dup_line_ratio']} <= 0.5) "
        f"AND ({g['word_rep_ratio']} IS NULL OR "
        f"{g['word_rep_ratio']} <= 0.9))")
    return (
        f"WITH p AS ({pages_cte(True)}), "
        f"f AS (SELECT url, warc_ts, "
        f"({host} IN ('host3.example', 'host7.example')) AS url_blocked, "
        f"{rules_ok} AS rules_ok, md5({NORM}) AS digest FROM p), "
        f"r AS (SELECT url, warc_ts, url_blocked, rules_ok, "
        f"(NOT url_blocked AND rules_ok) AS alive, "
        f"sum(CASE WHEN NOT url_blocked AND rules_ok THEN 1 ELSE 0 END) "
        f"OVER (PARTITION BY digest ORDER BY url, warc_ts "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ar FROM f) "
        f"SELECT url, warc_ts, url_blocked, rules_ok, "
        f"(alive AND ar = 1) AS final_keep FROM r ORDER BY url, warc_ts")


def url_canonicalize_sql() -> str:
    """Oracle for functions/urlcanon.py canonical_dedup over the same
    deterministic messy-url synthesis as __spark_entry__.q_url_canonicalize
    (3 variants per doc + an unparseable url for every 7th doc)."""
    from nacc_form_validator_spark.functions.urlcanon import (
        canonical_url_sql)
    canon = canonical_url_sql("url")
    return (
        "WITH m AS (SELECT doc_id, CAST(floor(sqrt(doc_id % 256)) AS "
        "INTEGER) AS hb FROM documents), "
        "u AS (SELECT u AS url FROM m, unnest([ "
        "'https://host' || hb || '.example/p/' || doc_id, "
        "'HTTPS://Host' || hb || '.Example:443/p/' || doc_id || "
        "'?utm_source=feed&utm_campaign=c' || (doc_id % 3), "
        "'https://host' || hb || '.example/p/' || doc_id || '/#sec-2' "
        "]) AS t(u) "
        "UNION ALL SELECT 'not-a-url-' || doc_id FROM m "
        "WHERE doc_id % 7 = 0), "
        f"c AS (SELECT url, {canon} AS canonical_url FROM u) "
        "SELECT url, canonical_url, (row_number() OVER "
        "(PARTITION BY canonical_url ORDER BY url) = 1) AS url_keep "
        "FROM c ORDER BY url")


def ppl_buckets_sql() -> str:
    from nacc_form_validator_spark.functions.perplexity import (
        ppl_buckets_sql as _sql)
    return _sql()


def ppl_buckets_approx_sql() -> str:
    from nacc_form_validator_spark.functions.perplexity import (
        ppl_buckets_approx_sql as _sql)
    return _sql()


_WORDS_SQL = ("list_filter(string_split_regex(lower(text), '\\s+'), "
              "x -> x <> '')")


def _gopher_label_sql() -> str:
    """GOPHER_RULES keep-label predicate, generated from the same bound
    table the Spark side reads (operators/selection.py gopher_label)."""
    from nacc_form_validator_spark.functions.heuristics import GOPHER_RULES
    g = gopher_sql("text")
    terms = []
    for stat, spec in GOPHER_RULES.items():
        bounds = []
        if "min" in spec:
            bounds.append(f"{g[stat]} >= {spec['min']}")
        if "max" in spec:
            bounds.append(f"{g[stat]} <= {spec['max']}")
        t = " AND ".join(bounds)
        if spec.get("nullable"):
            t = f"({g[stat]} IS NULL OR ({t}))"
        else:
            t = f"({t})"
        terms.append(t)
    return "(" + " AND ".join(terms) + ")"


def nb_quality_sql() -> str:
    """Oracle for operators/selection.py nb_quality_scores: add-one NB
    trained on the corpus's own GOPHER_RULES labels, exact counts."""
    return (
        f"WITH lbl AS (SELECT doc_id AS id, {_gopher_label_sql()} AS "
        f"lbl, text FROM documents), "
        f"toks AS (SELECT id, lbl, unnest({_WORDS_SQL}) AS w FROM lbl), "
        f"wt AS (SELECT w, sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS "
        f"c_pos, sum(CASE WHEN lbl THEN 0 ELSE 1 END) AS c_neg "
        f"FROM toks GROUP BY w), "
        f"tot AS (SELECT sum(c_pos) AS t_pos, sum(c_neg) AS t_neg, "
        f"count(*) AS v FROM wt), "
        f"pri AS (SELECT sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS n_pos, "
        f"sum(CASE WHEN lbl THEN 0 ELSE 1 END) AS n_neg FROM lbl), "
        f"sc AS (SELECT id, sum(ln((coalesce(c_pos, 0) + 1.0) / "
        f"(t_pos + v)) - ln((coalesce(c_neg, 0) + 1.0) / (t_neg + v))) "
        f"AS s, count(*) AS n FROM toks LEFT JOIN wt USING (w) "
        f"CROSS JOIN tot GROUP BY id), "
        f"r AS (SELECT l.id, l.lbl AS label, CAST(coalesce(sc.n, 0) AS "
        f"BIGINT) AS n_tokens, round(ln((n_pos + 1.0) / (n_neg + 1.0)) "
        f"+ coalesce(sc.s, 0.0), 6) AS score FROM lbl l LEFT JOIN sc "
        f"ON l.id = sc.id CROSS JOIN pri) "
        f"SELECT id, label, n_tokens, score, (score > 0) AS pred "
        f"FROM r ORDER BY id")


def quality_ensemble_sql(nb_threshold: float = 0.0,
                         entropy_band: tuple = (2.0, 6.0)) -> str:
    """Oracle for operators/ensemble.py quality_ensemble: the gopher
    label + char entropy recomputed per row, joined with the
    nb_quality and ppl_buckets subqueries on id."""
    from nacc_form_validator_spark.operators.textstats import (
        char_entropy_sql)
    lo, hi = (float(entropy_band[0]), float(entropy_band[1]))
    g = _gopher_label_sql()
    ent = char_entropy_sql("text")
    checks = {
        "g_ok": "b.gopher_ok",
        "nb_ok": f"nb.score > {float(nb_threshold)!r}",
        "ppl_ok": "pb.bucket <> 'tail'",
        "ent_ok": f"b.entropy BETWEEN {lo!r} AND {hi!r}",
    }
    oks = ", ".join(f"{e} AS {k}" for k, e in checks.items())
    allok = " AND ".join(f"({e})" for e in checks.values())
    fails = " + ".join(f"(CASE WHEN {e} THEN 0 ELSE 1 END)"
                       for e in checks.values())
    return (
        f"WITH nb AS (SELECT * FROM ({nb_quality_sql()})), "
        f"pb AS (SELECT * FROM ({ppl_buckets_sql()})), "
        f"b AS (SELECT doc_id AS id, {g} AS gopher_ok, {ent} AS "
        f"entropy FROM documents) "
        f"SELECT b.id, b.gopher_ok, nb.score AS nb_score, "
        f"pb.bucket AS ppl_bucket, b.entropy, {oks}, "
        f"({allok}) AS keep, CAST({fails} AS BIGINT) AS n_fails "
        f"FROM b JOIN nb ON b.id = nb.id JOIN pb ON b.id = pb.id "
        f"ORDER BY b.id")


def nb_calibration_sql(thresholds: tuple = None) -> str:
    """Oracle for selection.nb_calibration: the nb_quality query as a
    subquery, exploded against the threshold literals, one aggregate;
    precision/recall/f1 rounded to 6 with f1 from the rounded pair."""
    from nacc_form_validator_spark.operators.selection import (
        DEFAULT_THRESHOLDS)
    thresholds = thresholds or DEFAULT_THRESHOLDS
    tl = "[" + ", ".join(repr(float(x)) for x in thresholds) + "]"
    return (
        f"WITH nb AS (SELECT * FROM ({nb_quality_sql()})), "
        f"t AS (SELECT unnest({tl}) AS threshold), "
        f"agg AS (SELECT threshold, "
        f"sum(CASE WHEN score > threshold AND label THEN 1 ELSE 0 END) "
        f"AS tp, "
        f"sum(CASE WHEN score > threshold AND NOT label THEN 1 ELSE 0 "
        f"END) AS fp, "
        f"sum(CASE WHEN score <= threshold AND label THEN 1 ELSE 0 "
        f"END) AS fn, "
        f"sum(CASE WHEN score <= threshold AND NOT label THEN 1 ELSE 0 "
        f"END) AS tn FROM nb CROSS JOIN t GROUP BY threshold), "
        f"pr AS (SELECT threshold, CAST(tp AS BIGINT) AS tp, "
        f"CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn, "
        f"CAST(tn AS BIGINT) AS tn, "
        f"CASE WHEN tp + fp > 0 THEN round(tp / (tp + fp), 6) END AS "
        f"precision, "
        f"CASE WHEN tp + fn > 0 THEN round(tp / (tp + fn), 6) END AS "
        f"recall FROM agg) "
        f"SELECT *, CASE WHEN precision IS NOT NULL AND recall IS NOT "
        f"NULL AND precision + recall > 0 THEN round(2 * precision * "
        f"recall / (precision + recall), 6) END AS f1 FROM pr "
        f"ORDER BY threshold")


def dsir_logweights_sql(buckets: int = 256,
                        target_sources: tuple = ("src0", "src1",
                                                 "src2", "src3")) -> str:
    """Oracle for operators/selection.py dsir_logweights with the
    trusted-source target predicate."""
    srcs = ", ".join(f"'{s}'" for s in target_sources)
    bexpr = (f"CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) "
             f"% {buckets}")
    return (
        f"WITH toks AS (SELECT doc_id AS id, (source IN ({srcs})) AS t, "
        f"unnest({_WORDS_SQL}) AS w FROM documents), "
        f"bt AS (SELECT id, t, {bexpr} AS b FROM toks), "
        f"m AS (SELECT b, sum(CASE WHEN t THEN 1 ELSE 0 END) AS c_t, "
        f"count(*) AS c_r FROM bt GROUP BY b), "
        f"tot AS (SELECT sum(c_t) AS tt, sum(c_r) AS tr FROM m), "
        f"sc AS (SELECT id, count(*) AS n, round(sum(ln((c_t + 1.0) / "
        f"(tt + {buckets})) - ln((c_r + 1.0) / (tr + {buckets}))), 6) "
        f"AS lw FROM bt JOIN m USING (b) CROSS JOIN tot GROUP BY id) "
        f"SELECT d.doc_id AS id, CAST(coalesce(sc.n, 0) AS BIGINT) AS "
        f"n_tokens, coalesce(sc.lw, 0.0) AS log_weight FROM documents d "
        f"LEFT JOIN sc ON d.doc_id = sc.id ORDER BY id")


def exact_substring_sql(n: int = 6, min_doc_freq: int = 2) -> str:
    """Oracle for operators/dedup.py exact_substring_stats: positioned
    (non-distinct) n-word grams, duplicated when >= min_doc_freq
    distinct docs share the gram."""
    w = f"list_filter(string_split({NORM}, ' '), x -> x <> '')"
    return (
        f"WITH ww AS (SELECT doc_id AS id, {w} AS w FROM documents), "
        f"pos AS (SELECT id, md5(array_to_string(list_slice(w, i + 1, "
        f"i + {n}), ' ')) AS gh FROM ww, unnest(range(0, "
        f"len(w) - {n} + 1)) AS t(i) WHERE len(w) >= {n}), "
        f"freq AS (SELECT gh FROM pos GROUP BY gh "
        f"HAVING count(DISTINCT id) >= {min_doc_freq}), "
        f"per AS (SELECT id, count(*) AS n_grams, "
        f"sum(CASE WHEN freq.gh IS NOT NULL THEN 1 ELSE 0 END) AS dp "
        f"FROM pos LEFT JOIN freq ON pos.gh = freq.gh GROUP BY id) "
        f"SELECT d.doc_id AS id, CAST(coalesce(n_grams, 0) AS BIGINT) "
        f"AS n_grams, CAST(coalesce(dp, 0) AS BIGINT) AS dup_positions, "
        f"CASE WHEN coalesce(n_grams, 0) > 0 THEN "
        f"round(dp / n_grams, 6) ELSE 0.0 END AS dup_fraction "
        f"FROM documents d LEFT JOIN per ON d.doc_id = per.id "
        f"ORDER BY id")


def substring_dedup_sql(n: int = 6, min_doc_freq: int = 2) -> str:
    """Oracle for operators/dedup.py substring_dedup_text: drop every
    word position covered by a gram shared by >= min_doc_freq distinct
    docs, rebuild the canonical text from the survivors (DuckDB's
    indexed list_filter lambda is 1-based; the cov set is 0-based to
    match the Spark side, hence the i - 1)."""
    w = f"list_filter(string_split({NORM}, ' '), x -> x <> '')"
    return (
        f"WITH ww AS (SELECT doc_id AS id, {w} AS w FROM documents), "
        f"pos AS (SELECT id, i, md5(array_to_string(list_slice(w, "
        f"i + 1, i + {n}), ' ')) AS gh FROM ww, unnest(range(0, "
        f"len(w) - {n} + 1)) AS t(i) WHERE len(w) >= {n}), "
        f"freq AS (SELECT gh FROM pos GROUP BY gh "
        f"HAVING count(DISTINCT id) >= {min_doc_freq}), "
        f"cov AS (SELECT id, list(DISTINCT j) AS cov FROM (SELECT "
        f"pos.id, unnest(range(i, i + {n})) AS j FROM pos "
        f"JOIN freq ON pos.gh = freq.gh) GROUP BY id) "
        f"SELECT ww.id AS id, CAST(len(w) AS BIGINT) AS n_words, "
        f"CAST(coalesce(len(cov), 0) AS BIGINT) AS n_removed, "
        f"coalesce(array_to_string(list_filter(w, (x, i) -> "
        f"NOT list_contains(coalesce(cov, []::BIGINT[]), i - 1)), "
        f"' '), '') AS clean_text "
        f"FROM ww LEFT JOIN cov ON ww.id = cov.id ORDER BY id")


def _bpe_ctes(merges: int) -> list:
    """Shared CTE chain for the BPE oracles: word counts -> char
    symbols (carrying the word) -> ``merges`` unrolled argmax+merge
    steps with the run-parity greedy formula."""
    parts = [
        f"toks AS (SELECT unnest({_WORDS_SQL}) AS w FROM documents)",
        "s0 AS (SELECT w, list_transform(range(1, len(w) + 1), "
        "i -> w[i:i]) AS s, count(*) AS c FROM toks GROUP BY w)",
    ]
    for k in range(merges):
        nxt = k + 1
        parts += [
            f"p{k} AS (SELECT s[i] AS a, s[i + 1] AS b, sum(c) AS pc "
            f"FROM s{k}, unnest(range(1, len(s))) AS t(i) "
            f"GROUP BY 1, 2)",
            f"t{k} AS (SELECT a, b, pc FROM p{k} "
            f"ORDER BY pc DESC, a ASC, b ASC LIMIT 1)",
            # LEFT JOIN ON TRUE, not CROSS JOIN: when a step's pair
            # table is empty (degenerate corpus, fewer distinct pairs
            # than `merges`), t{k}.a/b are NULL, mt is all-NULL, and
            # the merge step is a no-op — matching the Spark side's
            # early break that keeps the vocab instead of emptying it
            f"mt{k} AS (SELECT w, s, c, list_transform(range(1, "
            f"len(s)), i -> s[i] = t{k}.a AND s[i + 1] = t{k}.b) AS mt "
            f"FROM s{k} LEFT JOIN t{k} ON TRUE)",
            f"mg{k} AS (SELECT w, s, c, list_transform(range(1, "
            f"len(s)), i -> mt[i] AND ((i - coalesce(list_max("
            f"list_filter(range(1, i), j -> NOT mt[j])), 0)) % 2 = 1)) "
            f"AS mg FROM mt{k})",
            f"s{nxt} AS (SELECT w, flatten(list_transform(range(1, "
            f"len(s) + 1), i -> CASE WHEN i < len(s) AND mg[i] "
            f"THEN [s[i] || s[i + 1]] WHEN i > 1 AND mg[i - 1] "
            f"THEN []::VARCHAR[] ELSE [s[i]] END)) AS s, c "
            f"FROM mg{k})",
        ]
    return parts


def bpe_train_sql(merges: int = 6) -> str:
    """Oracle for operators/bpe.py train_bpe_merges: ``merges`` unrolled
    BPE iterations — per step a weighted pair-count argmax (tie-break
    pc desc, a asc, b asc) and the same run-parity greedy merge formula
    the Spark side evaluates."""
    finals = " UNION ALL ".join(
        f"SELECT {k} AS step, a AS lhs, b AS rhs, a || b AS merged, "
        f"CAST(pc AS BIGINT) AS pair_count FROM t{k}"
        for k in range(merges))
    return ("WITH " + ", ".join(_bpe_ctes(merges)) +
            f" SELECT * FROM ({finals}) ORDER BY step")


def bpe_encode_sql(merges: int = 6) -> str:
    """Oracle for operators/bpe.py bpe_token_counts: encode via the
    final symbol table of the same unrolled training chain."""
    parts = _bpe_ctes(merges)
    parts += [
        f"wl AS (SELECT w, len(s) AS wl FROM s{merges})",
        f"dt AS (SELECT doc_id AS id, unnest({_WORDS_SQL}) AS w "
        f"FROM documents)",
        "per AS (SELECT id, count(*) AS n_words, sum(wl) AS n_tokens "
        "FROM dt JOIN wl USING (w) GROUP BY id)",
    ]
    return ("WITH " + ", ".join(parts) +
            " SELECT d.doc_id AS id, CAST(coalesce(n_words, 0) AS "
            "BIGINT) AS n_words, CAST(coalesce(n_tokens, 0) AS BIGINT) "
            "AS n_tokens FROM documents d LEFT JOIN per "
            "ON d.doc_id = per.id ORDER BY id")


def bpe_encode_batch_sql(batch_sql: str, merges: int = 6) -> str:
    """Oracle for operators/bpe.py encode_with_merges: the training
    chain learns t0..t{k} from ``documents``, then the SAME run-parity
    merge steps replay against the BATCH's distinct words
    (``batch_sql`` yields (id, text)) — novel words tokenize instead
    of dropping.  Both chains MATERIALIZED (each step references its
    predecessor twice; inlining is exponential in ``merges``)."""
    parts = [
        f"toks AS (SELECT unnest({_WORDS_SQL}) AS w FROM documents)",
        "s0 AS MATERIALIZED (SELECT w, list_transform(range(1, "
        "len(w) + 1), i -> w[i:i]) AS s, count(*) AS c FROM toks "
        "GROUP BY w)",
    ]
    for k in range(merges):
        nxt = k + 1
        parts += [
            f"p{k} AS (SELECT s[i] AS a, s[i + 1] AS b, sum(c) AS pc "
            f"FROM s{k}, unnest(range(1, len(s))) AS t(i) "
            f"GROUP BY 1, 2)",
            f"t{k} AS MATERIALIZED (SELECT a, b, pc FROM p{k} "
            f"ORDER BY pc DESC, a ASC, b ASC LIMIT 1)",
            f"mt{k} AS (SELECT w, s, c, list_transform(range(1, "
            f"len(s)), i -> s[i] = t{k}.a AND s[i + 1] = t{k}.b) AS mt "
            f"FROM s{k} LEFT JOIN t{k} ON TRUE)",
            f"mg{k} AS (SELECT w, s, c, list_transform(range(1, "
            f"len(s)), i -> mt[i] AND ((i - coalesce(list_max("
            f"list_filter(range(1, i), j -> NOT mt[j])), 0)) % 2 = 1)) "
            f"AS mg FROM mt{k})",
            f"s{nxt} AS MATERIALIZED (SELECT w, flatten("
            f"list_transform(range(1, len(s) + 1), i -> CASE WHEN "
            f"i < len(s) AND mg[i] THEN [s[i] || s[i + 1]] "
            f"WHEN i > 1 AND mg[i - 1] THEN []::VARCHAR[] "
            f"ELSE [s[i]] END)) AS s, c FROM mg{k})",
        ]
    parts += [
        f"batch AS MATERIALIZED ({batch_sql})",
        f"btoks AS (SELECT DISTINCT unnest(list_filter("
        f"string_split_regex(lower(text), '\\s+'), x -> x <> '')) "
        f"AS w FROM batch)",
        "b0 AS MATERIALIZED (SELECT w, list_transform(range(1, "
        "len(w) + 1), i -> w[i:i]) AS s FROM btoks)",
    ]
    for k in range(merges):
        nxt = k + 1
        parts += [
            f"bmt{k} AS (SELECT w, s, list_transform(range(1, "
            f"len(s)), i -> s[i] = t{k}.a AND s[i + 1] = t{k}.b) AS mt "
            f"FROM b{k} LEFT JOIN t{k} ON TRUE)",
            f"bmg{k} AS (SELECT w, s, list_transform(range(1, "
            f"len(s)), i -> mt[i] AND ((i - coalesce(list_max("
            f"list_filter(range(1, i), j -> NOT mt[j])), 0)) % 2 = 1)) "
            f"AS mg FROM bmt{k})",
            f"b{nxt} AS MATERIALIZED (SELECT w, flatten("
            f"list_transform(range(1, len(s) + 1), i -> CASE WHEN "
            f"i < len(s) AND mg[i] THEN [s[i] || s[i + 1]] "
            f"WHEN i > 1 AND mg[i - 1] THEN []::VARCHAR[] "
            f"ELSE [s[i]] END)) AS s FROM bmg{k})",
        ]
    parts += [
        f"wl AS (SELECT w, len(s) AS wl FROM b{merges})",
        "dt AS (SELECT id, unnest(list_filter(string_split_regex("
        "lower(text), '\\s+'), x -> x <> '')) AS w FROM batch)",
        "per AS (SELECT id, count(*) AS n_words, sum(wl) AS n_tokens "
        "FROM dt JOIN wl USING (w) GROUP BY id)",
    ]
    return ("WITH " + ", ".join(parts) +
            " SELECT batch.id, CAST(coalesce(n_words, 0) AS BIGINT) "
            "AS n_words, CAST(coalesce(n_tokens, 0) AS BIGINT) "
            "AS n_tokens FROM batch LEFT JOIN per "
            "ON batch.id = per.id ORDER BY batch.id")


def _wordpiece_ctes(merges: int) -> list:
    """Shared CTE chain for the WordPiece oracles: the BPE chain with
    the argmax criterion swapped for the likelihood-ratio score
    pc / (ca * cb) (Schuster & Nakajima 2012).  The score is one IEEE
    double product + division of exact integer counts — correctly
    rounded by the 754 spec in BOTH engines, so no rounding is needed
    for the argmax (or the emitted score) to hash-match."""
    parts = [
        f"toks AS (SELECT unnest({_WORDS_SQL}) AS w FROM documents)",
        "s0 AS (SELECT w, list_transform(range(1, len(w) + 1), "
        "i -> w[i:i]) AS s, count(*) AS c FROM toks GROUP BY w)",
    ]
    for k in range(merges):
        nxt = k + 1
        parts += [
            f"p{k} AS (SELECT s[i] AS a, s[i + 1] AS b, sum(c) AS pc "
            f"FROM s{k}, unnest(range(1, len(s))) AS t(i) "
            f"GROUP BY 1, 2)",
            f"u{k} AS (SELECT sym, sum(c) AS sc "
            f"FROM s{k}, unnest(s) AS t(sym) GROUP BY 1)",
            f"t{k} AS (SELECT a, b, pc, CAST(pc AS DOUBLE) / "
            f"(CAST(ca.sc AS DOUBLE) * CAST(cb.sc AS DOUBLE)) AS score "
            f"FROM p{k} JOIN u{k} ca ON p{k}.a = ca.sym "
            f"JOIN u{k} cb ON p{k}.b = cb.sym "
            f"ORDER BY score DESC, a ASC, b ASC LIMIT 1)",
            # LEFT JOIN ON TRUE: empty pair table -> no-op merge step
            # (matches the Spark side's early break; see _bpe_ctes)
            f"mt{k} AS (SELECT w, s, c, list_transform(range(1, "
            f"len(s)), i -> s[i] = t{k}.a AND s[i + 1] = t{k}.b) AS mt "
            f"FROM s{k} LEFT JOIN t{k} ON TRUE)",
            f"mg{k} AS (SELECT w, s, c, list_transform(range(1, "
            f"len(s)), i -> mt[i] AND ((i - coalesce(list_max("
            f"list_filter(range(1, i), j -> NOT mt[j])), 0)) % 2 = 1)) "
            f"AS mg FROM mt{k})",
            f"s{nxt} AS (SELECT w, flatten(list_transform(range(1, "
            f"len(s) + 1), i -> CASE WHEN i < len(s) AND mg[i] "
            f"THEN [s[i] || s[i + 1]] WHEN i > 1 AND mg[i - 1] "
            f"THEN []::VARCHAR[] ELSE [s[i]] END)) AS s, c "
            f"FROM mg{k})",
        ]
    return parts


def wordpiece_train_sql(merges: int = 6) -> str:
    """Oracle for operators/wordpiece.py train_wordpiece_merges:
    ``merges`` unrolled likelihood-ratio argmax + run-parity greedy
    merge steps (tie-break score desc, a asc, b asc)."""
    finals = " UNION ALL ".join(
        f"SELECT {k} AS step, a AS lhs, b AS rhs, a || b AS merged, "
        f"CAST(pc AS BIGINT) AS pair_count, score FROM t{k}"
        for k in range(merges))
    return ("WITH " + ", ".join(_wordpiece_ctes(merges)) +
            f" SELECT * FROM ({finals}) ORDER BY step")


def wordpiece_encode_sql(merges: int = 6) -> str:
    """Oracle for operators/wordpiece.py wordpiece_token_counts:
    encode via the final symbol table of the same unrolled chain (the
    encoding join is criterion-agnostic, shared with BPE)."""
    parts = _wordpiece_ctes(merges)
    parts += [
        f"wl AS (SELECT w, len(s) AS wl FROM s{merges})",
        f"dt AS (SELECT doc_id AS id, unnest({_WORDS_SQL}) AS w "
        f"FROM documents)",
        "per AS (SELECT id, count(*) AS n_words, sum(wl) AS n_tokens "
        "FROM dt JOIN wl USING (w) GROUP BY id)",
    ]
    return ("WITH " + ", ".join(parts) +
            " SELECT d.doc_id AS id, CAST(coalesce(n_words, 0) AS "
            "BIGINT) AS n_words, CAST(coalesce(n_tokens, 0) AS BIGINT) "
            "AS n_tokens FROM documents d LEFT JOIN per "
            "ON d.doc_id = per.id ORDER BY id")


def _unigram_dp_ctes(prefix: str, model: str, piece_len: int,
                     max_word_len: int, unk: float) -> list:
    """Unrolled Viterbi DP over the distinct-word table against
    ``model`` (piece, lp): step k extends every dp row i in
    [k-piece_len, k-1] with the piece w[i+1..k] (model lp, or ``unk``
    for unknown single chars) and keeps the best per word by
    (lp DESC, np ASC, j ASC) — the exact tie rule of the Spark fold
    (operators/unigramlm.py _viterbi).  Words longer than the cap
    take the char-by-char fallback.  Emits ``{prefix}seg``
    (w, lp, np, segs)."""
    p = prefix
    parts = [
        f"{p}d0 AS MATERIALIZED (SELECT w, 0 AS i, CAST(0.0 AS DOUBLE) AS lp, "
        f"0 AS np, []::VARCHAR[] AS segs FROM wc "
        f"WHERE len(w) <= {max_word_len})",
    ]
    for k in range(1, max_word_len + 1):
        parts += [
            f"{p}c{k} AS (SELECT d.w, "
            f"d.lp + CASE WHEN m.lp IS NOT NULL THEN m.lp "
            f"ELSE CAST({unk} AS DOUBLE) END AS lp, "
            f"d.np + 1 AS np, "
            f"list_append(d.segs, substr(d.w, d.i + 1, {k} - d.i)) "
            f"AS segs, d.i AS j0 "
            f"FROM {p}d{k-1} d LEFT JOIN {model} m "
            f"ON m.piece = substr(d.w, d.i + 1, {k} - d.i) "
            f"WHERE len(d.w) >= {k} AND d.i >= {k - piece_len} "
            f"AND d.i < {k} "
            f"AND (m.lp IS NOT NULL OR {k} - d.i = 1))",
            f"{p}b{k} AS (SELECT w, {k} AS i, lp, np, segs FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY w "
            f"ORDER BY lp DESC, np ASC, j0 ASC) AS rn FROM {p}c{k}) "
            f"WHERE rn = 1)",
            f"{p}d{k} AS MATERIALIZED (SELECT * FROM {p}d{k-1} UNION ALL "
            f"SELECT w, i, lp, np, segs FROM {p}b{k})",
        ]
    parts += [
        f"{p}fin AS (SELECT w, lp, np, segs FROM {p}d{max_word_len} "
        f"WHERE i = len(w))",
        f"{p}le AS (SELECT w, i, chs[i] AS ch FROM "
        f"(SELECT w, list_filter(string_split(w, ''), x -> x <> '') "
        f"AS chs FROM wc WHERE len(w) > {max_word_len}) q, "
        f"unnest(range(1, len(chs) + 1)) AS t(i))",
        f"{p}lj AS (SELECT w, sum(CASE WHEN m.lp IS NOT NULL "
        f"THEN m.lp ELSE CAST({unk} AS DOUBLE) END) AS lp, "
        f"CAST(count(*) AS INTEGER) AS np, "
        f"list(ch ORDER BY i) AS segs "
        f"FROM {p}le LEFT JOIN {model} m ON m.piece = {p}le.ch "
        f"GROUP BY w)",
        f"{p}seg AS (SELECT w, lp, np, segs FROM {p}fin "
        f"UNION ALL SELECT w, lp, np, segs FROM {p}lj)",
    ]
    return parts


def _unigram_ctes(seed_size: int, vocab_size: int, piece_len: int,
                  max_word_len: int, unk: float) -> list:
    """Shared CTE chain for the unigram-LM oracles: word counts ->
    substring-frequency seed (top seed_size, round-6 logp) -> one
    hard-EM round (Viterbi E-step via the unrolled DP, count/prune/
    renormalize M-step) -> final model ``m1`` (piece, cnt, lp)."""
    parts = [
        f"toks AS (SELECT unnest({_WORDS_SQL}) AS w FROM documents)",
        "wc AS MATERIALIZED (SELECT w, count(*) AS c FROM toks GROUP BY w)",
        f"sub AS (SELECT piece, sum(c) AS cnt FROM ("
        f"SELECT substr(w, i, l) AS piece, c FROM wc, "
        f"unnest(range(1, len(w) + 1)) AS t(i), "
        f"unnest(range(1, {piece_len} + 1)) AS t2(l) "
        f"WHERE i + l - 1 <= len(w)) q GROUP BY piece)",
        f"sk AS (SELECT piece, cnt FROM sub "
        f"ORDER BY cnt DESC, piece ASC LIMIT {seed_size})",
        "st AS (SELECT sum(cnt) AS tot FROM sk)",
        "m0 AS MATERIALIZED (SELECT piece, "
        "round(ln(CAST(cnt AS DOUBLE) / tot), 6) AS lp FROM sk, st)",
    ]
    parts += _unigram_dp_ctes("e", "m0", piece_len, max_word_len, unk)
    parts += [
        "ec AS (SELECT piece, sum(c) AS cnt FROM ("
        "SELECT unnest(s.segs) AS piece, wc.c FROM eseg s "
        "JOIN wc USING (w)) q GROUP BY piece)",
        f"ek AS (SELECT piece, cnt FROM ec "
        f"ORDER BY cnt DESC, piece ASC LIMIT {vocab_size})",
        "et AS (SELECT sum(cnt) AS tot FROM ek)",
        "m1 AS MATERIALIZED (SELECT piece, cnt, "
        "round(ln(CAST(cnt AS DOUBLE) / tot), 6) AS lp FROM ek, et)",
    ]
    return parts


def unigram_train_sql(seed_size: int = 48, vocab_size: int = 32,
                      piece_len: int = 4, max_word_len: int = 12,
                      unk: float = -20.0) -> str:
    """Oracle for operators/unigramlm.py train_unigram_lm (iters=1)."""
    parts = _unigram_ctes(seed_size, vocab_size, piece_len,
                          max_word_len, unk)
    return ("WITH " + ", ".join(parts) +
            " SELECT piece, CAST(cnt AS BIGINT) AS cnt, lp FROM m1 "
            "ORDER BY piece")


def unigram_encode_sql(seed_size: int = 48, vocab_size: int = 32,
                       piece_len: int = 4, max_word_len: int = 12,
                       unk: float = -20.0) -> str:
    """Oracle for operators/unigramlm.py unigram_token_counts: a
    second unrolled Viterbi chain against the trained model ``m1``,
    then documents join the per-distinct-word (np, lp) table."""
    parts = _unigram_ctes(seed_size, vocab_size, piece_len,
                          max_word_len, unk)
    parts += _unigram_dp_ctes("n", "m1", piece_len, max_word_len, unk)
    parts += [
        f"dt AS (SELECT doc_id AS id, unnest({_WORDS_SQL}) AS w "
        f"FROM documents)",
        "per AS (SELECT id, count(*) AS n_words, sum(np) AS n_tokens, "
        "round(sum(lp), 6) AS logp FROM dt JOIN nseg USING (w) "
        "GROUP BY id)",
    ]
    return ("WITH " + ", ".join(parts) +
            " SELECT d.doc_id AS id, "
            "CAST(coalesce(n_words, 0) AS BIGINT) AS n_words, "
            "CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens, "
            "coalesce(logp, 0.0) AS logp "
            "FROM documents d LEFT JOIN per ON d.doc_id = per.id "
            "ORDER BY id")


def host_split_sql(splits) -> str:
    """Oracle for operators/sampling.py host_disjoint_split over the
    distinct urls of the synthetic pages: the cumulative bounds are
    accumulated in the SAME Python float arithmetic the Spark side
    uses (0.8 + 0.1 is 0.9000000000000001 in both), then embedded via
    repr so the two engines compare identical doubles."""
    from ..functions.urlfilter import url_host_sql
    u = _hash_uniform_sql("host")
    cases, cum = [], 0.0
    for name, frac in splits[:-1]:
        cum += float(frac)
        cases.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    case = ("CASE " + " ".join(cases) + f" ELSE '{splits[-1][0]}' END"
            if cases else f"'{splits[-1][0]}'")
    host = url_host_sql("url")
    return (
        f"WITH p AS ({pages_cte()}), "
        f"uu AS (SELECT DISTINCT url FROM p), "
        f"h AS (SELECT url, {host} AS host FROM uu) "
        f"SELECT url, host, {case} AS split FROM h ORDER BY url")


def _bytebpe_ctes(merges: int) -> list:
    """Shared CTE chain for the byte-level BPE oracles: the _bpe_ctes
    merge steps over symbol sequences built from UTF-8 bytes mapped
    through the GPT-2 bytes_to_unicode table (imported from
    operators/bytebpe.py — shared by construction).  DuckDB MAP
    extraction yields a 1-list, hence the [1]; the s-chain is
    MATERIALIZED because each step references its predecessor twice
    (exponential inlining otherwise, the unigram-DP lesson)."""
    from ..operators.bytebpe import bytes_to_unicode
    entries = ", ".join(
        "'" + hx + "': '" + ch.replace("'", "''") + "'"
        for hx, ch in bytes_to_unicode().items())
    parts = [
        f"bm AS (SELECT MAP {{{entries}}} AS m)",
        f"toks AS (SELECT unnest({_WORDS_SQL}) AS w FROM documents)",
        "s0 AS MATERIALIZED (SELECT w, "
        "list_transform(range(1, CAST(len(h) / 2 AS INT) + 1), "
        "i -> m[h[i * 2 - 1:i * 2]][1]) AS s, c FROM "
        "(SELECT w, hex(encode(w)) AS h, count(*) AS c FROM toks "
        "GROUP BY w), bm)",
    ]
    for k in range(merges):
        nxt = k + 1
        parts += [
            f"p{k} AS (SELECT s[i] AS a, s[i + 1] AS b, sum(c) AS pc "
            f"FROM s{k}, unnest(range(1, len(s))) AS t(i) "
            f"GROUP BY 1, 2)",
            f"t{k} AS (SELECT a, b, pc FROM p{k} "
            f"ORDER BY pc DESC, a ASC, b ASC LIMIT 1)",
            f"mt{k} AS (SELECT w, s, c, list_transform(range(1, "
            f"len(s)), i -> s[i] = t{k}.a AND s[i + 1] = t{k}.b) AS mt "
            f"FROM s{k} LEFT JOIN t{k} ON TRUE)",
            f"mg{k} AS (SELECT w, s, c, list_transform(range(1, "
            f"len(s)), i -> mt[i] AND ((i - coalesce(list_max("
            f"list_filter(range(1, i), j -> NOT mt[j])), 0)) % 2 = 1)) "
            f"AS mg FROM mt{k})",
            f"s{nxt} AS MATERIALIZED (SELECT w, flatten("
            f"list_transform(range(1, "
            f"len(s) + 1), i -> CASE WHEN i < len(s) AND mg[i] "
            f"THEN [s[i] || s[i + 1]] WHEN i > 1 AND mg[i - 1] "
            f"THEN []::VARCHAR[] ELSE [s[i]] END)) AS s, c "
            f"FROM mg{k})",
        ]
    return parts


def bytebpe_train_sql(merges: int = 6) -> str:
    """Oracle for operators/bytebpe.py train_bytebpe_merges."""
    finals = " UNION ALL ".join(
        f"SELECT {k} AS step, a AS lhs, b AS rhs, a || b AS merged, "
        f"CAST(pc AS BIGINT) AS pair_count FROM t{k}"
        for k in range(merges))
    return ("WITH " + ", ".join(_bytebpe_ctes(merges)) +
            f" SELECT * FROM ({finals}) ORDER BY step")


def bytebpe_encode_sql(merges: int = 6) -> str:
    """Oracle for operators/bytebpe.py bytebpe_token_counts."""
    parts = _bytebpe_ctes(merges)
    parts += [
        f"wl AS (SELECT w, len(s) AS wl FROM s{merges})",
        f"dt AS (SELECT doc_id AS id, unnest({_WORDS_SQL}) AS w "
        f"FROM documents)",
        "per AS (SELECT id, count(*) AS n_words, sum(wl) AS n_tokens "
        "FROM dt JOIN wl USING (w) GROUP BY id)",
    ]
    return ("WITH " + ", ".join(parts) +
            " SELECT d.doc_id AS id, CAST(coalesce(n_words, 0) AS "
            "BIGINT) AS n_words, CAST(coalesce(n_tokens, 0) AS BIGINT) "
            "AS n_tokens FROM documents d LEFT JOIN per "
            "ON d.doc_id = per.id ORDER BY id")


def robots_rfc9309_sql() -> str:
    """Oracle for functions/robots.py robots_gate over the shared
    ROBOTS_FIXTURE (imported, not re-typed — the fixture cannot
    drift): full RFC 9309 re-implementation in DuckDB SQL — comment
    strip, group attribution via the same lag/sum window, longest
    substring agent selection, the identical regex-escape chain
    (RE2 replacement syntax instead of Java's, same output), and the
    2*plen+allow integer precedence aggregate."""
    from ..functions.robots import FIXTURE_AGENT, ROBOTS_FIXTURE
    vals = ", ".join(
        "('" + h + "', '" + txt.replace("'", "''") + "')"
        for h, txt in ROBOTS_FIXTURE)
    agent = FIXTURE_AGENT.lower()
    esc = (r"'^' || replace(replace(regexp_replace(CASE WHEN pattern "
           r"LIKE '%$' THEN pattern[1:len(pattern)-1] ELSE pattern "
           r"END, '([.^|?+(){}\[\]\\])', '\\\1', 'g'), '$', '\$'), "
           r"'*', '.*') || CASE WHEN pattern LIKE '%$' THEN '$' "
           r"ELSE '' END")
    return f"""
WITH robots(host, robots_txt) AS (VALUES {vals}),
p AS ({pages_cte()}),
urls AS (SELECT url,
  lower(regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)', 1)) AS host,
  CASE WHEN pq = '' THEN '/' ELSE pq END AS path
  FROM (SELECT DISTINCT url, regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1) AS pq FROM p) t),
ls AS (SELECT host, string_split(robots_txt, chr(10)) AS l FROM robots),
lines AS (SELECT host, i AS pos,
  trim(regexp_replace(l[i], '#.*$', '')) AS clean
  FROM ls, unnest(range(1, len(l) + 1)) AS u(i)),
parsed AS (SELECT host, pos,
  lower(trim(regexp_extract(clean, '^([^:]+):', 1))) AS key,
  trim(regexp_extract(clean, '^[^:]+:(.*)$', 1)) AS val FROM lines),
blk AS (SELECT host, pos, key, val, (key = 'user-agent') AS ua,
  ((key = 'user-agent') AND NOT coalesce(
    lag(key = 'user-agent') OVER (PARTITION BY host ORDER BY pos),
    FALSE)) AS strt FROM parsed),
blk2 AS (SELECT host, pos, key, val, ua,
  sum(CASE WHEN strt THEN 1 ELSE 0 END)
    OVER (PARTITION BY host ORDER BY pos) AS block FROM blk),
uas AS (SELECT host, block, lower(val) AS uav FROM blk2 WHERE ua),
rules AS (SELECT host, block, key = 'allow' AS allow, val AS pattern
  FROM blk2 WHERE key IN ('allow', 'disallow') AND val <> ''),
elig AS (SELECT host, block,
  CASE WHEN uav = '*' THEN 0 ELSE len(uav) END AS spec
  FROM uas WHERE uav = '*' OR strpos('{agent}', uav) > 0),
best AS (SELECT host, max(spec) AS bs FROM elig GROUP BY host),
chosen AS (SELECT DISTINCT e.host, e.block FROM elig e
  JOIN best b ON e.host = b.host AND e.spec = b.bs),
rr AS (SELECT r.host, pattern, allow, len(pattern) AS plen,
  {esc} AS rx
  FROM rules r JOIN chosen c ON r.host = c.host AND r.block = c.block),
j AS (SELECT u.url, CASE WHEN rr.rx IS NOT NULL
    AND regexp_matches(u.path, rr.rx)
    THEN plen * 2 + CASE WHEN allow THEN 1 ELSE 0 END END AS score
  FROM urls u LEFT JOIN rr ON u.host = rr.host),
per AS (SELECT url, max(score) AS best FROM j GROUP BY url)
SELECT url, (best IS NULL OR best % 2 = 1) AS allowed,
  CAST(best // 2 AS INTEGER) AS matched_plen,
  CASE WHEN best IS NOT NULL THEN best % 2 = 1 END AS matched_allow
FROM per ORDER BY url"""


def edit_verified_sql(k: int = 8, bands: int = 4, n: int = 3,
                      min_edit_sim: float = 0.6) -> str:
    """Oracle for dedup.edit_verified_pairs: the band-collision
    candidate set, each candidate verified with normalized levenshtein
    similarity over the same normalized text the shingles came from."""
    ctes, pair_select = _minhash_ctes(k, bands, n)
    sim = (f"round(1.0 - levenshtein(a.t, b.t) * 1.0 / "
           f"greatest(length(a.t), length(b.t), 1), 6)")
    return (
        f"WITH {ctes}, pairs AS ({pair_select}), "
        f"txt AS (SELECT doc_id AS id, {NORM} AS t FROM documents) "
        f"SELECT id_a, id_b, edit_sim FROM ("
        f"SELECT id_a, id_b, {sim} AS edit_sim "
        f"FROM pairs JOIN txt a ON pairs.id_a = a.id "
        f"JOIN txt b ON pairs.id_b = b.id) "
        f"WHERE edit_sim >= {min_edit_sim} ORDER BY id_a, id_b")


def containment_sql(n: int = 3, threshold: float = 0.5,
                    max_df: "int | None" = None) -> str:
    """Oracle for dedup.containment_pairs: candidate pairs from the
    (optionally df-capped) shingle self-join, verified with exact
    full-set intersection containment on BOTH directions."""
    sh = _shingles(n)
    ex = "SELECT id, unnest(sh) AS s FROM sh"
    if max_df is not None:
        ex = (f"SELECT id, s FROM (SELECT id, unnest(sh) AS s FROM sh) "
              f"QUALIFY count(*) OVER (PARTITION BY s) <= {max_df}")
    return (
        f"WITH sh AS (SELECT doc_id AS id, {sh} AS sh FROM documents "
        f"WHERE len({sh}) > 0), "
        f"ex AS ({ex}), "
        f"cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b "
        f"FROM ex a JOIN ex b ON a.s = b.s AND a.id < b.id) "
        f"SELECT id_a, id_b, cont_a, cont_b FROM ("
        f"SELECT id_a, id_b, "
        f"round(len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh), 6) "
        f"AS cont_a, "
        f"round(len(list_intersect(a.sh, b.sh)) * 1.0 / len(b.sh), 6) "
        f"AS cont_b "
        f"FROM cand JOIN sh a ON cand.id_a = a.id "
        f"JOIN sh b ON cand.id_b = b.id) "
        f"WHERE cont_a >= {threshold} OR cont_b >= {threshold} "
        f"ORDER BY id_a, id_b")

"""T5-style span corruption (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning...", public objective): mask contiguous token
spans with numbered sentinels and emit (corrupted input, target) pairs
— the denoising-objective example constructor, the encoder-decoder
sibling of operators/fim.fim_transform.

Deterministic recast (documented deviations from the sampled T5
recipe): tokens partition into fixed blocks of ``block`` tokens; each
FULL-CAPACITY region of a block masks one ``span``-token run with
probability ``rate``, at an offset both drawn from md5 of
(doc_id, block index) — no RNG state, so the transform is
resume-stable and byte-reproducible in the DuckDB oracle (the fim.py
determinism law).  Expected corruption fraction is rate * span / block
(defaults 0.5 * 3 / 8 ≈ 19%, near T5's 15%).  Sentinels are numbered
consecutively per document (<extra_id_0>, <extra_id_1>, ...) and the
target terminates with the final sentinel, as in the public objective.

Scale shape: pure in-row HOF projection — zero shuffles, zero Python;
block decisions, the span membership test, and the sentinel prefix
count are all array arithmetic over the token list."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.fim import _hash_frac


def span_corrupt(docs: DataFrame, rate: float = 0.5,
                 block: int = 8, span: int = 3,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, n_masked, input_text, target_text): span-corrupted pairs.

    Documents whose token count is below one full block pass through
    (n_masked = 0, input = text, empty target).
    """
    B, L = block, span
    key = F.col(id_col)
    d = docs.select(
        key.alias("id"),
        F.filter(F.split(F.col(text_col), r"\s+"),
                 lambda x: x != "").alias("w"))
    n = F.size("w")
    nb = F.ceil(n / B).cast("int")
    # per block j: capacity len_j, mask decision, span start (absolute)
    blks = F.sequence(F.lit(0), F.greatest(nb - 1, F.lit(0)))
    len_j = lambda j: F.least(n - j * B, F.lit(B))  # noqa: E731
    mask_j = lambda j: (  # noqa: E731
        (len_j(j) >= L) &
        (_hash_frac(F.concat(F.col("id").cast("string"),
                             F.lit(":"), j.cast("string")), "sc-m")
         < rate))
    start_j = lambda j: (  # noqa: E731
        j * B + F.floor(
            _hash_frac(F.concat(F.col("id").cast("string"),
                                F.lit(":"), j.cast("string")), "sc-o")
            * (len_j(j) - L + 1)).cast("int"))
    d = (d.withColumn("__mask", F.when(n > 0, F.transform(
            blks, lambda j: mask_j(j))).otherwise(
                F.array().cast("array<boolean>")))
         .withColumn("__start", F.when(n > 0, F.transform(
             blks, lambda j: F.when(mask_j(j), start_j(j))
             .otherwise(F.lit(-1)))).otherwise(
                 F.array().cast("array<int>"))))
    # consecutive sentinel number for block j = masked blocks before j
    k_of = lambda j: F.size(  # noqa: E731
        F.filter(F.slice(F.col("__mask"), 1, j), lambda m: m))
    total = F.size(F.filter(F.col("__mask"), lambda m: m))
    # input: sentinel at span start, drop span tail, keep the rest
    in_tok = F.filter(
        F.transform(F.col("w"), lambda t, i: F.when(
            F.coalesce(
                F.element_at(F.col("__mask"),
                             F.floor(i / B).cast("int") + 1),
                F.lit(False)) &
            (i >= F.element_at(F.col("__start"),
                               F.floor(i / B).cast("int") + 1)) &
            (i < F.element_at(F.col("__start"),
                              F.floor(i / B).cast("int") + 1) + L),
            F.when(i == F.element_at(F.col("__start"),
                                     F.floor(i / B).cast("int") + 1),
                   F.concat(F.lit("<extra_id_"),
                            k_of(F.floor(i / B).cast("int"))
                            .cast("string"), F.lit(">")))
        ).otherwise(t)),
        lambda t: t.isNotNull())
    # target: "<extra_id_k> span tokens" per masked block, + terminator
    tgt_parts = F.filter(
        F.transform(blks, lambda j: F.when(
            F.coalesce(F.element_at(F.col("__mask"), j + 1),
                       F.lit(False)),
            F.concat(F.lit("<extra_id_"), k_of(j).cast("string"),
                     F.lit("> "),
                     F.array_join(F.slice(
                         F.col("w"),
                         F.element_at(F.col("__start"), j + 1) + 1, L),
                         " ")))),
        lambda s: s.isNotNull())
    target = F.when(
        total > 0,
        F.concat(F.array_join(tgt_parts, " "), F.lit(" <extra_id_"),
                 total.cast("string"), F.lit(">"))).otherwise(F.lit(""))
    return (d.select(
        "id", total.cast("long").alias("n_masked"),
        F.array_join(in_tok, " ").alias("input_text"),
        target.alias("target_text")).orderBy("id"))


def span_corrupt_sql(table: str = "documents", rate: float = 0.5,
                     block: int = 8, span: int = 3) -> str:
    """DuckDB mirror of :func:`span_corrupt` — identical md5 decisions,
    block arithmetic, sentinel numbering, and joins."""
    B, L = block, span

    def frac(salt: str) -> str:
        return (f"(CAST(concat('0x', substr(md5(CAST(id AS VARCHAR) "
                f"|| ':' || CAST(j AS VARCHAR) || '{salt}'), 1, 8)) "
                f"AS BIGINT) / {float(16 ** 8)!r})")

    len_j = f"least(n - j * {B}, {B})"
    mask = f"(({len_j}) >= {L} AND {frac('sc-m')} < {rate!r})"
    start = (f"(j * {B} + CAST(floor({frac('sc-o')} * "
             f"(({len_j}) - {L} + 1)) AS INT))")
    return (
        f"WITH src AS (SELECT doc_id AS id, list_filter("
        f"string_split_regex(text, '\\s+'), x -> x <> '') AS w "
        f"FROM {table}), "
        f"dims AS (SELECT id, w, len(w) AS n, "
        f"CAST(ceil(len(w) / {B}.0) AS INT) AS nb FROM src), "
        f"marks AS (SELECT id, w, n, "
        f"CASE WHEN n > 0 THEN list_transform(range(0, nb), "
        f"j -> {mask}) ELSE [] END AS mk, "
        f"CASE WHEN n > 0 THEN list_transform(range(0, nb), "
        f"j -> CASE WHEN {mask} THEN {start} ELSE -1 END) "
        f"ELSE [] END AS st FROM dims), "
        f"built AS (SELECT id, "
        f"len(list_filter(mk, m -> m)) AS total, "
        f"array_to_string(list_filter(list_transform(range(0, n), "
        f"i -> CASE WHEN coalesce(mk[CAST(i // {B} AS INT) + 1], "
        f"false) AND i >= st[CAST(i // {B} AS INT) + 1] "
        f"AND i < st[CAST(i // {B} AS INT) + 1] + {L} THEN "
        f"CASE WHEN i = st[CAST(i // {B} AS INT) + 1] THEN "
        f"'<extra_id_' || CAST(len(list_filter(mk[1:CAST(i // {B} "
        f"AS INT)], m -> m)) AS VARCHAR) || '>' END "
        f"ELSE w[CAST(i AS INT) + 1] END), "
        f"x -> x IS NOT NULL), ' ') AS input_text, "
        f"array_to_string(list_filter(list_transform("
        f"range(0, len(mk)), j -> CASE WHEN coalesce("
        f"mk[CAST(j AS INT) + 1], false) THEN "
        f"'<extra_id_' || CAST(len(list_filter(mk[1:CAST(j AS INT)], "
        f"m -> m)) AS VARCHAR) || '> ' || array_to_string("
        f"w[st[CAST(j AS INT) + 1] + 1 : st[CAST(j AS INT) + 1] + {L}]"
        f", ' ') END), x -> x IS NOT NULL), ' ') AS tgt, "
        f"CAST(len(list_filter(mk, m -> m)) AS BIGINT) AS n_masked "
        f"FROM marks) "
        f"SELECT id, n_masked, input_text, "
        f"CASE WHEN n_masked > 0 THEN tgt || ' <extra_id_' || "
        f"CAST(n_masked AS VARCHAR) || '>' ELSE '' END AS target_text "
        f"FROM built ORDER BY id")


def mlm_mask(docs: DataFrame, rate: float = 0.15,
             id_col: str = "doc_id", text_col: str = "text",
             mask_token: str = "[MASK]") -> DataFrame:
    """(id, n_tokens, n_masked, input_text, labels_text): BERT-style
    masked-LM example construction (Devlin et al. 2018, public
    objective) — each token masks with probability ``rate``; a masked
    position becomes ``mask_token`` 80% of the time, a (deterministic)
    token drawn from the SAME document 10%, and stays itself 10%.
    ``labels_text`` is the space-joined originals of the masked
    positions in order — the training targets.

    Determinism law (fim.py): every decision is an md5 fraction of
    (doc_id, position, salt) — no RNG state, resume-stable,
    byte-reproducible in the DuckDB mirror.  Scale shape: pure in-row
    HOF projection, zero shuffles, zero Python.
    """
    key = F.col(id_col)
    d = docs.select(
        key.alias("id"),
        F.filter(F.split(F.col(text_col), r"\s+"),
                 lambda x: x != "").alias("w"))
    n = F.size("w")

    def frac(i: Column, salt: str) -> Column:
        return _hash_frac(F.concat(F.col("id").cast("string"),
                                   F.lit(":"), i.cast("string")), salt)

    masked = lambda i: frac(i, "mlm-m") < rate  # noqa: E731
    # sub-decision: [0, .8) -> [MASK]; [.8, .9) -> in-doc random
    # token; [.9, 1) -> keep original (still predicted)
    sub = lambda i: frac(i, "mlm-s")  # noqa: E731
    rnd = lambda i: F.element_at(  # noqa: E731
        F.col("w"), (F.floor(frac(i, "mlm-r") * n) + 1).cast("int"))

    inp = F.transform(
        F.col("w"), lambda t, i: F.when(
            ~masked(i), t).when(sub(i) < 0.8, F.lit(mask_token))
        .when(sub(i) < 0.9, rnd(i)).otherwise(t))
    lbl = F.filter(
        F.transform(F.col("w"),
                    lambda t, i: F.when(masked(i), t)),
        lambda x: x.isNotNull())
    return d.select(
        "id", n.cast("long").alias("n_tokens"),
        F.size(lbl).cast("long").alias("n_masked"),
        F.array_join(inp, " ").alias("input_text"),
        F.array_join(lbl, " ").alias("labels_text"))


def mlm_mask_sql(table: str = "documents", rate: float = 0.15,
                 mask_token: str = "[MASK]") -> str:
    """DuckDB mirror of :func:`mlm_mask` (same hashes, same 80/10/10
    split, 0-based positions)."""

    def frac(i: str, salt: str) -> str:
        return (f"(CAST(concat('0x', substr(md5(CAST(id AS VARCHAR) "
                f"|| ':' || CAST({i} AS VARCHAR) || '{salt}'), 1, 8)) "
                f"AS BIGINT) / 4294967296.0)")

    m = f"({frac('i - 1', 'mlm-m')} < {rate})"
    s = frac("i - 1", "mlm-s")
    r = (f"w[CAST(floor({frac('i - 1', 'mlm-r')} * len(w)) "
         f"AS INTEGER) + 1]")
    return (
        f"WITH d AS (SELECT doc_id AS id, "
        f"list_filter(string_split_regex(text, '\\s+'), "
        f"x -> x <> '') AS w FROM {table}), "
        f"e AS (SELECT id, w, len(w) AS n, "
        f"list_transform(range(1, len(w) + 1), i -> CASE "
        f"WHEN NOT {m} THEN w[i] "
        f"WHEN {s} < 0.8 THEN '{mask_token}' "
        f"WHEN {s} < 0.9 THEN {r} ELSE w[i] END) AS inp, "
        f"list_filter(list_transform(range(1, len(w) + 1), "
        f"i -> CASE WHEN {m} THEN w[i] END), x -> x IS NOT NULL) "
        f"AS lbl FROM d) "
        f"SELECT id, CAST(n AS BIGINT) AS n_tokens, "
        f"CAST(len(lbl) AS BIGINT) AS n_masked, "
        f"coalesce(array_to_string(inp, ' '), '') AS input_text, "
        f"coalesce(array_to_string(lbl, ' '), '') AS labels_text "
        f"FROM e ORDER BY id")

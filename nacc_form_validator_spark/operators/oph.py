"""One-permutation MinHash with densification (OPH).

Classic MinHash (operators/dedup.py minhash_signature) evaluates k
independent salted hashes PER SHINGLE — at 100 TB the shingle-hashing
projection dominates near-dup cost, and k multiplies it.  One-permutation
hashing (Li/Owen/Zhang, NIPS 2012) hashes each shingle ONCE, partitions
the hash space into k bins, and keeps the minimum within each bin — the
same k-slot signature for 1/k of the hash work.  Empty bins (short
documents) are filled by *densification* (Shrivastava/Li, ICML 2014):
slot i borrows the value of the nearest non-empty bin to its right
(circular rotation), which restores the unbiased Jaccard collision
estimate E[sig_a[i] = sig_b[i]] = J(a, b).

Engine-portable determinism: the single hash is md5(shingle); a
shingle's bin is its first 4 hex chars as an integer mod k; bin minima
and rotation are pure value operations both engines compute identically
(Spark HOFs here, DuckDB list ops in the oracle mirror).

Scale shape (100 TB): signature construction is a zero-shuffle in-row
projection — ONE md5 per shingle (vs k in the classic path), then k
array_min/filter passes over the already-materialized per-doc hash
array (per-doc work, negligible next to hashing).  The banded
candidate join downstream is byte-identical to the classic LSH path:
bands x docs rows of 32-byte keys, never documents.  Reference
analogue: none (recast LLM-corpus surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.dedup import (
    normalized, shingles_from_words)

#: oracle-side normalized text (same form as plans/oracle.NORM)
_NORM = "trim(regexp_replace(lower({t}), '\\s+', ' ', 'g'))"


def _bin_of(h: Column, k: int) -> Column:
    """A hash's bin: first 4 hex chars as an integer, mod k."""
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % k


def oph_signature(hashes: Column, k: int) -> Column:
    """Densified OPH signature (array of k md5 hex strings) from a
    materialized per-doc array of shingle hashes.

    Bin minima first (NULL for empty bins), then rotation
    densification: slot i takes the first non-NULL of raw[(i + t) % k]
    for t = 0..k-1.  A doc with zero shingles yields all-NULL — callers
    filter those out up front.
    """
    # one-arg lambda factory: a two-parameter lambda (``lambda h, i=i``)
    # would make F.filter pass the ARRAY INDEX as the second argument,
    # silently overriding the bin id.
    def _in_bin(i):
        return lambda h: _bin_of(h, k) == i

    raw = F.array(*[
        F.array_min(F.filter(hashes, _in_bin(i))) for i in range(k)])

    def densify(raw_col):
        return F.array(*[
            F.coalesce(*[raw_col[(i + t) % k] for t in range(k)])
            for i in range(k)])

    return densify(raw)


def oph_signatures(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 8,
                   n: int = 3) -> DataFrame:
    """(doc_id, h0..h{k-1}): densified OPH signature per document,
    flattened to one column per slot (engine-portable schema).

    Stage hygiene: words, shingles, and the per-shingle hash array are
    materialized in separate projections so each HOF slices an array
    instead of re-running the upstream subtree per element.
    """
    d = (docs.select(F.col(id_col).alias("doc_id"),
                     F.split(normalized(F.col(text_col)), " ").alias("w"))
         .select("doc_id", shingles_from_words(F.col("w"), n).alias("sh"))
         .where(F.size("sh") > 0)
         .select("doc_id",
                 F.transform(F.col("sh"), F.md5).alias("hs"))
         .select("doc_id", oph_signature(F.col("hs"), k).alias("sig")))
    return d.select("doc_id",
                    *[F.col("sig")[i].alias(f"h{i}") for i in range(k)])


def oph_pairs(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", k: int = 8, bands: int = 4,
              n: int = 3) -> DataFrame:
    """(id_a, id_b): candidate near-dup pairs sharing at least one OPH
    LSH band — the same band-key join shape as dedup.minhash_lsh_pairs,
    fed by the 1-hash-per-shingle signature instead of the k-hash one.
    """
    rows = k // bands
    sigs = oph_signatures(docs, text_col, id_col, k, n)
    band_cols = []
    for b in range(bands):
        key = F.md5(F.concat_ws(
            "|", *[F.col(f"h{b * rows + r}") for r in range(rows)]))
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  key.alias("key")))
    banded = (sigs.select(F.col("doc_id").alias("id"),
                          F.explode(F.array(*band_cols)).alias("bk"))
              .select("id", "bk.band", "bk.key"))
    a = banded.select("band", "key", F.col("id").alias("id_a"))
    b = banded.select("band", "key", F.col("id").alias("id_b"))
    return (a.join(b, ["band", "key"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct()
            .orderBy("id_a", "id_b"))


def _oph_sig_ctes(k: int, n: int, table: str = "documents",
                  text_sql: str = "text",
                  id_sql: str = "doc_id") -> str:
    """Shared oracle CTEs ending in sigs(doc_id, h0..h{k-1})."""
    t = _NORM.format(t=text_sql)
    w = f"list_filter(string_split({t}, ' '), x -> x <> '')"
    sh = (f"list_distinct(list_filter(list_transform(range(0, "
          f"greatest(len({w}) - {n}, 0) + 1), i -> array_to_string("
          f"list_slice({w}, i + 1, i + {n}), ' ')), s -> s <> ''))")
    raw = ", ".join(
        f"list_min(list_filter(hs, h -> CAST(concat('0x', "
        f"substr(h, 1, 4)) AS BIGINT) % {k} = {i})) AS r{i}"
        for i in range(k))
    dense = ", ".join(
        "coalesce(" + ", ".join(f"r{(i + t) % k}" for t in range(k))
        + f") AS h{i}" for i in range(k))
    return (f"sh AS (SELECT {id_sql} AS doc_id, {sh} AS sh "
            f"FROM {table}), "
            f"hs AS (SELECT doc_id, list_transform(sh, s -> md5(s)) "
            f"AS hs FROM sh WHERE len(sh) > 0), "
            f"raw AS (SELECT doc_id, {raw} FROM hs), "
            f"sigs AS (SELECT doc_id, {dense} FROM raw)")


def oph_signatures_sql(k: int = 8, n: int = 3,
                       table: str = "documents") -> str:
    """DuckDB mirror of :func:`oph_signatures`."""
    cols = ", ".join(f"h{i}" for i in range(k))
    return (f"WITH {_oph_sig_ctes(k, n, table)} "
            f"SELECT doc_id, {cols} FROM sigs ORDER BY doc_id")


def oph_pairs_sql(k: int = 8, bands: int = 4, n: int = 3,
                  table: str = "documents") -> str:
    """DuckDB mirror of :func:`oph_pairs`."""
    rows = k // bands
    band_rows = []
    for b in range(bands):
        key = " || '|' || ".join(
            f"h{b * rows + r}" for r in range(rows))
        band_rows.append(f"SELECT doc_id AS id, {b} AS band, "
                         f"md5({key}) AS key FROM sigs")
    banded = " UNION ALL ".join(band_rows)
    return (f"WITH {_oph_sig_ctes(k, n, table)}, "
            f"banded AS ({banded}) "
            f"SELECT DISTINCT l.id AS id_a, r.id AS id_b "
            f"FROM banded l JOIN banded r ON l.band = r.band "
            f"AND l.key = r.key AND l.id < r.id ORDER BY id_a, id_b")

"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS).

Position-robust local fingerprinting: hash every k-gram of the
normalized text, slide a window of ``w`` consecutive k-gram hashes, and
keep each window's MINIMUM hash.  The guarantee that makes winnowing
the standard plagiarism/near-dup scheme: any shared substring of length
>= k + w - 1 between two documents yields at least one SHARED
fingerprint, while unshared regions almost never collide — so
fingerprint-bucket joins find copied PASSAGES, not just whole-document
near-duplicates (what MinHash resemblance measures).

Deviation from the paper, documented: the paper breaks window ties by
keeping the RIGHTMOST minimum to maximize fingerprint density; we keep
the plain minimum and de-duplicate per document.  Selection becomes
order-independent (pure value-min), which both engines compute
identically — the shared-substring guarantee is unaffected (a shared
window still selects the same value).

Scale shape (100 TB): fingerprint selection is a pure in-row HOF
projection (zero Python, zero shuffle); only (doc_id, 32-hex fp) pairs
leave the row.  The pair join is the banded-LSH shape used by
minhash/simhash here: group by fingerprint with a hot-bucket cap
(``max_df``) so a boilerplate fingerprint can never go quadratic, then
count shared fingerprints per candidate pair.  Reference analogue: none
(recast LLM-corpus surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: normalized text both engines agree on (same form as plans/oracle.NORM)
_NORM = "trim(regexp_replace(lower({t}), '\\s+', ' ', 'g'))"


def _norm_col(text_col: str):
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        k: int = 8, w: int = 4) -> DataFrame:
    """(doc_id, fp): distinct winnowing fingerprints per document.

    ``k``: character k-gram size; ``w``: window (in k-grams).  Hashes
    are md5 hex strings — lexicographic min is engine-portable.
    """
    t = _norm_col(text_col)
    d = docs.select(F.col(id_col).alias("doc_id"), t.alias("__t"))
    n = F.length("__t")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0))),
        lambda i: F.md5(F.substring(F.col("__t"), i, k)))
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("__g") - (w - 1),
                                        F.lit(0))),
        lambda j: F.array_min(F.slice(F.col("__g"), j, w)))
    return (d.where(n >= k)
            .withColumn("__g", grams)
            .select("doc_id",
                    F.explode(F.array_distinct(wins)).alias("fp")))


def winnow_fingerprints_sql(table_sql: str, text_sql: str = "text",
                            id_sql: str = "doc_id",
                            k: int = 8, w: int = 4) -> str:
    """DuckDB mirror of :func:`winnow_fingerprints`."""
    t = _NORM.format(t=text_sql)
    grams = (f"list_transform(range(1, greatest(len(__t) - {k - 1}, 0) "
             f"+ 1), i -> md5(substr(__t, CAST(i AS INT), {k})))")
    wins = (f"list_transform(range(1, greatest(len(__g) - {w - 1}, 0) "
            f"+ 1), j -> list_min(list_slice(__g, CAST(j AS INT), "
            f"CAST(j AS INT) + {w - 1})))")
    return (f"WITH src AS ({table_sql}), "
            f"nt AS (SELECT {id_sql} AS doc_id, {t} AS __t FROM src), "
            f"g AS (SELECT doc_id, {grams} AS __g FROM nt "
            f"WHERE len(__t) >= {k}), "
            f"f AS (SELECT doc_id, unnest(list_distinct({wins})) AS fp "
            f"FROM g) SELECT doc_id, fp FROM f")


def winnow_pairs(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 8, w: int = 4,
                 min_common: int = 2, max_df: int = 50) -> DataFrame:
    """(id_a, id_b, n_common): candidate copied-passage pairs sharing
    >= ``min_common`` fingerprints.  ``max_df`` drops fingerprints hit
    by more than that many documents (site boilerplate) BEFORE the
    self-join — the same hot-bucket guard the minhash/ngram paths use,
    bounding per-fingerprint join fan-out at max_df^2."""
    from pyspark import StorageLevel

    from nacc_form_validator_spark.operators.dedup import (  # noqa: F401
        release_intermediates)
    fps = winnow_fingerprints(docs, text_col, id_col, k, w)
    # the corpus-sized normalize+hash projection feeds BOTH the df-cap
    # aggregate and the self-join: persist it once (module convention,
    # see dedup.ngram_jaccard_pairs; release via release_intermediates)
    fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
    rare = (fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df))
    kept = fps.join(rare.select("fp"), "fp")
    a = kept.select(F.col("fp"), F.col("doc_id").alias("id_a"))
    b = kept.select(F.col("fp"), F.col("doc_id").alias("id_b"))
    out = (a.join(b, "fp")
           .where(F.col("id_a") < F.col("id_b"))
           .groupBy("id_a", "id_b")
           .agg(F.count(F.lit(1)).alias("n_common"))
           .where(F.col("n_common") >= min_common)
           .orderBy("id_a", "id_b"))
    out._persisted_intermediates = [fps]
    return out


def winnow_pairs_sql(table_sql: str, text_sql: str = "text",
                     id_sql: str = "doc_id", k: int = 8, w: int = 4,
                     min_common: int = 2, max_df: int = 50) -> str:
    """DuckDB mirror of :func:`winnow_pairs`."""
    fps = winnow_fingerprints_sql(table_sql, text_sql, id_sql, k, w)
    return (f"WITH fps AS ({fps}), "
            f"rare AS (SELECT fp FROM fps GROUP BY fp "
            f"HAVING count(*) <= {max_df}), "
            f"r AS (SELECT fps.doc_id, fps.fp FROM fps "
            f"JOIN rare USING (fp)) "
            f"SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            f"CAST(count(*) AS BIGINT) AS n_common "
            f"FROM r a JOIN r b ON a.fp = b.fp AND a.doc_id < b.doc_id "
            f"GROUP BY 1, 2 HAVING count(*) >= {min_common} "
            f"ORDER BY id_a, id_b")

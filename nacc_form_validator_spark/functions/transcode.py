"""Charset transcoding: decode raw page bytes BY their declared charset.

Crawled content is not all UTF-8 — real Common Crawl is ~5-10%
legacy-charset pages (latin-1, cp1252, gbk, shift_jis, ...), with the
charset declared in the HTTP Content-Type (sources/warc.py
``read_warc_http`` extracts it) or the html meta tag.  Spark's
``F.decode`` takes a LITERAL charset, so a column-driven decode needs
the Python codec machinery: this stage runs it Arrow-batched in ONE
``mapInPandas`` pass — the documented exception to the zero-Python rule
(same class as the gzip member walk in warc.py: the codec itself is C,
Python only dispatches per payload).

Semantics chosen for crawl reality:
- unknown/unsupported charset names fall back to utf-8 (crawls declare
  garbage charsets constantly; dropping the page for a bad LABEL loses
  good content);
- decode errors REPLACE (U+FFFD), never raise — the mojibake stats
  stage downstream quantifies the damage and gates;
- NULL charset means utf-8 (the modern-web default).

Reference analogue: the cast-before-validate stage
(/root/reference/nacc_form_validator/nacc_validator.py:220-257) — fix
the representation before rules run; here the "cast" is bytes->text by
declared encoding.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUT_SCHEMA_SUFFIX = [
    T.StructField("text", T.StringType()),
    T.StructField("used_charset", T.StringType()),
]


def transcode_to_utf8(df: DataFrame, bin_col: str = "html",
                      charset_col: str = "charset",
                      url_col: str = "url") -> DataFrame:
    """(url, text, used_charset): bytes decoded by the row's declared
    charset.  ``used_charset`` records what actually applied (the
    declared codec when Python knows it, else the utf-8 fallback) —
    the lineage a later audit needs."""
    schema = T.StructType([T.StructField("url", T.StringType())] +
                          OUT_SCHEMA_SUFFIX)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import codecs
        known: dict = {}

        def resolve(name):
            if name is None or (isinstance(name, float) and
                                pd.isna(name)):
                return "utf-8"
            key = str(name).strip().lower()
            if key not in known:
                try:
                    codecs.lookup(key)
                    known[key] = key
                except LookupError:
                    known[key] = "utf-8"
            return known[key]

        for pdf in batches:
            used = [resolve(c) for c in pdf[charset_col]]
            texts = [bytes(b).decode(cs, "replace")
                     for b, cs in zip(pdf[bin_col], used)]
            yield pd.DataFrame({"url": pdf[url_col], "text": texts,
                                "used_charset": used})

    return (df.select(url_col, bin_col, charset_col)
            .mapInPandas(run, schema))


# ------------------------------------------------------------ fixture --

GEN_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("charset", T.StringType()),
])

#: charset rotation by doc id: legacy single-byte pages, a garbage
#: label (falls back to utf-8), a NULL label, and plain utf-8
_CHARSETS = ["latin-1", "cp1252", "utf-8", None, "x-bogus"]

#: accented payload prefix — encodable in latin-1 AND cp1252, decoded
#: back identically, so expected text is SQL-derivable from the source
_PREFIX = "café résumé à "


def deterministic_charset_pages(docs: DataFrame,
                                id_col: str = "doc_id",
                                text_col: str = "text") -> DataFrame:
    """(url, html, charset): per doc, the ascii source text prefixed
    with accented chars, ENCODED in the rotated charset (garbage/NULL
    labels carry utf-8 bytes — the fallback must reproduce them)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, blobs, charsets = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                label = _CHARSETS[int(did) % len(_CHARSETS)]
                codec = label if label in ("latin-1", "cp1252") \
                    else "utf-8"
                urls.append(f"cs{int(did)}")
                blobs.append((_PREFIX + str(text)).encode(codec))
                charsets.append(label)
            yield pd.DataFrame({"url": urls, "html": blobs,
                                "charset": charsets})

    return docs.select(id_col, text_col).mapInPandas(gen, GEN_SCHEMA)


def transcode_roundtrip_sql(table: str = "documents",
                            id_sql: str = "doc_id") -> str:
    """Expected transcode of the fixture pages from the SOURCE table:
    decode(encode(prefix || text, cs), cs) is the identity for every
    representable payload, so expected text is source-derived; the
    used_charset column mirrors the resolve rule (NULL -> utf-8,
    unknown label -> utf-8)."""
    n = len(_CHARSETS)
    used = (f"CASE {id_sql} % {n} WHEN 0 THEN 'latin-1' "
            f"WHEN 1 THEN 'cp1252' ELSE 'utf-8' END")
    return (f"SELECT 'cs' || CAST({id_sql} AS VARCHAR) AS url, "
            f"'café résumé à ' || text AS text, "
            f"{used} AS used_charset "
            f"FROM {table} ORDER BY url")


# ------------------------------------------------- charset detection --
#: catches both <meta charset="x"> and the http-equiv form's
#: content="text/html; charset=x" — both carry 'charset='; RE2-safe
_META_CHARSET_RE = r"""(?i)<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_-]+)"""


def html_meta_charset(html_str):
    """Declared in-document charset from an html STRING column (the
    fallback when the HTTP header carries none), lowercased, NULL when
    absent.  Effective charset for :func:`transcode_to_utf8` is
    ``coalesce(http_charset, html_meta_charset(...), 'utf-8')``."""
    from pyspark.sql import functions as F
    return F.nullif(F.lower(
        F.regexp_extract(html_str, _META_CHARSET_RE, 1)), F.lit(""))


def html_meta_charset_sql(html_expr: str) -> str:
    """DuckDB mirror of :func:`html_meta_charset`."""
    esc = _META_CHARSET_RE.replace("'", "''")
    return (f"nullif(lower(regexp_extract({html_expr}, '{esc}', 1)), "
            f"'')")

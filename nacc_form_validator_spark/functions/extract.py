"""HTML -> text extraction over the ``html: binary`` page payload.

The input table carries both the raw crawl payload (``html binary``) and
the extracted ``text``; the contract is that extraction is DETERMINISTIC
and byte-identical per url, so a re-run over the raw payload must
reproduce ``text`` exactly (the corpus-scale analogue of the reference's
record-identity invariant — nacc_validator.py casts never mutate the raw
value channel, /root/reference/nacc_form_validator/nacc_validator.py:300-337).

Pure Column expressions end to end (decode + regexp chain + literal
entity replaces) — whole-stage codegen, no Python, and every step is
ANSI-SQL-expressible so the DuckDB oracle can verify byte identity
value-for-value.  Deliberately a MINIMAL deterministic extractor (drop
script/style subtrees, drop comments, strip tags, unescape the five
core entities); a production boilerplate-aware extractor is the
corpus-level :mod:`..operators.boilerplate` pass downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: core entity unescapes, applied in order — ``&amp;`` LAST so
#: double-escaped input (``&amp;lt;``) resolves one level per pass,
#: matching the single-pass SQL oracle exactly
ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&amp;", "&"))

#: subtree-dropping and tag-stripping patterns; RE2-compatible (no
#: backreferences) so Java regex (Spark) and RE2 (DuckDB) agree
_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
_STYLE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT = r"(?s)<!--.*?-->"
_TAG = r"(?s)<[^>]*>"


def extract_text_str(s: Column) -> Column:
    """Extracted text from an html STRING column (the post-transcode
    shape) — same subtree/tag/entity pipeline as :func:`extract_text`."""
    for pat in (_SCRIPT, _STYLE, _COMMENT, _TAG):
        s = F.regexp_replace(s, pat, "")
    for ent, ch in ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def extract_text(html: Column) -> Column:
    """Extracted text from a utf-8 html ``binary`` column."""
    return extract_text_str(F.decode(html, "UTF-8"))


def with_extracted_text(df: DataFrame, html_col: str = "html",
                        out: str = "extracted_text") -> DataFrame:
    return df.withColumn(out, extract_text(F.col(html_col)))


def extract_text_sql(html_expr: str = "html") -> str:
    """The same extraction as one ANSI SQL expression (DuckDB oracle;
    the oracle's html column is already VARCHAR, so no decode)."""
    s = html_expr
    for pat in (_SCRIPT, _STYLE, _COMMENT, _TAG):
        esc = pat.replace("'", "''")
        s = f"regexp_replace({s}, '{esc}', '', 'g')"
    for ent, ch in ENTITIES:
        ch_sql = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{ch_sql}')"
    return s

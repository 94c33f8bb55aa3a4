"""Unicode text normalization (NFC + accent-fold/lowercase canonical).

Web crawls mix composed and decomposed unicode for the same visible
text (e.g. ``é`` as U+00E9 vs ``e`` + U+0301), which breaks exact
dedup, shingling, and token matching.  The standard fix is NFC
normalization before hashing, plus an accent-folded lowercase form for
matching.

Spark has no built-in unicode-normalize, so this is a vectorized pandas
UDF over stdlib ``unicodedata`` (Arrow-batched; the model-free analogue
of the langid UDF).  Both transforms are value-verified against DuckDB
(``nfc_normalize`` / ``strip_accents``, utf8proc-backed — parity probed
over composed/decomposed/ligature/sharp-s cases in
tests/test_normalize.py and the ``text_normalize`` oracle).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

#: deterministic non-ASCII fixture prefixes (shared by the driver query
#: and its SQL oracle so both sides see identical codepoints); index 0
#: uses the DECOMPOSED e + U+0301
UNICODE_FIXTURES = (
    "cafe\u0301 and CAFE\u0301 ",   # DECOMPOSED acute (e + U+0301)
    "CAF\u00c9 \u00dcBER stra\u00dfe ",  # composed + sharp s
    "na\u00efve \u00f1o \u00f8 ",  # diaeresis, tilde, o-slash
    "",                              # pass-through
)


def nfc_normalize_py(s: str) -> str:
    return unicodedata.normalize("NFC", s)


def fold_py(s: str) -> str:
    """NFC -> strip combining marks (NFD + drop Mn) -> lowercase; equals
    DuckDB ``lower(strip_accents(nfc_normalize(s)))``."""
    s = unicodedata.normalize("NFC", s)
    s = "".join(c for c in unicodedata.normalize("NFD", s)
                if not unicodedata.combining(c))
    return s.lower()


def make_normalize_udf(fold: bool = False):
    """Vectorized normalizer: NFC, or the accent-folded lowercase form."""
    fn = fold_py if fold else nfc_normalize_py

    @pandas_udf(T.StringType())
    def _norm(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: None if t is None else fn(t))

    return _norm

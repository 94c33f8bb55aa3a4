"""End-to-end corpus pass: the composed keep/drop decision a real
training-data run makes per page, in ONE DataFrame plan.

Stage order (all map-side until the single content-hash window):

1. URL/host blocklist gate (functions/urlfilter.py) — InSet, codegen;
2. html -> text re-extraction (functions/extract.py) — all downstream
   stats read the EXTRACTED text, so a broken extractor fails the
   oracle (which computes the same stats over the carried ``text``);
3. Gopher-ish heuristic bounds over doc stats (functions/heuristics.py,
   the GOPHER_RULES min/max table; nullable stats pass when null,
   mirroring the reference's nullable rule semantics,
   /root/reference/nacc_form_validator/nacc_validator.py nullable);
4. exact dedup among SURVIVING pages: one window partitioned by the
   md5 of normalized extracted text, ordered by (url, warc_ts); the
   first alive row of each digest keeps, later alive rows drop.

Scale: stages 1-3 are a single codegen projection; stage 4 is the
plan's only wide operation — one Exchange on the content digest
(duplicate-heavy corpora concentrate per-digest groups; mass-duplicate
content is exactly what the upstream boilerplate/dedup passes remove,
and the window state per digest group is O(1): a running sum).
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.extract import extract_text
from nacc_form_validator_spark.functions.heuristics import (packed_word_fold,
                                                            doc_stats, words)
from nacc_form_validator_spark.functions.urlfilter import url_host
from nacc_form_validator_spark.operators.dedup import normalized


def full_corpus_pass(pages: DataFrame,
                     blocked_hosts: Optional[Iterable[str]] = None
                     ) -> DataFrame:
    """(url, warc_ts, url_blocked, rules_ok, final_keep) per page."""
    blocked_hosts = list(blocked_hosts or ())
    ext = extract_text(F.col("html"))
    df = pages.withColumn("__ext", ext)
    df = (df.withColumn("__w", words(F.col("__ext")))
          .withColumn("__lines",
                      F.array_remove(F.split(F.col("__ext"), r"\n"), ""))
          .withColumn("__packed", packed_word_fold(F.col("__w"))))
    s = doc_stats(F.col("__ext"), w=F.col("__w"), lines=F.col("__lines"),
                  packed=F.col("__packed"))

    def bound(c, lo=None, hi=None):
        ok = F.lit(True)
        if lo is not None:
            ok = ok & (c >= lo)
        if hi is not None:
            ok = ok & (c <= hi)
        return c.isNull() | ok

    # GOPHER_RULES bounds (heuristics.py): n_words is non-nullable
    # (a 0-word doc fails min=5), ratio stats pass when null
    rules_ok = ((s["n_words"] >= 5) & (s["n_words"] <= 200000) &
                bound(s["mean_word_len"], 2.0, 12.0) &
                bound(s["symbol_ratio"], None, 0.3) &
                bound(s["stopword_ratio"], 0.002, None) &
                bound(s["dup_line_ratio"], None, 0.5) &
                bound(s["word_rep_ratio"], None, 0.9))

    host = url_host(F.col("url"))
    blocked = (host.isin(*[h.lower() for h in blocked_hosts])
               if blocked_hosts else F.lit(False))
    df = (df.withColumn("url_blocked", blocked)
          .withColumn("rules_ok", rules_ok)
          .withColumn("__alive",
                      ~F.col("url_blocked") & F.col("rules_ok"))
          .withColumn("__digest", F.md5(normalized(F.col("__ext")))))
    w = (Window.partitionBy("__digest").orderBy("url", "warc_ts")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    alive_rank = F.sum(F.col("__alive").cast("int")).over(w)
    df = df.withColumn(
        "final_keep", F.col("__alive") & (alive_rank == 1))
    return (df.select("url", "warc_ts", "url_blocked", "rules_ok",
                      "final_keep")
            .orderBy("url", "warc_ts"))

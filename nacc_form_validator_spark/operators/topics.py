"""Lexicon-based topic tagging (domain classification without a model).

The cheap first-tier of corpus domain organization: count per-topic
lexicon hits per document and tag with the argmax topic.  Production
pipelines run this BEFORE any trained classifier — it needs no labels,
costs one projection, and its tags stratify mixture resampling
(operators/sampling.mixture_resample) and per-domain budgets.  A
trained upgrade is operators/selection.nb_quality_scores with
topic-labeled seeds.  Reference analogue: none (recast LLM-corpus
surface).

Scale shape: pure in-row HOF projection — lexicons are literal arrays
compiled into the plan (tens of words each; a >10^4-word lexicon should
switch to the broadcast-join shape of domains.registered_domain_join).
Zero shuffles, zero Python.  Ties break to the lexicographically first
topic name; zero hits everywhere tags 'none' — both rules are explicit
so the DuckDB mirror is value-identical."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fixture lexicons drawn from the synthetic corpus vocabulary so tests
#: and benches exercise every branch; callers pass their own
DEFAULT_LEXICONS = {
    "execution": ("join", "hash", "merge", "filter", "agg", "sort"),
    "storage": ("scan", "row", "column", "table", "part", "batch"),
    "streaming": ("stream", "window", "watermark", "state"),
    "workload": ("query", "order", "group", "key", "value", "customer"),
}


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def topic_hits(text: Column,
               lexicons: "dict[str, tuple]" = DEFAULT_LEXICONS
               ) -> "dict[str, Column]":
    """topic -> total lexicon-token occurrences in ``text``."""
    toks = _tokens(text)
    out = {}
    for name in sorted(lexicons):
        lex = F.array(*[F.lit(w) for w in lexicons[name]])
        out[name] = F.size(F.filter(
            toks, lambda t: F.array_contains(lex, t))).cast("long")
    return out


def topic_tag(text: Column,
              lexicons: "dict[str, tuple]" = DEFAULT_LEXICONS) -> Column:
    """struct(topic, n_hits): argmax topic (ties -> first name asc,
    all-zero -> 'none')."""
    hits = topic_hits(text, lexicons)
    names = sorted(hits)
    best = F.greatest(*[hits[n] for n in names]) if len(names) > 1 \
        else hits[names[0]]
    tag = F.lit("none")
    for n in reversed(names):          # earliest name wins the tie
        tag = F.when(hits[n] == best, F.lit(n)).otherwise(tag)
    tag = F.when(best > 0, tag).otherwise(F.lit("none"))
    return F.struct(tag.alias("topic"), best.alias("n_hits"))


def topic_tag_sql(text_expr: str = "text",
                  lexicons: "dict[str, tuple]" = DEFAULT_LEXICONS
                  ) -> "dict[str, str]":
    """DuckDB mirrors: {'topic': expr, 'n_hits': expr} — same argmax
    and tie rules as :func:`topic_tag`."""
    toks = (f"list_filter(string_split_regex(lower({text_expr}), "
            f"'\\s+'), x -> x <> '')")
    names = sorted(lexicons)
    hits = {}
    for name in names:
        lst = ", ".join(f"'{w}'" for w in lexicons[name])
        hits[name] = (f"CAST(len(list_filter({toks}, "
                      f"t -> list_contains([{lst}], t))) AS BIGINT)")
    best = "greatest(" + ", ".join(hits[n] for n in names) + ")" \
        if len(names) > 1 else hits[names[0]]
    tag = "'none'"
    for n in reversed(names):
        tag = (f"CASE WHEN {hits[n]} = ({best}) THEN '{n}' "
               f"ELSE {tag} END")
    return {
        "topic": f"CASE WHEN ({best}) > 0 THEN ({tag}) ELSE 'none' END",
        "n_hits": f"({best})",
    }

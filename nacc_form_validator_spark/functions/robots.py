"""robots.txt parsing and per-URL allow gate — FULL RFC 9309 (the
Robots Exclusion Protocol).  Supersedes the Disallow-prefix subset in
functions/urlfilter.py (parse_robots_rules/robots_gate, kept as the
cheap prefix fast path) with the complete published semantics: Allow
rules, ``*`` wildcards, ``$`` end anchors, longest-match precedence,
and named-agent group selection.  The crawl-side half of the consent
stack next to functions/urlfilter.py (host blocklists) and the in-page
``meta_robots_gate`` (functions/junkpages.py): a compliant corpus
builder must honor the crawl-time opt-out BEFORE any content compute,
and re-checking it at filter time catches pages fetched before a
robots change.

Semantics implemented (RFC 9309 §2, matching Google's published
parser behavior):

- groups: a run of consecutive ``User-agent:`` lines opens a group;
  ``Allow:`` / ``Disallow:`` lines attach to the most recent group.
  Unknown directives (``Crawl-delay:`` etc.) and comments (``#`` to
  end of line) are ignored; blank/malformed lines are skipped.
- group selection: the crawler obeys the group(s) whose user-agent
  token is the LONGEST substring match of its own agent string
  (case-insensitive); ``*`` groups match with specificity 0 and are
  obeyed only when no named group matches.  Multiple groups tying at
  max specificity combine their rules (RFC 9309 §2.2.1).
- rule precedence per path: the rule with the LONGEST pattern wins;
  on a length tie ``Allow`` wins (§2.2.2).  An empty ``Disallow:``
  value is a no-op.  No matching rule (or no robots.txt for the
  host) -> allowed.
- patterns: literal path prefixes with ``*`` wildcards and an
  optional trailing ``$`` end-anchor, matched against path + query.

The reference validator has no crawl layer; this is §2.9 recast
surface (SURVEY.md).

Scale shape: robots.txt parsing runs on the ROBOTS table (hosts-sized
— millions of rows at web scale, never corpus-sized); its one window
(line -> group attribution) partitions by host.  The compiled rule
table joins pages by host under the MODEL_JOIN_CONTRACT default (AQE
broadcasts it when small; no forced hint because a full-web robots
table is unbounded).  The per-url decision is ONE integer aggregate —
precedence is encoded as ``score = 2 * pattern_length + is_allow``,
so longest-match + allow-wins-ties needs no struct comparisons or
window over the joined table, and map-side partial max applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: the agent string the entry query crawls as
FIXTURE_AGENT = "qfbot/1.0"

#: deterministic robots.txt fixture over the synthetic pages hosts
#: (sources/pages.py host0..host15.example) — shared VERBATIM by the
#: Spark query and the DuckDB oracle (plans/oracle.py robots_gate_sql)
#: so the two sides can never drift.  Exercises: longest-match
#: allow-over-disallow (host0), named-group precedence over '*' with a
#: wildcard+anchor pattern (host1), a group for some OTHER crawler
#: only (host2 -> all allowed), empty Disallow + unknown directive
#: (host3), multi-user-agent group with an exact '$' re-allow
#: (host4), total block (host6), and absent robots.txt (other hosts).
ROBOTS_FIXTURE = [
    ("host0.example",
     "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n"),
    ("host1.example",
     "# qfbot gets its own group\nUser-agent: qfbot\n"
     "Disallow: /p/*3$\n\nUser-agent: *\nDisallow: /\n"),
    ("host2.example", "User-agent: otherbot\nDisallow: /\n"),
    ("host3.example",
     "User-agent: *\nDisallow:\nCrawl-delay: 10\n"),
    ("host4.example",
     "User-agent: smallbot\nUser-agent: qfbot\n"
     "Disallow: /p/2\nAllow: /p/2$\n"),
    ("host6.example", "User-agent: *\nDisallow: /\n"),
]

#: specials escaped before wildcard expansion: every Java/RE2 regex
#: metacharacter EXCEPT '*' (expanded to '.*') and '$' (trailing one
#: becomes the end anchor, interior ones escaped separately — plain
#: replace(), no regex, so the chain is engine-portable)
_ESC_CLASS = r"([.^|?+(){}\[\]\\])"


def _pattern_rx(pat: Column) -> Column:
    """Compile a robots path pattern into the anchored regex both
    engines match identically: escape regex specials, expand ``*`` ->
    ``.*``, honor only a TRAILING ``$`` as the end anchor."""
    ends = pat.endswith("$")
    body = F.when(ends, F.substring(pat, 1, F.length(pat) - 1)) \
        .otherwise(pat)
    esc = F.regexp_replace(body, _ESC_CLASS, r"\\$1")
    esc = F.replace(esc, F.lit("$"), F.lit(r"\$"))
    esc = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(F.lit("^"), esc, F.when(ends, F.lit("$"))
                    .otherwise(F.lit("")))


def parse_robots(robots: DataFrame, agent: str,
                 host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """(host, pattern, allow, plen, rx): the rules of the group(s)
    governing ``agent``, per host, with the match regex precompiled.

    One posexplode + one per-host window (group attribution) + a
    (host, block) self-join of two tiny projections — all bounded by
    robots-file line counts, never by the corpus.
    """
    agent_lc = agent.lower()
    lines = (robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "line")))
    # strip comments, trim, split 'key: value'
    clean = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    parsed = (lines
              .withColumn("key", F.lower(F.trim(
                  F.regexp_extract(clean, "^([^:]+):", 1))))
              .withColumn("val", F.trim(
                  F.regexp_extract(clean, "^[^:]+:(.*)$", 1))))
    is_ua = F.col("key") == "user-agent"
    w = Window.partitionBy("host").orderBy("pos")
    # a ua line NOT preceded by a ua line starts a new group block
    blocks = (parsed
              .withColumn("__ua", is_ua)
              .withColumn("__start", F.col("__ua") & ~F.coalesce(
                  F.lag("__ua").over(w), F.lit(False)))
              .withColumn("block", F.sum(F.col("__start").cast("int"))
                          .over(w)))
    uas = (blocks.where(F.col("__ua"))
           .select("host", "block", F.lower(F.col("val")).alias("ua")))
    rules = (blocks
             .where(F.col("key").isin("allow", "disallow") &
                    (F.col("val") != ""))
             .select("host", "block",
                     (F.col("key") == "allow").alias("allow"),
                     F.col("val").alias("pattern")))
    # group selection: eligible groups, then keep max specificity/host
    elig = (uas.where((F.col("ua") == "*") |
                      (F.instr(F.lit(agent_lc), F.col("ua")) > 0))
            .select("host", "block",
                    F.when(F.col("ua") == "*", F.lit(0))
                    .otherwise(F.length("ua")).alias("spec")))
    best = elig.groupBy("host").agg(F.max("spec").alias("best_spec"))
    chosen = (elig.join(best, "host")
              .where(F.col("spec") == F.col("best_spec"))
              .select("host", "block").distinct())
    out = (rules.join(chosen, ["host", "block"])
           .select("host", "pattern", "allow",
                   F.length("pattern").alias("plen"),
                   _pattern_rx(F.col("pattern")).alias("rx")))
    return out


def _path_q(url: Column) -> Column:
    """path + query ('/' default), the robots match target: everything
    between the authority and the fragment."""
    p = F.regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)",
                         1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_gate(pages: DataFrame, robots: DataFrame, agent: str,
                url_col: str = "url",
                host_col_expr: "Column | None" = None) -> DataFrame:
    """(url, allowed, matched_plen, matched_allow): per distinct URL,
    the RFC 9309 decision for ``agent``.

    ``matched_plen``/``matched_allow`` carry the winning rule's
    pattern length and type for lineage (null when no rule matched —
    which, like a missing robots.txt, means allowed).
    """
    rules = parse_robots(robots, agent)
    u = F.col(url_col)
    host = (host_col_expr if host_col_expr is not None
            else F.lower(F.regexp_extract(
                u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1)))
    urls = (pages.select(u.alias("url"), host.alias("host"),
                         _path_q(u).alias("path"))
            .distinct())
    j = urls.join(rules, "host", "left")
    matched = F.col("rx").isNotNull() & F.regexp_like("path", F.col("rx"))
    # precedence as ONE integer: longest pattern wins, allow wins ties
    score = F.when(matched,
                   F.col("plen") * 2 + F.col("allow").cast("int"))
    per = (j.groupBy("url")
           .agg(F.max(score).alias("best")))
    return (per.select(
        "url",
        (F.col("best").isNull() | (F.col("best") % 2 == 1))
        .alias("allowed"),
        F.floor(F.col("best") / 2).cast("int").alias("matched_plen"),
        F.when(F.col("best").isNotNull(), F.col("best") % 2 == 1)
        .alias("matched_allow")))

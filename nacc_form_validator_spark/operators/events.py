"""Event-stream batch operators: sessionization and as-of join.

Both are recasts of the reference's per-subject ordered-history
discipline (temporalrules: previous record via the (pk, orderby)
visit chain, /root/reference/nacc_form_validator/quality_check.py:38
and datastore.py previous-record lookups) onto the event-log shapes a
web-scale pipeline actually has: crawl/user event streams where
"previous record" means the latest state AT OR BEFORE a timestamp.

- :func:`sessionize` — gap-based session assignment (the canonical
  clickstream/crawl-burst grouping);
- :func:`asof_join` — each left row joined to the latest right row
  with order <= the left's order per key.  Spark has no ASOF JOIN
  operator; the scalable form is the union + last(ignorenulls) window
  trick below — ONE shuffle, no join explosion, no per-key collect.
  (DuckDB has native ASOF JOIN, which is the oracle.)

Scale shape (10^12 events): both operators are a single hash(key)
Exchange; per-key state is the ordered event group (the same bounded-
window story, and the same salting escape hatch as temporalrules via
history.py if one key absorbs a pathological share).  Timestamps
compare in integer MICROSECONDS (unix_micros / epoch_us) so the two
engines never disagree on sub-second boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_seconds: int = 1800,
               key_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """(event_id, user_id, ts, session_idx, session_id): a new session
    starts when the gap since the key's previous event exceeds
    ``gap_seconds``; session_idx numbers a key's sessions from 0 and
    session_id = '<key>#<idx>' is the global session key.

    The lag and the running cumsum share ONE hash(key) window
    partitioning (Catalyst reuses the Exchange for both window specs
    on the same key+order)."""
    gap_us = int(gap_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev = F.lag(us).over(w)
    new_s = (prev.isNotNull() &
             ((us - prev) > gap_us)).cast("long")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx = F.sum(new_s).over(wc)
    return (events.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        idx.alias("session_idx"),
        F.concat(F.col(key_col).cast("string"), F.lit("#"),
                 idx.cast("string")).alias("session_id"))
        .orderBy("event_id"))


def sessionize_sql(table_sql: str, gap_seconds: int = 1800) -> str:
    """DuckDB mirror of :func:`sessionize` over ``table_sql`` (a
    subquery yielding (event_id, user_id, ts)) — same micros
    arithmetic, same lag/cumsum semantics."""
    gap_us = int(gap_seconds) * 1_000_000
    return (
        f"WITH src AS ({table_sql}), "
        f"l AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us, "
        f"lag(epoch_us(ts)) OVER (PARTITION BY user_id "
        f"ORDER BY ts, event_id) AS prev FROM src), "
        f"s AS (SELECT event_id, user_id, ts, "
        f"CAST(sum(CASE WHEN prev IS NOT NULL AND us - prev > {gap_us} "
        f"THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, "
        f"event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        f"AS BIGINT) AS session_idx FROM l) "
        f"SELECT event_id, user_id, ts, session_idx, "
        f"user_id || '#' || session_idx AS session_id FROM s "
        f"ORDER BY event_id")


def asof_join(left: DataFrame, right: DataFrame,
              key_col: str = "user_id", order_col: str = "ts",
              value_cols: "tuple[str, ...]" = ("value",)) -> DataFrame:
    """Left rows + the latest ``right`` row with right.order <= the
    left row's order, per key (ASOF <= semantics).

    ``right`` must be unique per (key, order) — callers pre-aggregate
    (the fixture takes max per micro-timestamp); ambiguity there is a
    data bug that native ASOF engines resolve arbitrarily.

    The scalable plan: union the two sides with a side tag, ONE
    hash(key) window ordered by (order, side) with the right side
    sorting BEFORE left at equal order (so equal timestamps match),
    and last(ignorenulls=True) carries each right value forward onto
    following left rows.  No join node at all — hence no row
    explosion on hot keys and exactly one Exchange; a sort-merge
    range join would re-sort both sides and still need the per-key
    backward scan."""
    carry = [c for c in left.columns if c not in (key_col, order_col)]
    lv = left.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(order_col).cast("timestamp")).alias("o"),
        F.lit(1).alias("side"),
        F.col(order_col).alias("ts"),
        *[F.col(c).alias(f"l_{c}") for c in carry],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}")
          for c in value_cols])
    rv = right.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(order_col).cast("timestamp")).alias("o"),
        F.lit(0).alias("side"),
        F.col(order_col).alias("ts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"l_{c}")
          for c in carry],
        *[F.col(c).alias(f"r_{c}") for c in value_cols])
    u = lv.unionByName(rv)
    w = (Window.partitionBy("k").orderBy("o", "side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(f"r_{c}", ignorenulls=True).over(w).alias(c)
               for c in value_cols]
    return (u.select("k", "o", "side", "ts",
                     *[F.col(f"l_{c}") for c in carry], *carried)
            .where(F.col("side") == 1)
            .select(F.col("k").alias(key_col),
                    F.col("ts").alias(order_col),
                    *[F.col(f"l_{c}").alias(c) for c in carry],
                    *value_cols)
            .orderBy(key_col, order_col, *carry))


def asof_join_sql(left_sql: str, right_sql: str,
                  carry_cols: "tuple[str, ...]" = (),
                  value_cols: "tuple[str, ...]" = ("value",)) -> str:
    """DuckDB mirror of :func:`asof_join` using the NATIVE ASOF LEFT
    JOIN — an independent implementation of the same semantics, which
    makes this oracle a real cross-check of the window trick rather
    than the same algorithm twice.  Sides yield (user_id, ts, ...)."""
    carries = "".join(f"l.{c}, " for c in carry_cols)
    vals = ", ".join(f"r.{c} AS {c}" for c in value_cols)
    order_c = "".join(f", l.{c}" for c in carry_cols)
    return (
        f"WITH l AS ({left_sql}), r AS ({right_sql}) "
        f"SELECT l.user_id, l.ts, {carries}{vals} "
        f"FROM l ASOF LEFT JOIN r "
        f"ON l.user_id = r.user_id AND l.ts >= r.ts "
        f"ORDER BY l.user_id, l.ts{order_c}")

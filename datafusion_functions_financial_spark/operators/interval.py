"""Batch interval-overlap join — the two-sided range join Spark has
no native operator for. A naive ``a.start <= b.end AND b.start <=
a.end`` join plans as BroadcastNestedLoop (quadratic, driver-bound);
this implementation BUCKETIZES: each interval explodes into the
fixed-grain buckets it covers, candidates meet in a bucket equi-join,
a cheap predicate keeps true overlaps, and ``distinct`` collapses
multi-bucket pairs.

Cost model at 100 TB: explode size = interval length / grain (pick
the grain near the MEDIAN interval length: row explosion stays small
while bucket occupancy — the quadratic term — stays bounded); the
join is a plain hash shuffle on (keys..., bucket). Identical output
to the naive join (the oracle IS the naive join). Long intervals and
hot buckets are the same skew story as the LSH band join — cap or
split upstream.

The streaming counterpart (watermarked, state-bounded) is
``streaming/joins.py``; this is the batch/backfill path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["interval_join"]

US_PER_HOUR = 3_600_000_000


def interval_join(
    a: DataFrame, a_id: str, a_start: str, a_end: str,
    b: DataFrame, b_id: str, b_start: str, b_end: str,
    grain: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """(keys..., a_id, b_id, overlap_len): pairs of intervals with
    ``a.start <= b.end AND b.start <= a.end`` (closed-interval
    overlap, integer time units), plus the overlap length. Equal to
    the naive range join, computed via grain buckets.

    Precondition: ``(keys, id)`` must be unique within each input
    (same contract as ``asof_join``'s ``right_on``). A pair spanning
    G shared grain buckets surfaces G times from the bucket join, so
    the result is collapsed with ``.distinct()`` — with duplicate
    input ids that collapse would also swallow the legitimate
    duplicate pairs the naive join emits (ADVICE r05)."""
    keys = list(keys)

    def bucketed(df, idc, s, e, side):
        return df.select(
            *keys,
            F.col(idc).alias(f"{side}_id"),
            F.col(s).alias(f"{side}_start"),
            F.col(e).alias(f"{side}_end"),
            F.explode(F.expr(
                f"sequence({s} DIV {grain}, {e} DIV {grain})"
            )).alias("__bk"),
        )
    ab = bucketed(a, a_id, a_start, a_end, "a")
    bb = bucketed(b, b_id, b_start, b_end, "b")
    joined = ab.join(bb, [*keys, "__bk"]).filter(
        (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end"))
    )
    return (
        joined.select(
            *keys, "a_id", "b_id",
            (F.least("a_end", "b_end")
             - F.greatest("a_start", "b_start")).alias("overlap_len"),
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# Gate query: user sessions × global busy hours
# --------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000
BUSY_MIN_EVENTS = 30


def _q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user sessions overlap globally busy hours (≥ 30 events),
    and by how much — the incident-correlation join."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_s = F.when(
        (F.col("us") - F.lag("us").over(w)) > SESSION_GAP_US, 1
    ).otherwise(0)
    sess = (
        ev.withColumn("__new", new_s)
        .withColumn("sid", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_start"), F.max("us").alias("s_end"))
        .withColumn("session_id",
                    F.col("user_id") * 100000 + F.col("sid"))
    )
    busy = (
        ev.withColumn("__h", F.expr(f"us DIV {US_PER_HOUR}"))
        .groupBy("__h").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= BUSY_MIN_EVENTS)
        .select(
            F.col("__h").alias("busy_id"),
            (F.col("__h") * US_PER_HOUR).alias("b_start"),
            ((F.col("__h") + 1) * US_PER_HOUR - 1).alias("b_end"),
        )
    )
    out = interval_join(
        sess, "session_id", "s_start", "s_end",
        busy, "busy_id", "b_start", "b_end",
        grain=US_PER_HOUR,
    )
    return out.selectExpr("a_id AS session_id", "b_id AS busy_hour",
                          "overlap_len")


_ORACLE_INTERVAL_OVERLAP = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
), flagged AS (
  SELECT user_id, us, event_id,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id
               ORDER BY us, event_id) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM ev
), sess AS (
  SELECT user_id,
         CAST(sum(new_s) OVER (PARTITION BY user_id
           ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS sid,
         us
  FROM flagged
), bounds AS (
  SELECT user_id * 100000 + sid AS session_id,
         min(us) AS s_start, max(us) AS s_end
  FROM sess GROUP BY user_id, sid
), busy AS (
  SELECT h AS busy_id, h * {US_PER_HOUR} AS b_start,
         (h + 1) * {US_PER_HOUR} - 1 AS b_end
  FROM (SELECT us // {US_PER_HOUR} AS h, count(*) AS n
        FROM ev GROUP BY 1)
  WHERE n >= {BUSY_MIN_EVENTS}
)
SELECT s.session_id, b.busy_id AS busy_hour,
       least(s.s_end, b.b_end) - greatest(s.s_start, b.b_start)
         AS overlap_len
FROM bounds s JOIN busy b
  ON s.s_start <= b.b_end AND b.b_start <= s.s_end
"""


QUERIES: dict = {
    "q_interval_overlap_events": (_q_interval_overlap,
                                  _ORACLE_INTERVAL_OVERLAP),
}

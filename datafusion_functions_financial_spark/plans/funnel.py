"""Funnel conversion + cohort retention over the events stream — the
two product-analytics queries every event warehouse runs daily.

Scale shape (both): one map-side-combined groupBy(user_id) collapses
the event stream to one row per user (min timestamp per funnel step /
first-seen day), then a tiny second aggregation over users. No windows,
no joins on the big side; the user-level intermediate is the only
shuffle and it combines map-side. At 100 TB the events scan dominates
and parallelizes perfectly; skewed users collapse in the partial agg.

Timestamps are epoch-ns BIGINTs end-to-end (the engine's tick-time
model), so day bucketing is exact integer arithmetic on both engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .series import round_portable, round_portable_duck

__all__ = ["funnel_conversion", "cohort_retention"]

NS_DAY = 86_400_000_000_000


def funnel_conversion(events: DataFrame, steps: Sequence[str],
                      type_col: str = "event_type",
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Strictly-ordered funnel: a user converts through step k iff their
    FIRST occurrence of each step is strictly later than the first
    occurrence of the previous step. Returns one row per funnel depth:
    (step_idx, step, n_users).

    One groupBy(user): ``min(ts) FILTER step_i`` per step, then
    conditional counting over the per-user row.
    """
    firsts = events.groupBy(user_col).agg(*[
        F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"t{i}")
        for i, s in enumerate(steps)
    ])
    # reached_k = t0 < t1 < ... < tk (all non-null, strictly increasing)
    reached = []
    cond = F.col("t0").isNotNull()
    reached.append(cond)
    for i in range(1, len(steps)):
        cond = cond & F.col(f"t{i}").isNotNull() & (
            F.col(f"t{i}") > F.col(f"t{i - 1}"))
        reached.append(cond)
    agg = firsts.agg(*[
        F.sum(F.when(c, 1).otherwise(0)).alias(f"n{i}")
        for i, c in enumerate(reached)
    ])
    rows = [
        F.expr(f"named_struct('step_idx', CAST({i} AS BIGINT), "
               f"'step', '{s}', 'n_users', n{i})")
        for i, s in enumerate(steps)
    ]
    return agg.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.step_idx", "r.step", "r.n_users")


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     max_offset_days: int = 14) -> DataFrame:
    """Classic retention triangle: cohort users by first-seen day, then
    count distinct users active at each day offset from their cohort
    day: (cohort_day, day_offset, n_users).

    Two shuffles: user-level first-seen (map-side combined), then the
    (cohort, offset) count-distinct — whose key space is bounded by
    days x offsets, not data size.
    """
    # Integer DIV, not float division: epoch-ns (~1.7e18) exceeds the
    # 2^53 exact range of doubles (same guard as q_events_hourly).
    day = F.expr(f"{ts_col} DIV {NS_DAY}")
    with_day = events.select(F.col(user_col), day.alias("__day"))
    first_day = with_day.groupBy(user_col).agg(
        F.min("__day").alias("cohort_day"))
    activity = with_day.distinct()
    joined = activity.join(first_day, user_col)
    return (
        joined.select(
            user_col, "cohort_day",
            (F.col("__day") - F.col("cohort_day")).alias("day_offset"),
        )
        .filter(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------

_STEPS = ("view", "click", "purchase")
_RETAIN_DAYS = 14


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_conversion(load(spark, sf_dir, "events"), _STEPS)


_ORACLE_FUNNEL = f"""
WITH firsts AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = '{_STEPS[0]}') AS t0,
         min(ts) FILTER (WHERE event_type = '{_STEPS[1]}') AS t1,
         min(ts) FILTER (WHERE event_type = '{_STEPS[2]}') AS t2
  FROM events GROUP BY user_id
), counts AS (
  SELECT
    sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS n0,
    sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
             THEN 1 ELSE 0 END) AS n1,
    sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
              AND t2 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END) AS n2
  FROM firsts
)
SELECT CAST(0 AS BIGINT) AS step_idx, '{_STEPS[0]}' AS step,
       CAST(n0 AS BIGINT) AS n_users FROM counts
UNION ALL
SELECT CAST(1 AS BIGINT), '{_STEPS[1]}', CAST(n1 AS BIGINT) FROM counts
UNION ALL
SELECT CAST(2 AS BIGINT), '{_STEPS[2]}', CAST(n2 AS BIGINT) FROM counts
"""


def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_retention(load(spark, sf_dir, "events"),
                            max_offset_days=_RETAIN_DAYS)


_ORACLE_RETENTION = f"""
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) * 1000 // {NS_DAY} AS BIGINT) AS day
  FROM events
), fd AS (
  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id
)
SELECT fd.cohort_day, d.day - fd.cohort_day AS day_offset,
       count(DISTINCT d.user_id) AS n_users
FROM d JOIN fd USING (user_id)
WHERE d.day - fd.cohort_day <= {_RETAIN_DAYS}
GROUP BY 1, 2
"""

def conversion_latency(events: DataFrame, from_step: str, to_step: str,
                       type_col: str = "event_type",
                       user_col: str = "user_id",
                       ts_col: str = "ts") -> DataFrame:
    """One row: converted-user count and exact median/p90 of the
    first-``from_step`` -> first-``to_step`` latency in seconds.

    Same single groupBy(user) collapse as the funnel; the percentile
    runs over one row per converted user (bounded by user count, not
    event count) with both engines' shared linear interpolation.
    """
    firsts = events.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == from_step, F.col(ts_col)))
        .alias("t_from"),
        F.min(F.when(F.col(type_col) == to_step, F.col(ts_col)))
        .alias("t_to"),
    )
    lat = firsts.filter(
        F.col("t_from").isNotNull() & F.col("t_to").isNotNull()
        & (F.col("t_to") > F.col("t_from"))
    ).select(
        ((F.col("t_to") - F.col("t_from")) / F.lit(1_000_000_000.0))
        .alias("lat_s")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        round_portable(F.expr("percentile(lat_s, 0.5)")).alias("median_s"),
        round_portable(F.expr("percentile(lat_s, 0.9)")).alias("p90_s"),
    )


def _q_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversion_latency(load(spark, sf_dir, "events"),
                              "view", "purchase")


_ORACLE_LATENCY = f"""
WITH firsts AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view') AS t_from,
         min(ts) FILTER (WHERE event_type = 'purchase') AS t_to
  FROM events GROUP BY user_id
), lat AS (
  SELECT epoch_us(t_to - t_from) / 1000000.0 AS lat_s
  FROM firsts
  WHERE t_from IS NOT NULL AND t_to IS NOT NULL AND t_to > t_from
)
SELECT count(*) AS n_converted,
       {round_portable_duck("quantile_cont(lat_s, 0.5)")} AS median_s,
       {round_portable_duck("quantile_cont(lat_s, 0.9)")} AS p90_s
FROM lat
"""

QUERIES: dict = {
    "q_funnel_events": (_q_funnel, _ORACLE_FUNNEL),
    "q_retention_events": (_q_retention, _ORACLE_RETENTION),
    "q_conversion_latency_events": (_q_latency, _ORACLE_LATENCY),
}

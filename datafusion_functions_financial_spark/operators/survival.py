"""Survival analysis: the Kaplan-Meier product-limit estimator over
inter-event durations with right censoring — "how long until a user
acts again", the churn/retention curve done properly (the naive gap
histogram in ``sequences.q_gap_survival`` ignores censoring, so it
underestimates long waits; KM is the standard correction).

Event definition for the gate query: each consecutive same-user event
pair contributes an OBSERVED duration (minutes); each user's final
event contributes a CENSORED duration to the corpus end-of-window.

Determinism: counts are exact integers; the survival product
``prod(1 - d/n_risk)`` folds as an integer-quantized cumulative sum
of log terms (the divergence.py rule) and exponentiates once, with a
carried flag zeroing the curve after any time where the risk set
dies out entirely.

Plan shape at scale: one per-user window pass for the gaps, one hash
aggregate to the per-duration (d, c) table (bounded by distinct
durations — minutes-bucketed), and windows over THAT table only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["kaplan_meier", "nelson_aalen"]

Q = 10 ** 8
QF = float(Q)
US_PER_MIN = 60_000_000


def kaplan_meier(df: DataFrame, us_col: str, subject_col: str,
                 order: list[str]) -> DataFrame:
    """(t_min, n_risk, d, c, survival): the KM curve over
    minutes-bucketed inter-event durations. ``d`` observed events,
    ``c`` right-censored at each time; ``survival`` steps down only
    at observed-event times."""
    oorder = ", ".join(order)
    part = f"PARTITION BY {subject_col} ORDER BY {oorder}"
    # End-of-window as a broadcast scalar, NOT a global window (which
    # would drag every row through one task).
    end = df.agg(F.max(us_col).alias("__end"))
    staged = (
        df.crossJoin(F.broadcast(end))
        .withColumn("__nxt", F.expr(
            f"lead({us_col}) OVER ({part})"))
        .selectExpr(
            f"CASE WHEN __nxt IS NOT NULL "
            f"THEN (__nxt - ({us_col})) DIV {US_PER_MIN} "
            f"ELSE (__end - ({us_col})) DIV {US_PER_MIN} END AS __t",
            "CASE WHEN __nxt IS NOT NULL THEN 1 ELSE 0 END AS __obs",
        )
    )
    table = staged.groupBy("__t").agg(
        F.sum("__obs").cast("bigint").alias("d"),
        F.sum(F.expr("1 - __obs")).cast("bigint").alias("c"),
    )
    w = "ORDER BY __t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    wprev = ("ORDER BY __t ROWS BETWEEN UNBOUNDED PRECEDING "
             "AND 1 PRECEDING")
    curve = (
        table
        .withColumn("__tot", F.expr("sum(d + c) OVER ()"))
        .withColumn("__before", F.expr(
            f"coalesce(sum(d + c) OVER ({wprev}), 0)"))
        .withColumn("n_risk", F.expr(
            "CAST(__tot - __before AS BIGINT)"))
        .withColumn("__lt", F.expr(
            f"CASE WHEN d > 0 AND d < n_risk THEN "
            f"CAST(round(ln(1.0 - CAST(d AS DOUBLE) "
            f"/ CAST(n_risk AS DOUBLE)) * {Q}) AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END"))
        .withColumn("__dead", F.expr(
            f"max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) "
            f"OVER ({w})"))
        .withColumn("__cum", F.expr(f"sum(__lt) OVER ({w})"))
    )
    return curve.select(
        F.col("__t").cast("bigint").alias("t_min"),
        "n_risk", "d", "c",
        round_portable(F.expr(
            f"CASE WHEN __dead = 1 THEN CAST(0 AS DOUBLE) "
            f"ELSE exp(CAST(__cum AS DOUBLE) / {QF!r}) END"), 6
        ).alias("survival"),
    )


def _q_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return kaplan_meier(ev, "__us", "user_id", ["ts", "event_id"])


_W = "ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
_WPREV = "ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"

_ORACLE_KM = f"""
WITH staged AS (
  SELECT
    CASE WHEN nxt IS NOT NULL
      THEN (nxt - us) // {US_PER_MIN}
      ELSE (mend - us) // {US_PER_MIN} END AS t,
    CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS obs
  FROM (
    SELECT epoch_us(ts) AS us,
      lead(epoch_us(ts)) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS nxt,
      (SELECT max(epoch_us(ts)) FROM events) AS mend
    FROM events
  )
), tab AS (
  SELECT t, CAST(sum(obs) AS BIGINT) AS d,
         CAST(sum(1 - obs) AS BIGINT) AS c
  FROM staged GROUP BY 1
), curve AS (
  SELECT t, d, c,
    CAST(CAST(sum(d + c) OVER () AS BIGINT)
      - coalesce(CAST(sum(d + c) OVER ({_WPREV}) AS BIGINT), 0)
      AS BIGINT) AS n_risk
  FROM tab
), terms AS (
  SELECT t, d, c, n_risk,
    CASE WHEN d > 0 AND d < n_risk THEN
      CAST(round(ln(1.0 - CAST(d AS DOUBLE)
        / CAST(n_risk AS DOUBLE)) * {Q}) AS BIGINT)
      ELSE CAST(0 AS BIGINT) END AS lt,
    max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER ({_W}) AS dead
  FROM curve
)
SELECT CAST(t AS BIGINT) AS t_min, n_risk, d, c,
  {round_portable_duck(
      f"CASE WHEN dead = 1 THEN CAST(0 AS DOUBLE) "
      f"ELSE exp(CAST(CAST(sum(lt) OVER ({_W}) AS BIGINT) AS DOUBLE) "
      f"/ {QF!r}) END", 6)} AS survival
FROM terms
"""


def nelson_aalen(df: DataFrame, us_col: str, subject_col: str,
                 order: list[str]) -> DataFrame:
    """(t_min, n_risk, d, c, cum_hazard, hazard_var): the Nelson-Aalen
    cumulative-hazard estimator over the same minutes-bucketed
    risk-set relation as :func:`kaplan_meier` — ``H(t) = sum d_i /
    n_i`` with the Poisson-type variance ``sum d_i / n_i^2``. KM's
    log-product becomes a plain cumulative sum, so each term
    quantizes to BIGINT and the cumulative fold is exact under any
    partial-agg schedule."""
    oorder = ", ".join(order)
    part = f"PARTITION BY {subject_col} ORDER BY {oorder}"
    end = df.agg(F.max(us_col).alias("__end"))
    staged = (
        df.crossJoin(F.broadcast(end))
        .withColumn("__nxt", F.expr(
            f"lead({us_col}) OVER ({part})"))
        .selectExpr(
            f"CASE WHEN __nxt IS NOT NULL "
            f"THEN (__nxt - ({us_col})) DIV {US_PER_MIN} "
            f"ELSE (__end - ({us_col})) DIV {US_PER_MIN} END AS __t",
            "CASE WHEN __nxt IS NOT NULL THEN 1 ELSE 0 END AS __obs",
        )
    )
    table = staged.groupBy("__t").agg(
        F.sum("__obs").cast("bigint").alias("d"),
        F.sum(F.expr("1 - __obs")).cast("bigint").alias("c"),
    )
    w = "ORDER BY __t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    wprev = ("ORDER BY __t ROWS BETWEEN UNBOUNDED PRECEDING "
             "AND 1 PRECEDING")
    curve = (
        table
        .withColumn("__tot", F.expr("sum(d + c) OVER ()"))
        .withColumn("__before", F.expr(
            f"coalesce(sum(d + c) OVER ({wprev}), 0)"))
        .withColumn("n_risk", F.expr(
            "CAST(__tot - __before AS BIGINT)"))
        .withColumn("__ht", F.expr(
            f"CASE WHEN d > 0 THEN CAST(round(CAST(d AS DOUBLE) "
            f"/ CAST(n_risk AS DOUBLE) * {Q}) AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END"))
        .withColumn("__vt", F.expr(
            f"CASE WHEN d > 0 THEN CAST(round(CAST(d AS DOUBLE) "
            f"/ (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)) "
            f"* {Q}) AS BIGINT) ELSE CAST(0 AS BIGINT) END"))
    )
    return curve.select(
        F.col("__t").cast("bigint").alias("t_min"),
        "n_risk", "d", "c",
        round_portable(F.expr(
            f"CAST(sum(__ht) OVER ({w}) AS DOUBLE) / {QF!r}"), 6
        ).alias("cum_hazard"),
        round_portable(F.expr(
            f"CAST(sum(__vt) OVER ({w}) AS DOUBLE) / {QF!r}"), 6
        ).alias("hazard_var"),
    )


def _q_na(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return nelson_aalen(ev, "__us", "user_id", ["ts", "event_id"])


_ORACLE_NA = f"""
WITH staged AS (
  SELECT
    CASE WHEN nxt IS NOT NULL
      THEN (nxt - us) // {US_PER_MIN}
      ELSE (mend - us) // {US_PER_MIN} END AS t,
    CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS obs
  FROM (
    SELECT epoch_us(ts) AS us,
      lead(epoch_us(ts)) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS nxt,
      (SELECT max(epoch_us(ts)) FROM events) AS mend
    FROM events
  )
), tab AS (
  SELECT t, CAST(sum(obs) AS BIGINT) AS d,
         CAST(sum(1 - obs) AS BIGINT) AS c
  FROM staged GROUP BY 1
), curve AS (
  SELECT t, d, c,
    CAST(CAST(sum(d + c) OVER () AS BIGINT)
      - coalesce(CAST(sum(d + c) OVER ({_WPREV}) AS BIGINT), 0)
      AS BIGINT) AS n_risk
  FROM tab
), terms AS (
  SELECT t, d, c, n_risk,
    CASE WHEN d > 0 THEN
      CAST(round(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) * {Q})
        AS BIGINT) ELSE CAST(0 AS BIGINT) END AS ht,
    CASE WHEN d > 0 THEN
      CAST(round(CAST(d AS DOUBLE)
        / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)) * {Q})
        AS BIGINT) ELSE CAST(0 AS BIGINT) END AS vt
  FROM curve
)
SELECT CAST(t AS BIGINT) AS t_min, n_risk, d, c,
  {round_portable_duck(
      f"CAST(CAST(sum(ht) OVER ({_W}) AS BIGINT) AS DOUBLE) "
      f"/ {QF!r}", 6)} AS cum_hazard,
  {round_portable_duck(
      f"CAST(CAST(sum(vt) OVER ({_W}) AS BIGINT) AS DOUBLE) "
      f"/ {QF!r}", 6)} AS hazard_var
FROM terms
"""


QUERIES: dict = {
    "q_kaplan_meier_events": (_q_km, _ORACLE_KM),
    "q_nelson_aalen_events": (_q_na, _ORACLE_NA),
}

"""Survival analysis #2: the two-group log-rank test — the
significance companion to the gated Kaplan-Meier / Nelson-Aalen
curves (``survival.py``): the curves SHOW two cohorts' survival; the
log-rank statistic says whether they differ beyond chance (Mantel,
1966) — the standard A/B readout for time-to-event metrics
(churn, conversion latency) at any scale.

Staging mirrors ``kaplan_meier``: every consecutive same-subject
event pair contributes an OBSERVED minutes-bucketed duration, each
subject's final event a CENSORED one; the group comes from the
subject key. At each duration t with observed events:

  O1 += d1(t);  E1 += d(t) * n1(t)/n(t)
  V  += d(t) * (n1/n) * (1 - n1/n) * (n - d)/(n - 1)

with n_j(t) = at-risk counts (suffix sums over the bounded duration
table). z = (O1 - E1) / sqrt(V).

Engine-exactness: the (t, group, d, c) table is exact integer
counting; at-risk suffix sums are BIGINT window sums over THAT
bounded table (distinct minutes x 2 rows — the survival.py
convention: windows never touch raw rows); E1 and V terms quantize
to BIGINT at 1e8 before their folds.

Plan shape at 100 TB: one shuffle by subject for the LEAD window,
one hash aggregate to the duration table; everything after operates
on the bounded relation.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (survival tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["logrank_test"]

Q = 10 ** 8
QF = float(Q)
US_PER_MIN = 60_000_000


def logrank_test(df: DataFrame, us_col: str, subject_col: str,
                 order: list[str], group_expr: str) -> DataFrame:
    """One row (n1, n2, o1, e1, var_lr, z_logrank): the log-rank test
    between the two groups ``group_expr`` yields (0 or 1; group 1 is
    the one scored)."""
    w = Window.partitionBy(subject_col).orderBy(*order)
    end = df.agg(F.max(F.expr(us_col)).alias("__end"))
    staged = (
        df.withColumn("__nxt", F.lead(F.expr(us_col)).over(w))
        .crossJoin(F.broadcast(end))
        .selectExpr(
            f"CASE WHEN __nxt IS NOT NULL "
            f"THEN (__nxt - ({us_col})) DIV {US_PER_MIN} "
            f"ELSE (__end - ({us_col})) DIV {US_PER_MIN} END AS __t",
            "CASE WHEN __nxt IS NOT NULL THEN 1 ELSE 0 END AS __obs",
            f"CAST(({group_expr}) AS INT) AS __g1",
        )
    )
    tab = (
        staged.groupBy("__t")
        .agg(
            F.sum(F.expr("CASE WHEN __g1 = 1 THEN __obs ELSE 0 "
                         "END")).cast("bigint").alias("__d1"),
            F.sum("__obs").cast("bigint").alias("__d"),
            F.sum(F.expr("CASE WHEN __g1 = 1 THEN 1 ELSE 0 END"))
            .cast("bigint").alias("__e1cnt"),
            F.count(F.lit(1)).cast("bigint").alias("__ecnt"),
        )
    )
    # at-risk = suffix sums of (entries at duration >= t)
    sw = (Window.orderBy(F.col("__t").desc())
          .rowsBetween(Window.unboundedPreceding, 0))
    risk = (
        tab.withColumn("__n1", F.sum("__e1cnt").over(sw)
                       .cast("bigint"))
        .withColumn("__n", F.sum("__ecnt").over(sw).cast("bigint"))
        .filter("__d > 0 AND __n > 1")
    )
    p1 = "(CAST(__n1 AS DOUBLE) / CAST(__n AS DOUBLE))"
    e1 = f"(CAST(__d AS DOUBLE) * {p1})"
    v = (f"(CAST(__d AS DOUBLE) * {p1} * (1.0 - {p1}) "
         f"* CAST(__n - __d AS DOUBLE) / CAST(__n - 1 AS DOUBLE))")
    red = risk.agg(
        F.sum("__d1").cast("bigint").alias("o1"),
        F.sum(F.expr(
            f"CAST(round(({e1}) * {Q}) AS BIGINT)")).alias("__e1q"),
        F.sum(F.expr(
            f"CAST(round(({v}) * {Q}) AS BIGINT)")).alias("__vq"),
    )
    sizes = staged.agg(
        F.sum(F.expr("CASE WHEN __g1 = 1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n1"),
        F.sum(F.expr("CASE WHEN __g1 = 1 THEN 0 ELSE 1 END"))
        .cast("bigint").alias("n2"),
    )
    e1d = f"(CAST(__e1q AS DOUBLE) / {QF!r})"
    vd = f"(CAST(__vq AS DOUBLE) / {QF!r})"
    return red.crossJoin(F.broadcast(sizes)).select(
        "n1", "n2", "o1",
        round_portable(F.expr(e1d), 6).alias("e1"),
        round_portable(F.expr(vd), 6).alias("var_lr"),
        round_portable(F.expr(
            f"CASE WHEN {vd} > 0.0 THEN "
            f"(CAST(o1 AS DOUBLE) - {e1d}) / sqrt({vd}) "
            f"ELSE 0.0 END"), 6).alias("z_logrank"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (groups: user_id parity)
# --------------------------------------------------------------------------


def _q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return logrank_test(ev, "__us", "user_id", ["ts", "event_id"],
                        "user_id % 2 = 1")


_D_P1 = "(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))"
_D_E1 = f"(CAST(d AS DOUBLE) * {_D_P1})"
_D_V = (f"(CAST(d AS DOUBLE) * {_D_P1} * (1.0 - {_D_P1}) "
        f"* CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE))")
_D_E1D = f"(CAST(e1q AS DOUBLE) / {QF!r})"
_D_VD = f"(CAST(vq AS DOUBLE) / {QF!r})"

_ORACLE_LOGRANK = f"""
WITH staged AS (
  SELECT
    CASE WHEN nxt IS NOT NULL
      THEN (nxt - us) // {US_PER_MIN}
      ELSE (mend - us) // {US_PER_MIN} END AS t,
    CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS obs,
    CAST(user_id % 2 = 1 AS INT) AS g1
  FROM (
    SELECT user_id, epoch_us(ts) AS us,
      lead(epoch_us(ts)) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS nxt,
      (SELECT max(epoch_us(ts)) FROM events) AS mend
    FROM events
  )
), tab AS (
  SELECT t,
    CAST(sum(CASE WHEN g1 = 1 THEN obs ELSE 0 END) AS BIGINT) AS d1,
    CAST(sum(obs) AS BIGINT) AS d,
    CAST(sum(CASE WHEN g1 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS e1cnt,
    CAST(count(*) AS BIGINT) AS ecnt
  FROM staged GROUP BY 1
), risk AS (
  SELECT t, d1, d,
    CAST(sum(e1cnt) OVER (ORDER BY t DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS n1,
    CAST(sum(ecnt) OVER (ORDER BY t DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS n
  FROM tab
), red AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1,
    CAST(sum(CAST(round(({_D_E1}) * {Q}) AS BIGINT)) AS BIGINT)
      AS e1q,
    CAST(sum(CAST(round(({_D_V}) * {Q}) AS BIGINT)) AS BIGINT)
      AS vq
  FROM risk WHERE d > 0 AND n > 1
), sizes AS (
  SELECT
    CAST(sum(CASE WHEN g1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN g1 = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n2
  FROM staged
)
SELECT sizes.n1, sizes.n2, red.o1,
  {round_portable_duck(_D_E1D, 6)} AS e1,
  {round_portable_duck(_D_VD, 6)} AS var_lr,
  {round_portable_duck(
      f"CASE WHEN {_D_VD} > 0.0 THEN "
      f"(CAST(red.o1 AS DOUBLE) - {_D_E1D}) / sqrt({_D_VD}) "
      f"ELSE 0.0 END", 6)} AS z_logrank
FROM red, sizes
"""


QUERIES: dict = {
    "q_logrank_events": (_q_logrank, _ORACLE_LOGRANK),
}

"""Survival tier #4: restricted mean survival time — "how many
minutes of the first tau does a subject survive, on average?" — the
single-number summary of the gated Kaplan-Meier curve that stays
well-defined under censoring (the plain mean does not) and compares
across cohorts without proportional-hazards assumptions: RMST(tau)
is the area under the KM curve up to tau.

Computed directly ON the gated curve relation (``kaplan_meier``
reused verbatim, so this oracle embeds the gated KM oracle as a CTE
and the two can never drift): each curve row carries its survival
level across the interval to the next event time, clipped at tau,
plus the leading [0, t_1) interval at S = 1.

Engine-exactness: interval lengths are exact integer minutes; each
S * length term quantizes to BIGINT at 1e8 before the sum.

Plan shape at 100 TB: the KM reduction's documented shape plus one
window and one reduction over the bounded curve relation.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (survival tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .survival import _ORACLE_KM, kaplan_meier

__all__ = ["rmst"]

Q = 10 ** 8
QF = float(Q)
TAU_MIN = 60


def rmst(df: DataFrame, us_col: str, subject_col: str,
         order: list[str], tau_min: int = TAU_MIN) -> DataFrame:
    """One row (tau_min, n_times, rmst_min): the restricted mean
    survival time (minutes) up to ``tau_min`` over the gated KM
    curve (intervals past tau contribute nothing; the tail beyond
    the last event time carries the final survival level)."""
    curve = kaplan_meier(df, us_col, subject_col, order)
    w = Window.partitionBy().orderBy("t_min")
    iv = curve.withColumn("__nxt", F.lead("t_min").over(w))
    # interval [t_i, min(t_{i+1}, tau)) carries S(t_i); the leading
    # [0, t_1) interval carries S = 1; the final interval runs to tau
    seg = (f"greatest(least(CAST(coalesce(__nxt, tau) AS DOUBLE), "
           f"CAST(tau AS DOUBLE)) "
           f"- least(CAST(t_min AS DOUBLE), CAST(tau AS DOUBLE)), "
           f"0.0)")
    staged = iv.withColumn("tau", F.lit(tau_min).cast("bigint"))
    first_rel = staged.agg(
        F.min("t_min").alias("__t1"),
        F.max("tau").alias("__tau"))
    head = first_rel.select(F.expr(
        f"CAST(round(least(CAST(__t1 AS DOUBLE), "
        f"CAST(__tau AS DOUBLE)) * 1.0 * {Q}) AS BIGINT)")
        .alias("__hq"))
    red = staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_times"),
        F.sum(F.expr(
            f"CAST(round(survival * ({seg}) * {Q}) AS BIGINT)"))
        .alias("__sq"))
    return (
        red.crossJoin(F.broadcast(head))
        .select(
            F.lit(tau_min).cast("bigint").alias("tau_min"),
            "n_times",
            round_portable(F.expr(
                f"(CAST(__hq AS DOUBLE) + CAST(__sq AS DOUBLE)) "
                f"/ {QF!r}"), 6).alias("rmst_min"),
        )
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (the gated KM staging, embedded)
# --------------------------------------------------------------------------


def _q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return rmst(ev, "__us", "user_id", ["ts", "event_id"])


_SEG_DUCK = (f"greatest(least(CAST(coalesce(nxt, {TAU_MIN}) "
             f"AS DOUBLE), CAST({TAU_MIN} AS DOUBLE)) "
             f"- least(CAST(t_min AS DOUBLE), "
             f"CAST({TAU_MIN} AS DOUBLE)), 0.0)")

_ORACLE_RMST = f"""
WITH km AS ({_ORACLE_KM}
), iv AS (
  SELECT t_min, survival,
    lead(t_min) OVER (ORDER BY t_min) AS nxt
  FROM km
), head AS (
  SELECT CAST(round(least(CAST(min(t_min) AS DOUBLE),
    CAST({TAU_MIN} AS DOUBLE)) * 1.0 * {Q}) AS BIGINT) AS hq
  FROM iv
), red AS (
  SELECT CAST(count(*) AS BIGINT) AS n_times,
    CAST(sum(CAST(round(survival * ({_SEG_DUCK}) * {Q}) AS BIGINT))
      AS BIGINT) AS sq
  FROM iv
)
SELECT CAST({TAU_MIN} AS BIGINT) AS tau_min, n_times,
  {round_portable_duck(
      f"(CAST(hq AS DOUBLE) + CAST(sq AS DOUBLE)) / {QF!r}", 6)}
    AS rmst_min
FROM red, head
"""


QUERIES: dict = {
    "q_rmst_events": (_q_rmst, _ORACLE_RMST),
}

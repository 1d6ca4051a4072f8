"""Experimentation #2: the difference-in-differences estimator —
the quasi-experimental companion to the gated A/B tier (two-
proportion z, CUPED, SRM, jackknife ratio SE): when assignment
isn't randomized but a before/after boundary exists, DiD removes
both the group's level difference and the common time trend:

  DiD = (ybar_t,post - ybar_t,pre) - (ybar_c,post - ybar_c,pre)

with the unpooled (Welch-style) standard error
sqrt(sum over the 4 cells of s^2/n).

Engine-exactness: cell sums are exact BIGINT cents; cell variances
combine the exact (sum c, sum c^2, n) moments in DOUBLE with
one-factor casts — both engines difference the SAME exact integers,
so the catastrophic-cancellation risk of the one-pass variance is
deterministic, not a divergence source. One pass, map-side
combinable, no windows.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (experimentation tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["diff_in_diff"]


def diff_in_diff(df: DataFrame, treat_expr: str, post_expr: str,
                 value_expr: str) -> DataFrame:
    """One row (n_tpre, n_tpost, n_cpre, n_cpost, mean_tpre,
    mean_tpost, mean_cpre, mean_cpost, did, se, t_stat)."""
    rows = df.select(
        F.expr(f"CAST(({treat_expr}) AS INT)").alias("__tr"),
        F.expr(f"CAST(({post_expr}) AS INT)").alias("__po"),
        F.expr(f"CAST(round(({value_expr}) * 100) AS BIGINT)")
        .alias("__c"),
    ).filter("__c IS NOT NULL AND __tr IS NOT NULL "
             "AND __po IS NOT NULL")

    def cell(t, p, name):
        cond = f"__tr = {t} AND __po = {p}"
        return [
            F.sum(F.expr(f"CASE WHEN {cond} THEN 1 ELSE 0 END"))
            .cast("bigint").alias(f"n_{name}"),
            F.sum(F.expr(f"CASE WHEN {cond} THEN __c ELSE 0 END"))
            .cast("bigint").alias(f"__s_{name}"),
            F.sum(F.expr(f"CASE WHEN {cond} THEN __c * __c "
                         f"ELSE 0 END"))
            .cast("bigint").alias(f"__s2_{name}"),
        ]

    aggs = (cell(1, 0, "tpre") + cell(1, 1, "tpost")
            + cell(0, 0, "cpre") + cell(0, 1, "cpost"))
    red = rows.agg(*aggs)

    def mean(name):
        return (f"(CAST(__s_{name} AS DOUBLE) / 100.0 "
                f"/ CAST(n_{name} AS DOUBLE))")

    def var_over_n(name):
        # s^2/n in dollars^2: ((sum c^2) - (sum c)^2/n) / (n-1) / n
        # / 100^2, one-factor DOUBLE casts
        return (
            f"((CAST(__s2_{name} AS DOUBLE) "
            f"- CAST(__s_{name} AS DOUBLE) "
            f"* CAST(__s_{name} AS DOUBLE) "
            f"/ CAST(n_{name} AS DOUBLE)) "
            f"/ CAST(n_{name} - 1 AS DOUBLE) "
            f"/ CAST(n_{name} AS DOUBLE) / 10000.0)"
        )

    did = (f"(({mean('tpost')} - {mean('tpre')}) "
           f"- ({mean('cpost')} - {mean('cpre')}))")
    se = ("sqrt(" + " + ".join(
        var_over_n(n) for n in ("tpre", "tpost", "cpre", "cpost"))
        + ")")
    return red.select(
        "n_tpre", "n_tpost", "n_cpre", "n_cpost",
        *[round_portable(F.expr(mean(n)), 6).alias(f"mean_{n}")
          for n in ("tpre", "tpost", "cpre", "cpost")],
        round_portable(F.expr(did), 6).alias("did"),
        round_portable(F.expr(se), 6).alias("se"),
        round_portable(F.expr(f"({did}) / ({se})"), 6)
        .alias("t_stat"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (treatment: user parity; post: second
# half of the event window — ts is ns-BIGINT on Spark, us-TIMESTAMP
# in DuckDB, so the midpoint condition is mirrored via epoch_us)
# --------------------------------------------------------------------------


def _q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(F.expr(
        "(min(ts DIV 1000) + max(ts DIV 1000)) DIV 2").alias("__mid"))
    ev2 = ev.crossJoin(F.broadcast(mid))
    return diff_in_diff(ev2, "user_id % 2 = 1",
                        "(ts DIV 1000) >= __mid", "value")


def _d_cell(t, p, name):
    cond = f"tr = {t} AND po = {p}"
    return (
        f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_{name},\n"
        f"    CAST(sum(CASE WHEN {cond} THEN c ELSE 0 END) "
        f"AS BIGINT) AS s_{name},\n"
        f"    CAST(sum(CASE WHEN {cond} THEN c * c ELSE 0 END) "
        f"AS BIGINT) AS s2_{name}"
    )


def _d_mean(name):
    return (f"(CAST(s_{name} AS DOUBLE) / 100.0 "
            f"/ CAST(n_{name} AS DOUBLE))")


def _d_von(name):
    return (
        f"((CAST(s2_{name} AS DOUBLE) - CAST(s_{name} AS DOUBLE) "
        f"* CAST(s_{name} AS DOUBLE) / CAST(n_{name} AS DOUBLE)) "
        f"/ CAST(n_{name} - 1 AS DOUBLE) "
        f"/ CAST(n_{name} AS DOUBLE) / 10000.0)"
    )


_D_DID = (f"(({_d_mean('tpost')} - {_d_mean('tpre')}) "
          f"- ({_d_mean('cpost')} - {_d_mean('cpre')}))")
_D_SE = ("sqrt(" + " + ".join(
    _d_von(n) for n in ("tpre", "tpost", "cpre", "cpost")) + ")")

_ORACLE_DID = f"""
WITH mid AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
  FROM events
), rows_l AS (
  SELECT CAST(user_id % 2 = 1 AS INT) AS tr,
    CAST(epoch_us(ts) >= mid.m AS INT) AS po,
    CAST(round(value * 100) AS BIGINT) AS c
  FROM events, mid
  WHERE value IS NOT NULL
), red AS (
  SELECT
    {_d_cell(1, 0, "tpre")},
    {_d_cell(1, 1, "tpost")},
    {_d_cell(0, 0, "cpre")},
    {_d_cell(0, 1, "cpost")}
  FROM rows_l
)
SELECT n_tpre, n_tpost, n_cpre, n_cpost,
  {round_portable_duck(_d_mean("tpre"), 6)} AS mean_tpre,
  {round_portable_duck(_d_mean("tpost"), 6)} AS mean_tpost,
  {round_portable_duck(_d_mean("cpre"), 6)} AS mean_cpre,
  {round_portable_duck(_d_mean("cpost"), 6)} AS mean_cpost,
  {round_portable_duck(_D_DID, 6)} AS did,
  {round_portable_duck(_D_SE, 6)} AS se,
  {round_portable_duck(f"({_D_DID}) / ({_D_SE})", 6)} AS t_stat
FROM red
"""


QUERIES: dict = {
    "q_did_events": (_q_did, _ORACLE_DID),
}

"""Robust two-sample tier #21: Yuen's trimmed-means t-test — the
outlier-resistant companion to the gated Welch t: a single wild
value moves the Welch statistic arbitrarily, while Yuen compares
20%-trimmed means with winsorized variances (the standard robust
location test; Yuen 1974). Computed WITHOUT any per-row sort: all
rank arithmetic runs on the per-group DISTINCT-VALUE cumulative
relation — the stats2 midrank machinery pointed at trim cuts.

Per group (n, k = n/5, keep ranks k+1..n-k, h = n - 2k):
- trimmed sum: each distinct value contributes
  max(0, min(cum, n-k) - max(cum - cnt, k)) copies;
- winsorized moments add k copies of the cut values x_(k+1) and
  x_(n-k) (the min values whose cumulative count reaches k+1 and
  n-k);
- t = (tm_a - tm_b) / sqrt(d_a + d_b),
  d = s_w^2 (n-1) / (h (h-1)) with the winsorized variance s_w^2.

Engine-exactness: every count, rank cut, and cents sum is an exact
integer; squares stay inside int64 on the events cents scale; one
final double expression.

Plan shape at 100 TB: one distinct-value hash aggregate per group
(map-side combinable), one bounded cumulative window over distinct
values, one k-row reduction.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["yuen_ttest"]

TRIM_DEN = 5  # 20% trim per tail


def yuen_ttest(df: DataFrame, value_col: str, group_expr: str,
               group_a: str, group_b: str) -> DataFrame:
    """One row (n_a, n_b, h_a, h_b, tmean_a, tmean_b, t_yuen):
    Yuen's 20%-trimmed two-sample t statistic (NULL when either
    winsorized variance degenerates or h <= 1)."""
    cents = f"CAST(round(({value_col}) * 100) AS BIGINT)"
    flt = df.selectExpr(f"({group_expr}) AS __g",
                        f"{cents} AS __c").filter(
        F.col("__g").isin([group_a, group_b])
        & F.col("__c").isNotNull())
    vals = flt.groupBy("__g", "__c").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    wg = (Window.partitionBy("__g").orderBy("__c")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = vals.withColumn("__cum", F.sum("__cnt").over(wg))
    tot = vals.groupBy("__g").agg(
        F.sum("__cnt").cast("bigint").alias("__n")).withColumn(
        "__k", F.expr(f"__n DIV {TRIM_DEN}"))
    j = cum.join(F.broadcast(tot), "__g")
    cin = ("greatest(least(__cum, __n - __k) "
           "- greatest(__cum - __cnt, __k), 0)")
    per = j.groupBy("__g").agg(
        F.max("__n").alias("__n"), F.max("__k").alias("__k"),
        F.sum(F.expr(cin)).cast("bigint").alias("__h"),
        F.sum(F.expr(f"({cin}) * __c")).cast("bigint").alias("__ts"),
        F.sum(F.expr(f"({cin}) * __c * __c")).cast("bigint")
        .alias("__tss"),
        F.min(F.expr(
            "CASE WHEN __cum >= __k + 1 THEN __c END"))
        .cast("bigint").alias("__xlo"),
        F.min(F.expr(
            "CASE WHEN __cum >= __n - __k THEN __c END"))
        .cast("bigint").alias("__xhi"),
    )
    ws = "(__ts + __k * __xlo + __k * __xhi)"
    wss = "(__tss + __k * __xlo * __xlo + __k * __xhi * __xhi)"
    nd, hd = "CAST(__n AS DOUBLE)", "CAST(__h AS DOUBLE)"
    sw2 = (f"((CAST({wss} AS DOUBLE) - CAST({ws} AS DOUBLE) "
           f"* CAST({ws} AS DOUBLE) / {nd}) / ({nd} - 1.0) "
           f"/ 10000.0)")
    d = f"({sw2} * ({nd} - 1.0) / ({hd} * ({hd} - 1.0)))"
    tm = f"(CAST(__ts AS DOUBLE) / 100.0 / {hd})"
    sel = per.select(
        "__g", "__n", "__h",
        F.expr(f"CASE WHEN __h >= 2 THEN {tm} END").alias("__tm"),
        F.expr(f"CASE WHEN __h >= 2 THEN {d} END").alias("__d"))
    a = sel.filter(F.col("__g") == group_a).selectExpr(
        "__n AS n_a", "__h AS h_a", "__tm AS __tma", "__d AS __da")
    b = sel.filter(F.col("__g") == group_b).selectExpr(
        "__n AS n_b", "__h AS h_b", "__tm AS __tmb", "__d AS __db")
    return a.crossJoin(F.broadcast(b)).select(
        "n_a", "n_b", "h_a", "h_b",
        round_portable(F.col("__tma"), 6).alias("tmean_a"),
        round_portable(F.col("__tmb"), 6).alias("tmean_b"),
        round_portable(F.expr(
            "CASE WHEN __da IS NOT NULL AND __db IS NOT NULL "
            "AND __da + __db > 0.0 THEN (__tma - __tmb) "
            "/ sqrt(__da + __db) END"), 6).alias("t_yuen"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (events: click vs view values)
# --------------------------------------------------------------------------


def _q_yuen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return yuen_ttest(load(spark, sf_dir, "events"), "value",
                      "event_type", "click", "view")


_D_CIN_Q = ("greatest(least(cum.cum, tot.n - tot.k) "
            "- greatest(cum.cum - cum.cnt, tot.k), 0)")
_D_WS = "(ts + k * xlo + k * xhi)"
_D_WSS = "(tss + k * xlo * xlo + k * xhi * xhi)"
_D_ND, _D_HD = "CAST(n AS DOUBLE)", "CAST(h AS DOUBLE)"
_D_SW2 = (f"((CAST({_D_WSS} AS DOUBLE) - CAST({_D_WS} AS DOUBLE) "
          f"* CAST({_D_WS} AS DOUBLE) / {_D_ND}) / ({_D_ND} - 1.0) "
          f"/ 10000.0)")
_D_D = (f"({_D_SW2} * ({_D_ND} - 1.0) "
        f"/ ({_D_HD} * ({_D_HD} - 1.0)))")
_D_TM = f"(CAST(ts AS DOUBLE) / 100.0 / {_D_HD})"

_ORACLE_YUEN = f"""
WITH flt AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
), vals AS (
  SELECT g, c, CAST(count(*) AS BIGINT) AS cnt FROM flt GROUP BY 1, 2
), cum AS (
  SELECT g, c, cnt,
    CAST(sum(cnt) OVER (PARTITION BY g ORDER BY c
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum
  FROM vals
), tot AS (
  SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
    CAST(sum(cnt) AS BIGINT) // {TRIM_DEN} AS k
  FROM vals GROUP BY 1
), per AS (
  SELECT cum.g, CAST(max(tot.n) AS BIGINT) AS n,
    CAST(max(tot.k) AS BIGINT) AS k,
    CAST(sum({_D_CIN_Q}) AS BIGINT) AS h,
    CAST(sum(({_D_CIN_Q}) * cum.c) AS BIGINT) AS ts,
    CAST(sum(({_D_CIN_Q}) * cum.c * cum.c) AS BIGINT) AS tss,
    CAST(min(CASE WHEN cum.cum >= tot.k + 1 THEN cum.c END)
      AS BIGINT) AS xlo,
    CAST(min(CASE WHEN cum.cum >= tot.n - tot.k THEN cum.c END)
      AS BIGINT) AS xhi
  FROM cum JOIN tot ON cum.g = tot.g
  GROUP BY 1
), sel AS (
  SELECT g, n, h,
    CASE WHEN h >= 2 THEN {_D_TM} END AS tm,
    CASE WHEN h >= 2 THEN {_D_D} END AS d
  FROM per
)
SELECT a.n AS n_a, b.n AS n_b, a.h AS h_a, b.h AS h_b,
  {round_portable_duck("a.tm", 6)} AS tmean_a,
  {round_portable_duck("b.tm", 6)} AS tmean_b,
  {round_portable_duck(
      "CASE WHEN a.d IS NOT NULL AND b.d IS NOT NULL "
      "AND a.d + b.d > 0.0 THEN (a.tm - b.tm) "
      "/ sqrt(a.d + b.d) END", 6)} AS t_yuen
FROM sel a, sel b
WHERE a.g = 'click' AND b.g = 'view'
"""


QUERIES: dict = {
    "q_yuen_ttest_events": (_q_yuen, _ORACLE_YUEN),
}

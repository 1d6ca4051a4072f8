"""Regression diagnostics + a robust location test #10: the two
classic OLS residual screens (Breusch-Pagan heteroscedasticity,
Durbin-Watson serial correlation) over the per-key daily-mean trend
fit, and Mood's median test (the outlier-proof k-group location
screen — counts above/below the EXACT global median).

Builds on proven pieces: the daily-mean + OLS construction is
``robustfit.ols_trend_daily``'s (same quantized moment sums, so the
fitted line is bit-identical on both engines), and the exact median
comes from ``quantile2.distributed_median``'s iterated histogram
narrowing for the Spark side with ``quantile_cont`` on the oracle.

Engine-exactness: residuals are one double expression of
BIGINT-derived slope/intercept (identical bits); every cross-row
residual term (e^2, x*e^2, e^4, successive differences) quantizes to
BIGINT per row before its sum; Mood's chi-square is integer counts
into the stats2 quantized-cell-term reduction.

Plan shape at 100 TB: daily aggregation is one map-side-combinable
shuffle; the per-key day series are bounded partitions (days per
key), so the lag window never sees raw rows; Mood's is one median
(histogram passes) + one hash aggregate.

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .robustfit import US_PER_DAY, _daily_means

__all__ = ["breusch_pagan_daily", "durbin_watson_daily",
           "mood_median_test"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)
Q4 = 10 ** 4
Q4F = float(Q4)


def _with_residuals(df: DataFrame, value_col: str, key: str,
                    us_col: str) -> DataFrame:
    """(key, x, resid): daily-mean series with OLS residuals from the
    per-key trend fit — the robustfit construction, kept inline so
    the residual expression is visible to both engines verbatim."""
    daily = _daily_means(df, value_col, key, us_col)
    w = Window.partitionBy(key).orderBy("__d")
    t = daily.withColumn(
        "__x", (F.row_number().over(w) - F.lit(1)).cast("bigint"))
    agg = t.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum(F.expr("__x * __x")).alias("__sxx"),
        F.sum(F.expr(f"CAST(round(__m * {Q}) AS BIGINT)")).alias("__sy"),
        F.sum(F.expr(f"CAST(round(__m * {Q}) AS BIGINT) * __x"))
        .alias("__sxy"),
    )
    nn = "CAST(__n AS DOUBLE)"
    sx = "CAST(__sx AS DOUBLE)"
    sxx = "CAST(__sxx AS DOUBLE)"
    sy = f"(CAST(__sy AS DOUBLE) / {QF!r})"
    sxy = f"(CAST(__sxy AS DOUBLE) / {QF!r})"
    slope = (f"(({nn} * {sxy} - {sx} * {sy}) "
             f"/ ({nn} * {sxx} - {sx} * {sx}))")
    intercept = f"(({sy} - {slope} * {sx}) / {nn})"
    fit = agg.select(key, F.expr(slope).alias("__b"),
                     F.expr(intercept).alias("__a"))
    return (
        t.join(fit, key)
        .withColumn("__e", F.expr(
            "__m - (__a + __b * CAST(__x AS DOUBLE))"))
        .select(key, "__x", "__e")
    )


def breusch_pagan_daily(df: DataFrame, value_col: str, key: str,
                        us_col: str) -> DataFrame:
    """(key, n_days, bp_lm): the Breusch-Pagan LM statistic
    n * R^2 of the auxiliary regression e^2 ~ day index, per key. A
    large value flags heteroscedastic residual variance over time."""
    r = _with_residuals(df, value_col, key, us_col)
    agg = r.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("__x").alias("__sx"),
        F.sum(F.expr("__x * __x")).alias("__sxx"),
        F.sum(F.expr(f"CAST(round(__e * __e * {Q2}) AS BIGINT)"))
        .alias("__sz"),
        F.sum(F.expr(
            f"CAST(round(CAST(__x AS DOUBLE) * __e * __e * {Q2}) "
            f"AS BIGINT)")).alias("__sxz"),
        F.sum(F.expr(
            f"CAST(round(__e * __e * __e * __e * {Q4}) AS BIGINT)"))
        .alias("__szz"),
    )
    nn = "CAST(n_days AS DOUBLE)"
    sx = "CAST(__sx AS DOUBLE)"
    sxx = "CAST(__sxx AS DOUBLE)"
    sz = f"(CAST(__sz AS DOUBLE) / {Q2F!r})"
    sxz = f"(CAST(__sxz AS DOUBLE) / {Q2F!r})"
    szz = f"(CAST(__szz AS DOUBLE) / {Q4F!r})"
    num = f"({nn} * {sxz} - {sx} * {sz})"
    den = (f"(({nn} * {sxx} - {sx} * {sx}) "
           f"* ({nn} * {szz} - {sz} * {sz}))")
    return agg.select(
        key, "n_days",
        round_portable(F.expr(
            f"{nn} * ({num} * {num}) / {den}"), 6).alias("bp_lm"),
    )


def durbin_watson_daily(df: DataFrame, value_col: str, key: str,
                        us_col: str) -> DataFrame:
    """(key, n_days, dw): Durbin-Watson over the per-key daily
    residual series — sum of squared successive differences over the
    residual sum of squares (2 = no serial correlation, -> 0 strong
    positive, -> 4 strong negative)."""
    r = _with_residuals(df, value_col, key, us_col)
    w = Window.partitionBy(key).orderBy("__x")
    lagged = r.withColumn("__ep", F.lag("__e", 1).over(w))
    agg = lagged.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.expr(
            f"CASE WHEN __ep IS NOT NULL THEN CAST(round("
            f"(__e - __ep) * (__e - __ep) * {Q2}) AS BIGINT) END"
        )).alias("__sd"),
        F.sum(F.expr(f"CAST(round(__e * __e * {Q2}) AS BIGINT)"))
        .alias("__ss"),
    )
    return agg.select(
        key, "n_days",
        round_portable(F.expr(
            "CAST(__sd AS DOUBLE) / CAST(__ss AS DOUBLE)"), 6)
        .alias("dw"),
    )


def mood_median_test(df: DataFrame, value_col: str,
                     group_col: str) -> DataFrame:
    """One row (n, k, chi2): Mood's median test — counts above/at-or-
    below the EXACT global median per group, Pearson chi-square over
    the 2 x k table. The median comes from the distributed histogram
    narrowing (no global sort); counts are integers to the end."""
    from .quantile2 import distributed_median

    # column names must avoid distributed_median's internal __g/__tid
    # broadcast-frame names (they join by raw F.col references)
    rows = df.select(F.col(group_col).alias("__mgrp"),
                     F.col(value_col).cast("double").alias("__mval")) \
        .filter(F.col("__mval").isNotNull())
    med = distributed_median(
        rows.withColumn("__mone", F.lit(1)), "__mval", "__mone",
        "__mgrp").select(F.col("median").alias("__med"))
    # The split predicate compares 1e6-quantized BIGINTs: the median
    # arrives 6dp-rounded (distributed_median's contract), so both
    # engines see the identical integer threshold and a value within
    # a float ulp of the median cannot land in different cells.
    cells = (
        rows.crossJoin(F.broadcast(med))
        .select("__mgrp", F.expr(
            "CASE WHEN CAST(round(__mval * 1000000) AS BIGINT) "
            "> CAST(round(__med * 1000000) AS BIGINT) "
            "THEN 1 ELSE 0 END").alias("__abv"))
        .groupBy("__mgrp", "__abv")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__o"))
    )
    mg = cells.groupBy("__mgrp").agg(F.sum("__o").alias("__ng"))
    ma = cells.groupBy("__abv").agg(F.sum("__o").alias("__na"))
    grid = (
        F.broadcast(mg).crossJoin(F.broadcast(ma))
        .join(cells, ["__mgrp", "__abv"], "left")
        .withColumn("__oo", F.coalesce(F.col("__o"), F.lit(0)))
        .withColumn("__nt", F.sum("__oo").over(Window.partitionBy()))
    )
    e = ("CAST(__ng AS DOUBLE) * CAST(__na AS DOUBLE) "
         "/ CAST(__nt AS DOUBLE)")
    term = (f"CAST(round((CAST(__oo AS DOUBLE) - ({e})) "
            f"* (CAST(__oo AS DOUBLE) - ({e})) / ({e}) * {Q}) "
            f"AS BIGINT)")
    red = grid.agg(
        F.max("__nt").cast("bigint").alias("n"),
        F.countDistinct("__mgrp").cast("bigint").alias("k"),
        F.sum(F.expr(term)).alias("__chi_q"),
    )
    return red.select(
        "n", "k",
        round_portable(F.expr(
            f"CAST(__chi_q AS DOUBLE) / {QF!r}"), 6).alias("chi2"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events daily series per event_type;
# ts is ns-BIGINT on Spark, us-TIMESTAMP in DuckDB)
# --------------------------------------------------------------------------

_D_RESID = f"""daily AS (
  SELECT event_type AS g, epoch_us(ts) // {US_PER_DAY} AS d,
    CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), t AS (
  SELECT g, CAST(s AS DOUBLE) / (CAST(c AS DOUBLE) * {QF!r}) AS m,
    CAST(row_number() OVER (PARTITION BY g ORDER BY d) - 1
      AS BIGINT) AS x
  FROM daily
), agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
    CAST(sum(CAST(round(m * {Q}) AS BIGINT)) AS BIGINT) AS sy,
    CAST(sum(CAST(round(m * {Q}) AS BIGINT) * x) AS BIGINT) AS sxy
  FROM t GROUP BY 1
), fit AS (
  SELECT g,
    ((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / {QF!r})
      - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / {QF!r}))
     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS b,
    (((CAST(sy AS DOUBLE) / {QF!r})
      - ((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / {QF!r})
          - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / {QF!r}))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS a
  FROM agg
), resid AS (
  SELECT t.g, t.x, t.m - (fit.a + fit.b * CAST(t.x AS DOUBLE)) AS e
  FROM t JOIN fit ON t.g = fit.g
)"""


def _q_bp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return breusch_pagan_daily(load(spark, sf_dir, "events"), "value",
                               "event_type", "(ts DIV 1000)").select(
        F.col("event_type"), "n_days", "bp_lm")


_ORACLE_BP = f"""
WITH {_D_RESID}, bag AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
    CAST(sum(CAST(round(e * e * {Q2}) AS BIGINT)) AS BIGINT) AS sz,
    CAST(sum(CAST(round(CAST(x AS DOUBLE) * e * e * {Q2})
      AS BIGINT)) AS BIGINT) AS sxz,
    CAST(sum(CAST(round(e * e * e * e * {Q4}) AS BIGINT)) AS BIGINT)
      AS szz
  FROM resid GROUP BY 1
)
SELECT g AS event_type, n_days,
  {round_portable_duck(
      f"CAST(n_days AS DOUBLE) * ((CAST(n_days AS DOUBLE)"
      f" * (CAST(sxz AS DOUBLE) / {Q2F!r}) - CAST(sx AS DOUBLE)"
      f" * (CAST(sz AS DOUBLE) / {Q2F!r}))"
      f" * (CAST(n_days AS DOUBLE)"
      f" * (CAST(sxz AS DOUBLE) / {Q2F!r}) - CAST(sx AS DOUBLE)"
      f" * (CAST(sz AS DOUBLE) / {Q2F!r})))"
      f" / ((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)"
      f" - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
      f" * (CAST(n_days AS DOUBLE) * (CAST(szz AS DOUBLE) / {Q4F!r})"
      f" - (CAST(sz AS DOUBLE) / {Q2F!r})"
      f" * (CAST(sz AS DOUBLE) / {Q2F!r})))", 6)} AS bp_lm
FROM bag
"""


def _q_dw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return durbin_watson_daily(load(spark, sf_dir, "events"), "value",
                               "event_type", "(ts DIV 1000)").select(
        F.col("event_type"), "n_days", "dw")


_ORACLE_DW = f"""
WITH {_D_RESID}, lagd AS (
  SELECT g, e,
    lag(e) OVER (PARTITION BY g ORDER BY x) AS ep
  FROM resid
), bag AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(CASE WHEN ep IS NOT NULL THEN CAST(round(
      (e - ep) * (e - ep) * {Q2}) AS BIGINT) END) AS BIGINT) AS sd,
    CAST(sum(CAST(round(e * e * {Q2}) AS BIGINT)) AS BIGINT) AS ss
  FROM lagd GROUP BY 1
)
SELECT g AS event_type, n_days,
  {round_portable_duck(
      "CAST(sd AS DOUBLE) / CAST(ss AS DOUBLE)", 6)} AS dw
FROM bag
"""


def _q_mood(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mood_median_test(load(spark, sf_dir, "events"), "value",
                            "event_type")


_MOOD_E = ("CAST(ng AS DOUBLE) * CAST(na AS DOUBLE) "
           "/ CAST(nt AS DOUBLE)")

_ORACLE_MOOD = f"""
WITH rows_l AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
  WHERE value IS NOT NULL
), med AS (
  SELECT {round_portable_duck("quantile_cont(v, 0.5)", 6)} AS m
  FROM rows_l
),
cells AS (
  SELECT g,
    CASE WHEN CAST(round(v * 1000000) AS BIGINT)
      > CAST(round(med.m * 1000000) AS BIGINT)
      THEN 1 ELSE 0 END AS abv,
    CAST(count(*) AS BIGINT) AS o
  FROM rows_l, med GROUP BY 1, 2
), mg AS (SELECT g, CAST(sum(o) AS BIGINT) AS ng FROM cells GROUP BY 1),
ma AS (SELECT abv, CAST(sum(o) AS BIGINT) AS na FROM cells GROUP BY 1),
grid AS (
  SELECT mg.g, ma.abv, mg.ng, ma.na, COALESCE(cells.o, 0) AS oo,
    sum(COALESCE(cells.o, 0)) OVER () AS nt
  FROM mg CROSS JOIN ma
  LEFT JOIN cells ON cells.g = mg.g AND cells.abv = ma.abv
), red AS (
  SELECT CAST(max(nt) AS BIGINT) AS n,
    CAST(count(DISTINCT g) AS BIGINT) AS k,
    CAST(sum(CAST(round((CAST(oo AS DOUBLE) - ({_MOOD_E}))
      * (CAST(oo AS DOUBLE) - ({_MOOD_E})) / ({_MOOD_E}) * {Q})
      AS BIGINT)) AS BIGINT) AS chi_q
  FROM grid
)
SELECT n, k,
  {round_portable_duck(f"CAST(chi_q AS DOUBLE) / {QF!r}", 6)} AS chi2
FROM red
"""


QUERIES: dict = {
    "q_breusch_pagan_events": (_q_bp, _ORACLE_BP),
    "q_durbin_watson_events": (_q_dw, _ORACLE_DW),
    "q_mood_median_events": (_q_mood, _ORACLE_MOOD),
}

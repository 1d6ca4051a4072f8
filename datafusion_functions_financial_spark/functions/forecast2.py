"""Forecast evaluation #2: seasonal-naive baseline with MASE and
sMAPE — the metric tier the gated forecast operators (Holt, Theta)
report against: MASE (Hyndman & Koehler, 2006) scales a model's MAE
by the in-sample MAE of the one-step naive forecast, so "MASE < 1 =
beats naive" reads the same at any scale and unit; sMAPE is the
bounded percentage companion. The model evaluated HERE is the
seasonal naive (y_hat_t = y_{t-m}, m = 24 hours) — the standard
yardstick any real forecaster must beat on seasonal data.

Engine-exactness: the hourly series uses exact quantized cent sums;
absolute errors quantize to BIGINT at 1e8 before their folds; sMAPE
terms likewise. LAG windows run over the bounded per-key hourly
series (calendar-sized, never row-sized).

Plan shape at 100 TB: one hash aggregate to (key, hour), per-key
windows over the bounded series, one reduction per key.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (forecasting tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["seasonal_naive_eval"]

Q = 10 ** 8
QF = float(Q)
US_PER_HOUR = 3_600_000_000
SEASON = 24


def seasonal_naive_eval(df: DataFrame, key_expr: str, us_expr: str,
                        value_col: str,
                        season: int = SEASON) -> DataFrame:
    """(key, n_eval, mae_seasonal, mae_naive1, mase, smape): per key,
    the seasonal-naive forecast's MAE over the hourly mean series,
    the one-step-naive MAE denominator, their MASE ratio, and the
    seasonal-naive sMAPE. Evaluated on hours where both the m-back
    and 1-back observations exist (gaps in the OBSERVED hour grid
    count as steps — the documented contract)."""
    hourly = (
        df.select(
            F.expr(key_expr).alias("__k"),
            F.expr(f"({us_expr}) DIV {US_PER_HOUR}").alias("__h"),
            F.expr(f"CAST(round(({value_col}) * 100) AS BIGINT)")
            .alias("__c"),
        )
        .filter("__c IS NOT NULL")
        .groupBy("__k", "__h")
        .agg(F.sum("__c").alias("__sc"),
             F.count(F.lit(1)).cast("bigint").alias("__n"))
        .withColumn("__y", F.expr(
            "CAST(__sc AS DOUBLE) / 100.0 / CAST(__n AS DOUBLE)"))
    )
    w = Window.partitionBy("__k").orderBy("__h")
    lagged = (
        hourly
        .withColumn("__ys", F.lag("__y", season).over(w))
        .withColumn("__y1", F.lag("__y", 1).over(w))
        .filter("__ys IS NOT NULL AND __y1 IS NOT NULL")
    )
    smape_t = ("CASE WHEN abs(__y) + abs(__ys) > 0.0 THEN "
               "2.0 * abs(__y - __ys) / (abs(__y) + abs(__ys)) "
               "ELSE 0.0 END")
    red = lagged.groupBy("__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(F.expr(
            f"CAST(round(abs(__y - __ys) * {Q}) AS BIGINT)"))
        .alias("__es"),
        F.sum(F.expr(
            f"CAST(round(abs(__y - __y1) * {Q}) AS BIGINT)"))
        .alias("__e1"),
        F.sum(F.expr(
            f"CAST(round(({smape_t}) * {Q}) AS BIGINT)"))
        .alias("__sm"),
    )
    mae_s = f"(CAST(__es AS DOUBLE) / {QF!r} / CAST(n_eval AS DOUBLE))"
    mae_1 = f"(CAST(__e1 AS DOUBLE) / {QF!r} / CAST(n_eval AS DOUBLE))"
    return red.select(
        F.col("__k").alias("key"), "n_eval",
        round_portable(F.expr(mae_s), 6).alias("mae_seasonal"),
        round_portable(F.expr(mae_1), 6).alias("mae_naive1"),
        round_portable(F.expr(
            f"CASE WHEN {mae_1} > 0.0 THEN {mae_s} / {mae_1} "
            f"ELSE 0.0 END"), 6).alias("mase"),
        round_portable(F.expr(
            f"CAST(__sm AS DOUBLE) / {QF!r} "
            f"/ CAST(n_eval AS DOUBLE)"), 6).alias("smape"),
    ).orderBy("key")


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (key = user_id % 8)
# --------------------------------------------------------------------------

_KEY = "user_id % 8"


def _q_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_naive_eval(load(spark, sf_dir, "events"), _KEY,
                               "ts DIV 1000", "value")


_D_SMAPE = ("CASE WHEN abs(y) + abs(ys) > 0.0 THEN "
            "2.0 * abs(y - ys) / (abs(y) + abs(ys)) ELSE 0.0 END")
_D_MAE_S = f"(CAST(es AS DOUBLE) / {QF!r} / CAST(n_eval AS DOUBLE))"
_D_MAE_1 = f"(CAST(e1 AS DOUBLE) / {QF!r} / CAST(n_eval AS DOUBLE))"

_ORACLE_MASE = f"""
WITH hourly AS (
  SELECT user_id % 8 AS k, epoch_us(ts) // {US_PER_HOUR} AS h,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
      / 100.0 / CAST(count(*) AS DOUBLE) AS y
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), lagged AS (
  SELECT k, y,
    lag(y, {SEASON}) OVER (PARTITION BY k ORDER BY h) AS ys,
    lag(y, 1) OVER (PARTITION BY k ORDER BY h) AS y1
  FROM hourly
), red AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_eval,
    sum(CAST(round(abs(y - ys) * {Q}) AS BIGINT)) AS es,
    sum(CAST(round(abs(y - y1) * {Q}) AS BIGINT)) AS e1,
    sum(CAST(round(({_D_SMAPE}) * {Q}) AS BIGINT)) AS sm
  FROM lagged WHERE ys IS NOT NULL AND y1 IS NOT NULL
  GROUP BY 1
)
SELECT k AS key, n_eval,
  {round_portable_duck(_D_MAE_S, 6)} AS mae_seasonal,
  {round_portable_duck(_D_MAE_1, 6)} AS mae_naive1,
  {round_portable_duck(
      f"CASE WHEN {_D_MAE_1} > 0.0 THEN {_D_MAE_S} / {_D_MAE_1} "
      f"ELSE 0.0 END", 6)} AS mase,
  {round_portable_duck(
      f"CAST(sm AS DOUBLE) / {QF!r} / CAST(n_eval AS DOUBLE)", 6)}
    AS smape
FROM red ORDER BY 1
"""


QUERIES: dict = {
    "q_seasonal_naive_mase_events": (_q_mase, _ORACLE_MASE),
}

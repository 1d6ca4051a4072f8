"""Forecast evaluation #3: pinball (quantile) loss over an
hour-of-day empirical quantile forecast — the PROBABILISTIC
companion to the gated point-forecast metrics (theta/Holt MAE,
seasonal-naive MASE/sMAPE score a single number per horizon; a
capacity planner needs the P10/P50/P90 band, and pinball loss is the
proper scoring rule that makes quantile forecasts comparable).

Deterministic split: even day-index rows train, odd rows test (the
hash-split convention, scale-stable). The forecast is the exact
type-1 empirical quantile per hour-of-day — value at rank
ceil(q * n) from the per-hour distinct-value cumulative relation (no
row-level sort). Loss: L_q(y, yhat) = max(q*(y - yhat),
(q - 1)*(y - yhat)), averaged over the test half.

Engine-exactness: quantile ranks and cents values are exact
integers; each loss term quantizes to BIGINT at 1e8 before the mean
(q as exact integer-ratio doubles: 10/100, 50/100, 90/100).

Plan shape at 100 TB: one distinct-(hour, value) hash aggregate on
the train half, a bounded cumulative window per hour, a 72-row
forecast broadcast joined to the test half, one reduction.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (forecast-eval tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["pinball_hourly"]

Q = 10 ** 8
QF = float(Q)
US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
QUANTS = (10, 50, 90)  # percent


def pinball_hourly(df: DataFrame, us_expr: str,
                   value_col: str) -> DataFrame:
    """(q_pct, n_test, pinball): mean pinball loss of the
    even-day-trained hour-of-day empirical quantile forecast on the
    odd-day test half, one row per quantile."""
    cents = f"CAST(round(({value_col}) * 100) AS BIGINT)"
    base = df.selectExpr(
        f"(({us_expr}) DIV {US_PER_DAY}) % 2 AS __odd",
        f"(({us_expr}) DIV {US_PER_HOUR}) % 24 AS __hod",
        f"{cents} AS __c").filter("__c IS NOT NULL")
    train = base.filter("__odd = 0")
    vals = train.groupBy("__hod", "__c").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    wh = (Window.partitionBy("__hod").orderBy("__c")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = vals.withColumn("__cum", F.sum("__cnt").over(wh))
    ns = vals.groupBy("__hod").agg(
        F.sum("__cnt").cast("bigint").alias("__n"))
    qs = ", ".join(str(p) for p in QUANTS)
    targets = (
        ns.selectExpr("__hod", "__n",
                      f"explode(array({qs})) AS __p")
        .withColumn("__target", F.expr(
            "(__p * __n + 99) DIV 100"))
    )
    fc = (
        cum.join(targets, "__hod")
        .filter(F.col("__cum") >= F.col("__target"))
        .groupBy("__hod", "__p")
        .agg(F.min("__c").alias("__yhat"))
    )
    test = base.filter("__odd = 1")
    j = test.join(F.broadcast(fc), "__hod")
    qd = "(CAST(__p AS DOUBLE) / 100.0)"
    diff = "(CAST(__c - __yhat AS DOUBLE) / 100.0)"
    loss = (f"greatest({qd} * {diff}, ({qd} - 1.0) * {diff})")
    red = j.groupBy("__p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.expr(
            f"CAST(round(({loss}) * {Q}) AS BIGINT)")).alias("__sq"))
    return red.select(
        F.col("__p").cast("bigint").alias("q_pct"),
        "n_test",
        round_portable(F.expr(
            f"CAST(__sq AS DOUBLE) / {QF!r} "
            f"/ CAST(n_test AS DOUBLE)"), 6).alias("pinball"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (events value by hour of day)
# --------------------------------------------------------------------------


def _q_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pinball_hourly(load(spark, sf_dir, "events"),
                          "(ts DIV 1000)", "value")


_D_QD = "(CAST(p AS DOUBLE) / 100.0)"
_D_DIFF = "(CAST(c - yhat AS DOUBLE) / 100.0)"
_D_LOSS = (f"greatest({_D_QD} * {_D_DIFF}, "
           f"({_D_QD} - 1.0) * {_D_DIFF})")

_ORACLE_PINBALL = f"""
WITH base AS (
  SELECT (epoch_us(ts) // {US_PER_DAY}) % 2 AS odd,
    (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod,
    CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
), vals AS (
  SELECT hod, c, CAST(count(*) AS BIGINT) AS cnt
  FROM base WHERE odd = 0 GROUP BY 1, 2
), cum AS (
  SELECT hod, c, cnt,
    CAST(sum(cnt) OVER (PARTITION BY hod ORDER BY c
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum
  FROM vals
), ns AS (
  SELECT hod, CAST(sum(cnt) AS BIGINT) AS n FROM vals GROUP BY 1
), targets AS (
  SELECT ns.hod, ns.n, CAST(q.p AS BIGINT) AS p,
    (CAST(q.p AS BIGINT) * ns.n + 99) // 100 AS target
  FROM ns, (SELECT unnest([{', '.join(str(p) for p in QUANTS)}])
    AS p) q
), fc AS (
  SELECT cum.hod, targets.p, CAST(min(cum.c) AS BIGINT) AS yhat
  FROM cum JOIN targets
    ON cum.hod = targets.hod AND cum.cum >= targets.target
  GROUP BY 1, 2
), j AS (
  SELECT fc.p, base.c, fc.yhat
  FROM base JOIN fc ON base.hod = fc.hod
  WHERE base.odd = 1
), red AS (
  SELECT p, CAST(count(*) AS BIGINT) AS n_test,
    CAST(sum(CAST(round(({_D_LOSS}) * {Q}) AS BIGINT)) AS BIGINT)
      AS sq
  FROM j GROUP BY 1
)
SELECT CAST(p AS BIGINT) AS q_pct, n_test,
  {round_portable_duck(
      f"CAST(sq AS DOUBLE) / {QF!r} / CAST(n_test AS DOUBLE)", 6)}
    AS pinball
FROM red
"""


QUERIES: dict = {
    "q_pinball_events": (_q_pinball, _ORACLE_PINBALL),
}

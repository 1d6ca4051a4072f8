"""Microstructure #4: realized higher moments (Amaya-Christoffersen-
Jacobs-Vasquez realized skewness/kurtosis from intraday returns) and
tick-rule trade-run statistics (run counts/lengths — the descriptive
companion to the Wald-Wolfowitz runs test and order-flow sign PACF).

Determinism: per-return powers quantize to BIGINT before the per-day
sums (order-independent reductions); the moment ratios then run in
doubles with identical trees on both engines (``rv^1.5`` is spelled
``rv * sqrt(rv)`` — sqrt is correctly rounded everywhere, ``pow``
is not). Run statistics are exact integer arithmetic end-to-end.

Plan shape at scale: one window-lag pass per (key, day) then a hash
aggregate — map-side combinable, no joins; run stats are two window
passes (sign carry, run-id cumsum) and two aggregates on the series
key, the same shuffle the VPIN bucket cut already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["realized_moments", "trade_runs"]

Q = 10 ** 8
US_PER_DAY = 86_400_000_000


# --------------------------------------------------------------------------
# Realized skewness / kurtosis
# --------------------------------------------------------------------------


def realized_moments(df: DataFrame, value_col: str, us_col: str,
                     keys: list[str], order: list[str],
                     q: int = Q) -> DataFrame:
    """(keys..., day, n_returns, rv, rskew, rkurt) per (key, day):
    realized variance ``sum r^2``, realized skewness
    ``sqrt(n) * sum r^3 / rv^1.5`` and realized kurtosis
    ``n * sum r^4 / rv^2`` of intraday log returns (NULL on flat
    days where rv = 0). Cites micro3.rv_bipower's staging: positive
    prices only, per-(key, day) window lag.

    ``q`` sizes the quantized BIGINT power sums (welch_ttest
    convention): pick it so ``max|r|^4 * q * n_day`` stays inside
    BIGINT range — the 1e8 default fits the events gate series
    (|r| <= ~11) to SF 1000; for realistic small returns
    (|r| <= 0.25) raise q to ~1e12 for full 4th-power granularity."""
    okeys = ", ".join(keys)
    oorder = ", ".join(order)
    pos = df.filter(F.col(value_col) > 0).withColumn(
        "__day", F.expr(f"({us_col}) DIV {US_PER_DAY}"))
    part = f"PARTITION BY {okeys}, __day ORDER BY {oorder}"
    staged = (
        pos.withColumn("__r", F.expr(
            f"ln({value_col} / lag({value_col}) OVER ({part}))"))
        .filter(F.col("__r").isNotNull())
    )
    agg = staged.groupBy(*keys, "__day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_returns"),
        F.sum(F.expr(
            f"CAST(round(__r * __r * {q}) AS BIGINT)")).alias("__s2"),
        F.sum(F.expr(
            f"CAST(round(__r * __r * __r * {q}) AS BIGINT)"
        )).alias("__s3"),
        F.sum(F.expr(
            f"CAST(round(__r * __r * __r * __r * {q}) AS BIGINT)"
        )).alias("__s4"),
    )
    rv = f"(CAST(__s2 AS DOUBLE) / {float(q)!r})"
    n = "CAST(n_returns AS DOUBLE)"
    return agg.select(
        *keys,
        F.col("__day").cast("bigint").alias("day"),
        "n_returns",
        round_portable(F.expr(rv), 6).alias("rv"),
        round_portable(F.expr(
            f"CASE WHEN __s2 > 0 THEN sqrt({n}) "
            f"* (CAST(__s3 AS DOUBLE) / {float(q)!r}) "
            f"/ ({rv} * sqrt({rv})) END"), 6).alias("rskew"),
        round_portable(F.expr(
            f"CASE WHEN __s2 > 0 THEN {n} "
            f"* (CAST(__s4 AS DOUBLE) / {float(q)!r}) "
            f"/ ({rv} * {rv}) END"), 6).alias("rkurt"),
    )


def _q_realized_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return realized_moments(ev, "value", "__us", ["event_type"],
                            ["ts", "event_id"])


_RV_D = f"(CAST(s2 AS DOUBLE) / {float(Q)!r})"

_ORACLE_REALIZED_MOMENTS = f"""
WITH pos AS (
  SELECT event_type, ts, event_id, value,
         epoch_us(ts) // {US_PER_DAY} AS day
  FROM events WHERE value > 0
), staged AS (
  SELECT event_type, day,
         ln(value / lag(value) OVER (PARTITION BY event_type, day
                                     ORDER BY ts, event_id)) AS r
  FROM pos
), agg AS (
  SELECT event_type, day,
    CAST(count(*) AS BIGINT) AS n_returns,
    CAST(sum(CAST(round(r * r * {Q}) AS BIGINT)) AS BIGINT) AS s2,
    CAST(sum(CAST(round(r * r * r * {Q}) AS BIGINT)) AS BIGINT) AS s3,
    CAST(sum(CAST(round(r * r * r * r * {Q}) AS BIGINT)) AS BIGINT)
      AS s4
  FROM staged WHERE r IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, CAST(day AS BIGINT) AS day, n_returns,
  {round_portable_duck(_RV_D, 6)} AS rv,
  {round_portable_duck(
      f"CASE WHEN s2 > 0 THEN sqrt(CAST(n_returns AS DOUBLE)) "
      f"* (CAST(s3 AS DOUBLE) / {float(Q)!r}) "
      f"/ ({_RV_D} * sqrt({_RV_D})) END", 6)} AS rskew,
  {round_portable_duck(
      f"CASE WHEN s2 > 0 THEN CAST(n_returns AS DOUBLE) "
      f"* (CAST(s4 AS DOUBLE) / {float(Q)!r}) "
      f"/ ({_RV_D} * {_RV_D}) END", 6)} AS rkurt
FROM agg
"""


# --------------------------------------------------------------------------
# Tick-rule trade runs
# --------------------------------------------------------------------------


def trade_runs(df: DataFrame, value_col: str, keys: list[str],
               order: list[str]) -> DataFrame:
    """(keys..., n_ticks, n_runs, mean_run, max_run): maximal
    same-sign runs of tick-rule classified trades (carried last
    non-zero price-change sign; leading unclassifiable ticks are
    excluded, as in the VPIN cut). ``mean_run = n_ticks / n_runs``."""
    okeys = ", ".join(keys)
    oorder = ", ".join(order)
    w = f"PARTITION BY {okeys} ORDER BY {oorder}"
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    signed = (
        df.withColumn("__dp", F.expr(
            f"{value_col} - lag({value_col}) OVER ({w})"))
        .withColumn("__sgn", F.expr(
            f"last_value(nullif(CAST(sign(__dp) AS BIGINT), 0), true) "
            f"OVER ({w} {frame})"))
        .filter(F.col("__sgn").isNotNull())
    )
    runs = (
        signed.withColumn("__new", F.expr(
            f"CASE WHEN lag(__sgn) OVER ({w}) IS NULL "
            f"OR lag(__sgn) OVER ({w}) != __sgn THEN 1 ELSE 0 END"))
        .withColumn("__rid", F.expr(
            f"sum(__new) OVER ({w} {frame})"))
        .groupBy(*keys, "__rid")
        .agg(F.count(F.lit(1)).alias("__len"))
    )
    return runs.groupBy(*keys).agg(
        F.sum("__len").cast("bigint").alias("n_ticks"),
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
    ).select(
        *keys, "n_ticks", "n_runs",
        round_portable(F.expr(
            "CAST(n_ticks AS DOUBLE) / CAST(n_runs AS DOUBLE)"), 6
        ).alias("mean_run"),
    ).join(
        runs.groupBy(*keys).agg(
            F.max("__len").cast("bigint").alias("max_run")),
        keys,
    )


def _q_trade_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trade_runs(load(spark, sf_dir, "events"), "value",
                      ["event_type"], ["ts", "event_id"])


_ORACLE_TRADE_RUNS = f"""
WITH diffed AS (
  SELECT event_type, ts, event_id,
         value - lag(value) OVER w AS dp
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), signed AS (
  SELECT event_type, ts, event_id,
         last_value(nullif(CAST(sign(dp) AS BIGINT), 0) IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sgn
  FROM diffed
), flt AS (
  SELECT * FROM signed WHERE sgn IS NOT NULL
), marked AS (
  SELECT event_type, ts, event_id, sgn,
         CASE WHEN lag(sgn) OVER w IS NULL
              OR lag(sgn) OVER w != sgn THEN 1 ELSE 0 END AS new
  FROM flt
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), rid AS (
  SELECT event_type,
         CAST(sum(new) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND
                             CURRENT ROW) AS BIGINT) AS r
  FROM marked
), runs AS (
  SELECT event_type, r, CAST(count(*) AS BIGINT) AS len
  FROM rid GROUP BY 1, 2
)
SELECT event_type,
  CAST(sum(len) AS BIGINT) AS n_ticks,
  CAST(count(*) AS BIGINT) AS n_runs,
  {round_portable_duck(
      "CAST(CAST(sum(len) AS BIGINT) AS DOUBLE) "
      "/ CAST(count(*) AS DOUBLE)", 6)} AS mean_run,
  CAST(max(len) AS BIGINT) AS max_run
FROM runs GROUP BY 1
"""


QUERIES: dict = {
    "micro_realized_moments_events": (
        _q_realized_moments, _ORACLE_REALIZED_MOMENTS),
    "micro_trade_runs_events": (_q_trade_runs, _ORACLE_TRADE_RUNS),
}

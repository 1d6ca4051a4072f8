"""Sequential drift tier #2: the Page-Hinkley scan — "when did the
level of this series first drift past lambda, and by how much?" —
the cumulative-deviation companion to the gated window drift scores
(PSI/chi2/JS compare a window's DISTRIBUTION to a baseline; CUSUM
locates the best single changepoint in hindsight): Page-Hinkley is
the classic sequential alarm — it accumulates deviations from the
RUNNING mean and alarms when the excursion above its running
minimum exceeds lambda, the form streaming monitors replay.

PH_t = U_t - min_{s<=t} U_s with U_t = sum_{i<=t} (x_i - mean_i -
delta), mean_i the running mean. This is a batch replay over the
hourly bucket-mean series: two cumulative windows (sum + running
min) — the same relation a streaming register would keep.

Engine-exactness: the series is the house cents-exact staging; each
deviation term (x_i - mean_i, exact-integer-derived doubles)
quantizes to BIGINT at 1e8 before the cumulative sum, so U, its
running min, and PH are exact integers end to end.

Plan shape at 100 TB: span-bounded global series (the q_acf_events
argument), then two windows over it.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (drift/monitoring tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .tsa2 import _series

__all__ = ["page_hinkley", "page_hinkley_from_series",
           "window_means_stream", "window_means_batch",
           "ph_from_window_means"]

Q = 10 ** 8
QF = float(Q)
US_PER_HOUR = 3_600_000_000
LAMBDA = 10.0
DELTA = 0.0


def page_hinkley(df: DataFrame, bucket_expr: str, value_col: str,
                 lam: float = LAMBDA,
                 delta: float = DELTA) -> DataFrame:
    """One row (t, max_ph, n_alarm_buckets, first_alarm_t): the
    Page-Hinkley excursion maximum, how many buckets sit above
    ``lam``, and the first alarming bucket index (NULL when none)."""
    series = _series(df, bucket_expr, value_col)
    return page_hinkley_from_series(series, lam, delta)


def page_hinkley_from_series(series: DataFrame,
                             lam: float = LAMBDA,
                             delta: float = DELTA) -> DataFrame:
    """The PH scan over a prepared (__h, __yq) series relation —
    shared by the batch staging and the streaming window registers
    (``ph_from_window_means``)."""
    w = Window.partitionBy().orderBy("__h")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    staged = (
        series
        .withColumn("__rn", F.row_number().over(w).cast("bigint"))
        .withColumn("__cy", F.sum("__yq").over(wc))
    )
    # deviation from the running mean, quantized per term
    dev = (f"(CAST(__yq AS DOUBLE) / {QF!r} "
           f"- CAST(__cy AS DOUBLE) "
           f"/ (CAST(__rn AS DOUBLE) * {QF!r}) - {delta!r})")
    ph = (
        staged
        .withColumn("__tq", F.expr(
            f"CAST(round(({dev}) * {Q}) AS BIGINT)"))
        .withColumn("__u", F.sum("__tq").over(wc))
        .withColumn("__m", F.min("__u").over(wc))
        .withColumn("__ph", F.expr("__u - __m"))
    )
    lamq = int(round(lam * Q))
    return ph.agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.max(F.expr(
            f"CAST(__ph AS DOUBLE) / {QF!r}")).alias("__mx"),
        F.sum(F.expr(
            f"CASE WHEN __ph > {lamq} THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_alarm_buckets"),
        F.min(F.expr(
            f"CASE WHEN __ph > {lamq} THEN __rn END"))
        .cast("bigint").alias("first_alarm_t"),
    ).select(
        "t",
        round_portable(F.col("__mx"), 6).alias("max_ph"),
        "n_alarm_buckets", "first_alarm_t",
    )


def window_means_stream(stream_df: DataFrame, ts_col: str,
                        value_col: str, window: str = "1 hour",
                        watermark: str = "1 hour") -> DataFrame:
    """(window, c, n): watermarked per-event-time-window cents-exact
    mean registers — the streaming state IS the batch relation (the
    drift-family idiom; score with ``ph_from_window_means``)."""
    if not stream_df.isStreaming:
        raise ValueError(
            "window_means_stream expects a streaming DataFrame; "
            "use window_means_batch for batch")
    return (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.window(ts_col, window).alias("window"),
            F.expr(f"CAST(round(({value_col}) * 100) AS BIGINT)")
            .alias("__c"),
        )
        .groupBy("window")
        .agg(F.sum("__c").alias("c"),
             F.count(F.lit(1)).alias("n"))
    )


def window_means_batch(df: DataFrame, ts_col: str, value_col: str,
                       window: str = "1 hour") -> DataFrame:
    """Identical-expression batch twin of ``window_means_stream``."""
    return (
        df.select(
            F.window(ts_col, window).alias("window"),
            F.expr(f"CAST(round(({value_col}) * 100) AS BIGINT)")
            .alias("__c"),
        )
        .groupBy("window")
        .agg(F.sum("__c").alias("c"),
             F.count(F.lit(1)).alias("n"))
    )


def ph_from_window_means(means: DataFrame, lam: float = LAMBDA,
                         delta: float = DELTA) -> DataFrame:
    """Score the Page-Hinkley scan over the windowed mean registers
    (stream sink or batch twin — identical results by construction:
    the register relation is the series)."""
    series = means.selectExpr(
        "window.start AS __h",
        f"CAST(round(CAST(c AS DOUBLE) / 100.0 "
        f"/ CAST(n AS DOUBLE) * {Q}) AS BIGINT) AS __yq")
    return page_hinkley_from_series(series, lam, delta)


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (events: global hourly series)
# --------------------------------------------------------------------------

_SPARK_H = f"(ts DIV 1000) DIV {US_PER_HOUR}"
_DUCK_H = f"epoch_us(ts) // {US_PER_HOUR}"


def _q_ph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return page_hinkley(load(spark, sf_dir, "events"), _SPARK_H,
                        "value")


_D_DEV = (f"(CAST(yq AS DOUBLE) / {QF!r} "
          f"- CAST(cy AS DOUBLE) / (CAST(rn AS DOUBLE) * {QF!r}) "
          f"- {DELTA!r})")
_LAMQ = int(round(LAMBDA * Q))

_ORACLE_PH = f"""
WITH series AS (
  SELECT {_DUCK_H} AS h,
    CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT))
      AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) * {Q})
      AS BIGINT) AS yq
  FROM events WHERE value IS NOT NULL GROUP BY 1
), staged AS (
  SELECT CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rn, yq,
    CAST(sum(yq) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) AS BIGINT) AS cy, h
  FROM series
), u AS (
  SELECT rn, h,
    CAST(sum(CAST(round(({_D_DEV}) * {Q}) AS BIGINT)) OVER (
      ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS BIGINT) AS uu
  FROM staged
), ph AS (
  SELECT rn,
    uu - CAST(min(uu) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED
      PRECEDING AND CURRENT ROW) AS BIGINT) AS excursion
  FROM u
)
SELECT CAST(count(*) AS BIGINT) AS t,
  {round_portable_duck(
      f"max(CAST(excursion AS DOUBLE) / {QF!r})", 6)} AS max_ph,
  CAST(sum(CASE WHEN excursion > {_LAMQ} THEN 1 ELSE 0 END)
    AS BIGINT) AS n_alarm_buckets,
  CAST(min(CASE WHEN excursion > {_LAMQ} THEN rn END) AS BIGINT)
    AS first_alarm_t
FROM ph
"""


QUERIES: dict = {
    "q_page_hinkley_events": (_q_ph, _ORACLE_PH),
}

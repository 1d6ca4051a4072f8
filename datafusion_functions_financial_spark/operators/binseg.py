"""Optimal single changepoint by exact SSE split (the first step of
binary segmentation): for each key's daily-mean series, the split
day minimizing SSE(left) + SSE(right) — the least-squares
changepoint, complementing the sequential CUSUM detector
(plans/anomaly's q_changepoint_cusum) with the OFFLINE optimal
answer and an explained-variance score.

Exact arithmetic: daily means are quantized rationals; both SSE
pieces at every candidate split come from BIGINT prefix sums of the
quantized mean and its quantized square (one keyed window over the
calendar-bounded daily relation), so every candidate's objective is
bit-identical across engines and the argmin (ties: earliest day)
lands identically.

Plan shape at scale: one hash aggregate to daily means (bounded by
keys x days), one keyed prefix window over that bounded relation,
one argmin struct aggregate per key. Nothing data-sized after the
first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["best_changepoint"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)
US_PER_DAY = 86_400_000_000


def best_changepoint(df: DataFrame, value_col: str, key: str,
                     us_col: str) -> DataFrame:
    """(key, n_days, cp_day, sse_full, sse_split, var_explained):
    the split with days <= cp_day on the left; candidates leave at
    least one day on each side. var_explained = 1 - sse_split /
    sse_full (0 when the series is flat)."""
    daily = (
        df.select(
            F.col(key),
            F.expr(f"({us_col}) DIV {US_PER_DAY}").alias("__d"),
            F.expr(f"CAST(round({value_col} * {Q}) AS BIGINT)")
            .alias("__q"))
        .groupBy(key, "__d")
        .agg(F.expr(
            f"CAST(sum(__q) AS DOUBLE) "
            f"/ (CAST(count(*) AS DOUBLE) * {QF!r})").alias("__m"))
        .select(key, "__d",
                F.expr(f"CAST(round(__m * {Q}) AS BIGINT)")
                .alias("__mq"),
                F.expr(f"CAST(round(__m * __m * {Q2}) AS BIGINT)")
                .alias("__mq2"))
    )
    w = Window.partitionBy(key).orderBy("__d").rowsBetween(
        Window.unboundedPreceding, 0)
    wt = Window.partitionBy(key)
    pre = (
        daily
        .withColumn("__i", F.row_number().over(
            Window.partitionBy(key).orderBy("__d")).cast("long"))
        .withColumn("__cs", F.sum("__mq").over(w))
        .withColumn("__cs2", F.sum("__mq2").over(w))
        .withColumn("__ts", F.sum("__mq").over(wt))
        .withColumn("__ts2", F.sum("__mq2").over(wt))
        .withColumn("__n", F.count(F.lit(1)).over(wt).cast("long"))
    )

    def sse(s2: str, s1: str, n: str) -> str:
        return (f"(CAST({s2} AS DOUBLE) / {Q2F!r} "
                f"- (CAST({s1} AS DOUBLE) / {QF!r}) "
                f"* (CAST({s1} AS DOUBLE) / {QF!r}) "
                f"/ CAST({n} AS DOUBLE))")

    left = sse("__cs2", "__cs", "__i")
    right = sse("(__ts2 - __cs2)", "(__ts - __cs)", "(__n - __i)")
    full = sse("__ts2", "__ts", "__n")
    cands = (
        pre.filter(F.expr("__i < __n"))
        .withColumn("__sse", F.expr(f"({left}) + ({right})"))
        .withColumn("__full", F.expr(full))
    )
    best = (
        cands.groupBy(key)
        .agg(
            F.max("__n").alias("n_days"),
            F.max("__full").alias("__sf"),
            F.min(F.struct(
                F.col("__sse").alias("s"),
                F.col("__d").alias("d"))).alias("__b"),
        )
    )
    return best.select(
        F.col(key), "n_days",
        F.col("__b.d").alias("cp_day"),
        round_portable(F.col("__sf"), 6).alias("sse_full"),
        round_portable(F.col("__b.s"), 6).alias("sse_split"),
        round_portable(F.expr(
            "CASE WHEN __sf > 0.0 THEN 1.0 - __b.s / __sf "
            "ELSE 0.0 END"), 6).alias("var_explained"),
    )


def _q_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return best_changepoint(ev, "value", "event_type", "__us")


def _sse_duck(s2: str, s1: str, n: str) -> str:
    return (f"(CAST({s2} AS DOUBLE) / {Q2F!r} "
            f"- (CAST({s1} AS DOUBLE) / {QF!r}) "
            f"* (CAST({s1} AS DOUBLE) / {QF!r}) "
            f"/ CAST({n} AS DOUBLE))")


_ORACLE_BINSEG = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {US_PER_DAY} AS d,
    CAST(round((CAST(sum(CAST(round(value * {Q}) AS BIGINT))
      AS DOUBLE) / (CAST(count(*) AS DOUBLE) * {QF!r})) * {Q})
      AS BIGINT) AS mq,
    CAST(round((CAST(sum(CAST(round(value * {Q}) AS BIGINT))
      AS DOUBLE) / (CAST(count(*) AS DOUBLE) * {QF!r}))
      * (CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {QF!r})) * {Q2}) AS BIGINT)
      AS mq2
  FROM events GROUP BY 1, 2
), pre AS (
  SELECT event_type, d,
    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
      AS BIGINT) AS i,
    CAST(sum(mq) OVER (PARTITION BY event_type ORDER BY d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cs,
    CAST(sum(mq2) OVER (PARTITION BY event_type ORDER BY d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cs2,
    CAST(sum(mq) OVER (PARTITION BY event_type) AS BIGINT) AS ts,
    CAST(sum(mq2) OVER (PARTITION BY event_type) AS BIGINT) AS ts2,
    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
), cands AS (
  SELECT event_type, d, n,
    ({_sse_duck("cs2", "cs", "i")})
      + ({_sse_duck("(ts2 - cs2)", "(ts - cs)", "(n - i)")}) AS sse,
    {_sse_duck("ts2", "ts", "n")} AS sse_full
  FROM pre WHERE i < n
), best AS (
  SELECT event_type, n AS n_days, d AS cp_day, sse_full, sse,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY sse, d) AS rk
  FROM cands
)
SELECT event_type, n_days, cp_day,
  {round_portable_duck("sse_full", 6)} AS sse_full,
  {round_portable_duck("sse", 6)} AS sse_split,
  {round_portable_duck(
      "CASE WHEN sse_full > 0.0 THEN 1.0 - sse / sse_full "
      "ELSE 0.0 END", 6)} AS var_explained
FROM best WHERE rk = 1
"""


QUERIES: dict = {
    "q_best_changepoint_events": (_q_binseg, _ORACLE_BINSEG),
}

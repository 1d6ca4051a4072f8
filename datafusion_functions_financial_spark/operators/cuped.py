"""CUPED variance reduction (Controlled-experiment Using Pre-Existing
Data, Deng et al. 2013): adjust each unit's post-period metric with
its pre-period covariate — ``Y_adj = Y - theta (X - mean X)`` with
``theta = cov(X, Y) / var(X)`` — and report how much metric variance
the adjustment removes. The first thing an experimentation platform
computes before powering an A/B test.

Units here are users: X = the user's mean event value in the first
half of the time range, Y = the mean in the second half (users
active in both halves enter; the per-user halves come from one hash
aggregate keyed by (user, half)).

Exact arithmetic: per-user means are quantized rationals; the
(X, Y) covariance matrix reduces to quantized BIGINT sums; theta and
the two variances are one shared closed-form tree, so the reported
reduction is bit-identical across engines.

Plan shape at scale: groupBy (user, half) -> pivot to per-user
(X, Y) via one more hash aggregate -> a single moment-vector
reduction. Map-combinable end to end; no windows, no joins beyond
the implicit aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["cuped_reduction"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)


def cuped_reduction(df: DataFrame, value_col: str, user_col: str,
                    us_col: str) -> DataFrame:
    """One row (n_users, theta, var_raw, var_adj, reduction):
    the CUPED theta and the variance of the adjusted vs raw
    post-period metric; reduction = 1 - var_adj/var_raw (equals the
    squared pre/post correlation)."""
    rng = df.agg(F.min(F.expr(us_col)).alias("__lo"),
                 F.max(F.expr(us_col)).alias("__hi"))
    halves = (
        df.crossJoin(F.broadcast(rng))
        .selectExpr(
            f"{user_col} AS __u",
            f"CASE WHEN ({us_col}) * 2 < __lo + __hi THEN 0 "
            f"ELSE 1 END AS __half",
            f"CAST(round({value_col} * {Q}) AS BIGINT) AS __q")
        .groupBy("__u", "__half")
        .agg(F.expr(
            f"CAST(sum(__q) AS DOUBLE) "
            f"/ (CAST(count(*) AS DOUBLE) * {QF!r})").alias("__m"))
    )
    xy = (
        halves.groupBy("__u")
        .agg(
            F.max(F.expr("CASE WHEN __half = 0 THEN __m END"))
            .alias("__x"),
            F.max(F.expr("CASE WHEN __half = 1 THEN __m END"))
            .alias("__y"),
        )
        .filter("__x IS NOT NULL AND __y IS NOT NULL")
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        *[F.sum(F.expr(
            f"CAST(round({e} * {q}) AS BIGINT)")).alias(a)
          for e, q, a in (
              ("__x", Q, "sx"), ("__y", Q, "sy"),
              ("__x * __x", Q2, "sxx"), ("__x * __y", Q2, "sxy"),
              ("__y * __y", Q2, "syy"))],
    )
    n = "CAST(n_users AS DOUBLE)"
    mx = f"(CAST(sx AS DOUBLE) / ({n} * {QF!r}))"
    my = f"(CAST(sy AS DOUBLE) / ({n} * {QF!r}))"
    sxx = f"(CAST(sxx AS DOUBLE) / {Q2F!r} - {n} * {mx} * {mx})"
    sxy = f"(CAST(sxy AS DOUBLE) / {Q2F!r} - {n} * {mx} * {my})"
    syy = f"(CAST(syy AS DOUBLE) / {Q2F!r} - {n} * {my} * {my})"
    theta = f"(({sxy}) / ({sxx}))"
    var_raw = f"(({syy}) / ({n} - 1.0))"
    # var(Y - theta X) = (Syy - 2 theta Sxy + theta^2 Sxx)/(n-1)
    var_adj = (f"((({syy}) - 2.0 * {theta} * ({sxy}) "
               f"+ {theta} * {theta} * ({sxx})) / ({n} - 1.0))")
    return s.select(
        "n_users",
        round_portable(F.expr(theta), 6).alias("theta"),
        round_portable(F.expr(var_raw), 6).alias("var_raw"),
        round_portable(F.expr(var_adj), 6).alias("var_adj"),
        round_portable(F.expr(
            f"1.0 - ({var_adj}) / ({var_raw})"), 6).alias("reduction"),
    )


def _q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return cuped_reduction(ev, "value", "user_id", "__us")


def _cuped_oracle() -> str:
    n = "CAST(n_users AS DOUBLE)"
    mx = f"(CAST(sx AS DOUBLE) / ({n} * {QF!r}))"
    my = f"(CAST(sy AS DOUBLE) / ({n} * {QF!r}))"
    sxx = f"(CAST(sxx AS DOUBLE) / {Q2F!r} - {n} * {mx} * {mx})"
    sxy = f"(CAST(sxy AS DOUBLE) / {Q2F!r} - {n} * {mx} * {my})"
    syy = f"(CAST(syy AS DOUBLE) / {Q2F!r} - {n} * {my} * {my})"
    theta = f"(({sxy}) / ({sxx}))"
    var_raw = f"(({syy}) / ({n} - 1.0))"
    var_adj = (f"((({syy}) - 2.0 * {theta} * ({sxy}) "
               f"+ {theta} * {theta} * ({sxx})) / ({n} - 1.0))")
    return f"""
WITH rng AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
), halves AS (
  SELECT user_id AS u,
    CASE WHEN epoch_us(ts) * 2 < rng.lo + rng.hi THEN 0 ELSE 1 END
      AS half,
    CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {QF!r}) AS m
  FROM events CROSS JOIN rng GROUP BY 1, 2
), xy AS (
  SELECT u,
    max(CASE WHEN half = 0 THEN m END) AS x,
    max(CASE WHEN half = 1 THEN m END) AS y
  FROM halves GROUP BY 1
), flt AS (
  SELECT x, y FROM xy WHERE x IS NOT NULL AND y IS NOT NULL
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
    CAST(sum(CAST(round(x * {Q}) AS BIGINT)) AS BIGINT) AS sx,
    CAST(sum(CAST(round(y * {Q}) AS BIGINT)) AS BIGINT) AS sy,
    CAST(sum(CAST(round(x * x * {Q2}) AS BIGINT)) AS BIGINT) AS sxx,
    CAST(sum(CAST(round(x * y * {Q2}) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(sum(CAST(round(y * y * {Q2}) AS BIGINT)) AS BIGINT) AS syy
  FROM flt
)
SELECT n_users,
  {round_portable_duck(theta, 6)} AS theta,
  {round_portable_duck(var_raw, 6)} AS var_raw,
  {round_portable_duck(var_adj, 6)} AS var_adj,
  {round_portable_duck(
      f"1.0 - ({var_adj}) / ({var_raw})", 6)} AS reduction
FROM s
"""


QUERIES: dict = {
    "q_cuped_events": (_q_cuped, _cuped_oracle()),
}

"""Heteroscedastic k-sample tests #14: Welch's ANOVA, the
Brown-Forsythe test, and Bartlett's test — completing the
equal-means/equal-variances family around the gated classic ANOVA
(``q_dow_anova_events``) and mean-centered Levene
(``q_levene_events``):

- ``welch_anova``: equal means WITHOUT assuming equal variances
  (the test to reach for when Levene rejects) — Welch (1951)
  F* = sum w_i (m_i - M)^2 / (k-1) / B with w_i = n_i / s_i^2,
  M = sum w_i m_i / sum w_i, and the Satterthwaite-style correction
  B = 1 + 2(k-2)/(k^2-1) * sum (1 - w_i/W)^2 / (n_i - 1).
- ``brown_forsythe``: Levene's W with MEDIAN centers
  (z_ij = |x_ij - median_i|) — robust to heavy tails where the mean
  center over-rejects.
- ``bartlett``: the parametric equal-variances test,
  T = ((N-k) ln Sp^2 - sum (n_i-1) ln s_i^2) / C — more powerful
  than Levene under normality, the classic pre-ANOVA check.

Engine-exactness: group means from exact 1e8-quantized BIGINT sums;
second-pass squared deviations quantized to BIGINT at 1e6 before the
per-group fold (the Levene convention); per-group medians are exact
interpolated percentiles PORTABLY ROUNDED before centering (both
engines center on the same double — the threshold_metrics
convention); the k-row closed forms combine scalars in DOUBLE with
one-factor casts.

Plan shape at 100 TB: two passes over the data (means/medians, then
deviations) with map-side combine; everything after runs on the
k-row group relation. Percentile is Spark's built-in exact
aggregate — at extreme group cardinalities swap for the narrowing
histogram median (``quantile2.distributed_median``), same contract.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["welch_anova", "brown_forsythe", "bartlett"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)


def _rows(df: DataFrame, value_col: str,
          group_expr: str) -> DataFrame:
    return (
        df.select(F.expr(group_expr).alias("__g"),
                  F.col(value_col).cast("double").alias("__x"))
        .filter(F.col("__x").isNotNull()
                & F.col("__g").isNotNull())
    )


def _group_moments(rows: DataFrame) -> DataFrame:
    """(__g, __n, __mean, __ss): two-pass exact group mean and sum of
    squared deviations (1e6-quantized fold)."""
    means = rows.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr(f"CAST(round(__x * {Q}) AS BIGINT)"))
        .alias("__s"),
    ).withColumn("__mean", F.expr(
        f"CAST(__s AS DOUBLE) / ({QF!r} * CAST(__n AS DOUBLE))"))
    dev = rows.join(F.broadcast(means.select("__g", "__mean")), "__g")
    return (
        dev.groupBy("__g")
        .agg(F.sum(F.expr(
            f"CAST(round((__x - __mean) * (__x - __mean) * {Q2}) "
            f"AS BIGINT)")).alias("__ssq"))
        .join(F.broadcast(means.select("__g", "__n", "__mean")),
              "__g")
        .withColumn("__ss", F.expr(
            f"CAST(__ssq AS DOUBLE) / {Q2F!r}"))
        .select("__g", "__n", "__mean", "__ss")
    )


def welch_anova(df: DataFrame, value_col: str,
                group_expr: str) -> DataFrame:
    """One row (k, n, f_welch, df2): Welch's heteroscedastic one-way
    ANOVA across the groups."""
    g = _group_moments(_rows(df, value_col, group_expr)).filter(
        "__n >= 2 AND __ss > 0.0")
    # w = n / s^2 = n (n-1) / ss; all k-row folds quantize to BIGINT
    # first (order-independent on both engines)
    w = ("(CAST(__n AS DOUBLE) * CAST(__n - 1 AS DOUBLE) "
         "/ __ss)")
    terms = g.select(
        "__n", "__mean", "__ss",
        F.expr(w).alias("__w"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("__n").cast("bigint").alias("n"),
        F.sum(F.expr(f"CAST(round(__w * {Q2}) AS BIGINT)"))
        .alias("__swq"),
        F.sum(F.expr(f"CAST(round(__w * __mean * {Q2}) AS BIGINT)"))
        .alias("__swmq"),
    )
    big = terms.crossJoin(F.broadcast(tot))
    sw = f"(CAST(__swq AS DOUBLE) / {Q2F!r})"
    m = f"(CAST(__swmq AS DOUBLE) / CAST(__swq AS DOUBLE))"
    red = big.agg(
        F.max("k").alias("k"), F.max("n").alias("n"),
        F.max("__swq").alias("__swq"),
        F.sum(F.expr(
            f"CAST(round(__w * (__mean - {m}) * (__mean - {m}) "
            f"* {Q2}) AS BIGINT)")).alias("__aq"),
        F.sum(F.expr(
            f"CAST(round((1.0 - __w / {sw}) * (1.0 - __w / {sw}) "
            f"/ CAST(__n - 1 AS DOUBLE) * {Q}) AS BIGINT)"))
        .alias("__hq"),
    )
    h = f"(CAST(__hq AS DOUBLE) / {QF!r})"
    a = (f"(CAST(__aq AS DOUBLE) / {Q2F!r} "
         f"/ CAST(k - 1 AS DOUBLE))")
    b = (f"(1.0 + 2.0 * CAST(k - 2 AS DOUBLE) "
         f"/ (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) * {h})")
    return red.select(
        "k", "n",
        round_portable(F.expr(f"{a} / {b}"), 6).alias("f_welch"),
        round_portable(F.expr(
            f"(CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) "
            f"/ (3.0 * {h})"), 6).alias("df2"),
    )


def brown_forsythe(df: DataFrame, value_col: str,
                   group_expr: str) -> DataFrame:
    """One row (k, n, w_stat): the Brown-Forsythe (median-centered
    Levene) test of equal variances."""
    rows = _rows(df, value_col, group_expr)
    med = rows.groupBy("__g").agg(
        round_portable(F.expr("percentile(__x, 0.5)"), 6)
        .alias("__med"))
    z = (
        rows.join(F.broadcast(med), "__g")
        .withColumn("__z", F.expr("abs(__x - __med)"))
    )
    zg = z.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr(f"CAST(round(__z * {Q}) AS BIGINT)"))
        .alias("__zs"),
        F.sum(F.expr(f"CAST(round(__z * __z * {Q2}) AS BIGINT)"))
        .alias("__zss"),
    )
    zbar_i = f"(CAST(__zs AS DOUBLE) / ({QF!r} * CAST(__n AS DOUBLE)))"
    within = (f"(CAST(__zss AS DOUBLE) / {Q2F!r} "
              f"- CAST(__n AS DOUBLE) * {zbar_i} * {zbar_i})")
    tot = zg.agg(
        F.count(F.lit(1)).cast("bigint").alias("__k"),
        F.sum("__n").cast("bigint").alias("__nt"),
        F.sum("__zs").alias("__zst"),
    )
    zbar = (f"(CAST(__zst AS DOUBLE) / ({QF!r} "
            f"* CAST(__nt AS DOUBLE)))")
    parts = (
        zg.crossJoin(F.broadcast(tot))
        .select(
            F.col("__k"), F.col("__nt"),
            F.expr(
                f"CAST(round(CAST(__n AS DOUBLE) "
                f"* ({zbar_i} - {zbar}) * ({zbar_i} - {zbar}) "
                f"* {Q}) AS BIGINT)").alias("__bq"),
            F.expr(f"CAST(round(({within}) * {Q2}) AS BIGINT)")
            .alias("__wq"),
        )
        .agg(F.max("__k").alias("__k"), F.max("__nt").alias("__nt"),
             F.sum("__bq").alias("__b"), F.sum("__wq").alias("__w"))
    )
    return parts.select(
        F.col("__k").alias("k"),
        F.col("__nt").alias("n"),
        round_portable(F.expr(
            f"(CAST(__nt - __k AS DOUBLE) / CAST(__k - 1 AS DOUBLE)) "
            f"* (CAST(__b AS DOUBLE) / {QF!r}) "
            f"/ (CAST(__w AS DOUBLE) / {Q2F!r})"), 6).alias("w_stat"),
    )


def bartlett(df: DataFrame, value_col: str,
             group_expr: str) -> DataFrame:
    """One row (k, n, t_stat): Bartlett's equal-variances statistic
    across the groups (groups with n < 2 dropped)."""
    g = _group_moments(_rows(df, value_col, group_expr)).filter(
        "__n >= 2 AND __ss > 0.0")
    s2 = "(__ss / CAST(__n - 1 AS DOUBLE))"
    red = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("__n").cast("bigint").alias("n"),
        # __ss is an exact multiple of 1e-6 (integer / Q2), so its
        # k-row double sum is order-independent; the ln and 1/(n-1)
        # folds quantize
        F.sum("__ss").alias("__ssp"),
        F.sum(F.expr(
            f"CAST(round(CAST(__n - 1 AS DOUBLE) * ln({s2}) * {Q2}) "
            f"AS BIGINT)")).alias("__slnq"),
        F.sum(F.expr(
            f"CAST(round(1.0 / CAST(__n - 1 AS DOUBLE) * {Q}) "
            f"AS BIGINT)")).alias("__sinvq"),
    )
    sp2 = "(__ssp / CAST(n - k AS DOUBLE))"
    sln = f"(CAST(__slnq AS DOUBLE) / {Q2F!r})"
    sinv = f"(CAST(__sinvq AS DOUBLE) / {QF!r})"
    c = (f"(1.0 + ({sinv} - 1.0 / CAST(n - k AS DOUBLE)) "
         f"/ (3.0 * CAST(k - 1 AS DOUBLE)))")
    return red.select(
        "k", "n",
        round_portable(F.expr(
            f"(CAST(n - k AS DOUBLE) * ln({sp2}) - {sln}) / {c}"), 6)
        .alias("t_stat"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (value across event_type groups —
# the q_levene_events staging)
# --------------------------------------------------------------------------


def _q_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return welch_anova(load(spark, sf_dir, "events"), "value",
                       "event_type")


def _q_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return brown_forsythe(load(spark, sf_dir, "events"), "value",
                          "event_type")


def _q_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bartlett(load(spark, sf_dir, "events"), "value",
                    "event_type")


_DUCK_MOM = f"""rows_l AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS x FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
), means AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(x * {Q}) AS BIGINT)) AS DOUBLE)
      / ({QF!r} * CAST(count(*) AS DOUBLE)) AS mean
  FROM rows_l GROUP BY 1
), mom AS (
  SELECT r.g, max(m.n) AS n, max(m.mean) AS mean,
    CAST(sum(CAST(round((r.x - m.mean) * (r.x - m.mean) * {Q2})
      AS BIGINT)) AS DOUBLE) / {Q2F!r} AS ss
  FROM rows_l r JOIN means m ON r.g = m.g
  GROUP BY 1
)"""

_D_W = "(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / ss)"
_D_SW = f"(CAST(swq AS DOUBLE) / {Q2F!r})"
_D_M = "(CAST(swmq AS DOUBLE) / CAST(swq AS DOUBLE))"
_D_H = f"(CAST(hq AS DOUBLE) / {QF!r})"
_D_A = f"(CAST(aq AS DOUBLE) / {Q2F!r} / CAST(k - 1 AS DOUBLE))"
_D_B = (f"(1.0 + 2.0 * CAST(k - 2 AS DOUBLE) "
        f"/ (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) * {_D_H})")

_ORACLE_WELCH = f"""
WITH {_DUCK_MOM}, g AS (
  SELECT n, mean, ss, {_D_W} AS w
  FROM mom WHERE n >= 2 AND ss > 0.0
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
    CAST(sum(CAST(round(w * {Q2}) AS BIGINT)) AS BIGINT) AS swq,
    CAST(sum(CAST(round(w * mean * {Q2}) AS BIGINT)) AS BIGINT)
      AS swmq
  FROM g
), red AS (
  SELECT max(tot.k) AS k, max(tot.n) AS n, max(tot.swq) AS swq,
    sum(CAST(round(g.w * (g.mean - {_D_M}) * (g.mean - {_D_M})
      * {Q2}) AS BIGINT)) AS aq,
    sum(CAST(round((1.0 - g.w / {_D_SW}) * (1.0 - g.w / {_D_SW})
      / CAST(g.n - 1 AS DOUBLE) * {Q}) AS BIGINT)) AS hq
  FROM g, tot
)
SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
  {round_portable_duck(f"{_D_A} / {_D_B}", 6)} AS f_welch,
  {round_portable_duck(
      f"(CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) "
      f"/ (3.0 * {_D_H})", 6)} AS df2
FROM red
"""

_Z_BAR_I = f"(CAST(zs AS DOUBLE) / ({QF!r} * CAST(n AS DOUBLE)))"
_Z_WITHIN = (f"(CAST(zss AS DOUBLE) / {Q2F!r} "
             f"- CAST(n AS DOUBLE) * {_Z_BAR_I} * {_Z_BAR_I})")
_Z_BAR = f"(CAST(zst AS DOUBLE) / ({QF!r} * CAST(nt AS DOUBLE)))"

_ORACLE_BF = f"""
WITH rows_l AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS x FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
), med AS (
  SELECT g, {round_portable_duck("quantile_cont(x, 0.5)", 6)} AS md
  FROM rows_l GROUP BY 1
), z AS (
  SELECT r.g, abs(r.x - med.md) AS z
  FROM rows_l r JOIN med ON r.g = med.g
), zg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(z * {Q}) AS BIGINT)) AS BIGINT) AS zs,
    CAST(sum(CAST(round(z * z * {Q2}) AS BIGINT)) AS BIGINT) AS zss
  FROM z GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nt,
    CAST(sum(zs) AS BIGINT) AS zst
  FROM zg
), parts AS (
  SELECT max(tot.k) AS k, max(tot.nt) AS nt,
    sum(CAST(round(CAST(zg.n AS DOUBLE)
      * ({_Z_BAR_I} - {_Z_BAR}) * ({_Z_BAR_I} - {_Z_BAR}) * {Q})
      AS BIGINT)) AS b,
    sum(CAST(round(({_Z_WITHIN}) * {Q2}) AS BIGINT)) AS w
  FROM zg, tot
)
SELECT CAST(k AS BIGINT) AS k, CAST(nt AS BIGINT) AS n,
  {round_portable_duck(
      f"(CAST(nt - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)) "
      f"* (CAST(b AS DOUBLE) / {QF!r}) "
      f"/ (CAST(w AS DOUBLE) / {Q2F!r})", 6)} AS w_stat
FROM parts
"""

_D_S2 = "(ss / CAST(n - 1 AS DOUBLE))"
_D_SP2 = "(ssp / CAST(n - k AS DOUBLE))"
_D_SLN = f"(CAST(slnq AS DOUBLE) / {Q2F!r})"
_D_SINV = f"(CAST(sinvq AS DOUBLE) / {QF!r})"
_D_C = (f"(1.0 + ({_D_SINV} - 1.0 / CAST(n - k AS DOUBLE)) "
        f"/ (3.0 * CAST(k - 1 AS DOUBLE)))")

_ORACLE_BARTLETT = f"""
WITH {_DUCK_MOM}, g AS (
  SELECT n, ss FROM mom WHERE n >= 2 AND ss > 0.0
), red AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
    sum(ss) AS ssp,
    sum(CAST(round(CAST(n - 1 AS DOUBLE) * ln({_D_S2}) * {Q2})
      AS BIGINT)) AS slnq,
    sum(CAST(round(1.0 / CAST(n - 1 AS DOUBLE) * {Q}) AS BIGINT))
      AS sinvq
  FROM g
)
SELECT k, n,
  {round_portable_duck(
      f"(CAST(n - k AS DOUBLE) * ln({_D_SP2}) - {_D_SLN}) / {_D_C}",
      6)} AS t_stat
FROM red
"""


QUERIES: dict = {
    "q_welch_anova_events": (_q_welch, _ORACLE_WELCH),
    "q_brown_forsythe_events": (_q_bf, _ORACLE_BF),
    "q_bartlett_events": (_q_bartlett, _ORACLE_BARTLETT),
}

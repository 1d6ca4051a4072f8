"""Hypothesis tests #9: homogeneity-of-variance (Levene), ordinal
trend (Cochran-Armitage), and inter-rater agreement (Cohen's kappa)
— completing the stats2/stats6/stats8 test battery with the three
classic screens a data-quality pipeline runs before pooling groups:
may variances be pooled, does a rate trend with an ordered factor,
and do two binary detectors agree beyond chance.

Engine-exactness:
- Levene uses the mean-centered statistic: group means derive from
  quantized BIGINT sums (bit-identical doubles both engines), the
  absolute deviations quantize per row at 1e8 (linear) / 1e6
  (squares) — the stats8/Welch moment convention — and the 5-row
  between-group contributions quantize again before their sum.
- Cochran-Armitage is integer arithmetic to the end: with A = sum
  s_i r_i, B = sum s_i n_i, C = sum s_i^2 n_i (exact BIGINTs),
  Z = (A*N - R*B) * sqrt(N) / sqrt(R*(N-R)*(C*N - B^2)) — products
  that might pass 2^53 are cast to DOUBLE one factor at a time
  (IEEE multiplication rounds identically on both engines).
- Kappa is a closed form over four cell counts.

Plan shape at 100 TB: each statistic is one or two hash aggregates
plus a <= k-row broadcast join (k = group count); no windows, no
per-row UDFs.

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["levene_test", "trend_test", "cohens_kappa"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)

US_PER_HOUR = 3_600_000_000


def levene_test(df: DataFrame, value_col: str,
                group_expr: str) -> DataFrame:
    """One row (k, n, w_stat): Levene's mean-centered test of equal
    variances across the ``group_expr`` groups.

    W = ((N-k)/(k-1)) * sum_i n_i (zbar_i - zbar)^2
        / sum_ij (z_ij - zbar_i)^2,   z_ij = |x_ij - mean_i|."""
    rows = (
        df.select(F.expr(group_expr).alias("__g"),
                  F.col(value_col).cast("double").alias("__x"))
        .filter(F.col("__x").isNotNull())
    )
    means = rows.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr(f"CAST(round(__x * {Q}) AS BIGINT)"))
        .alias("__s"),
    ).withColumn("__mean", F.expr(
        f"CAST(__s AS DOUBLE) / ({QF!r} * CAST(__n AS DOUBLE))"))
    z = (
        rows.join(F.broadcast(means.select("__g", "__mean")), "__g")
        .withColumn("__z", F.expr("abs(__x - __mean)"))
    )
    zg = z.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr(f"CAST(round(__z * {Q}) AS BIGINT)"))
        .alias("__zs"),
        F.sum(F.expr(f"CAST(round(__z * __z * {Q2}) AS BIGINT)"))
        .alias("__zss"),
    )
    zbar_i = f"(CAST(__zs AS DOUBLE) / ({QF!r} * CAST(__n AS DOUBLE)))"
    # within-group SS from the quantized moments: sum z^2 - n zbar^2
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
            F.expr(
                f"CAST(round(CAST(__n AS DOUBLE) "
                f"* ({zbar_i} - {zbar}) * ({zbar_i} - {zbar}) "
                f"* {Q}) AS BIGINT)").alias("__bq"),
            F.expr(f"CAST(round(({within}) * {Q2}) AS BIGINT)")
            .alias("__wq"),
        )
        .agg(F.sum("__bq").alias("__b"), F.sum("__wq").alias("__w"))
    )
    return parts.crossJoin(F.broadcast(tot)).select(
        F.col("__k").alias("k"),
        F.col("__nt").alias("n"),
        round_portable(F.expr(
            f"(CAST(__nt - __k AS DOUBLE) / CAST(__k - 1 AS DOUBLE)) "
            f"* (CAST(__b AS DOUBLE) / {QF!r}) "
            f"/ (CAST(__w AS DOUBLE) / {Q2F!r})"), 6).alias("w_stat"),
    )


def trend_test(df: DataFrame, score_expr: str,
               label_expr: str) -> DataFrame:
    """One row (n, n_pos, z_trend): the Cochran-Armitage test for a
    linear trend in the ``label_expr`` rate across ordinal
    ``score_expr`` levels. Integer sums to the end; see module
    docstring for the closed form."""
    rows = df.select(
        F.expr(score_expr).cast("bigint").alias("__s"),
        F.expr(label_expr).cast("int").alias("__y"),
    ).filter(F.col("__s").isNotNull())
    per = rows.groupBy("__s").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__y").cast("bigint").alias("__r"),
    )
    red = per.agg(
        F.sum("__n").cast("bigint").alias("__nt"),
        F.sum("__r").cast("bigint").alias("__rt"),
        F.sum(F.expr("__s * __r")).cast("bigint").alias("__a"),
        F.sum(F.expr("__s * __n")).cast("bigint").alias("__b"),
        F.sum(F.expr("__s * __s * __n")).cast("bigint").alias("__c"),
    )
    return red.select(
        F.col("__nt").alias("n"),
        F.col("__rt").alias("n_pos"),
        round_portable(F.expr(
            "(CAST(__a AS DOUBLE) * CAST(__nt AS DOUBLE) "
            " - CAST(__rt AS DOUBLE) * CAST(__b AS DOUBLE)) "
            "* sqrt(CAST(__nt AS DOUBLE)) "
            "/ sqrt(CAST(__rt AS DOUBLE) * CAST(__nt - __rt AS DOUBLE)"
            " * (CAST(__c AS DOUBLE) * CAST(__nt AS DOUBLE)"
            "    - CAST(__b AS DOUBLE) * CAST(__b AS DOUBLE)))"), 6
        ).alias("z_trend"),
    )


def cohens_kappa(df: DataFrame, rater_a_expr: str,
                 rater_b_expr: str) -> DataFrame:
    """One row (n11, n10, n01, n00, po, pe, kappa): Cohen's kappa
    between two binary raters — chance-corrected agreement from the
    2x2 table: kappa = 2(ad - bc) / ((a+b)(b+d) + (a+c)(c+d))."""
    red = df.select(
        F.expr(rater_a_expr).cast("int").alias("__a"),
        F.expr(rater_b_expr).cast("int").alias("__b"),
    ).agg(
        F.sum(F.expr("CASE WHEN __a = 1 AND __b = 1 THEN 1 ELSE 0 "
                     "END")).cast("bigint").alias("n11"),
        F.sum(F.expr("CASE WHEN __a = 1 AND __b = 0 THEN 1 ELSE 0 "
                     "END")).cast("bigint").alias("n10"),
        F.sum(F.expr("CASE WHEN __a = 0 AND __b = 1 THEN 1 ELSE 0 "
                     "END")).cast("bigint").alias("n01"),
        F.sum(F.expr("CASE WHEN __a = 0 AND __b = 0 THEN 1 ELSE 0 "
                     "END")).cast("bigint").alias("n00"),
    )
    nt = "CAST(n11 + n10 + n01 + n00 AS DOUBLE)"
    po = f"(CAST(n11 + n00 AS DOUBLE) / {nt})"
    pe = (f"((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) "
          f"+ CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) "
          f"/ ({nt} * {nt}))")
    return red.select(
        "n11", "n10", "n01", "n00",
        round_portable(F.expr(po), 6).alias("po"),
        round_portable(F.expr(pe), 6).alias("pe"),
        round_portable(F.expr(
            f"(({po}) - ({pe})) / (1.0 - ({pe}))"), 6).alias("kappa"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events; ts is ns-BIGINT on Spark,
# us-TIMESTAMP in DuckDB — the stats2 epoch-arithmetic convention)
# --------------------------------------------------------------------------

_SPARK_HOUR_BAND = f"((ts DIV 1000) DIV {US_PER_HOUR}) % 24 DIV 6"
_DUCK_HOUR_BAND = f"((epoch_us(ts) // {US_PER_HOUR}) % 24) // 6"
_LABEL = "event_type = 'purchase'"
_RATER_A = "value > 100.0"
_RATER_B = "event_type IN ('purchase', 'click')"


def _q_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    return levene_test(load(spark, sf_dir, "events"), "value",
                       "event_type")


_L_ZBAR_I = f"(CAST(zs AS DOUBLE) / ({QF!r} * CAST(n AS DOUBLE)))"
_L_WITHIN = (f"(CAST(zss AS DOUBLE) / {Q2F!r} "
             f"- CAST(n AS DOUBLE) * {_L_ZBAR_I} * {_L_ZBAR_I})")
_L_ZBAR = f"(CAST(zst AS DOUBLE) / ({QF!r} * CAST(nt AS DOUBLE)))"

_ORACLE_LEVENE = f"""
WITH rows_l AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL
), means AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(x * {Q}) AS BIGINT)) AS BIGINT) AS s
  FROM rows_l GROUP BY 1
), z AS (
  SELECT rows_l.g,
    abs(rows_l.x - CAST(means.s AS DOUBLE)
        / ({QF!r} * CAST(means.n AS DOUBLE))) AS zv
  FROM rows_l JOIN means ON rows_l.g = means.g
), zg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(zv * {Q}) AS BIGINT)) AS BIGINT) AS zs,
    CAST(sum(CAST(round(zv * zv * {Q2}) AS BIGINT)) AS BIGINT) AS zss
  FROM z GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nt,
    CAST(sum(zs) AS BIGINT) AS zst
  FROM zg
), parts AS (
  SELECT
    CAST(sum(CAST(round(CAST(n AS DOUBLE)
      * ({_L_ZBAR_I} - {_L_ZBAR}) * ({_L_ZBAR_I} - {_L_ZBAR})
      * {Q}) AS BIGINT)) AS BIGINT) AS b,
    CAST(sum(CAST(round(({_L_WITHIN}) * {Q2}) AS BIGINT)) AS BIGINT)
      AS w
  FROM zg, tot
)
SELECT tot.k, tot.nt AS n,
  {round_portable_duck(
      f"(CAST(tot.nt - tot.k AS DOUBLE) / CAST(tot.k - 1 AS DOUBLE))"
      f" * (CAST(parts.b AS DOUBLE) / {QF!r})"
      f" / (CAST(parts.w AS DOUBLE) / {Q2F!r})", 6)} AS w_stat
FROM parts, tot
"""


def _q_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trend_test(load(spark, sf_dir, "events"),
                      _SPARK_HOUR_BAND, _LABEL)


_ORACLE_TREND = f"""
WITH rows_l AS (
  SELECT CAST({_DUCK_HOUR_BAND} AS BIGINT) AS s,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), per AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS r
  FROM rows_l GROUP BY 1
), red AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(r) AS BIGINT) AS rt,
    CAST(sum(s * r) AS BIGINT) AS a, CAST(sum(s * n) AS BIGINT) AS b,
    CAST(sum(s * s * n) AS BIGINT) AS c
  FROM per
)
SELECT nt AS n, rt AS n_pos,
  {round_portable_duck(
      "(CAST(a AS DOUBLE) * CAST(nt AS DOUBLE) "
      " - CAST(rt AS DOUBLE) * CAST(b AS DOUBLE)) "
      "* sqrt(CAST(nt AS DOUBLE)) "
      "/ sqrt(CAST(rt AS DOUBLE) * CAST(nt - rt AS DOUBLE) "
      "* (CAST(c AS DOUBLE) * CAST(nt AS DOUBLE) "
      "   - CAST(b AS DOUBLE) * CAST(b AS DOUBLE)))", 6)} AS z_trend
FROM red
"""


def _q_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohens_kappa(load(spark, sf_dir, "events"), _RATER_A,
                        _RATER_B)


_K_NT = "CAST(n11 + n10 + n01 + n00 AS DOUBLE)"
_K_PO = f"(CAST(n11 + n00 AS DOUBLE) / {_K_NT})"
_K_PE = (f"((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) "
         f"+ CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) "
         f"/ ({_K_NT} * {_K_NT}))")

_ORACLE_KAPPA = f"""
WITH red AS (
  SELECT
    CAST(sum(CASE WHEN ({_RATER_A}) AND ({_RATER_B})
      THEN 1 ELSE 0 END) AS BIGINT) AS n11,
    CAST(sum(CASE WHEN ({_RATER_A}) AND NOT ({_RATER_B})
      THEN 1 ELSE 0 END) AS BIGINT) AS n10,
    CAST(sum(CASE WHEN NOT ({_RATER_A}) AND ({_RATER_B})
      THEN 1 ELSE 0 END) AS BIGINT) AS n01,
    CAST(sum(CASE WHEN NOT ({_RATER_A}) AND NOT ({_RATER_B})
      THEN 1 ELSE 0 END) AS BIGINT) AS n00
  FROM events
)
SELECT n11, n10, n01, n00,
  {round_portable_duck(_K_PO, 6)} AS po,
  {round_portable_duck(_K_PE, 6)} AS pe,
  {round_portable_duck(
      f"(({_K_PO}) - ({_K_PE})) / (1.0 - ({_K_PE}))", 6)} AS kappa
FROM red
"""


QUERIES: dict = {
    "q_levene_events": (_q_levene, _ORACLE_LEVENE),
    "q_trend_test_events": (_q_trend, _ORACLE_TREND),
    "q_cohens_kappa_events": (_q_kappa, _ORACLE_KAPPA),
}

"""Categorical association #12: Cramér's V (chi-square association
of two nominal variables), McNemar's test (paired binary marginal
homogeneity), and Cohen's h (arcsine effect size for two
proportions) — the nominal-data companions to the gated ordinal tier
(``stats11`` gamma/Somers' D) and the 2x2 agreement tier (``stats9``
Cohen's kappa).

Engine-exactness: contingency cells, margins, and N are exact BIGINT
hash aggregates; each cell's (O - E)^2 / E term is computed in
DOUBLE with one-factor-at-a-time casts and quantized to BIGINT at
1e8 before the fold (the cells relation is tiny but the sum must be
order-independent on both engines); McNemar and Cohen's h combine
single scalars.

Plan shape at 100 TB: ONE hash aggregate per statistic builds a
bounded cell/margin relation (k x m cells, 2x2 table, or two
proportions); margins join back by broadcast. The data is touched
once per statistic; no windows, no pair joins.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["cramers_v", "mcnemar_test", "cohens_h"]

US_PER_HOUR = 3_600_000_000
Q = 10 ** 8
QF = float(Q)


def cramers_v(df: DataFrame, x_expr: str, y_expr: str) -> DataFrame:
    """One row (n, r_levels, c_levels, chi2, cramers_v): chi-square
    independence statistic and Cramér's V of the (x, y) nominal
    pair."""
    cells = (
        df.selectExpr(f"CAST({x_expr} AS STRING) AS __x",
                      f"CAST({y_expr} AS STRING) AS __y")
        .filter("__x IS NOT NULL AND __y IS NOT NULL")
        .groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__o"))
    )
    rows_m = cells.groupBy("__x").agg(
        F.sum("__o").cast("bigint").alias("__rt"))
    cols_m = cells.groupBy("__y").agg(
        F.sum("__o").cast("bigint").alias("__ct"))
    tot = cells.agg(
        F.sum("__o").cast("bigint").alias("__n"),
        F.countDistinct("__x").cast("bigint").alias("__r"),
        F.countDistinct("__y").cast("bigint").alias("__c"),
    )
    # E = rt*ct/n; term = (O - E)^2 / E, quantized before the fold
    e = ("(CAST(__rt AS DOUBLE) * CAST(__ct AS DOUBLE) "
         "/ CAST(__n AS DOUBLE))")
    term = (f"(CAST(__o AS DOUBLE) - {e}) "
            f"* (CAST(__o AS DOUBLE) - {e}) / {e}")
    red = (
        cells.join(F.broadcast(rows_m), "__x")
        .join(F.broadcast(cols_m), "__y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("__n").alias("n"),
            F.max("__r").alias("__r"),
            F.max("__c").alias("__c"),
            F.sum(F.expr(
                f"CAST(round(({term}) * {Q}) AS BIGINT)"))
            .alias("__chi_q"),
        )
    )
    chi2 = f"(CAST(__chi_q AS DOUBLE) / {QF!r})"
    return red.select(
        "n",
        F.col("__r").alias("r_levels"),
        F.col("__c").alias("c_levels"),
        round_portable(F.expr(chi2), 6).alias("chi2"),
        round_portable(F.expr(
            f"sqrt({chi2} / (CAST(n AS DOUBLE) "
            f"* CAST(least(__r, __c) - 1 AS DOUBLE)))"), 6)
        .alias("cramers_v"),
    )


def mcnemar_test(df: DataFrame, rater_a_expr: str,
                 rater_b_expr: str) -> DataFrame:
    """One row (n10, n01, mcnemar, mcnemar_cc): McNemar's statistic
    (and its continuity-corrected variant) over the discordant cells
    of the paired 2x2 table — do the two binary raters disagree
    symmetrically?"""
    red = df.select(
        F.expr(rater_a_expr).cast("int").alias("__a"),
        F.expr(rater_b_expr).cast("int").alias("__b"),
    ).agg(
        F.sum(F.expr("CASE WHEN __a = 1 AND __b = 0 THEN 1 ELSE 0 "
                     "END")).cast("bigint").alias("n10"),
        F.sum(F.expr("CASE WHEN __a = 0 AND __b = 1 THEN 1 ELSE 0 "
                     "END")).cast("bigint").alias("n01"),
    )
    d = "CAST(n10 - n01 AS DOUBLE)"
    s = "CAST(n10 + n01 AS DOUBLE)"
    return red.select(
        "n10", "n01",
        round_portable(F.expr(
            f"CASE WHEN n10 + n01 > 0 THEN ({d}) * ({d}) / ({s}) "
            f"ELSE 0.0 END"), 6).alias("mcnemar"),
        round_portable(F.expr(
            f"CASE WHEN n10 + n01 > 0 THEN "
            f"(abs({d}) - 1.0) * (abs({d}) - 1.0) / ({s}) "
            f"ELSE 0.0 END"), 6).alias("mcnemar_cc"),
    )


def cohens_h(df: DataFrame, group_expr: str,
             success_expr: str) -> DataFrame:
    """One row (n1, n2, p1, p2, cohens_h): the arcsine-transform
    effect size 2*asin(sqrt(p1)) - 2*asin(sqrt(p2)) between the two
    groups ``group_expr`` splits (must be boolean: true -> group 1)."""
    red = df.select(
        F.expr(group_expr).cast("int").alias("__g"),
        F.expr(success_expr).cast("int").alias("__s"),
    ).agg(
        F.sum(F.expr("CASE WHEN __g = 1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n1"),
        F.sum(F.expr("CASE WHEN __g = 0 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n2"),
        F.sum(F.expr("CASE WHEN __g = 1 THEN __s ELSE 0 END"))
        .cast("bigint").alias("__s1"),
        F.sum(F.expr("CASE WHEN __g = 0 THEN __s ELSE 0 END"))
        .cast("bigint").alias("__s2"),
    )
    p1 = "(CAST(__s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    p2 = "(CAST(__s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    return red.select(
        "n1", "n2",
        round_portable(F.expr(p1), 6).alias("p1"),
        round_portable(F.expr(p2), 6).alias("p2"),
        round_portable(F.expr(
            f"2.0 * asin(sqrt({p1})) - 2.0 * asin(sqrt({p2}))"), 6)
        .alias("cohens_h"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events; ts is ns-BIGINT on Spark,
# us-TIMESTAMP in DuckDB — the stats2 epoch-arithmetic convention)
# --------------------------------------------------------------------------

_SPARK_BAND = f"((ts DIV 1000) DIV {US_PER_HOUR}) % 24 DIV 6"
_DUCK_BAND = f"((epoch_us(ts) // {US_PER_HOUR}) % 24) // 6"
_RATER_A = "value > 100.0"
_RATER_B = "event_type IN ('purchase', 'click')"
_SPARK_HALF = f"(((ts DIV 1000) DIV {US_PER_HOUR}) % 24) < 12"
_DUCK_HALF = f"(((epoch_us(ts) // {US_PER_HOUR}) % 24) < 12)"
_SUCCESS = "event_type = 'purchase'"


def _q_cramers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cramers_v(load(spark, sf_dir, "events"), "event_type",
                     _SPARK_BAND)


def _q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mcnemar_test(load(spark, sf_dir, "events"), _RATER_A,
                        _RATER_B)


def _q_cohens_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohens_h(load(spark, sf_dir, "events"), _SPARK_HALF,
                    _SUCCESS)


_E = ("(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) "
      "/ CAST(n AS DOUBLE))")
_TERM = (f"(CAST(o AS DOUBLE) - {_E}) "
         f"* (CAST(o AS DOUBLE) - {_E}) / {_E}")
_CHI2 = f"(CAST(chi_q AS DOUBLE) / {QF!r})"

_ORACLE_CRAMERS = f"""
WITH cells AS (
  SELECT CAST(event_type AS VARCHAR) AS x,
    CAST({_DUCK_BAND} AS VARCHAR) AS y,
    CAST(count(*) AS BIGINT) AS o
  FROM events
  WHERE event_type IS NOT NULL
  GROUP BY 1, 2
), rm AS (SELECT x, CAST(sum(o) AS BIGINT) AS rt FROM cells
  GROUP BY 1),
cm AS (SELECT y, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n,
    CAST(count(DISTINCT x) AS BIGINT) AS r,
    CAST(count(DISTINCT y) AS BIGINT) AS c
  FROM cells
), red AS (
  SELECT max(tot.n) AS n, max(tot.r) AS r, max(tot.c) AS c,
    sum(CAST(round(({_TERM}) * {Q}) AS BIGINT)) AS chi_q
  FROM cells
  JOIN rm ON cells.x = rm.x
  JOIN cm ON cells.y = cm.y
  CROSS JOIN tot
)
SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r_levels,
  CAST(c AS BIGINT) AS c_levels,
  {round_portable_duck(_CHI2, 6)} AS chi2,
  {round_portable_duck(
      f"sqrt({_CHI2} / (CAST(n AS DOUBLE) "
      f"* CAST(least(r, c) - 1 AS DOUBLE)))", 6)} AS cramers_v
FROM red
"""

_MD = "CAST(n10 - n01 AS DOUBLE)"
_MS = "CAST(n10 + n01 AS DOUBLE)"

_ORACLE_MCNEMAR = f"""
WITH red AS (
  SELECT
    CAST(sum(CASE WHEN ({_RATER_A}) AND NOT ({_RATER_B})
      THEN 1 ELSE 0 END) AS BIGINT) AS n10,
    CAST(sum(CASE WHEN NOT ({_RATER_A}) AND ({_RATER_B})
      THEN 1 ELSE 0 END) AS BIGINT) AS n01
  FROM events
)
SELECT n10, n01,
  {round_portable_duck(
      f"CASE WHEN n10 + n01 > 0 THEN ({_MD}) * ({_MD}) / ({_MS}) "
      f"ELSE 0.0 END", 6)} AS mcnemar,
  {round_portable_duck(
      f"CASE WHEN n10 + n01 > 0 THEN "
      f"(abs({_MD}) - 1.0) * (abs({_MD}) - 1.0) / ({_MS}) "
      f"ELSE 0.0 END", 6)} AS mcnemar_cc
FROM red
"""

_P1 = "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
_P2 = "(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"

_ORACLE_COHENS_H = f"""
WITH red AS (
  SELECT
    CAST(sum(CASE WHEN {_DUCK_HALF} THEN 1 ELSE 0 END) AS BIGINT)
      AS n1,
    CAST(sum(CASE WHEN NOT ({_DUCK_HALF}) THEN 1 ELSE 0 END)
      AS BIGINT) AS n2,
    CAST(sum(CASE WHEN ({_DUCK_HALF}) AND ({_SUCCESS})
      THEN 1 ELSE 0 END) AS BIGINT) AS s1,
    CAST(sum(CASE WHEN NOT ({_DUCK_HALF}) AND ({_SUCCESS})
      THEN 1 ELSE 0 END) AS BIGINT) AS s2
  FROM events
)
SELECT n1, n2,
  {round_portable_duck(_P1, 6)} AS p1,
  {round_portable_duck(_P2, 6)} AS p2,
  {round_portable_duck(
      f"2.0 * asin(sqrt({_P1})) - 2.0 * asin(sqrt({_P2}))", 6)}
    AS cohens_h
FROM red
"""


QUERIES: dict = {
    "q_cramers_v_events": (_q_cramers, _ORACLE_CRAMERS),
    "q_mcnemar_events": (_q_mcnemar, _ORACLE_MCNEMAR),
    "q_cohens_h_events": (_q_cohens_h, _ORACLE_COHENS_H),
}

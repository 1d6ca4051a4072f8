"""Two-sample ECDF distances #15: Cramér-von Mises and Kuiper —
completing the distribution-comparison tier around the gated
Kolmogorov-Smirnov (``dq_ks_two_sample_events``), KS separation
(``mlmetrics3``), and energy-distance (``q_energy_distance_events``)
queries: KS sees only the single largest ECDF gap; CvM integrates
ALL of it (sensitive to body shifts KS misses); Kuiper adds the two
one-sided extremes (equal sensitivity at the tails, rotation-
invariant — the classic test for cyclic quantities).

  CvM  T = n1*n2/(n1+n2)^2 * sum_v c_v * (F1(v) - F2(v))^2
  Kuiper V = max_v(F1 - F2) + max_v(F2 - F1)

summed/maxed over the pooled distinct values v with multiplicity
c_v (the discrete tied-data form: each pooled observation
contributes its ECDF gap).

Engine-exactness: cumulative counts come from the
``mlmetrics2._bucketed2`` two-level prefix sum (distinct-value
relation, NO global single-partition window over raw rows);
F1 - F2 = (n2*cum1 - n1*cum2) / (n1*n2) has an exact BIGINT
numerator — the CvM fold quantizes the squared term at 1e8, the
Kuiper maxima compare exact integers.

Plan shape at 100 TB: one hash aggregate to distinct scores, the
bucketed prefix sum (windows over <= N_BUCKETS-row relations), one
reduction. Identical shape to the gated AUC/PR-AUC machinery.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .mlmetrics2 import _bucketed2

__all__ = ["cvm_two_sample", "kuiper_two_sample"]

Q = 10 ** 8
QF = float(Q)


def _cums(df: DataFrame, value_col: str,
          group1_expr: str) -> DataFrame:
    """(__v, __c, __cum1, __cum2) + totals (__n1, __n2): pooled
    distinct values with per-sample cumulative counts."""
    per_v = (
        df.select(F.col(value_col).cast("double").alias("__v"),
                  F.expr(f"CAST(({group1_expr}) AS INT)")
                  .alias("__y"))
        .filter("__v IS NOT NULL AND __y IS NOT NULL")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"),
             F.sum("__y").cast("bigint").alias("__cp"))
    )
    ranked = _bucketed2(per_v)
    tot = per_v.agg(F.sum("__c").cast("bigint").alias("__nt"),
                    F.sum("__cp").cast("bigint").alias("__n1"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .selectExpr(
            "__v", "__c", "__n1", "__nt - __n1 AS __n2",
            # cumulative counts THROUGH v from the prefix starts
            "__pstart + __cp - 1 AS __cum1",
            "(__start + __c - 1) - (__pstart + __cp - 1) AS __cum2",
        )
    )


def cvm_two_sample(df: DataFrame, value_col: str,
                   group1_expr: str) -> DataFrame:
    """One row (n1, n2, t_cvm): the two-sample Cramér-von Mises
    criterion between group 1 (``group1_expr`` true) and group 2."""
    c = _cums(df, value_col, group1_expr)
    gap = ("(CAST(__n2 * __cum1 - __n1 * __cum2 AS DOUBLE) "
           "/ (CAST(__n1 AS DOUBLE) * CAST(__n2 AS DOUBLE)))")
    red = c.agg(
        F.max("__n1").alias("n1"),
        F.max("__n2").alias("n2"),
        F.sum(F.expr(
            f"CAST(round(CAST(__c AS DOUBLE) * {gap} * {gap} * {Q}) "
            f"AS BIGINT)")).alias("__tq"),
    )
    return red.select(
        "n1", "n2",
        round_portable(F.expr(
            f"CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) "
            f"/ (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)) "
            f"* CAST(__tq AS DOUBLE) / {QF!r}"), 6).alias("t_cvm"),
    )


def kuiper_two_sample(df: DataFrame, value_col: str,
                      group1_expr: str) -> DataFrame:
    """One row (n1, n2, d_plus, d_minus, v_kuiper): the Kuiper
    statistic (sum of the two one-sided KS extremes)."""
    c = _cums(df, value_col, group1_expr)
    num = "(__n2 * __cum1 - __n1 * __cum2)"
    red = c.agg(
        F.max("__n1").alias("n1"),
        F.max("__n2").alias("n2"),
        F.max(F.expr(num)).alias("__up"),
        F.min(F.expr(num)).alias("__dn"),
    )
    nm = "(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
    dp = f"(greatest(CAST(__up AS DOUBLE), 0.0) / {nm})"
    dm = f"(greatest(-CAST(__dn AS DOUBLE), 0.0) / {nm})"
    return red.select(
        "n1", "n2",
        round_portable(F.expr(dp), 6).alias("d_plus"),
        round_portable(F.expr(dm), 6).alias("d_minus"),
        round_portable(F.expr(f"{dp} + {dm}"), 6).alias("v_kuiper"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (value: purchase vs click — the
# dq_ks_two_sample staging; DuckDB's oracle may use a plain global
# cumulative window, the VALUES are what must match)
# --------------------------------------------------------------------------

_G1 = "event_type = 'purchase'"


def _two_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(["purchase", "click"]))


def _q_cvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cvm_two_sample(_two_class(spark, sf_dir), "value", _G1)


def _q_kuiper(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kuiper_two_sample(_two_class(spark, sf_dir), "value", _G1)


_DUCK_CUMS = f"""per_v AS (
  SELECT CAST(value AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c,
    CAST(sum(CASE WHEN {_G1} THEN 1 ELSE 0 END) AS BIGINT) AS cp
  FROM events
  WHERE value IS NOT NULL
    AND event_type IN ('purchase', 'click')
  GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS nt, CAST(sum(cp) AS BIGINT) AS n1
  FROM per_v
), cums AS (
  SELECT v, c, tot.n1, tot.nt - tot.n1 AS n2,
    CAST(sum(cp) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum1,
    CAST(sum(c - cp) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum2
  FROM per_v, tot
)"""

_D_GAP = ("(CAST(n2 * cum1 - n1 * cum2 AS DOUBLE) "
          "/ (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))")

_ORACLE_CVM = f"""
WITH {_DUCK_CUMS}, red AS (
  SELECT max(n1) AS n1, max(n2) AS n2,
    sum(CAST(round(CAST(c AS DOUBLE) * {_D_GAP} * {_D_GAP} * {Q})
      AS BIGINT)) AS tq
  FROM cums
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  {round_portable_duck(
      f"CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) "
      f"/ (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)) "
      f"* CAST(tq AS DOUBLE) / {QF!r}", 6)} AS t_cvm
FROM red
"""

_D_NM = "(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
_D_DP = f"(greatest(CAST(up AS DOUBLE), 0.0) / {_D_NM})"
_D_DM = f"(greatest(-CAST(dn AS DOUBLE), 0.0) / {_D_NM})"

_ORACLE_KUIPER = f"""
WITH {_DUCK_CUMS}, red AS (
  SELECT max(n1) AS n1, max(n2) AS n2,
    CAST(max(n2 * cum1 - n1 * cum2) AS BIGINT) AS up,
    CAST(min(n2 * cum1 - n1 * cum2) AS BIGINT) AS dn
  FROM cums
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  {round_portable_duck(_D_DP, 6)} AS d_plus,
  {round_portable_duck(_D_DM, 6)} AS d_minus,
  {round_portable_duck(f"{_D_DP} + {_D_DM}", 6)} AS v_kuiper
FROM red
"""


QUERIES: dict = {
    "q_cvm_two_sample_events": (_q_cvm, _ORACLE_CVM),
    "q_kuiper_events": (_q_kuiper, _ORACLE_KUIPER),
}

"""Exact quantiles #3: the distribution-free (order-statistic)
confidence interval for the median — the companion to
``quantile2.distributed_median`` that says how WIDE the median is,
with no normality assumption: the CI endpoints are the order
statistics at ranks ``(n ∓ z√n)/2`` (the binomial-rank interval with
the standard normal approximation), selected exactly.

Engine-exact: rank bounds are floor/ceil of one shared double
expression of (n, z); the selected rows are exact order statistics
under a (value, id) total order, so both engines pick identical rows.

Plan shape at scale: one count aggregate (broadcast back), one keyed
rank window (per-group sort — keyed, parallel; swap in the
mlmetrics bucketed prefix-sum when a single group outgrows a task),
then a filter to exactly five ranks per group — O(groups) rows ever
leave the scan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["median_ci"]

Z95 = 1.959963984540054  # two-sided 95%


def median_ci(df: DataFrame, value_col: str, group_col: str,
              id_col: str, z: float = Z95) -> DataFrame:
    """(group, n, ci_lo, median, ci_hi): the exact median (mean of
    the two middle order statistics) with the rank-based ~95% CI
    ``[x_(l), x_(u)]``, l = floor((n - z√n)/2) clamped to 1,
    u = ceil(1 + (n + z√n)/2) clamped to n.

    Scale note (SCALING.md §"r08 notes"): the per-group row_number
    sort is spill-backed (a hot group is slow, not fatal); for
    billion-row groups prefer ``quantile2.distributed_median`` and
    derive the CI ranks from its histogram passes."""
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__x"),
        F.col(id_col).alias("__id"))
    counts = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    bounds = counts.select(
        "__g", "n",
        F.expr(f"greatest(CAST(1 AS BIGINT), CAST(floor("
               f"(CAST(n AS DOUBLE) - {z!r} * sqrt(CAST(n AS DOUBLE)))"
               f" / 2.0) AS BIGINT))").alias("__l"),
        F.expr(f"least(n, CAST(ceil(1.0 + (CAST(n AS DOUBLE) "
               f"+ {z!r} * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT))"
               ).alias("__u"),
        F.expr("CAST((n + 1) DIV 2 AS BIGINT)").alias("__m1"),
        F.expr("CAST((n + 2) DIV 2 AS BIGINT)").alias("__m2"),
    )
    ranked = (
        base.join(F.broadcast(bounds), "__g")
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy("__g").orderBy("__x", "__id"))
            .cast("long"))
        .filter(F.expr("__rn = __l OR __rn = __u "
                       "OR __rn = __m1 OR __rn = __m2"))
    )
    agg = ranked.groupBy("__g").agg(
        F.max("n").alias("n"),
        F.max(F.expr("CASE WHEN __rn = __l THEN __x END"))
        .alias("__lo"),
        F.max(F.expr("CASE WHEN __rn = __m1 THEN __x END"))
        .alias("__v1"),
        F.max(F.expr("CASE WHEN __rn = __m2 THEN __x END"))
        .alias("__v2"),
        F.max(F.expr("CASE WHEN __rn = __u THEN __x END"))
        .alias("__hi"),
    )
    return agg.select(
        F.col("__g").alias(group_col), "n",
        round_portable(F.col("__lo"), 6).alias("ci_lo"),
        round_portable(F.expr("(__v1 + __v2) / 2.0"), 6)
        .alias("median"),
        round_portable(F.col("__hi"), 6).alias("ci_hi"),
    )


def _q_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    return median_ci(load(spark, sf_dir, "orders"), "o_totalprice",
                     "o_orderpriority", "o_orderkey")


_ORACLE_MEDIAN_CI = f"""
WITH base AS (
  SELECT o_orderpriority AS g, o_totalprice AS x, o_orderkey AS id
  FROM orders WHERE o_totalprice IS NOT NULL
), counts AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1
), bounds AS (
  SELECT g, n,
    greatest(CAST(1 AS BIGINT), CAST(floor(
      (CAST(n AS DOUBLE) - {Z95!r} * sqrt(CAST(n AS DOUBLE))) / 2.0)
      AS BIGINT)) AS l,
    least(n, CAST(ceil(1.0 + (CAST(n AS DOUBLE)
      + {Z95!r} * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)) AS u,
    CAST((n + 1) // 2 AS BIGINT) AS m1,
    CAST((n + 2) // 2 AS BIGINT) AS m2
  FROM counts
), ranked AS (
  SELECT b.g, b.x, bo.n, bo.l, bo.u, bo.m1, bo.m2,
    row_number() OVER (PARTITION BY b.g ORDER BY b.x, b.id) AS rn
  FROM base b JOIN bounds bo ON b.g = bo.g
), picked AS (
  SELECT g, max(n) AS n,
    max(CASE WHEN rn = l THEN x END) AS lo,
    max(CASE WHEN rn = m1 THEN x END) AS v1,
    max(CASE WHEN rn = m2 THEN x END) AS v2,
    max(CASE WHEN rn = u THEN x END) AS hi
  FROM ranked
  WHERE rn = l OR rn = u OR rn = m1 OR rn = m2
  GROUP BY 1
)
SELECT g AS o_orderpriority, n,
  {round_portable_duck("lo", 6)} AS ci_lo,
  {round_portable_duck("(v1 + v2) / 2.0", 6)} AS median,
  {round_portable_duck("hi", 6)} AS ci_hi
FROM picked
"""


QUERIES: dict = {
    "q_median_ci_orders": (_q_median_ci, _ORACLE_MEDIAN_CI),
}

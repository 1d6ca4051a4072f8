"""Weighted percentile per group — the volume-weighted median price
(and any other weighted quantile) computed exactly, with an
integer-only threshold test so both engines agree bit-for-bit.

Definition: sort the group by (value, tiebreak); the weighted
``q``-quantile is the value of the FIRST row whose cumulative weight
reaches ``q`` of the group's total. With integer weights the reach
test is ``cumw * denom >= total * numer`` — pure BIGINT arithmetic,
no float boundary anywhere (the known engine trap with
``0.5 * total`` thresholds).

Plan shape at scale: one hash shuffle on the group key feeds the sort
window (cumulative weight) and the group total; the qualifying set is
upward-closed in the sort order, so "first qualifying row" collapses
to a ``min(struct(value, ord))`` aggregation — map-side combinable,
no second sort. Per-group memory is O(1) beyond the window sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["weighted_quantile"]


def weighted_quantile(df: DataFrame, value_col: str, weight_col: str,
                      keys: Sequence[str], tiebreaks: Sequence[str],
                      numer: int = 1, denom: int = 2) -> DataFrame:
    """(keys..., w_quantile, total_weight): exact weighted
    ``numer/denom``-quantile of ``value`` per key group. ``weight``
    must be integral (cast to BIGINT); ordering ties break on
    ``tiebreaks`` (must make rows unique within a group)."""
    if not (0 < numer <= denom):
        raise ValueError("need 0 < numer <= denom")
    order = [F.col(value_col).asc()] + [F.col(c).asc() for c in tiebreaks]
    w_cum = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(*keys)
    wgt = F.col(weight_col).cast("bigint")
    staged = (
        df.withColumn("__cumw", F.sum(wgt).over(w_cum))
        .withColumn("__total", F.sum(wgt).over(w_all))
    )
    qualifying = staged.filter(
        F.col("__cumw") * F.lit(denom) >= F.col("__total") * F.lit(numer))
    pick = F.struct(F.col(value_col), *[F.col(c) for c in tiebreaks])
    return qualifying.groupBy(*keys).agg(
        round_portable(F.min(pick)[value_col]).alias("w_quantile"),
        F.max("__total").alias("total_weight"),
    )


# --------------------------------------------------------------------------
# Gate query: volume-weighted median price per supplier
# --------------------------------------------------------------------------


def _q_wmedian(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_quantile(
        load(spark, sf_dir, "lineitem"), "l_extendedprice", "l_quantity",
        ["l_suppkey"], ["l_orderkey", "l_linenumber"])


_ORACLE_WMEDIAN = f"""
WITH staged AS (
  SELECT l_suppkey, l_extendedprice, l_orderkey, l_linenumber,
         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cumw,
         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_suppkey
         ) AS BIGINT) AS total
  FROM lineitem
), q AS (
  SELECT *, row_number() OVER (
           PARTITION BY l_suppkey
           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
  FROM staged WHERE cumw * 2 >= total * 1
)
SELECT l_suppkey,
  {round_portable_duck("l_extendedprice")} AS w_quantile,
  total AS total_weight
FROM q WHERE rn = 1
"""


def _q_wiqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted interquartile range per supplier: the robust
    dispersion screen (two reach tests over one staged cumulative,
    exact BIGINT throughout)."""
    li = load(spark, sf_dir, "lineitem")
    args = ("l_extendedprice", "l_quantity", ["l_suppkey"],
            ["l_orderkey", "l_linenumber"])
    p25 = weighted_quantile(li, *args, numer=1, denom=4).selectExpr(
        "l_suppkey", "w_quantile AS p25")
    p75 = weighted_quantile(li, *args, numer=3, denom=4).selectExpr(
        "l_suppkey", "w_quantile AS p75", "total_weight")
    return (
        p25.join(p75, "l_suppkey")
        .withColumn("iqr", round_portable(
            F.col("p75") - F.col("p25")))
        .select("l_suppkey", "p25", "p75", "iqr", "total_weight")
    )


def _duck_wq(numer: int, denom: int, alias: str) -> str:
    return f"""
  SELECT l_suppkey,
         {round_portable_duck("l_extendedprice")} AS {alias},
         total AS total_weight
  FROM (
    SELECT *, row_number() OVER (
             PARTITION BY l_suppkey
             ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
    FROM (
      SELECT l_suppkey, l_extendedprice, l_orderkey, l_linenumber,
             CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cumw,
             CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_suppkey
             ) AS BIGINT) AS total
      FROM lineitem
    ) WHERE cumw * {denom} >= total * {numer}
  ) WHERE rn = 1"""


_ORACLE_WIQR = f"""
WITH q25 AS ({_duck_wq(1, 4, "p25")}),
q75 AS ({_duck_wq(3, 4, "p75")})
SELECT a.l_suppkey, a.p25, b.p75,
  {round_portable_duck("b.p75 - a.p25")} AS iqr,
  b.total_weight
FROM q25 a JOIN q75 b USING (l_suppkey)
"""


QUERIES: dict = {
    "wq_weighted_median_lineitem": (_q_wmedian, _ORACLE_WMEDIAN),
    "wq_weighted_iqr_lineitem": (_q_wiqr, _ORACLE_WIQR),
}

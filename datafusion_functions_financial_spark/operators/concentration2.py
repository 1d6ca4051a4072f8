"""Concentration #2: the Pareto cutpoint — the smallest set of top
customers (by revenue, descending, tie-blocks enter together) whose
revenue share reaches ``share_num/share_den`` (default 4/5, the
"80/20" audit). Complements the gated Gini / Lorenz-decile /
HHI suite with the single number an account team asks for: "how many
customers are 80% of revenue?".

Semantics are BLOCK-GRANULAR and therefore deterministic: customers
with identical revenue enter the top set together (no arbitrary
tie-break inside a revenue value), and the reported share is the
exact share of the selected set — >= the target by construction.

Engine-exactness: revenues are exact cents BIGINTs; the cumulative
relation uses the mlmetrics bucketed two-level prefix (extended to
carry BOTH the customer count and the revenue mass in one pass), so
no global-sort window touches per-customer rows; the threshold test
is the integer cross-multiplication ``den * cum_rev >= num * total``;
the winning block is the unique min over qualifying rows.

Plan shape at 100 TB: one per-customer aggregate, one per-distinct-
value aggregate, the 1024-bucket prefix (bucket totals are a <= 1024
row window), a broadcast total, one reduction.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (analytics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["pareto_cutpoint"]

N_BUCKETS = 1024
SHARE_NUM, SHARE_DEN = 4, 5


def _prefixed(rel: DataFrame) -> DataFrame:
    """Adds exclusive ascending prefixes ``__pre_c`` (customers) and
    ``__pre_w`` (revenue mass) to a relation of distinct ``__v``
    (revenue cents) rows carrying ``__c`` and ``__w`` — the
    ``mlmetrics._bucketed`` two-level scheme with two carried sums."""
    rng = rel.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    b = (
        rel.crossJoin(F.broadcast(rng))
        .withColumn("__b", F.expr(
            f"CASE WHEN __hi <= __lo THEN CAST(0 AS BIGINT) ELSE "
            f"CAST(least(CAST({N_BUCKETS - 1} AS BIGINT), "
            f"CAST(floor((CAST(__v AS DOUBLE) - CAST(__lo AS DOUBLE)) "
            f"* {N_BUCKETS} / (CAST(__hi AS DOUBLE) "
            f"- CAST(__lo AS DOUBLE))) AS BIGINT)) AS BIGINT) END"))
        .drop("__lo", "__hi")
    )
    btot = b.groupBy("__b").agg(F.sum("__c").alias("__bc"),
                                F.sum("__w").alias("__bw"))
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    boff = (
        btot.withColumn("__offc", F.sum("__bc").over(w) - F.col("__bc"))
        .withColumn("__offw", F.sum("__bw").over(w) - F.col("__bw"))
        .drop("__bc", "__bw")
    )
    intra = Window.partitionBy("__b").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0)
    return (
        b.join(F.broadcast(boff), "__b")
        .withColumn("__pre_c", F.col("__offc")
                    + F.sum("__c").over(intra) - F.col("__c"))
        .withColumn("__pre_w", F.col("__offw")
                    + F.sum("__w").over(intra) - F.col("__w"))
        .drop("__offc", "__offw")
    )


def pareto_cutpoint(df: DataFrame, key_col: str, value_expr: str,
                    share_num: int = SHARE_NUM,
                    share_den: int = SHARE_DEN) -> DataFrame:
    """One row (n_keys, top_keys, top_share): the smallest descending
    tie-block prefix of per-key totals whose share of the grand total
    reaches ``share_num/share_den``."""
    per_key = (
        df.selectExpr(f"{key_col} AS __k",
                      f"CAST(round(({value_expr}) * 100) AS BIGINT) "
                      "AS __cents")
        .groupBy("__k")
        .agg(F.sum("__cents").alias("__rev"))
    )
    # materialize: per_val feeds the grand total AND the prefix chain
    # (otherwise the per-key aggregate re-scans the input twice)
    per_val = per_key.groupBy(F.col("__rev").alias("__v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
    ).withColumn("__w", F.expr("__v * __c")).localCheckpoint()
    tot = per_val.agg(F.sum("__c").cast("bigint").alias("__tc"),
                      F.sum("__w").cast("bigint").alias("__tw"))
    pre = _prefixed(per_val)
    # customers with revenue >= v, and their revenue mass
    cum = (
        pre.crossJoin(F.broadcast(tot))
        .withColumn("__cum_c", F.col("__tc") - F.col("__pre_c"))
        .withColumn("__cum_w", F.col("__tw") - F.col("__pre_w"))
        .filter(F.expr(
            f"{share_den} * __cum_w >= {share_num} * __tw"))
    )
    best = cum.agg(F.min(F.struct("__cum_c", "__cum_w", "__tc", "__tw"))
                   .alias("__b"))
    return best.select(
        F.col("__b.__tc").alias("n_keys"),
        F.col("__b.__cum_c").alias("top_keys"),
        round_portable(F.expr(
            "CAST(__b.__cum_w AS DOUBLE) / CAST(__b.__tw AS DOUBLE)"),
            6).alias("top_share"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle
# --------------------------------------------------------------------------


def _q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pareto_cutpoint(load(spark, sf_dir, "orders"), "o_custkey",
                           "o_totalprice")


_ORACLE_PARETO = f"""
WITH per_key AS (
  SELECT o_custkey AS k,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS rev
  FROM orders GROUP BY 1
), per_val AS (
  SELECT rev AS v, CAST(count(*) AS BIGINT) AS c,
    CAST(rev * count(*) AS BIGINT) AS w
  FROM per_key GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS tc, CAST(sum(w) AS BIGINT) AS tw
  FROM per_val
), cum AS (
  SELECT
    CAST(sum(c) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED
      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c,
    CAST(sum(w) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED
      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_w,
    tot.tc, tot.tw
  FROM per_val, tot
), best AS (
  SELECT min(cum_c) AS top_keys FROM cum
  WHERE {SHARE_DEN} * cum_w >= {SHARE_NUM} * tw
)
SELECT tot.tc AS n_keys, best.top_keys,
  {round_portable_duck(
      f"(SELECT CAST(cum_w AS DOUBLE) / CAST(tw AS DOUBLE) FROM cum "
      f"WHERE cum_c = best.top_keys)", 6)} AS top_share
FROM best, tot
"""


QUERIES: dict = {
    "q_pareto_cutpoint_orders": (_q_pareto, _ORACLE_PARETO),
}

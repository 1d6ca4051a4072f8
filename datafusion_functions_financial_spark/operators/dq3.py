"""Data-quality #3: functional-dependency audit (which candidate
key -> attribute rules actually hold, and how badly the violations
leak) and a per-column cardinality profile (distinct ratio, null
share, top-value concentration) — the schema-discovery companions to
the null-profile / uniqueness / skew checks in dq.py, dq2.py and
skew.py.

Everything is exact integer arithmetic until the final ratios, so
both engines agree bit-for-bit after portable rounding.

Plan shapes at scale: each FD is ONE hash aggregate on the LHS key
(count distinct RHS per key, map-side combinable) followed by a
scalar reduction; each profiled column is one value-count aggregate
reduced to (distinct, max-count) — no joins, no sorts, no windows
over data. Column results union into one small frame.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["fd_violations", "cardinality_profile"]

FDS_LINEITEM = (
    ("l_orderkey", "l_returnflag"),
    ("l_orderkey", "l_shipdate"),
    ("l_partkey", "l_extendedprice"),
    ("l_suppkey", "l_linestatus"),
)
PROFILE_ORDERS = ("o_orderstatus", "o_orderpriority", "o_custkey",
                  "o_totalprice")


def fd_violations(df: DataFrame,
                  fds: tuple[tuple[str, str], ...]) -> DataFrame:
    """(fd, n_keys, n_violating, violation_rate) per candidate
    functional dependency lhs -> rhs: a key violates when it maps to
    more than one distinct rhs value (NULL counts as a value of its
    own via the null-safe distinct)."""
    outs = []
    for lhs, rhs in fds:
        per_key = df.groupBy(lhs).agg(
            F.countDistinct(rhs).alias("__d"),
            F.sum(F.expr(
                f"CASE WHEN {rhs} IS NULL THEN 1 ELSE 0 END"
            )).alias("__nn"),
        ).select(
            lhs,
            (F.col("__d")
             + F.expr("CASE WHEN __nn > 0 THEN 1 ELSE 0 END")
             ).alias("__dn"),
        )
        outs.append(per_key.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.expr(
                "CASE WHEN __dn > 1 THEN 1 ELSE 0 END"
            )).cast("bigint").alias("n_violating"),
        ).select(F.lit(f"{lhs}->{rhs}").alias("fd"),
                 "n_keys", "n_violating"))
    out = reduce(lambda a, b: a.unionAll(b), outs)
    return out.select(
        "fd", "n_keys", "n_violating",
        round_portable(F.expr(
            "CAST(n_violating AS DOUBLE) / CAST(n_keys AS DOUBLE)"), 6
        ).alias("violation_rate"),
    )


def _q_fd_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fd_violations(load(spark, sf_dir, "lineitem"),
                         FDS_LINEITEM)


def _duck_fd_one(lhs: str, rhs: str) -> str:
    return f"""
SELECT '{lhs}->{rhs}' AS fd,
  CAST(count(*) AS BIGINT) AS n_keys,
  CAST(sum(CASE WHEN dn > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_violating,
  {round_portable_duck(
      "CAST(sum(CASE WHEN dn > 1 THEN 1 ELSE 0 END) AS DOUBLE) "
      "/ CAST(count(*) AS DOUBLE)", 6)} AS violation_rate
FROM (
  SELECT {lhs},
    count(DISTINCT {rhs})
      + CASE WHEN sum(CASE WHEN {rhs} IS NULL THEN 1 ELSE 0 END) > 0
        THEN 1 ELSE 0 END AS dn
  FROM lineitem GROUP BY 1
)"""


_ORACLE_FD_LINEITEM = "\nUNION ALL\n".join(
    _duck_fd_one(l, r) for l, r in FDS_LINEITEM)


def cardinality_profile(df: DataFrame, table_expr_cols: tuple[str, ...]
                        ) -> DataFrame:
    """(column, n, n_distinct, n_null, distinct_ratio, top_share) per
    profiled column: exact distinct count, null count, and the share
    of the most frequent non-null value."""
    outs = []
    for c in table_expr_cols:
        counts = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c).agg(F.count(F.lit(1)).alias("__c"))
        )
        stats = counts.agg(
            F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint")
            .alias("__nv"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.coalesce(F.max("__c"), F.lit(0)).cast("bigint")
            .alias("__top"),
        ).select(F.lit(c).alias("column"), "__nv", "n_distinct",
                 "__top")
        nulls = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr(
                f"CASE WHEN {c} IS NULL THEN 1 ELSE 0 END"
            )).cast("bigint").alias("n_null"),
        )
        outs.append(stats.crossJoin(F.broadcast(nulls)))
    out = reduce(lambda a, b: a.unionAll(b), outs)
    return out.select(
        "column", "n", "n_distinct", "n_null",
        round_portable(F.expr(
            "CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE)"), 6
        ).alias("distinct_ratio"),
        round_portable(F.expr(
            "CASE WHEN __nv > 0 THEN CAST(__top AS DOUBLE) "
            "/ CAST(n AS DOUBLE) END"), 6).alias("top_share"),
    )


def _q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cardinality_profile(load(spark, sf_dir, "orders"),
                               PROFILE_ORDERS)


def _duck_profile_one(c: str) -> str:
    return f"""
SELECT '{c}' AS "column",
  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n,
  CAST(count(*) AS BIGINT) AS n_distinct,
  (SELECT CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) FROM orders) AS n_null,
  {round_portable_duck(
      "CAST(count(*) AS DOUBLE) / CAST((SELECT count(*) FROM orders)"
      " AS DOUBLE)", 6)} AS distinct_ratio,
  {round_portable_duck(
      "CASE WHEN CAST(sum(c) AS BIGINT) > 0 THEN "
      "CAST(CAST(max(c) AS BIGINT) AS DOUBLE) "
      "/ CAST((SELECT count(*) FROM orders) AS DOUBLE) END", 6)}
    AS top_share
FROM (
  SELECT {c} AS v, count(*) AS c FROM orders
  WHERE {c} IS NOT NULL GROUP BY 1
)"""


_ORACLE_PROFILE_ORDERS = "\nUNION ALL\n".join(
    _duck_profile_one(c) for c in PROFILE_ORDERS)


QUERIES: dict = {
    "dq_fd_violations_lineitem": (_q_fd_lineitem, _ORACLE_FD_LINEITEM),
    "dq_cardinality_profile_orders": (
        _q_profile_orders, _ORACLE_PROFILE_ORDERS),
}

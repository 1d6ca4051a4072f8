"""Analytics #8: cross-table reconciliation (the order-header vs
line-sum audit every billing pipeline runs) and the ship-latency
distribution (order date → ship date, exact per-priority order
statistics).

Reconciliation semantics: each order's recomputed total
``Σ extendedprice·(1−discount)·(1+tax)`` is compared with the stored
``o_totalprice`` in integer CENTS (both sides rounded to cents per
line / per header before differencing — the SCALING.md decimal
rule), reporting per-status match counts and the worst absolute
discrepancies. On the synthetic tables the header is generated
independently of the lines, so virtually nothing reconciles — the
operator's job is the exact discrepancy distribution, not a green
checkmark.

Latency semantics: per (priority), the exact min / p50 / p90 / max
of ``l_shipdate − o_orderdate`` in whole days, order-statistic
ranks (no interpolation) with the repo's reach-test pattern over the
distinct-day relation — no data-sized sort.

Plan shapes at scale: reconciliation is one line-side hash aggregate
on the order key joined to the header (both sides shuffle on
o_orderkey once; at 100 TB bucket both tables by order key and the
join is exchange-free), then a per-status rollup and a bounded
top-k discrepancy list via TakeOrdered. Latency joins on the order
key, buckets to whole days, and aggregates per (priority, days) —
the rank pass runs over that distinct-day relation (priorities ×
day-range rows, thousands at most).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["reconciliation_report", "ship_latency_profile"]

TOPK_DISCREPANCIES = 10
US_PER_DAY = 86_400_000_000


def reconciliation_report(orders: DataFrame, lineitem: DataFrame
                          ) -> DataFrame:
    """(o_orderstatus, n_orders, n_no_lines, n_match, mean_abs_diff):
    per-status reconciliation of header totals against recomputed
    line sums, exact integer cents throughout."""
    line_cents = lineitem.selectExpr(
        "l_orderkey",
        "CAST(round(l_extendedprice * (1 - l_discount) "
        "* (1 + l_tax) * 100) AS BIGINT) AS __lc",
    ).groupBy("l_orderkey").agg(F.sum("__lc").alias("__line_total"))
    joined = (
        orders.selectExpr(
            "o_orderkey", "o_orderstatus",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS __hdr")
        .join(line_cents,
              F.col("o_orderkey") == F.col("l_orderkey"), "left")
    )
    agg = joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.expr(
            "CASE WHEN __line_total IS NULL THEN 1 ELSE 0 END"
        )).cast("bigint").alias("n_no_lines"),
        F.sum(F.expr(
            "CASE WHEN __line_total = __hdr THEN 1 ELSE 0 END"
        )).cast("bigint").alias("n_match"),
        F.sum(F.expr(
            "CASE WHEN __line_total IS NOT NULL "
            "THEN abs(__hdr - __line_total) ELSE 0 END"
        )).cast("bigint").alias("__sum_abs"),
        F.sum(F.expr(
            "CASE WHEN __line_total IS NOT NULL THEN 1 ELSE 0 END"
        )).cast("bigint").alias("__n_lined"),
    )
    return agg.select(
        "o_orderstatus", "n_orders", "n_no_lines", "n_match",
        round_portable(F.expr(
            "CASE WHEN __n_lined > 0 THEN CAST(__sum_abs AS DOUBLE) "
            "/ (CAST(__n_lined AS DOUBLE) * 100.0) END"), 4
        ).alias("mean_abs_diff"),
    )


def top_discrepancies(orders: DataFrame, lineitem: DataFrame,
                      k: int = TOPK_DISCREPANCIES) -> DataFrame:
    """(o_orderkey, header_total, line_total, abs_diff): the ``k``
    worst reconciliation misses (orders with lines only), ties to
    the smaller key — a TakeOrdered top-k, no global sort."""
    line_cents = lineitem.selectExpr(
        "l_orderkey",
        "CAST(round(l_extendedprice * (1 - l_discount) "
        "* (1 + l_tax) * 100) AS BIGINT) AS __lc",
    ).groupBy("l_orderkey").agg(F.sum("__lc").alias("__line_total"))
    joined = (
        orders.selectExpr(
            "o_orderkey",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS __hdr")
        .join(line_cents,
              F.col("o_orderkey") == F.col("l_orderkey"))
        .withColumn("__ad", F.expr("abs(__hdr - __line_total)"))
    )
    return (
        joined.orderBy(F.col("__ad").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select(
            "o_orderkey",
            round_portable(F.expr("__hdr / 100.0"), 2)
            .alias("header_total"),
            round_portable(F.expr("__line_total / 100.0"), 2)
            .alias("line_total"),
            round_portable(F.expr("__ad / 100.0"), 2).alias("abs_diff"),
        )
    )


def ship_latency_profile(orders: DataFrame, lineitem: DataFrame,
                         ) -> DataFrame:
    """(o_orderpriority, n_lines, min_days, p50_days, p90_days,
    max_days): exact order-statistic latency profile of
    ``l_shipdate − o_orderdate`` in whole days per priority. p50/p90
    are the ceil(q·n)-th smallest values via a cumulative reach test
    over the per-(priority, days) count relation."""
    lat = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate",
                            "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .selectExpr(
            "o_orderpriority",
            "CAST((unix_micros(CAST(l_shipdate AS TIMESTAMP)) "
            "- unix_micros(CAST(o_orderdate AS TIMESTAMP))) "
            f"DIV {US_PER_DAY} AS BIGINT) AS __days")
    )
    cells = lat.groupBy("o_orderpriority", "__days").agg(
        F.count(F.lit(1)).alias("__c"))
    w = ("PARTITION BY o_orderpriority ORDER BY __days "
         "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
    staged = (
        cells
        .withColumn("__cum", F.expr(f"sum(__c) OVER ({w})"))
        .withColumn("__n", F.expr(
            "sum(__c) OVER (PARTITION BY o_orderpriority)"))
    )
    agg = staged.groupBy("o_orderpriority").agg(
        F.sum("__c").cast("bigint").alias("n_lines"),
        F.min("__days").cast("bigint").alias("min_days"),
        F.max("__days").cast("bigint").alias("max_days"),
        F.min(F.expr(
            "CASE WHEN __cum * 2 >= __n THEN __days END"
        )).cast("bigint").alias("p50_days"),
        F.min(F.expr(
            "CASE WHEN __cum * 10 >= __n * 9 THEN __days END"
        )).cast("bigint").alias("p90_days"),
    )
    return agg.select("o_orderpriority", "n_lines", "min_days",
                      "p50_days", "p90_days", "max_days")


def _q_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return reconciliation_report(load(spark, sf_dir, "orders"),
                                 load(spark, sf_dir, "lineitem"))


def _q_discrepancies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_discrepancies(load(spark, sf_dir, "orders"),
                             load(spark, sf_dir, "lineitem"))


def _q_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ship_latency_profile(load(spark, sf_dir, "orders"),
                                load(spark, sf_dir, "lineitem"))


_LINE_CENTS_DUCK = """
line_cents AS (
  SELECT l_orderkey,
    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
      * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS line_total
  FROM lineitem GROUP BY 1
)"""

_ORACLE_RECONCILE = f"""
WITH {_LINE_CENTS_DUCK}
, joined AS (
  SELECT o.o_orderstatus,
    CAST(round(o.o_totalprice * 100) AS BIGINT) AS hdr,
    lc.line_total
  FROM orders o LEFT JOIN line_cents lc
    ON o.o_orderkey = lc.l_orderkey
), agg AS (
  SELECT o_orderstatus,
    CAST(count(*) AS BIGINT) AS n_orders,
    CAST(sum(CASE WHEN line_total IS NULL THEN 1 ELSE 0 END)
      AS BIGINT) AS n_no_lines,
    CAST(sum(CASE WHEN line_total = hdr THEN 1 ELSE 0 END)
      AS BIGINT) AS n_match,
    CAST(sum(CASE WHEN line_total IS NOT NULL
      THEN abs(hdr - line_total) ELSE 0 END) AS BIGINT) AS sum_abs,
    CAST(sum(CASE WHEN line_total IS NOT NULL THEN 1 ELSE 0 END)
      AS BIGINT) AS n_lined
  FROM joined GROUP BY 1
)
SELECT o_orderstatus, n_orders, n_no_lines, n_match,
  {round_portable_duck(
      "CASE WHEN n_lined > 0 THEN CAST(sum_abs AS DOUBLE) "
      "/ (CAST(n_lined AS DOUBLE) * 100.0) END", 4)} AS mean_abs_diff
FROM agg
"""

_ORACLE_DISCREPANCIES = f"""
WITH {_LINE_CENTS_DUCK}
, joined AS (
  SELECT o.o_orderkey,
    CAST(round(o.o_totalprice * 100) AS BIGINT) AS hdr,
    lc.line_total,
    abs(CAST(round(o.o_totalprice * 100) AS BIGINT) - lc.line_total)
      AS ad
  FROM orders o JOIN line_cents lc ON o.o_orderkey = lc.l_orderkey
)
SELECT o_orderkey,
  {round_portable_duck("hdr / 100.0", 2)} AS header_total,
  {round_portable_duck("line_total / 100.0", 2)} AS line_total,
  {round_portable_duck("ad / 100.0", 2)} AS abs_diff
FROM joined
ORDER BY ad DESC, o_orderkey ASC
LIMIT {TOPK_DISCREPANCIES}
"""

_ORACLE_SHIP_LATENCY = f"""
WITH lat AS (
  SELECT o.o_orderpriority,
    CAST((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
      // {US_PER_DAY} AS BIGINT) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), cells AS (
  SELECT o_orderpriority, days, count(*) AS c
  FROM lat GROUP BY 1, 2
), staged AS (
  SELECT o_orderpriority, days, c,
    sum(c) OVER (PARTITION BY o_orderpriority ORDER BY days
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(c) OVER (PARTITION BY o_orderpriority) AS n
  FROM cells
)
SELECT o_orderpriority,
  CAST(sum(c) AS BIGINT) AS n_lines,
  CAST(min(days) AS BIGINT) AS min_days,
  CAST(min(CASE WHEN cum * 2 >= n THEN days END) AS BIGINT)
    AS p50_days,
  CAST(min(CASE WHEN cum * 10 >= n * 9 THEN days END) AS BIGINT)
    AS p90_days,
  CAST(max(days) AS BIGINT) AS max_days
FROM staged GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H-shaped multi-join queries (Q3 / Q16 adaptations)
# --------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-07-01"
Q3_TOPK = 10
Q16_TOPK = 15


def shipping_priority(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame,
                      segment: str = Q3_SEGMENT,
                      cutoff: str = Q3_CUTOFF,
                      k: int = Q3_TOPK) -> DataFrame:
    """TPC-H Q3 shape: top-``k`` unshipped-revenue orders for one
    market segment — orders placed before ``cutoff`` with lines
    shipping after it. Revenue is exact integer cents; ties rank by
    (o_orderdate, l_orderkey). The segment filter broadcasts the
    customer side; the orders⋈lineitem join shuffles on the order
    key; top-k plans as TakeOrdered."""
    c = customer.filter(
        F.col("c_mktsegment") == F.lit(segment)).select("c_custkey")
    o = orders.filter(F.expr(
        f"o_orderdate < TIMESTAMP '{cutoff}'")).select(
        "o_orderkey", "o_custkey", "o_orderdate")
    li = lineitem.filter(F.expr(
        f"l_shipdate > TIMESTAMP '{cutoff}'")).selectExpr(
        "l_orderkey",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT) AS __cents")
    joined = (
        o.join(F.broadcast(c),
               F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate").agg(
        F.sum("__cents").alias("__rev"))
    return (
        agg.orderBy(F.col("__rev").desc(), F.col("o_orderdate").asc(),
                    F.col("o_orderkey").asc())
        .limit(k)
        .select(
            "o_orderkey",
            round_portable(F.expr("__rev / 100.0"), 2).alias("revenue"),
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        )
    )


def parts_supplier_breadth(part: DataFrame, lineitem: DataFrame,
                           k: int = Q16_TOPK) -> DataFrame:
    """TPC-H Q16 shape: (p_brand, p_size, supplier_cnt) — distinct
    suppliers shipping each (brand, size), top-``k`` by count with
    (brand, size) tiebreaks. The part dimension broadcasts; the
    distinct collapses map-side on (brand, size, suppkey) before the
    final count."""
    pl = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_size", "l_suppkey")
        .distinct()
    )
    agg = pl.groupBy("p_brand", "p_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("supplier_cnt"))
    return (
        agg.orderBy(F.col("supplier_cnt").desc(),
                    F.col("p_brand").asc(), F.col("p_size").asc())
        .limit(k)
        .select("p_brand",
                F.col("p_size").cast("bigint").alias("p_size"),
                "supplier_cnt")
    )


def _q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shipping_priority(load(spark, sf_dir, "customer"),
                             load(spark, sf_dir, "orders"),
                             load(spark, sf_dir, "lineitem"))


def _q_parts_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parts_supplier_breadth(load(spark, sf_dir, "part"),
                                  load(spark, sf_dir, "lineitem"))


_ORACLE_Q3 = f"""
WITH li AS (
  SELECT l_orderkey,
    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
      AS cents
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
), agg AS (
  SELECT o.o_orderkey, o.o_orderdate,
         CAST(sum(li.cents) AS BIGINT) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
    AND c.c_mktsegment = '{Q3_SEGMENT}'
  JOIN li ON o.o_orderkey = li.l_orderkey
  WHERE o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  GROUP BY 1, 2
)
SELECT o_orderkey,
  {round_portable_duck("rev / 100.0", 2)} AS revenue,
  o_orderdate
FROM agg
ORDER BY rev DESC, o_orderdate ASC, o_orderkey ASC
LIMIT {Q3_TOPK}
"""

_ORACLE_Q16 = f"""
WITH pl AS (
  SELECT DISTINCT p.p_brand, p.p_size, l.l_suppkey
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), agg AS (
  SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
         CAST(count(*) AS BIGINT) AS supplier_cnt
  FROM pl GROUP BY 1, 2
)
SELECT p_brand, p_size, supplier_cnt
FROM agg
ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC
LIMIT {Q16_TOPK}
"""


QUERIES: dict = {
    "q_reconcile_orders_lineitem": (_q_reconcile, _ORACLE_RECONCILE),
    "q_reconcile_topk_orders": (_q_discrepancies,
                                _ORACLE_DISCREPANCIES),
    "q_ship_latency_orders": (_q_ship_latency, _ORACLE_SHIP_LATENCY),
    "q_shipping_priority_orders": (_q_shipping_priority, _ORACLE_Q3),
    "q_supplier_breadth_parts": (_q_parts_breadth, _ORACLE_Q16),
}

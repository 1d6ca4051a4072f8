"""Third analytics batch: classic OLAP join shapes the earlier batches
don't cover — market share over a snowflake dimension chain (TPC-H Q8
shape) and the customer order-count distribution (TPC-H Q13 shape).

Beyond-reference (the crate has no joins, SURVEY §2.C). Scale shapes:

- market share: orders is the only fact relation; customer, nation,
  region are all explicitly broadcast, so the fact side reaches the
  final per-year aggregation with ZERO pre-aggregation shuffle, and
  the share division happens on yearly integer-cent sums (exact at
  any partial-agg order).
- custdist: a groupBy-of-a-groupBy (orders per customer, then
  customers per order count). The first aggregation is
  map-side-combinable on o_custkey; the second input is one row per
  customer (narrow). The left join against the customer dimension
  keeps zero-order customers in the count-0 bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .series import round_portable, round_portable_duck

__all__ = ["nation_market_share", "customer_order_distribution",
           "seasonality_profile", "cohort_ltv"]

_HOUR_NS = 3_600 * 1_000_000_000
_DAY_NS = 86_400 * 1_000_000_000


def seasonality_profile(events: DataFrame,
                        ts_ns_col: str = "ts",
                        type_col: str = "event_type",
                        value_col: str = "value") -> DataFrame:
    """(event_type, dow, hour, n, avg_cents): activity/value profile
    by day-of-week (0 = Sunday) and UTC hour — the load/seasonality
    heatmap behind capacity planning and anomaly baselines.

    Calendar math is pure INTEGER arithmetic on the epoch-ns column
    (``(days + 4) % 7`` — 1970-01-01 was a Thursday), so both engines
    compute identical buckets without touching calendar functions or
    session time zones; one map-side-combinable groupBy.
    """
    return (
        events.selectExpr(
            f"{type_col} AS event_type",
            f"CAST(({ts_ns_col} DIV {_DAY_NS} + 4) % 7 AS BIGINT)"
            f" AS dow",
            f"CAST({ts_ns_col} DIV {_HOUR_NS} % 24 AS BIGINT) AS hour",
            f"CAST(round({value_col} * 100) AS BIGINT) AS cents",
        )
        .groupBy("event_type", "dow", "hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            round_portable(F.expr(
                "CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
            )).alias("avg_cents"),
        )
    )


def nation_market_share(orders: DataFrame, customer: DataFrame,
                        nation: DataFrame, region: DataFrame,
                        region_name: str,
                        nation_name: str) -> DataFrame:
    """Per-year share of ``nation_name``'s order revenue within
    ``region_name``: (o_year, region_cents, nation_cents, share).
    Revenue accumulates as integer cents; only the final share is a
    double."""
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    joined = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey",
                                        "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == region_name)
    )
    yearly = (
        joined.withColumn("o_year", F.year("o_orderdate"))
        .withColumn("__cents", cents)
        .groupBy("o_year")
        .agg(
            F.sum("__cents").alias("region_cents"),
            F.sum(F.when(F.col("n_name") == nation_name,
                         F.col("__cents")).otherwise(F.lit(0)))
            .alias("nation_cents"),
        )
    )
    share = ("CAST(nation_cents AS DOUBLE) "
             "/ CAST(region_cents AS DOUBLE)")
    return yearly.select(
        "o_year",
        F.col("region_cents").cast("bigint").alias("region_cents"),
        F.col("nation_cents").cast("bigint").alias("nation_cents"),
        round_portable(F.expr(share)).alias("share"),
    )


def customer_order_distribution(customer: DataFrame,
                                orders: DataFrame) -> DataFrame:
    """(c_count, custdist): how many customers placed exactly
    ``c_count`` orders — including the zero-order bucket."""
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_custkey", "o_orderkey"),
              customer.c_custkey == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Gate queries (R05 queue)
# ---------------------------------------------------------------------------

_REGION = "ASIA"
_NATION = "NATION_7"  # one of ASIA's five nations in the synthetic dims


def _q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nation_market_share(
        load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "nation"), load(spark, sf_dir, "region"),
        _REGION, _NATION)


_ORACLE_MARKET_SHARE = f"""
WITH j AS (
  SELECT year(o_orderdate) AS o_year, n_name,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{_REGION}'
), y AS (
  SELECT o_year,
         CAST(sum(cents) AS BIGINT) AS region_cents,
         CAST(sum(CASE WHEN n_name = '{_NATION}' THEN cents ELSE 0 END)
              AS BIGINT) AS nation_cents
  FROM j GROUP BY o_year
)
SELECT o_year, region_cents, nation_cents,
  {round_portable_duck(
      "CAST(nation_cents AS DOUBLE) / CAST(region_cents AS DOUBLE)"
  )} AS share
FROM y
"""


def _q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return customer_order_distribution(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders"))


_ORACLE_CUSTDIST = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def cohort_ltv(orders: DataFrame) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by FIRST-order
    month, revenue accumulated by month offset —
    (cohort_month, offset, n_orders, cum_cents). The retention
    triangle's revenue twin (``plans/funnel.cohort_retention`` counts
    users; this sums money).

    Exact end to end: months are integer ``year*12 + month − 1``,
    revenue is integer cents, and the cumulative sum is a prefix
    window over (cohort, offset) aggregates — at most
    cohorts x offsets rows, however large the fact table.
    """
    m = "year(o_orderdate) * 12 + month(o_orderdate) - 1"
    base = orders.selectExpr(
        "o_custkey", f"{m} AS om",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
    first = base.groupBy("o_custkey").agg(
        F.min("om").alias("cohort_month"))
    joined = base.join(first, "o_custkey").withColumn(
        "offset", F.col("om") - F.col("cohort_month"))
    per_cell = joined.groupBy("cohort_month", "offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("__cents"),
    )
    w = (Window.partitionBy("cohort_month").orderBy("offset")
         .rowsBetween(Window.unboundedPreceding, 0))
    return per_cell.withColumn(
        "cum_cents", F.sum("__cents").over(w).cast("bigint")
    ).select("cohort_month", "offset", "n_orders", "cum_cents")


def _q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonality_profile(load(spark, sf_dir, "events"))


_ORACLE_SEASONALITY = f"""
WITH t AS (
  SELECT event_type,
         CAST(((epoch_us(ts) * 1000) // {_DAY_NS} + 4) % 7 AS BIGINT)
           AS dow,
         CAST((epoch_us(ts) * 1000) // {_HOUR_NS} % 24 AS BIGINT)
           AS hour,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, dow, hour,
       CAST(count(*) AS BIGINT) AS n,
  {round_portable_duck(
      "CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
  )} AS avg_cents
FROM t GROUP BY 1, 2, 3
"""


def _q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_ltv(load(spark, sf_dir, "orders"))


_ORACLE_COHORT_LTV = """
WITH base AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS om,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), first AS (
  SELECT o_custkey, min(om) AS cohort_month FROM base GROUP BY 1
), cells AS (
  SELECT f.cohort_month, b.om - f.cohort_month AS "offset",
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(b.cents) AS BIGINT) AS c
  FROM base b JOIN first f USING (o_custkey)
  GROUP BY 1, 2
)
SELECT cohort_month, "offset", n_orders,
       CAST(sum(c) OVER (PARTITION BY cohort_month ORDER BY "offset"
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_cents
FROM cells
"""


QUERIES: dict = {
    "q_market_share_orders": (_q_market_share, _ORACLE_MARKET_SHARE),
    "q_custdist_orders": (_q_custdist, _ORACLE_CUSTDIST),
    "q_seasonality_events": (_q_seasonality, _ORACLE_SEASONALITY),
    "q_cohort_ltv_orders": (_q_cohort_ltv, _ORACLE_COHORT_LTV),
}

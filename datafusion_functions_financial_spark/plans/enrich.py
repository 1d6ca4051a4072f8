"""Semi-structured extraction + outer-join analytics.

- ``q_events_props_extract``: the events stream carries a JSON ``props``
  payload; extract a typed field in the scan projection
  (``get_json_object`` — JVM-side, no Python) and aggregate it. At
  100 TB the JSON parse is the per-row cost; it stays inside
  whole-stage codegen and the aggregation combines map-side.
- ``q_customers_no_orders``: per-nation count of customers that never
  ordered — LEFT ANTI join (orders side reduced to distinct custkeys
  BEFORE the join via the aggregate, so the anti probe is against the
  small distinct set), then a broadcast join to the tiny nation dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["extract_props_field", "customers_without_orders"]


def extract_props_field(events: DataFrame, field: str = "k",
                        props_col: str = "props") -> DataFrame:
    """Add ``props_<field>`` as BIGINT extracted from the JSON payload."""
    return events.withColumn(
        f"props_{field}",
        F.get_json_object(F.col(props_col), f"$.{field}").cast("bigint"),
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame,
                             nation: DataFrame) -> DataFrame:
    """(n_name, n_custs_no_orders): customers with zero qualifying
    orders, by nation. Callers pre-filter ``orders`` (e.g. to big-ticket
    orders); the anti probe runs against the distinct custkey set, not
    the raw orders table."""
    never = customer.join(
        orders.select("o_custkey").distinct(),
        customer["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )
    return (
        never.join(F.broadcast(nation),
                   never["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_custs_no_orders"))
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = extract_props_field(load(spark, sf_dir, "events"))
    return ev.groupBy("event_type").agg(
        F.count("props_k").alias("n_with_k"),
        F.sum("props_k").alias("sum_k"),
        F.min("props_k").alias("min_k"),
        F.max("props_k").alias("max_k"),
    )


_ORACLE_PROPS = """
WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM e GROUP BY event_type
"""


_BIG_ORDER = 300_000.0  # every customer has SOME order in the synthetic
# data; the big-ticket filter makes the anti-join set non-degenerate.


def _q_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > _BIG_ORDER)
    return customers_without_orders(
        load(spark, sf_dir, "customer"), orders,
        load(spark, sf_dir, "nation"),
    )


_ORACLE_NO_ORDERS = f"""
SELECT n.n_name, count(*) AS n_custs_no_orders
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > {_BIG_ORDER!r})
GROUP BY n.n_name
"""

QUERIES: dict = {
    "q_events_props_extract": (_q_props_extract, _ORACLE_PROPS),
    "q_customers_no_orders": (_q_no_orders, _ORACLE_NO_ORDERS),
}

"""RFM (recency / frequency / monetary) customer segmentation — the
classic behavioral scoring a warehouse runs over an order fact table,
implemented with rank arithmetic only (ntile over UNIQUE orderings,
integer cents) so both engines emit identical segments.

Scoring convention: each dimension is an ntile(5) quintile with 5 =
best (most recent / most frequent / highest spend); the segment label
concatenates the three digits ("555" = champions).

Plan shape at scale: one hash aggregation per customer, three
windows over the same single-partition ntile ordering — ntile needs a
total order, so the quintile assignment is a single-task sort of the
CUSTOMER relation (already aggregated: |customers| rows, not
|orders|). At true 100 TB customer counts swap ntile for a
percent_rank over a range-partitioned sort (same scores away from
quintile boundaries) — the aggregation stage is unchanged.

Beyond-reference scope (SURVEY.md extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["rfm_scores"]


def rfm_scores(orders: DataFrame, cust_col: str = "o_custkey",
               date_col: str = "o_orderdate",
               amount_col: str = "o_totalprice") -> DataFrame:
    """(custkey, recency_days, frequency, monetary_cents, r, f, m,
    segment): RFM quintile scores per customer."""
    cents = F.expr(f"CAST(round({amount_col} * 100) AS BIGINT)")
    per = orders.groupBy(F.col(cust_col).alias("custkey")).agg(
        F.max(date_col).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents).alias("monetary_cents"),
    )
    wt = Window.partitionBy()
    per = per.withColumn(
        "recency_days",
        F.datediff(F.max("__last").over(wt), F.col("__last"))
        .cast("bigint"),
    ).drop("__last")
    # 5 = best. Recency: smaller is better -> ntile ascending then
    # invert; frequency/monetary: larger is better -> ntile ascending
    # keeps 5 for the top quintile.
    w_r = Window.orderBy(F.col("recency_days").desc(),
                         F.col("custkey").asc())
    w_f = Window.orderBy(F.col("frequency").asc(), F.col("custkey").asc())
    w_m = Window.orderBy(F.col("monetary_cents").asc(),
                         F.col("custkey").asc())
    scored = (
        per.withColumn("r", F.ntile(5).over(w_r))
        .withColumn("f", F.ntile(5).over(w_f))
        .withColumn("m", F.ntile(5).over(w_m))
    )
    return scored.withColumn(
        "segment", F.concat_ws("", F.col("r"), F.col("f"), F.col("m"))
    )


# --------------------------------------------------------------------------
# Gate query
# --------------------------------------------------------------------------


def _q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rfm_scores(load(spark, sf_dir, "orders"))


_ORACLE_RFM = """
WITH per AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate) AS last_d,
         count(*) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY 1
), rec AS (
  SELECT custkey, frequency, monetary_cents,
         CAST(date_diff('day', last_d, max(last_d) OVER ()) AS BIGINT)
           AS recency_days
  FROM per
), scored AS (
  SELECT *,
         ntile(5) OVER (ORDER BY recency_days DESC, custkey ASC) AS r,
         ntile(5) OVER (ORDER BY frequency ASC, custkey ASC) AS f,
         ntile(5) OVER (ORDER BY monetary_cents ASC, custkey ASC) AS m
  FROM rec
)
SELECT custkey, recency_days, frequency, monetary_cents, r, f, m,
       CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
         AS segment
FROM scored
"""


QUERIES: dict = {
    "rfm_segment_orders": (_q_rfm, _ORACLE_RFM),
}

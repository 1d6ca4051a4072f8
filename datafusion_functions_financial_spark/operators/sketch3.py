"""Sketch algebra, part 3: what the part-1/2 sketches can ANSWER when
combined — join-size estimation from Count-Min inner products and
set-intersection cardinality from HLL inclusion-exclusion. These are
the planner-style questions (how big would this join be? how much do
these audiences overlap?) a platform wants answered WITHOUT running
the join — at 100 TB the sketches are the only pass over the data.

- **CMS join size** (AMS-style): |A ⋈ B| on key k equals
  Σ_k cA(k)·cB(k); the Count-Min row inner product
  Σ_col cA[j,·]·cB[j,·] upper-bounds it (collisions only ADD), so the
  estimate is the MIN over the d rows. Cells are exact integer sums →
  the estimate is deterministic and the inner product is exact BIGINT
  arithmetic.
- **HLL intersection**: |A∩B| = E(A) + E(B) − E(A∪B), where the
  union estimate comes from register-wise max (merge) — identical to
  estimating over the concatenated inputs, which is what the oracle
  does. All three estimates round identically before the subtraction.

Both gate queries also report the EXACT answer so the sketch error is
visible in the gate output (the same audit convention as the CMS
top-k gate).

Plan shape at scale: each sketch build is one linear scan folding to
≤ 2048 (CMS) / ≤ 512 (HLL) rows; everything after joins or unions
those tiny relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP, round_portable, round_portable_duck
from ..sources.tables import load
from .sketch import _estimate_from_registers, duck_hll_sql, \
    hll_registers, merge_registers
from .sketch2 import CMS_D, _duck_cms_cols, cms_build

__all__ = ["cms_join_size", "hll_intersection"]


def cms_join_size(a: DataFrame, key_a: str, b: DataFrame,
                  key_b: str) -> DataFrame:
    """(est_join_size, row_j_used): Count-Min estimate of
    |A ⋈ B on key| — min over sketch rows of the cell inner product.
    Exact BIGINT arithmetic end to end."""
    ca = cms_build(a.selectExpr(f"{key_a} AS v"), "v")
    cb = cms_build(b.selectExpr(f"{key_b} AS v"), "v")
    prod = (
        ca.selectExpr("row_j", "col", "c AS ca")
        .join(cb.selectExpr("row_j", "col", "c AS cb"),
              ["row_j", "col"])
        .groupBy("row_j")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    pick = F.struct(F.col("ip"), F.col("row_j"))
    return prod.agg(
        F.min("ip").cast("bigint").alias("est_join_size"),
        F.min_by("row_j", pick).cast("int").alias("row_j_used"),
    )


def hll_intersection(a: DataFrame, expr_a: str, b: DataFrame,
                     expr_b: str) -> DataFrame:
    """(est_a, est_b, est_union, est_intersection): HLL
    inclusion-exclusion overlap estimate. The union sketch is the
    register-wise max of the two input sketches."""
    ra = hll_registers(a, expr_a)
    rb = hll_registers(b, expr_b)
    ea = _estimate_from_registers(ra, ()).selectExpr(
        "approx_distinct AS est_a")
    eb = _estimate_from_registers(rb, ()).selectExpr(
        "approx_distinct AS est_b")
    eu = _estimate_from_registers(merge_registers(ra, rb), ()) \
        .selectExpr("approx_distinct AS est_union")
    return (
        ea.crossJoin(eb).crossJoin(eu)
        .withColumn("est_intersection", round_portable(
            F.col("est_a") + F.col("est_b") - F.col("est_union")))
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    est = cms_join_size(o, "o_custkey", c, "c_custkey")
    exact = o.join(c, o.o_custkey == c.c_custkey).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_join_size"))
    return est.crossJoin(exact)


def _duck_cms_cells(src_expr: str) -> str:
    return (
        "SELECT row_j, col, CAST(sum(1) AS BIGINT) AS c FROM ("
        + " UNION ALL ".join(
            f"SELECT {j} AS row_j, {_duck_cms_cols('v', j)} AS col "
            f"FROM ({src_expr})"
            for j in range(CMS_D))
        + ") GROUP BY row_j, col"
    )


_ORACLE_JOIN_SIZE = f"""
WITH ca AS ({_duck_cms_cells("SELECT o_custkey AS v FROM orders")}),
cb AS ({_duck_cms_cells("SELECT c_custkey AS v FROM customer")}),
prod AS (
  SELECT ca.row_j, CAST(sum(ca.c * cb.c) AS BIGINT) AS ip
  FROM ca JOIN cb ON ca.row_j = cb.row_j AND ca.col = cb.col
  GROUP BY 1
), est AS (
  -- argmin, not min(row_j): the winning row is the one holding the
  -- smallest inner product (row index breaks exact ties).
  SELECT CAST(ip AS BIGINT) AS est_join_size,
         CAST(row_j AS INT) AS row_j_used
  FROM prod ORDER BY ip, row_j LIMIT 1
), exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_join_size
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT * FROM est, exact
"""


def _q_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    viewers = ev.filter("event_type = 'view'")
    buyers = ev.filter("event_type = 'purchase'")
    est = hll_intersection(viewers, "user_id", buyers, "user_id")
    exact = (
        viewers.select("user_id").distinct()
        .join(buyers.select("user_id").distinct(), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_overlap"))
    )
    return est.crossJoin(exact)


_ORACLE_OVERLAP = f"""
WITH ea AS (
  SELECT approx_distinct AS est_a FROM (
    {duck_hll_sql(
        "(SELECT * FROM events WHERE event_type = 'view')",
        "user_id", ())})
), eb AS (
  SELECT approx_distinct AS est_b FROM (
    {duck_hll_sql(
        "(SELECT * FROM events WHERE event_type = 'purchase')",
        "user_id", ())})
), eu AS (
  SELECT approx_distinct AS est_union FROM (
    {duck_hll_sql(
        "(SELECT * FROM events WHERE event_type IN ('view', 'purchase'))",
        "user_id", ())})
), exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_overlap FROM (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  )
)
SELECT est_a, est_b, est_union,
  {round_portable_duck("est_a + est_b - est_union")}
    AS est_intersection,
  exact_overlap
FROM ea, eb, eu, exact
"""


QUERIES: dict = {
    "q_joinsize_cms_orders": (_q_join_size, _ORACLE_JOIN_SIZE),
    "q_overlap_hll_events": (_q_overlap, _ORACLE_OVERLAP),
}

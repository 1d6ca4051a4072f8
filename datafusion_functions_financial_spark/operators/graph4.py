"""Graph analytics #4: Newman modularity of an attribute partition
over the co-purchase graph — "do co-purchases concentrate within
brands?" — the partition-quality score that complements degree
assortativity (graph3) with a per-community decomposition:

``Q = Σ_c [ m_c/m − (d_c / 2m)² ]``

where m = total edges, m_c = intra-community edges, d_c = total
degree of community c. Q > 0 means denser-than-chance communities.

Everything is exact integer counting over the capped co-purchase
edge relation (analytics4.copurchase_pairs — the basket-cap guards
apply); the per-community closed forms quantize to BIGINT before the
cross-community total so Q is add-order-free. Community labels come
from a broadcast of the part dimension.

Plan shape at scale: the edge relation (already bounded by the
basket cap) joins the broadcast attribute twice (both endpoints),
then two community-keyed hash aggregates — community cardinality
(~25 brands) bounds everything downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["attribute_modularity"]

Q8 = 10 ** 8
Q8F = float(Q8)


def attribute_modularity(edges: DataFrame, attrs: DataFrame,
                         node_col: str, attr_col: str) -> DataFrame:
    """(community, n_nodes, m_intra, d_sum, q_term, q_total) from an
    undirected edge relation (item_a, item_b) and a node->attribute
    dimension. Nodes appearing in no edge contribute nothing (degree
    0 communities are absent by construction)."""
    a = attrs.select(F.col(node_col).alias("item_a"),
                     F.col(attr_col).alias("__ca"))
    b = attrs.select(F.col(node_col).alias("item_b"),
                     F.col(attr_col).alias("__cb"))
    labeled = (
        edges.join(F.broadcast(a), "item_a")
        .join(F.broadcast(b), "item_b")
    )
    m_total = labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("__m"))
    intra = (
        labeled.filter(F.col("__ca") == F.col("__cb"))
        .groupBy(F.col("__ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("m_intra"))
    )
    deg = (
        labeled.select(F.col("__ca").alias("community"))
        .unionAll(labeled.select(F.col("__cb").alias("community")))
        .groupBy("community")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_sum"))
    )
    nodes = (
        labeled.select(F.col("item_a").alias("n"),
                       F.col("__ca").alias("community"))
        .unionAll(labeled.select(F.col("item_b").alias("n"),
                                 F.col("__cb").alias("community")))
        .distinct()
        .groupBy("community")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    per_c = (
        deg.join(intra, "community", "left")
        .join(nodes, "community")
        .crossJoin(F.broadcast(m_total))
        .withColumn("m_intra", F.expr(
            "coalesce(m_intra, CAST(0 AS BIGINT))"))
    )
    q_term = ("(CAST(m_intra AS DOUBLE) / CAST(__m AS DOUBLE) "
              "- (CAST(d_sum AS DOUBLE) / (2.0 * CAST(__m AS DOUBLE)))"
              " * (CAST(d_sum AS DOUBLE) "
              "/ (2.0 * CAST(__m AS DOUBLE))))")
    scored = per_c.withColumn("__qq", F.expr(
        f"CAST(round({q_term} * {Q8}) AS BIGINT)"))
    return scored.select(
        "community", "n_nodes", "m_intra", "d_sum",
        round_portable(F.expr(
            f"CAST(__qq AS DOUBLE) / {Q8F!r}"), 6).alias("q_term"),
        round_portable(F.expr(
            f"CAST(sum(__qq) OVER () AS DOUBLE) / {Q8F!r}"), 6
        ).alias("q_total"),
    )


def _q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.analytics4 import copurchase_pairs
    from .cc import COPURCHASE_MIN_COUNT
    li = load(spark, sf_dir, "lineitem")
    edges = copurchase_pairs(li, "l_orderkey", "l_partkey",
                             min_count=COPURCHASE_MIN_COUNT
                             ).select("item_a", "item_b")
    parts = load(spark, sf_dir, "part")
    return attribute_modularity(edges, parts, "p_partkey", "p_brand")


_MOD_QT = ("(CAST(m_intra AS DOUBLE) / CAST(m AS DOUBLE) "
           "- (CAST(d_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))"
           " * (CAST(d_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))))")

_ORACLE_MODULARITY = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS ik FROM lineitem
), edges AS (
  SELECT l.ik AS item_a, r.ik AS item_b
  FROM b l JOIN b r ON l.bk = r.bk AND l.ik < r.ik
  GROUP BY 1, 2
  HAVING count(*) >= 2
), labeled AS (
  SELECT e.item_a, e.item_b, pa.p_brand AS ca, pb.p_brand AS cb
  FROM edges e
  JOIN part pa ON pa.p_partkey = e.item_a
  JOIN part pb ON pb.p_partkey = e.item_b
), mt AS (
  SELECT CAST(count(*) AS BIGINT) AS m FROM labeled
), intra AS (
  SELECT ca AS community, CAST(count(*) AS BIGINT) AS m_intra
  FROM labeled WHERE ca = cb GROUP BY 1
), deg AS (
  SELECT community, CAST(count(*) AS BIGINT) AS d_sum FROM (
    SELECT ca AS community FROM labeled
    UNION ALL SELECT cb FROM labeled) t
  GROUP BY 1
), nodes AS (
  SELECT community, CAST(count(*) AS BIGINT) AS n_nodes FROM (
    SELECT DISTINCT item_a AS n, ca AS community FROM labeled
    UNION SELECT DISTINCT item_b, cb FROM labeled) t
  GROUP BY 1
), per_c AS (
  SELECT d.community, n.n_nodes,
    coalesce(i.m_intra, CAST(0 AS BIGINT)) AS m_intra,
    d.d_sum, mt.m
  FROM deg d
  LEFT JOIN intra i ON i.community = d.community
  JOIN nodes n ON n.community = d.community
  CROSS JOIN mt
), scored AS (
  SELECT community, n_nodes, m_intra, d_sum,
    CAST(round({_MOD_QT} * {Q8}) AS BIGINT) AS qq
  FROM per_c
)
SELECT community, n_nodes, m_intra, d_sum,
  {round_portable_duck(f"CAST(qq AS DOUBLE) / {Q8F!r}", 6)}
    AS q_term,
  {round_portable_duck(
      f"CAST(sum(qq) OVER () AS DOUBLE) / {Q8F!r}", 6)} AS q_total
FROM scored
"""


QUERIES: dict = {
    "graph_modularity_parts": (_q_modularity, _ORACLE_MODULARITY),
}

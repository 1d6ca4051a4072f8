"""Graph ops #6: rich-club coefficient — for each degree threshold
k, the edge density among the nodes with degree > k:
phi(k) = 2 * E_k / (N_k * (N_k - 1)). A rising phi(k) means hubs
preferentially interconnect (the "rich club" — e.g. frequently
co-purchased staples forming a dense core); flat/falling phi flags
hub-and-spoke structure. Complements degree assortativity (gated
``graph_assortativity_lineitem``) with a per-threshold curve instead
of one correlation.

Engine-exactness: integer degrees, counts, and edge tallies end to
end; one double division per threshold row.

Plan shape at 100 TB: degree is one map-side-combinable aggregate;
each threshold's edge count is the edge list joined to the (tiny,
broadcast-eligible) degree relation twice and filtered — the
thresholds share one join pass via an exploded threshold array, so
the edge list is touched once regardless of how many k are scored.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (graph tier).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["rich_club"]

THRESHOLDS = (2, 4, 8)


def rich_club(edges: DataFrame, a_col: str, b_col: str,
              thresholds: Sequence[int] = THRESHOLDS) -> DataFrame:
    """(k, n_nodes, n_edges, phi): rich-club coefficient at each
    degree threshold (rows where fewer than 2 nodes qualify report
    phi = 0)."""
    # materialize once: the edge relation feeds degree + both sides
    # of the degree join, and degree feeds three consumers (the graph5
    # lesson — 43 exchanges at sf0.01 without the checkpoints)
    e = edges.select(F.col(a_col).alias("__x"),
                     F.col(b_col).alias("__y")).localCheckpoint()
    ends = e.selectExpr("__x AS __v").unionAll(
        e.selectExpr("__y AS __v"))
    deg = ends.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__d")).localCheckpoint()
    ks = ", ".join(str(int(k)) for k in thresholds)
    kdf = (f"explode(array({ks})) AS k",)
    # every threshold emits a row even when its club is empty (an SF
    # change must not change the result-set SHAPE, only its values)
    krel = edges.sparkSession.range(1).selectExpr(kdf[0])
    nodes_k = (
        deg.select(F.expr(kdf[0]), "__v", "__d")
        .filter(F.col("__d") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    nodes_k = (
        krel.join(nodes_k, "k", "left")
        .withColumn("n_nodes",
                    F.coalesce(F.col("n_nodes"), F.lit(0))
                    .cast("bigint"))
    )
    withdeg = (
        e.join(deg.withColumnRenamed("__v", "__x")
               .withColumnRenamed("__d", "__dx"), "__x")
        .join(deg.withColumnRenamed("__v", "__y")
              .withColumnRenamed("__d", "__dy"), "__y")
    )
    edges_k = (
        withdeg.select(F.expr(kdf[0]), "__dx", "__dy")
        .filter((F.col("__dx") > F.col("k"))
                & (F.col("__dy") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )
    return (
        nodes_k.join(edges_k, "k", "left")
        .withColumn("n_edges",
                    F.coalesce(F.col("n_edges"), F.lit(0))
                    .cast("bigint"))
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_nodes", "n_edges",
            round_portable(F.expr(
                "CASE WHEN n_nodes >= 2 THEN "
                "CAST(2 * n_edges AS DOUBLE) "
                "/ CAST(n_nodes * (n_nodes - 1) AS DOUBLE) "
                "ELSE 0.0 END"), 6).alias("phi"),
        )
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (part co-purchase graph)
# --------------------------------------------------------------------------


def _q_richclub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.analytics4 import copurchase_pairs
    li = load(spark, sf_dir, "lineitem")
    edges = copurchase_pairs(li, "l_orderkey", "l_partkey",
                             min_count=2)
    return rich_club(edges, "item_a", "item_b")


_KS_SQL = ", ".join(str(k) for k in THRESHOLDS)

_ORACLE_RICHCLUB = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
), e AS (
  SELECT l.it AS x, r.it AS y
  FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
  GROUP BY 1, 2 HAVING count(*) >= 2
), ends AS (
  SELECT x AS v FROM e UNION ALL SELECT y AS v FROM e
), deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM ends GROUP BY 1
), ks AS (SELECT unnest([{_KS_SQL}]) AS k),
nodes_k AS (
  SELECT ks.k,
    CAST(count(deg.v) AS BIGINT) AS n_nodes
  FROM ks LEFT JOIN deg ON deg.d > ks.k GROUP BY 1
), edges_k AS (
  SELECT ks.k, CAST(count(*) AS BIGINT) AS n_edges
  FROM ks, e
  JOIN deg dx ON e.x = dx.v JOIN deg dy ON e.y = dy.v
  WHERE dx.d > ks.k AND dy.d > ks.k
  GROUP BY 1
)
SELECT CAST(nodes_k.k AS BIGINT) AS k, nodes_k.n_nodes,
  CAST(coalesce(edges_k.n_edges, 0) AS BIGINT) AS n_edges,
  {round_portable_duck(
      "CASE WHEN nodes_k.n_nodes >= 2 THEN "
      "CAST(2 * coalesce(edges_k.n_edges, 0) AS DOUBLE) "
      "/ CAST(nodes_k.n_nodes * (nodes_k.n_nodes - 1) AS DOUBLE) "
      "ELSE 0.0 END", 6)} AS phi
FROM nodes_k LEFT JOIN edges_k ON nodes_k.k = edges_k.k
"""


QUERIES: dict = {
    "graph_richclub_parts": (_q_richclub, _ORACLE_RICHCLUB),
}

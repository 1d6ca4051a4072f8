"""Graph ops #5: per-node local clustering coefficient — the
node-level companion to the gated global ``triangle_count``
(``graph_triangles_lineitem``): lcc(v) = 2 t(v) / (d(v)(d(v)-1)),
the fraction of v's neighbor pairs that are themselves connected.
High-lcc nodes sit in tight communities; lcc ~ 0 flags hub/bridge
nodes — the standard structural feature for graph-aware sampling.

Same degree-oriented wedge join as the global counter (each triangle
enumerated exactly once from its lowest-(degree, id) corner,
O(m^1.5) work), but the closing join KEEPS the three corner
identities, explodes each triangle to its nodes, and counts per
node. All integers until the final lcc division.

Plan shape at 100 TB: degree is one map-side-combinable aggregate;
the wedge join fans out from the low-degree endpoint (the
orientation bounds per-node wedge counts by the degeneracy); the
per-node reduction is one hash aggregate; top-k is TakeOrdered.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (graph tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["local_clustering"]

TOPK = 20


def local_clustering(edges: DataFrame, a_col: str, b_col: str,
                     k: int = TOPK) -> DataFrame:
    """(node, degree, n_triangles, lcc): top-``k`` nodes by local
    clustering coefficient (ties by node id) among nodes with
    degree >= 2."""
    # The edge relation feeds FIVE consumers (degree, two sides of the
    # degree join, the canonical key set, and — via orientation — both
    # sides of the wedge self-join); without a materialization point
    # the upstream edge construction re-executes for each (measured 79
    # exchanges at sf0.01 -> 11 after the two checkpoints).
    e = edges.select(F.col(a_col).alias("__x"),
                     F.col(b_col).alias("__y")).localCheckpoint()
    ends = e.selectExpr("__x AS __v").unionAll(
        e.selectExpr("__y AS __v"))
    deg = ends.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__d"))
    withdeg = (
        e.join(deg.withColumnRenamed("__v", "__x")
               .withColumnRenamed("__d", "__dx"), "__x")
        .join(deg.withColumnRenamed("__v", "__y")
              .withColumnRenamed("__d", "__dy"), "__y")
    )
    lt = "(__dx < __dy OR (__dx = __dy AND __x < __y))"
    oriented = withdeg.selectExpr(
        f"CASE WHEN {lt} THEN __x ELSE __y END AS __u",
        f"CASE WHEN {lt} THEN __y ELSE __x END AS __w",
    ).localCheckpoint()
    canon = e.selectExpr("least(__x, __y) AS __p",
                         "greatest(__x, __y) AS __q")
    # wedges keep the apex, so the closing join yields all 3 corners
    wedges = (
        oriented.alias("o1")
        .join(oriented.alias("o2"),
              (F.col("o1.__u") == F.col("o2.__u"))
              & (F.col("o1.__w") < F.col("o2.__w")))
        .selectExpr("o1.__u AS __a",
                    "least(o1.__w, o2.__w) AS __p",
                    "greatest(o1.__w, o2.__w) AS __q")
    )
    tri_nodes = (
        wedges.join(canon, ["__p", "__q"])
        .selectExpr("explode(array(__a, __p, __q)) AS __v")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
    )
    lcc = ("CAST(2 * coalesce(__t, 0) AS DOUBLE) "
           "/ CAST(__d * (__d - 1) AS DOUBLE)")
    return (
        deg.filter(F.col("__d") >= 2)
        .join(tri_nodes, "__v", "left")
        .selectExpr("__v", "__d", "coalesce(__t, 0) AS __t",
                    f"{lcc} AS __lcc")
        .orderBy(F.col("__lcc").desc(), F.col("__v").asc())
        .limit(k)
        .select(F.col("__v").alias("node"),
                F.col("__d").alias("degree"),
                F.col("__t").alias("n_triangles"),
                round_portable(F.col("__lcc"), 6).alias("lcc"))
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (part co-purchase graph, the
# graph_triangles_lineitem edge construction)
# --------------------------------------------------------------------------


def _q_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.analytics4 import copurchase_pairs
    li = load(spark, sf_dir, "lineitem")
    edges = copurchase_pairs(li, "l_orderkey", "l_partkey",
                             min_count=2)
    return local_clustering(edges, "item_a", "item_b")


_ORACLE_LCC = f"""
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
), oriented AS (
  SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y)
           THEN e.x ELSE e.y END AS u,
         CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y)
           THEN e.y ELSE e.x END AS w
  FROM e JOIN deg dx ON e.x = dx.v JOIN deg dy ON e.y = dy.v
), canon AS (
  SELECT least(x, y) AS p, greatest(x, y) AS q FROM e
), tri_nodes AS (
  SELECT unnest([o1.u, least(o1.w, o2.w), greatest(o1.w, o2.w)]) AS v
  FROM oriented o1 JOIN oriented o2
    ON o1.u = o2.u AND o1.w < o2.w
  JOIN canon ON canon.p = least(o1.w, o2.w)
    AND canon.q = greatest(o1.w, o2.w)
), tcount AS (
  SELECT v, CAST(count(*) AS BIGINT) AS t FROM tri_nodes GROUP BY 1
)
SELECT deg.v AS node, deg.d AS degree,
  CAST(coalesce(tcount.t, 0) AS BIGINT) AS n_triangles,
  {round_portable_duck(
      "CAST(2 * coalesce(tcount.t, 0) AS DOUBLE) "
      "/ CAST(deg.d * (deg.d - 1) AS DOUBLE)", 6)} AS lcc
FROM deg LEFT JOIN tcount ON deg.v = tcount.v
WHERE deg.d >= 2
ORDER BY CAST(2 * coalesce(tcount.t, 0) AS DOUBLE)
  / CAST(deg.d * (deg.d - 1) AS DOUBLE) DESC, deg.v ASC
LIMIT {TOPK}
"""


QUERIES: dict = {
    "graph_lcc_parts": (_q_lcc, _ORACLE_LCC),
}

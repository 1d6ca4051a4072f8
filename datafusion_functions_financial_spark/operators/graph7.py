"""Graph ops #7: average-neighbor-degree profile and the degree-tail
Hill estimator — distributional degree diagnostics next to the gated
scalar tier (``graph3`` degree assortativity, ``graph6`` rich-club):

- ``avg_neighbor_degree``: knn(k), the mean degree of the neighbors
  of degree-k nodes (Pastor-Satorras et al., PRL 87:258701) — the
  PROFILE whose monotone trend the assortativity scalar summarizes;
  a rising knn(k) with a negative global r localizes where the
  mixing flips.
- ``degree_tail_hill``: the Hill estimator of the degree
  distribution's power-law tail index over the top-k degrees,
  alpha = 1 + k / sum ln(d_i / d_k) — "is this graph scale-free
  enough that hub-aware partitioning (salting, hub replication)
  is worth it?" — the graph twin of the gated value-tail
  ``q_hill_tail_events``.

Engine-exactness: degrees and edge-end sums are exact BIGINT; knn is
one division per degree row; the Hill sum quantizes ln terms to
BIGINT at 1e8 before folding the k-row relation.

Plan shape at 100 TB: degree is one map-side-combinable aggregate
over edge ends; knn joins edges to degrees (two shuffles by
endpoint) then reduces keyed by degree — a bounded relation; the
Hill top-k is TakeOrdered (k rows to the driver-side plan, no global
sort), the quantified fold is one aggregate over k rows.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (graph tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["avg_neighbor_degree", "degree_tail_hill"]

KNN_TOPK = 20
HILL_K = 50

Q = 10 ** 8
QF = float(Q)


def _degrees(edges: DataFrame, a_col: str, b_col: str):
    e = edges.select(F.col(a_col).alias("__x"),
                     F.col(b_col).alias("__y")).localCheckpoint()
    ends = e.selectExpr("__x AS __v").unionAll(
        e.selectExpr("__y AS __v"))
    deg = ends.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__d"))
    return e, deg


def avg_neighbor_degree(edges: DataFrame, a_col: str, b_col: str,
                        k: int = KNN_TOPK) -> DataFrame:
    """(degree, n_edge_ends, knn): mean neighbor degree per node
    degree — the first ``k`` degrees ascending."""
    e, deg = _degrees(edges, a_col, b_col)
    wd = (
        e.join(deg.withColumnRenamed("__v", "__x")
               .withColumnRenamed("__d", "__dx"), "__x")
        .join(deg.withColumnRenamed("__v", "__y")
              .withColumnRenamed("__d", "__dy"), "__y")
        .select("__dx", "__dy")
    )
    both = wd.selectExpr("__dx AS __k", "__dy AS __nd").unionAll(
        wd.selectExpr("__dy AS __k", "__dx AS __nd"))
    return (
        both.groupBy("__k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edge_ends"),
             F.sum("__nd").cast("bigint").alias("__snd"))
        .orderBy(F.col("__k").asc())
        .limit(k)
        .select(
            F.col("__k").alias("degree"), "n_edge_ends",
            round_portable(F.expr(
                "CAST(__snd AS DOUBLE) / CAST(n_edge_ends AS DOUBLE)"
            ), 6).alias("knn"),
        )
    )


def degree_tail_hill(edges: DataFrame, a_col: str, b_col: str,
                     k: int = HILL_K) -> DataFrame:
    """One row (n_nodes, k_tail, d_min_tail, hill_alpha): the Hill
    tail-index estimate over the ``k`` largest degrees (ties broken
    by node id so the tail set is deterministic)."""
    _e, deg = _degrees(edges, a_col, b_col)
    top = (
        deg.orderBy(F.col("__d").desc(), F.col("__v").asc())
        .limit(k)
    )
    dmin = top.agg(F.min("__d").alias("__dk"))
    red = (
        top.crossJoin(F.broadcast(dmin))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_tail"),
            F.max("__dk").cast("bigint").alias("d_min_tail"),
            F.sum(F.expr(
                f"CAST(round(ln(CAST(__d AS DOUBLE) "
                f"/ CAST(__dk AS DOUBLE)) * {Q}) AS BIGINT)"))
            .alias("__sl"),
        )
    )
    tot = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    return red.crossJoin(F.broadcast(tot)).select(
        "n_nodes", "k_tail", "d_min_tail",
        round_portable(F.expr(
            f"CASE WHEN __sl > 0 THEN "
            f"1.0 + CAST(k_tail AS DOUBLE) "
            f"/ (CAST(__sl AS DOUBLE) / {QF!r}) "
            f"ELSE 0.0 END"), 6).alias("hill_alpha"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (part co-purchase graph — the
# graph_triangles_lineitem / graph_lcc_parts edge construction)
# --------------------------------------------------------------------------


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.analytics4 import copurchase_pairs
    li = load(spark, sf_dir, "lineitem")
    return copurchase_pairs(li, "l_orderkey", "l_partkey",
                            min_count=2)


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return avg_neighbor_degree(_edges(spark, sf_dir),
                               "item_a", "item_b")


def _q_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_tail_hill(_edges(spark, sf_dir),
                            "item_a", "item_b")


_DUCK_DEG = """b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
), e AS (
  SELECT l.it AS x, r.it AS y
  FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
  GROUP BY 1, 2 HAVING count(*) >= 2
), ends AS (
  SELECT x AS v FROM e UNION ALL SELECT y AS v FROM e
), deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM ends GROUP BY 1
)"""

_ORACLE_KNN = f"""
WITH {_DUCK_DEG}, wd AS (
  SELECT dx.d AS jx, dy.d AS jy
  FROM e JOIN deg dx ON e.x = dx.v JOIN deg dy ON e.y = dy.v
), both_ends AS (
  SELECT jx AS k, jy AS nd FROM wd
  UNION ALL SELECT jy AS k, jx AS nd FROM wd
)
SELECT k AS degree, CAST(count(*) AS BIGINT) AS n_edge_ends,
  {round_portable_duck(
      "CAST(sum(nd) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)}
    AS knn
FROM both_ends
GROUP BY 1
ORDER BY 1 ASC
LIMIT {KNN_TOPK}
"""

_ORACLE_HILL = f"""
WITH {_DUCK_DEG}, top AS (
  SELECT v, d FROM deg ORDER BY d DESC, v ASC LIMIT {HILL_K}
), dmin AS (SELECT min(d) AS dk FROM top),
red AS (
  SELECT CAST(count(*) AS BIGINT) AS k_tail,
    CAST(max(dk) AS BIGINT) AS d_min_tail,
    sum(CAST(round(ln(CAST(d AS DOUBLE) / CAST(dk AS DOUBLE))
      * {Q}) AS BIGINT)) AS sl
  FROM top, dmin
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
SELECT tot.n_nodes, red.k_tail, red.d_min_tail,
  {round_portable_duck(
      f"CASE WHEN red.sl > 0 THEN "
      f"1.0 + CAST(red.k_tail AS DOUBLE) "
      f"/ (CAST(red.sl AS DOUBLE) / {QF!r}) ELSE 0.0 END", 6)}
    AS hill_alpha
FROM red, tot
"""


QUERIES: dict = {
    "graph_knn_parts": (_q_knn, _ORACLE_KNN),
    "graph_degree_tail_parts": (_q_hill, _ORACLE_HILL),
}

"""Graph analytics #3: degree assortativity (Newman's degree-degree
Pearson r over edge endpoints) and k-core extraction by iterative
peeling.

Complements ``graph2`` (triangles, link prediction), ``cc``
(connected components), and ``plans/analytics6`` (PageRank) with the
two remaining staples of a corpus-graph health report: whether hubs
attach to hubs (assortativity > 0) or to leaves (< 0), and the
densest sustained subgraph (the k-core survives every peel of
degree-<k nodes — the standard "spam ring / hot cluster" screen on a
dedup or co-purchase graph).

Determinism: degrees are exact integers, so the assortativity sums
(S_x, S_xx, S_xy over the 2m directed endpoint pairs) stay BIGINT
until one final double division — no quantization needed. The peel
is a pure set fixpoint: no floats anywhere.

Plan shapes at scale: assortativity is one degree aggregate + one
edge-to-degree join (shuffle on node id, broadcastable degree side
for bounded graphs) + a scalar aggregate. The peel is O(rounds)
passes, each an aggregate + join on the node id — the same shuffle
key every round, so AQE reuses the exchange; each round's edge set
is ``localCheckpoint``-ed (the cc.py pattern) so lineage stays flat,
and a (count, xxhash64) signature gives an O(1) driver-side
early-exit at the fixpoint. The ORACLE unrolls a fixed number of
rounds; pytest asserts the gate configuration converges within them
(one extra round leaves the edge set unchanged), which makes the
early exit and the unrolled SQL equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["degree_assortativity", "k_core", "k_core_summary"]

KCORE_K = 3
KCORE_ROUNDS = 8
COPURCHASE_MIN_COUNT = 2


def _degrees(e: DataFrame) -> DataFrame:
    ends = e.selectExpr("__x AS __v").unionAll(e.selectExpr("__y AS __v"))
    return ends.groupBy("__v").agg(F.count(F.lit(1)).alias("__d"))


def degree_assortativity(edges: DataFrame, a_col: str,
                         b_col: str) -> DataFrame:
    """One row (n_nodes, n_edges, assortativity): Newman's degree
    assortativity — the Pearson correlation of (deg(u), deg(v)) over
    the 2m directed endpoint pairs of the undirected edge list.
    With M = 2m, ``r = (M S_xy - S_x^2) / (M S_xx - S_x^2)`` and all
    three sums are exact BIGINTs (symmetry makes S_x = S_y,
    S_xx = S_yy). NULL for a degree-regular graph (denominator 0)."""
    e = edges.select(F.col(a_col).alias("__x"),
                     F.col(b_col).alias("__y"))
    deg = _degrees(e)
    wd = (
        e.join(deg.withColumnRenamed("__v", "__x")
               .withColumnRenamed("__d", "__du"), "__x")
        .join(deg.withColumnRenamed("__v", "__y")
              .withColumnRenamed("__d", "__dv"), "__y")
    )
    sums = wd.agg(
        F.count(F.lit(1)).cast("bigint").alias("__m1"),
        F.sum(F.expr("__du + __dv")).cast("bigint").alias("__sx"),
        F.sum(F.expr(
            "__du * __du + __dv * __dv")).cast("bigint").alias("__sxx"),
        F.sum(F.expr("2 * __du * __dv")).cast("bigint").alias("__sxy"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    r = ("CASE WHEN (2 * __m1) * __sxx - __sx * __sx != 0 THEN "
         "CAST((2 * __m1) * __sxy - __sx * __sx AS DOUBLE) "
         "/ CAST((2 * __m1) * __sxx - __sx * __sx AS DOUBLE) END")
    return sums.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        F.col("__m1").alias("n_edges"),
        round_portable(F.expr(r), 6).alias("assortativity"),
    )


def k_core(edges: DataFrame, a_col: str, b_col: str, k: int,
           max_rounds: int = KCORE_ROUNDS,
           early_exit: bool = True) -> DataFrame:
    """The edge set of the k-core: peel nodes of degree < k (and
    their edges) until no node falls below k or ``max_rounds``
    passes run. ``early_exit=False`` forces exactly ``max_rounds``
    passes (a converged set is a fixpoint, so extra passes are
    no-ops — used to mirror the unrolled oracle bit-for-bit)."""
    e = edges.select(F.col(a_col).alias("__x"),
                     F.col(b_col).alias("__y")).localCheckpoint()
    sig = None
    for _ in range(max_rounds):
        keep = _degrees(e).filter(F.col("__d") >= k).select("__v")
        e2 = (
            e.join(keep.withColumnRenamed("__v", "__x"), "__x")
            .join(keep.withColumnRenamed("__v", "__y"), "__y")
            .select("__x", "__y")
            .localCheckpoint()
        )
        if early_exit:
            row = e2.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(__x, __y))").alias("h"),
            ).collect()[0]
            sig2 = (row["n"], row["h"])
            e = e2
            if sig2 == sig:
                break
            sig = sig2
        else:
            e = e2
    return e


def k_core_summary(edges: DataFrame, a_col: str, b_col: str, k: int,
                   max_rounds: int = KCORE_ROUNDS) -> DataFrame:
    """One row (k, n_core_nodes, n_core_edges, min_core_degree) of
    the k-core; min_core_degree >= k certifies the peel converged."""
    core = k_core(edges, a_col, b_col, k, max_rounds)
    deg = _degrees(core)
    dagg = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_core_nodes"),
        F.min("__d").cast("bigint").alias("min_core_degree"),
    )
    eagg = core.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_core_edges"))
    return dagg.crossJoin(F.broadcast(eagg)).select(
        F.lit(k).cast("bigint").alias("k"),
        "n_core_nodes", "n_core_edges", "min_core_degree",
    )


# --------------------------------------------------------------------------
# Gate queries — both on the part co-purchase graph (edges = part
# pairs sharing >= 2 orders, the graph2/cc gate relation).
# --------------------------------------------------------------------------


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.analytics4 import copurchase_pairs
    li = load(spark, sf_dir, "lineitem")
    return copurchase_pairs(li, "l_orderkey", "l_partkey",
                            min_count=COPURCHASE_MIN_COUNT)


def _q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_assortativity(
        _copurchase_edges(spark, sf_dir), "item_a", "item_b")


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_core_summary(_copurchase_edges(spark, sf_dir),
                          "item_a", "item_b", KCORE_K)


_EDGES_DUCK = f"""
b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
), e0 AS (
  SELECT l.it AS x, r.it AS y
  FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
  GROUP BY 1, 2 HAVING count(*) >= {COPURCHASE_MIN_COUNT}
)"""

_ORACLE_ASSORT = f"""
WITH {_EDGES_DUCK}
, ends AS (
  SELECT x AS v FROM e0 UNION ALL SELECT y AS v FROM e0
), deg AS (
  SELECT v, count(*) AS d FROM ends GROUP BY 1
), wd AS (
  SELECT dx.d AS du, dy.d AS dv
  FROM e0 JOIN deg dx ON e0.x = dx.v JOIN deg dy ON e0.y = dy.v
), sums AS (
  SELECT CAST(count(*) AS BIGINT) AS m1,
    CAST(sum(du + dv) AS BIGINT) AS sx,
    CAST(sum(du * du + dv * dv) AS BIGINT) AS sxx,
    CAST(sum(2 * du * dv) AS BIGINT) AS sxy
  FROM wd
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg
)
SELECT n_nodes, m1 AS n_edges,
  {round_portable_duck(
      "CASE WHEN (2 * m1) * sxx - sx * sx != 0 THEN "
      "CAST((2 * m1) * sxy - sx * sx AS DOUBLE) "
      "/ CAST((2 * m1) * sxx - sx * sx AS DOUBLE) END", 6
  )} AS assortativity
FROM sums CROSS JOIN nn
"""


def _kcore_oracle(k: int, rounds: int) -> str:
    # MATERIALIZED stops DuckDB inlining each CTE into its (multiple)
    # consumers — an inlined unroll recomputes e0 exponentially.
    parts = [f"WITH {_EDGES_DUCK.replace('e0 AS (', 'e0 AS MATERIALIZED (')}"]
    for i in range(rounds):
        parts.append(f"""
, d{i} AS MATERIALIZED (
  SELECT v, count(*) AS d FROM (
    SELECT x AS v FROM e{i} UNION ALL SELECT y AS v FROM e{i}
  ) GROUP BY 1
), e{i + 1} AS MATERIALIZED (
  SELECT e{i}.x, e{i}.y
  FROM e{i}
  JOIN d{i} a ON e{i}.x = a.v AND a.d >= {k}
  JOIN d{i} b2 ON e{i}.y = b2.v AND b2.d >= {k}
)""")
    n = rounds
    parts.append(f"""
, dn AS (
  SELECT v, count(*) AS d FROM (
    SELECT x AS v FROM e{n} UNION ALL SELECT y AS v FROM e{n}
  ) GROUP BY 1
), dagg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_core_nodes,
         CAST(min(d) AS BIGINT) AS min_core_degree
  FROM dn
), eagg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_core_edges FROM e{n}
)
SELECT CAST({k} AS BIGINT) AS k, n_core_nodes, n_core_edges,
       min_core_degree
FROM dagg CROSS JOIN eagg
""")
    return "".join(parts)


QUERIES: dict = {
    "graph_assortativity_lineitem": (_q_assortativity, _ORACLE_ASSORT),
    "graph_kcore_parts": (_q_kcore,
                          _kcore_oracle(KCORE_K, KCORE_ROUNDS)),
}

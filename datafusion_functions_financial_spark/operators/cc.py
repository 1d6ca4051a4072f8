"""Connected components at scale: the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014) — the 100-TB path for resolving
dedup-pair graphs, replacing diameter-bound min-label propagation
(``dedup.dedup_clusters``) whose round count grows with the longest
chain in the graph.

Why this shape at scale: every round is two node-keyed aggregate +
equi-join passes over the EDGE set only (never the corpus), and the
round count is O(log^2 n) regardless of component diameter — a
10-million-link chain collapses in ~a dozen rounds where label
propagation would take 10 million. The driver sees one (count,
checksum) scalar pair per round for the fixpoint test; labels never
leave the cluster.

Engine-exact: all arithmetic is on integer node ids (min / least),
so there is nothing to quantize; the DuckDB oracles close the same
edge sets with a recursive CTE and take the same per-node min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["large_star", "small_star", "connected_components",
           "component_sizes"]

MAX_ROUNDS = 30
COPURCHASE_MIN_COUNT = 2


def _canon(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges as (__a, __b) with __a < __b; self
    loops dropped."""
    return (
        edges.selectExpr("least(__x, __y) AS __a",
                         "greatest(__x, __y) AS __b")
        .filter(F.col("__a") != F.col("__b"))
        .distinct()
    )


def large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node's strictly-larger neighbors
    attach to the minimum of its closed neighborhood."""
    sym = edges.selectExpr("__a AS __u", "__b AS __v").unionAll(
        edges.selectExpr("__b AS __u", "__a AS __v"))
    mins = sym.groupBy("__u").agg(F.min("__v").alias("__nm")).select(
        "__u", F.least(F.col("__nm"), F.col("__u")).alias("__m"))
    return _canon(
        sym.join(mins, "__u")
        .filter(F.col("__v") > F.col("__u"))
        .selectExpr("__v AS __x", "__m AS __y")
    )


def small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: store each edge at its larger endpoint;
    that endpoint and all its smaller neighbors attach to the
    smallest of them."""
    h = edges.selectExpr("__b AS __u", "__a AS __v")  # __v < __u
    mins = h.groupBy("__u").agg(F.min("__v").alias("__m"))
    attach = h.join(mins, "__u").selectExpr(
        "__v AS __x", "__m AS __y")
    self_attach = mins.selectExpr("__u AS __x", "__m AS __y")
    return _canon(attach.unionAll(self_attach))


def _edge_signature(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(__a, __b))").alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(nodes: DataFrame, edges: DataFrame,
                         node_col: str, a_col: str, b_col: str,
                         max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """(node, component): every node labeled with the smallest node
    id reachable from it. ``nodes`` supplies the universe (isolated
    nodes become their own singleton components).

    Alternates large-star / small-star until the edge set reaches its
    fixpoint (a star forest rooted at each component's minimum), then
    reads the labels straight off the star edges. The fixpoint test
    compares a (count, xxhash64-sum) signature — two scalars per
    round to the driver."""
    e = _canon(edges.select(F.col(a_col).alias("__x"),
                            F.col(b_col).alias("__y")))
    e = e.localCheckpoint()
    sig = _edge_signature(e)
    for _ in range(max_rounds):
        e2 = small_star(large_star(e)).localCheckpoint()
        sig2 = _edge_signature(e2)
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    stars = e.selectExpr("__b AS __node", "__a AS __root")
    return (
        nodes.select(F.col(node_col).alias("node")).distinct()
        .join(stars, F.col("node") == F.col("__node"), "left")
        .select(
            "node",
            F.coalesce(F.col("__root"), F.col("node")).alias("component"),
        )
    )


def component_sizes(cc: DataFrame) -> DataFrame:
    """(size, n_components) histogram of component sizes."""
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_components"))
        .select(F.col("size").cast("bigint").alias("size"),
                "n_components")
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _copurchase_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.analytics4 import copurchase_pairs
    li = load(spark, sf_dir, "lineitem")
    edges = copurchase_pairs(li, "l_orderkey", "l_partkey",
                             min_count=COPURCHASE_MIN_COUNT)
    nodes = li.select(F.col("l_partkey"))
    return connected_components(nodes, edges, "l_partkey",
                                "item_a", "item_b")


def _q_cc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _copurchase_cc(spark, sf_dir).select(
        F.col("node").cast("bigint").alias("part"),
        F.col("component").cast("bigint").alias("component"))


_CC_PARTS_CTE = f"""
WITH RECURSIVE b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
), e AS (
  SELECT l.it AS x, r.it AS y
  FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
  GROUP BY 1, 2 HAVING count(*) >= {COPURCHASE_MIN_COUNT}
), sym AS (
  SELECT x, y FROM e UNION ALL SELECT y AS x, x AS y FROM e
), reach AS (
  SELECT DISTINCT l_partkey AS id, l_partkey AS r FROM lineitem
  UNION
  SELECT s.x AS id, reach.r
  FROM sym s JOIN reach ON reach.id = s.y
), comp AS (
  SELECT id, min(r) AS component FROM reach GROUP BY id
)"""

_ORACLE_CC_PARTS = f"""
{_CC_PARTS_CTE}
SELECT CAST(id AS BIGINT) AS part,
       CAST(component AS BIGINT) AS component
FROM comp
"""


def _q_cc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return component_sizes(_copurchase_cc(spark, sf_dir))


_ORACLE_CC_SIZES = f"""
{_CC_PARTS_CTE}
, sizes AS (
  SELECT component, count(*) AS size FROM comp GROUP BY 1
)
SELECT CAST(size AS BIGINT) AS size,
       CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY 1
"""


def _q_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_clusters`` semantics (doc_id, cluster_id, is_kept)
    resolved with large-star/small-star instead of label
    propagation — same answer, O(log^2 n) rounds; gated against the
    identical recursive-closure oracle as the propagation path."""
    from .dedup import GATE_BUCKET_CAP, minhash_lsh_pairs
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, max_bucket_size=GATE_BUCKET_CAP)
    cc = connected_components(docs, pairs, "doc_id", "id_a", "id_b")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_kept"),
    )


def _oracle_dedup_cc() -> str:
    from .dedup import _ORACLE_DEDUP_CLUSTERS
    return _ORACLE_DEDUP_CLUSTERS


QUERIES: dict = {
    "graph_cc_parts": (_q_cc_parts, _ORACLE_CC_PARTS),
    "graph_cc_sizes_parts": (_q_cc_sizes, _ORACLE_CC_SIZES),
    "dedup_cc_documents": (_q_dedup_cc, _oracle_dedup_cc()),
}

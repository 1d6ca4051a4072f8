"""Graph analytics #2: degree-oriented triangle counting (global
clustering coefficient) and neighborhood-similarity link prediction
(Jaccard + Adamic–Adar over shared purchases) — the pair-level graph
measures that complement degree distributions, PageRank and
connected-component dedup clusters elsewhere in the package.

Everything is exact integer arithmetic until the final scalar
ratios, so no quantization is needed anywhere except the
Adamic–Adar sum (1/ln(degree) terms quantize to BIGINT at 1e8).

Plan shapes at scale:
- triangles: the classic MapReduce triangle count — orient every
  edge from its lower-(degree, id) endpoint, build wedges with an
  equi-join on the apex, close them with an equi-join on the
  canonical (min id, max id) edge key. Orientation bounds each
  node's out-degree by O(sqrt(m)) on skewed graphs, so the wedge
  fan-out stays tractable where a naive id-orientation would
  explode on hub nodes.
- neighbor similarity: candidate pairs come ONLY from an equi-join
  on the shared item (bucketed, never all-pairs), with a hot-item
  cap that drops items shared by more than ``max_owners_per_item``
  owners — the same skew guard as the LSH hot-bucket and basket
  caps; popular items carry no signal for similarity anyway
  (stopword logic, and they'd otherwise contribute O(owners^2)
  candidate pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["triangle_count", "neighbor_similarity"]

Q = 10 ** 8
JACCARD_TOP_N = 100
MAX_OWNERS_PER_ITEM = 40
MIN_COMMON = 2


# --------------------------------------------------------------------------
# Triangle counting
# --------------------------------------------------------------------------


def triangle_count(edges: DataFrame, a_col: str,
                   b_col: str) -> DataFrame:
    """One row (n_nodes, n_edges, n_triangles, n_wedges,
    global_clustering): exact triangle count of the undirected graph
    given as a deduplicated edge list (one row per unordered pair),
    plus the global clustering coefficient ``3T / W`` where
    ``W = sum deg*(deg-1)/2`` is the open+closed wedge count.

    Each edge is oriented from its lower-(degree, id) endpoint;
    wedges join on the apex and close against the canonical edge
    key, so every triangle is counted exactly once from its
    lowest-(degree, id) corner."""
    e = edges.select(F.col(a_col).alias("__x"),
                     F.col(b_col).alias("__y"))
    ends = e.selectExpr("__x AS __v").unionAll(
        e.selectExpr("__y AS __v"))
    deg = ends.groupBy("__v").agg(F.count(F.lit(1)).alias("__d"))
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
    )
    canon = e.selectExpr("least(__x, __y) AS __p",
                         "greatest(__x, __y) AS __q")
    wedges = (
        oriented.alias("o1")
        .join(oriented.alias("o2"),
              (F.col("o1.__u") == F.col("o2.__u"))
              & (F.col("o1.__w") < F.col("o2.__w")))
        .selectExpr("least(o1.__w, o2.__w) AS __p",
                    "greatest(o1.__w, o2.__w) AS __q")
    )
    tri = wedges.join(canon, ["__p", "__q"]).agg(
        F.count(F.lit(1)).alias("__t"))
    counts = (
        deg.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum(F.expr(
                "__d * (__d - 1)")).alias("__wedges2"),
        )
        .crossJoin(F.broadcast(
            e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))))
        .crossJoin(F.broadcast(tri))
    )
    return counts.select(
        "n_nodes", "n_edges",
        F.col("__t").cast("bigint").alias("n_triangles"),
        F.expr("CAST(__wedges2 DIV 2 AS BIGINT)").alias("n_wedges"),
        round_portable(F.expr(
            "CASE WHEN __wedges2 > 0 THEN "
            "CAST(3 AS DOUBLE) * CAST(__t AS DOUBLE) "
            "/ (CAST(__wedges2 AS DOUBLE) / 2) "
            "ELSE CAST(0 AS DOUBLE) END"), 6).alias("global_clustering"),
    )


# --------------------------------------------------------------------------
# Neighborhood similarity (Jaccard + Adamic–Adar link prediction)
# --------------------------------------------------------------------------


def neighbor_similarity(owns: DataFrame, owner_col: str, item_col: str,
                        min_common: int = MIN_COMMON,
                        max_owners_per_item: int = MAX_OWNERS_PER_ITEM,
                        top_n: int = JACCARD_TOP_N) -> DataFrame:
    """(owner_a, owner_b, n_common, jaccard, adamic_adar): the
    ``top_n`` owner pairs ranked by Jaccard similarity of their item
    sets (ties broken by common count then ids). Candidates come
    from the shared-item equi-join only; items owned by more than
    ``max_owners_per_item`` owners are dropped first (skew guard +
    stopword logic). ``adamic_adar = sum over common items of
    1/ln(item owners)`` — rarer shared items weigh more. Owner
    degrees count ALL their items (only pair generation is capped,
    mirroring how MinHash-LSH caps candidate buckets, not
    signatures)."""
    o = owns.select(F.col(owner_col).alias("__o"),
                    F.col(item_col).alias("__i")).distinct()
    deg = o.groupBy("__o").agg(F.count(F.lit(1)).alias("__d"))
    item_deg = o.groupBy("__i").agg(F.count(F.lit(1)).alias("__m"))
    capped = o.join(
        item_deg.filter(F.col("__m") <= max_owners_per_item), "__i")
    aa_q = f"CAST(round({Q} / ln(CAST(__m AS DOUBLE))) AS BIGINT)"
    pairs = (
        capped.alias("l")
        .join(capped.alias("r"),
              (F.col("l.__i") == F.col("r.__i"))
              & (F.col("l.__o") < F.col("r.__o")))
        .selectExpr("l.__o AS __a", "r.__o AS __b", "l.__m AS __m")
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__c"),
             F.sum(F.expr(aa_q)).alias("__aa"))
        .filter(F.col("__c") >= min_common)
    )
    scored = (
        pairs
        .join(deg.selectExpr("__o AS __a", "__d AS __da"), "__a")
        .join(deg.selectExpr("__o AS __b", "__d AS __db"), "__b")
        .withColumn("__j", F.expr(
            "CAST(__c AS DOUBLE) / CAST(__da + __db - __c AS DOUBLE)"))
    )
    # orderBy + limit plans as TakeOrderedAndProject (distributed
    # partial top-k per partition, then a k-row merge on the driver
    # side of the exchange) — no single-partition global sort.
    return (
        scored.orderBy(F.col("__j").desc(), F.col("__c").desc(),
                       F.col("__a").asc(), F.col("__b").asc())
        .limit(top_n)
        .select(
            F.col("__a").alias("owner_a"),
            F.col("__b").alias("owner_b"),
            F.col("__c").cast("bigint").alias("n_common"),
            round_portable(F.col("__j"), 6).alias("jaccard"),
            round_portable(F.expr(
                f"CAST(__aa AS DOUBLE) / {float(Q)!r}"), 6
            ).alias("adamic_adar"),
        )
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles of the part co-purchase graph (edges = part pairs
    sharing >= 2 orders, from the gated copurchase operator)."""
    from ..plans.analytics4 import copurchase_pairs
    li = load(spark, sf_dir, "lineitem")
    edges = copurchase_pairs(li, "l_orderkey", "l_partkey",
                             min_count=2)
    return triangle_count(edges, "item_a", "item_b")


_ORACLE_TRIANGLES = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
), e AS (
  SELECT l.it AS x, r.it AS y
  FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
  GROUP BY 1, 2 HAVING count(*) >= 2
), ends AS (
  SELECT x AS v FROM e UNION ALL SELECT y AS v FROM e
), deg AS (
  SELECT v, count(*) AS d FROM ends GROUP BY 1
), oriented AS (
  SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y)
           THEN e.x ELSE e.y END AS u,
         CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y)
           THEN e.y ELSE e.x END AS w
  FROM e JOIN deg dx ON e.x = dx.v JOIN deg dy ON e.y = dy.v
), canon AS (
  SELECT least(x, y) AS p, greatest(x, y) AS q FROM e
), wedges AS (
  SELECT least(o1.w, o2.w) AS p, greatest(o1.w, o2.w) AS q
  FROM oriented o1 JOIN oriented o2
    ON o1.u = o2.u AND o1.w < o2.w
), tri AS (
  SELECT count(*) AS t
  FROM wedges JOIN canon ON wedges.p = canon.p AND wedges.q = canon.q
), degagg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(d * (d - 1)) AS BIGINT) AS wedges2
  FROM deg
), eagg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e
)
SELECT n_nodes, n_edges, CAST(t AS BIGINT) AS n_triangles,
  CAST(wedges2 // 2 AS BIGINT) AS n_wedges,
  {gc} AS global_clustering
FROM degagg CROSS JOIN eagg CROSS JOIN tri
""".format(gc=round_portable_duck(
    "CASE WHEN wedges2 > 0 THEN "
    "CAST(3 AS DOUBLE) * CAST(t AS DOUBLE) "
    "/ (CAST(wedges2 AS DOUBLE) / 2) ELSE CAST(0 AS DOUBLE) END", 6))


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-similar customer pairs by shared purchased parts."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    owns = li.join(od, li.l_orderkey == od.o_orderkey).select(
        "o_custkey", "l_partkey")
    return neighbor_similarity(owns, "o_custkey", "l_partkey")


_ORACLE_JACCARD = f"""
WITH o AS (
  SELECT DISTINCT o_custkey AS ow, l_partkey AS it
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), deg AS (
  SELECT ow, count(*) AS d FROM o GROUP BY 1
), item_deg AS (
  SELECT it, count(*) AS m FROM o GROUP BY 1
), capped AS (
  SELECT o.ow, o.it, item_deg.m
  FROM o JOIN item_deg ON o.it = item_deg.it
  WHERE item_deg.m <= {MAX_OWNERS_PER_ITEM}
), pairs AS (
  SELECT l.ow AS a, r.ow AS b, count(*) AS c,
         sum(CAST(round({Q} / ln(CAST(l.m AS DOUBLE))) AS BIGINT))
           AS aa
  FROM capped l JOIN capped r
    ON l.it = r.it AND l.ow < r.ow
  GROUP BY 1, 2 HAVING count(*) >= {MIN_COMMON}
), scored AS (
  SELECT p.a, p.b, p.c, p.aa,
         CAST(p.c AS DOUBLE) / CAST(da.d + db.d - p.c AS DOUBLE) AS j
  FROM pairs p JOIN deg da ON p.a = da.ow JOIN deg db ON p.b = db.ow
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY j DESC, c DESC, a, b) AS rn
  FROM scored
)
SELECT a AS owner_a, b AS owner_b, CAST(c AS BIGINT) AS n_common,
  {round_portable_duck("j", 6)} AS jaccard,
  {round_portable_duck(
      f"CAST(aa AS DOUBLE) / {float(Q)!r}", 6)} AS adamic_adar
FROM ranked WHERE rn <= {JACCARD_TOP_N}
"""


QUERIES: dict = {
    "graph_triangles_lineitem": (_q_triangles, _ORACLE_TRIANGLES),
    "graph_jaccard_customers_lineitem": (_q_jaccard, _ORACLE_JACCARD),
}

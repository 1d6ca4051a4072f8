"""Distributed k-means (Lloyd's algorithm) over the embedding corpus:
deterministic farthest-from-origin-free init (the k lowest vec_ids),
a fixed number of unrolled iterations, and an exact-arithmetic
assignment so Spark and the SQL oracle converge to bit-identical
clusterings.

Engine exactness. Three places where naive k-means diverges across
engines, and the fix for each:
- *distances*: in-order zip_with/list_reduce folds over the array
  (embgeo's convention) — both engines left-fold index order, so the
  squared distance is the same double bit pattern;
- *centroid means*: per-dimension sums quantize each element to
  BIGINT before the (order-free) sum, so a centroid coordinate is the
  exact rational sum/(n*Q) — identical doubles on both engines no
  matter the partial-aggregation schedule;
- *argmin*: ties break on the cluster id via lexicographic
  (distance, cid) minimum — with bit-identical distances the
  assignment is fully deterministic.

Plan shape at scale (the 100 TB story): each Lloyd iteration is
  (data) crossJoin broadcast(k-row centroid table)
     -> per-row fold distance (no shuffle)
     -> hash-agg argmin keyed by vec_id (one shuffle of k rows/vec)
     -> posexplode + two-level hash agg to re-estimate centroids
       (map-side combinable; the centroid relation is k x dim rows).
Nothing data-sized is ever sorted or windowed; the only joins are
broadcasts of the k-row centroid relation. Iterations are a fixed
unrolled count (ITERS) — the standard mini-batch/fixed-budget
compromise for petabyte k-means; inertia per iteration is cheap to
emit if a convergence gate is wanted.

Reference: classic Lloyd (1982); the quantized-mean trick mirrors
SCALING.md's integer-quantized contribution rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["kmeans"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)
K = 8
ITERS = 2
DIM = 64

_SQDIST = ("aggregate(zip_with({a}, {b}, (x, y) -> "
           "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
           "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
           "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)")


def _assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, embedding, __cid, __d): each vector joined to its
    argmin-(distance, cid) centroid. ``cents``: (__cid, __carr)."""
    d = _SQDIST.format(a="embedding", b="__carr")
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("__d", F.expr(d))
        .groupBy("vec_id")
        .agg(F.first("embedding").alias("embedding"),
             F.min(F.struct(F.col("__d").alias("d"),
                            F.col("__cid").alias("c"))).alias("__m"))
        .select("vec_id", "embedding",
                F.col("__m.c").alias("__cid"),
                F.col("__m.d").alias("__d"))
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """(__cid, __carr): quantized-mean centroids of an assignment."""
    long = assigned.select(
        "__cid", F.posexplode("embedding").alias("__pos", "__x"))
    dims = (
        long.groupBy("__cid", "__pos")
        .agg(F.expr(
            f"CAST(sum(CAST(round(CAST(__x AS DOUBLE) * {Q}) "
            f"AS BIGINT)) AS DOUBLE) "
            f"/ (CAST(count(*) AS DOUBLE) * {QF!r})").alias("__m"))
    )
    return dims.groupBy("__cid").agg(F.expr(
        "transform(array_sort(collect_list(struct(__pos, __m))), "
        "s -> s.__m)").alias("__carr"))


def kmeans(df: DataFrame, vec_col: str = "embedding",
           id_col: str = "vec_id", k: int = K,
           iters: int = ITERS) -> DataFrame:
    """(cluster, n, mean_dist, c_norm): cluster sizes, mean squared
    distance to the assigning centroid (quantized-exact inertia / n),
    and the norm of the re-estimated centroid, after ``iters`` full
    Lloyd iterations from the deterministic lowest-id init."""
    emb = df.select(F.col(id_col).alias("vec_id"),
                    F.expr(f"transform({vec_col}, "
                           f"x -> CAST(x AS DOUBLE))").alias("embedding"))
    init = (
        emb.orderBy("vec_id").limit(k)
        .withColumn("__cid", F.row_number().over(
            Window.orderBy("vec_id")).cast("long") - 1)
        .select("__cid", F.col("embedding").alias("__carr"))
    )
    cents = init
    assigned = None
    for _ in range(iters):
        assigned = _assign(emb, cents)
        cents = _recompute(assigned)
    stats = assigned.groupBy("__cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(
            f"CAST(round(__d * {Q2}) AS BIGINT)")).alias("__iq"),
    )
    norms = cents.select(
        "__cid",
        F.expr(
            f"aggregate(transform(__carr, x -> "
            f"CAST(round(x * x * {Q2}) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (acc, t) -> acc + t)").alias("__n2q"),
    )
    return (
        stats.join(norms, "__cid")
        .select(
            F.col("__cid").alias("cluster"), "n",
            round_portable(F.expr(
                f"CAST(__iq AS DOUBLE) "
                f"/ (CAST(n AS DOUBLE) * {Q2F!r})"), 6
            ).alias("mean_dist"),
            round_portable(F.expr(
                f"sqrt(CAST(__n2q AS DOUBLE) / {Q2F!r})"), 6
            ).alias("c_norm"),
        )
    )


# --------------------------------------------------------------------------
# Gate query + unrolled DuckDB oracle
# --------------------------------------------------------------------------


def _q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans(load(spark, sf_dir, "embeddings"))


def _duck_sqdist(a: str, b: str) -> str:
    return (f"list_reduce(list_transform(range(1, {DIM} + 1), "
            f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
            f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), "
            f"(acc, t) -> acc + t)")


def _duck_iter(prev_cents: str, idx: int) -> str:
    """One Lloyd iteration: assignment a{idx} under {prev_cents},
    re-estimated centroids c{idx}."""
    d = _duck_sqdist("e.embedding", "c.carr")
    return f"""a{idx} AS (
  SELECT vec_id, embedding, cid, d FROM (
    SELECT e.vec_id, e.embedding, c.cid, {d} AS d,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {d}, c.cid) AS rn
    FROM emb e CROSS JOIN {prev_cents} c) t
  WHERE rn = 1
), l{idx} AS (
  SELECT a.cid, r.range AS pos,
    CAST(sum(CAST(round(CAST(a.embedding[r.range] AS DOUBLE) * {Q})
      AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {QF!r}) AS m
  FROM a{idx} a CROSS JOIN range(1, {DIM} + 1) r
  GROUP BY 1, 2
), c{idx} AS (
  SELECT cid, list(m ORDER BY pos) AS carr FROM l{idx} GROUP BY 1
)"""


def _kmeans_oracle(k: int = K, iters: int = ITERS) -> str:
    parts = [f"""emb AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
), c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         embedding AS carr
  FROM emb ORDER BY vec_id LIMIT {k}
)"""]
    for i in range(1, iters + 1):
        parts.append(_duck_iter(f"c{i - 1}", i))
    last = iters
    return f"""
WITH {', '.join(parts)}
, stats AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(d * {Q2}) AS BIGINT)) AS BIGINT) AS iq
  FROM a{last} GROUP BY 1
), norms AS (
  SELECT cid,
    CAST(sum(CAST(round(m * m * {Q2}) AS BIGINT)) AS BIGINT) AS n2q
  FROM l{last} GROUP BY 1
)
SELECT s.cid AS cluster, s.n,
  {round_portable_duck(
      f"CAST(s.iq AS DOUBLE) / (CAST(s.n AS DOUBLE) * {Q2F!r})", 6)}
    AS mean_dist,
  {round_portable_duck(
      f"sqrt(CAST(o.n2q AS DOUBLE) / {Q2F!r})", 6)} AS c_norm
FROM stats s JOIN norms o ON s.cid = o.cid
"""


QUERIES: dict = {
    "emb_kmeans_embeddings": (_q_kmeans, _kmeans_oracle()),
}

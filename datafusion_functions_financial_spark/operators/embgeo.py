"""Embedding geometry: per-label centroid dispersion + nearest-rival
centroid, exact medoids, and corpus anisotropy (mean pairwise
cosine) — the cluster-quality / representation-health diagnostics
that sit next to kNN label cohesion (embstats) and PCA (embpca).

Determinism with float32 inputs: every element is CAST to DOUBLE
before arithmetic (exact), in-array reductions are in-order folds
(Spark ``aggregate`` with 0.0 seed == DuckDB ``list_reduce`` — both
left folds over index order), and every cross-row reduction sums
per-term quantized BIGINTs (order-free under any partial-agg plan).

Plan shapes at scale:
- centroids: posexplode -> (label, dim) hash aggregate — the
  centroid table is labels x dims (tiny) and joins back BROADCAST;
  inter-centroid distances are a labels^2 self-join of that tiny
  table, never of the data.
- medoid: the within-label pairwise join is exact and bounded by the
  label-size cap (the hot-label guard — refuse quadratic work on a
  degenerate label); at 100 TB you cap or pre-cluster, same as the
  all-pairs guards in dedup.
- anisotropy: the ||sum of unit vectors|| identity turns mean
  pairwise cosine into ONE pass + a 64-row reduction — no pairs at
  all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["label_centroid_geometry", "label_medoids", "anisotropy"]

Q = 10 ** 8
QF = float(Q)
MAX_LABEL_SIZE = 10_000  # medoid pairwise-work guard

# In-order fold of squared elements (norm^2), elements cast to DOUBLE.
_NORM2_SPARK = ("aggregate(transform({v}, x -> CAST(x AS DOUBLE) "
                "* CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), "
                "(acc, t) -> acc + t)")
_NORM2_DUCK = ("list_reduce(list_transform({v}, "
               "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
               "(acc, t) -> acc + t)")
# In-order fold of squared differences between two arrays.
_SQDIST_SPARK = ("aggregate(zip_with({a}, {b}, (x, y) -> "
                 "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
                 "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
                 "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)")
_SQDIST_DUCK = ("list_reduce(list_transform(range(1, {dim} + 1), "
                "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
                " * (CAST({a}[i] AS DOUBLE) "
                "- CAST({b}[i] AS DOUBLE))), (acc, t) -> acc + t)")


def _exploded(df: DataFrame, vec_col: str, *cols: str) -> DataFrame:
    """(cols..., __pos 1-based, __val double) — one row per element."""
    return df.select(
        *cols, F.posexplode(vec_col).alias("__p0", "__v0")
    ).select(*cols, (F.col("__p0") + 1).alias("__pos"),
             F.col("__v0").cast("double").alias("__val"))


def label_centroid_geometry(df: DataFrame, vec_col: str,
                            label_col: str) -> DataFrame:
    """(label, n, mean_dist, nn_label, nn_dist): per label the mean
    member distance to its centroid (cluster tightness), plus the
    nearest OTHER centroid and its distance (separation margin;
    nn ties resolve to the smallest label)."""
    ex = _exploded(df, vec_col, label_col, "vec_id")
    cent = (
        ex.groupBy(label_col, "__pos")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.sum(F.expr(
                 f"CAST(round(__val * {Q}) AS BIGINT)")).alias("__s"))
        .select(
            label_col, "__pos", "__n",
            F.expr(f"CAST(__s AS DOUBLE) / (CAST(__n AS DOUBLE) "
                   f"* {QF!r})").alias("__c"),
        )
    )
    # Materialize the labels x dims table once: three consumers below
    # (member distances, both sides of the inter-centroid self-join)
    # would otherwise each re-scan the full corpus to rebuild it.
    cent = cent.localCheckpoint()
    # member -> centroid distances: broadcast the tiny centroid table
    dist = (
        ex.join(F.broadcast(cent.select(label_col, "__pos", "__c")),
                [label_col, "__pos"])
        .withColumn("__t", F.expr(
            f"CAST(round((__val - __c) * (__val - __c) * {Q}) "
            f"AS BIGINT)"))
        .groupBy(label_col, "vec_id")
        .agg(F.sum("__t").alias("__d2q"))
        .withColumn("__dq", F.expr(
            f"CAST(round(sqrt(CAST(__d2q AS DOUBLE) / {QF!r}) * {Q}) "
            f"AS BIGINT)"))
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             F.sum("__dq").alias("__sd"))
    )
    # inter-centroid distances: labels^2 self-join of the tiny table
    ca = cent.select(F.col(label_col).alias("__la"), "__pos",
                     F.col("__c").alias("__ca"))
    cb = cent.select(F.col(label_col).alias("__lb"), "__pos",
                     F.col("__c").alias("__cb"))
    between = (
        ca.join(F.broadcast(cb), "__pos")
        .filter(F.col("__la") != F.col("__lb"))
        .withColumn("__t", F.expr(
            f"CAST(round((__ca - __cb) * (__ca - __cb) * {Q}) "
            f"AS BIGINT)"))
        .groupBy("__la", "__lb")
        .agg(F.sum("__t").alias("__d2q"))
        .withColumn("__dq", F.expr(
            f"CAST(round(sqrt(CAST(__d2q AS DOUBLE) / {QF!r}) * {Q}) "
            f"AS BIGINT)"))
    )
    nn_d = between.groupBy("__la").agg(F.min("__dq").alias("__mind"))
    nn = (
        between.join(nn_d, "__la")
        .filter(F.col("__dq") == F.col("__mind"))
        .groupBy("__la")
        .agg(F.min("__lb").alias("nn_label"),
             F.max("__mind").alias("__nndq"))
    )
    return (
        dist.join(nn, dist[label_col] == nn["__la"])
        .select(
            label_col, "n",
            round_portable(F.expr(
                f"CAST(__sd AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r})"
            ), 6).alias("mean_dist"),
            "nn_label",
            round_portable(F.expr(
                f"CAST(__nndq AS DOUBLE) / {QF!r}"), 6
            ).alias("nn_dist"),
        )
    )


def _q_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_centroid_geometry(
        load(spark, sf_dir, "embeddings"), "embedding", "label")


_ORACLE_CENTROIDS = f"""
WITH ex AS (
  SELECT label, vec_id,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
), cent AS (
  SELECT label, pos, count(*) AS n,
    CAST(sum(CAST(round(val * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {QF!r}) AS c
  FROM ex GROUP BY 1, 2
), dvec AS (
  SELECT ex.label, ex.vec_id,
    CAST(sum(CAST(round((ex.val - cent.c) * (ex.val - cent.c) * {Q})
      AS BIGINT)) AS BIGINT) AS d2q
  FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
  GROUP BY 1, 2
), dist AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(sqrt(CAST(d2q AS DOUBLE) / {QF!r}) * {Q})
      AS BIGINT)) AS BIGINT) AS sd
  FROM dvec GROUP BY 1
), between_c AS (
  SELECT a.label AS la, b.label AS lb,
    CAST(sum(CAST(round((a.c - b.c) * (a.c - b.c) * {Q}) AS BIGINT))
      AS BIGINT) AS d2q
  FROM cent a JOIN cent b ON a.pos = b.pos AND a.label != b.label
  GROUP BY 1, 2
), bq AS (
  SELECT la, lb,
    CAST(round(sqrt(CAST(d2q AS DOUBLE) / {QF!r}) * {Q}) AS BIGINT)
      AS dq
  FROM between_c
), nnd AS (
  SELECT la, min(dq) AS mind FROM bq GROUP BY 1
), nn AS (
  SELECT bq.la, min(bq.lb) AS nn_label, max(nnd.mind) AS nndq
  FROM bq JOIN nnd ON bq.la = nnd.la AND bq.dq = nnd.mind
  GROUP BY 1
)
SELECT d.label, d.n,
  {round_portable_duck(
      f"CAST(d.sd AS DOUBLE) / (CAST(d.n AS DOUBLE) * {QF!r})", 6)}
    AS mean_dist,
  nn.nn_label,
  {round_portable_duck(f"CAST(nn.nndq AS DOUBLE) / {QF!r}", 6)}
    AS nn_dist
FROM dist d JOIN nn ON d.label = nn.la
"""


def label_medoids(df: DataFrame, vec_col: str, label_col: str,
                  id_col: str, dim: int,
                  max_label_size: int = MAX_LABEL_SIZE) -> DataFrame:
    """(label, medoid_id, n, mean_dist): the member minimizing the
    summed distance to its label peers (ties -> smallest id). Exact
    within-label pairwise work, guarded by ``max_label_size`` —
    labels above the cap are EXCLUDED (loudly quadratic otherwise)."""
    sizes = df.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("__n"))
    ok = df.join(
        F.broadcast(sizes.filter(
            (F.col("__n") <= max_label_size) & (F.col("__n") > 1))),
        label_col)
    a = ok.select(F.col(label_col).alias("__l"),
                  F.col(id_col).alias("__ia"),
                  F.col(vec_col).alias("__va"), "__n")
    b = ok.select(F.col(label_col).alias("__l"),
                  F.col(id_col).alias("__ib"),
                  F.col(vec_col).alias("__vb"))
    sq = _SQDIST_SPARK.format(a="__va", b="__vb")
    per = (
        a.join(b, "__l")
        .filter(F.col("__ia") != F.col("__ib"))
        .withColumn("__dq", F.expr(
            f"CAST(round(sqrt({sq}) * {Q}) AS BIGINT)"))
        .groupBy("__l", "__ia")
        .agg(F.max("__n").alias("__n"),
             F.sum("__dq").alias("__tot"))
    )
    best = per.groupBy("__l").agg(F.min("__tot").alias("__best"))
    return (
        per.join(best, "__l")
        .filter(F.col("__tot") == F.col("__best"))
        .groupBy("__l")
        .agg(F.min("__ia").alias("medoid_id"),
             F.max("__n").cast("bigint").alias("n"),
             F.max("__best").alias("__tq"))
        .select(
            F.col("__l").alias(label_col), "medoid_id", "n",
            round_portable(F.expr(
                f"CAST(__tq AS DOUBLE) / (CAST(n - 1 AS DOUBLE) "
                f"* {QF!r})"), 6).alias("mean_dist"),
        )
    )


def _q_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_medoids(load(spark, sf_dir, "embeddings"),
                         "embedding", "label", "vec_id", dim=64)


_SQD = _SQDIST_DUCK.format(a="a.embedding", b="b.embedding", dim=64)

_ORACLE_MEDOIDS = f"""
WITH sizes AS (
  SELECT label, count(*) AS n FROM embeddings GROUP BY 1
), ok AS (
  SELECT e.*, s.n FROM embeddings e JOIN sizes s
    ON e.label = s.label
  WHERE s.n <= {MAX_LABEL_SIZE} AND s.n > 1
), per AS (
  SELECT a.label AS l, a.vec_id AS ia, max(a.n) AS n,
    CAST(sum(CAST(round(sqrt({_SQD}) * {Q}) AS BIGINT)) AS BIGINT)
      AS tot
  FROM ok a JOIN ok b
    ON a.label = b.label AND a.vec_id != b.vec_id
  GROUP BY 1, 2
), best AS (
  SELECT l, min(tot) AS best FROM per GROUP BY 1
)
SELECT per.l AS label, min(per.ia) AS medoid_id,
  CAST(max(per.n) AS BIGINT) AS n,
  {round_portable_duck(
      f"CAST(max(per.tot) AS DOUBLE) "
      f"/ (CAST(max(per.n) - 1 AS DOUBLE) * {QF!r})", 6)}
    AS mean_dist
FROM per JOIN best ON per.l = best.l AND per.tot = best.best
GROUP BY 1
"""


def anisotropy(df: DataFrame, vec_col: str) -> DataFrame:
    """One row (n, mean_pairwise_cos): the exact mean cosine between
    all ordered pairs of distinct rows via the unit-sum identity
    ``(||sum u_i||^2 - n) / (n (n - 1))`` — high values mean the
    embedding space collapses into a narrow cone (anisotropy), a
    standard representation-quality red flag. One pass + a dim-sized
    reduction; zero pairs materialized."""
    n2 = _NORM2_SPARK.format(v=vec_col)
    # Explode the RAW vector and carry the per-row norm scalar through
    # the Generate instead of exploding a normalized transform()
    # array: Catalyst collapses the transform into the generator
    # expression and re-evaluates the whole norm fold per EXPLODED
    # element (measured 1.5 s vs 0.6 s for this explode at sf0.1).
    # __val is the same CAST(x AS DOUBLE) / sqrt(n2) double.
    ex = (
        df.select(F.expr(f"sqrt({n2})").alias("__nrm"),
                  F.posexplode(vec_col).alias("__p0", "__x"))
        .select("__p0",
                F.expr("CAST(__x AS DOUBLE) / __nrm").alias("__val"))
    )
    dims = (
        ex.groupBy("__p0")
        .agg(F.sum(F.expr(
            f"CAST(round(__val * {Q}) AS BIGINT)")).alias("__s"),
            F.count(F.lit(1)).alias("__n"))
        .select(
            "__n",
            F.expr(
                f"CAST(round((CAST(__s AS DOUBLE) / {QF!r}) "
                f"* (CAST(__s AS DOUBLE) / {QF!r}) * {Q}) AS BIGINT)"
            ).alias("__m2q"),
        )
    )
    return dims.agg(
        F.max("__n").cast("bigint").alias("n"),
        F.sum("__m2q").alias("__ssq"),
    ).select(
        "n",
        round_portable(F.expr(
            f"(CAST(__ssq AS DOUBLE) / {QF!r} - CAST(n AS DOUBLE)) "
            f"/ (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))"), 6
        ).alias("mean_pairwise_cos"),
    )


def _q_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anisotropy(load(spark, sf_dir, "embeddings"), "embedding")


_N2_D = _NORM2_DUCK.format(v="embedding")

_ORACLE_ANISOTROPY = f"""
WITH unit AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)
           / sqrt({_N2_D})) AS u
  FROM embeddings
), ex AS (
  SELECT generate_subscripts(u, 1) AS pos, unnest(u) AS val
  FROM unit
), dims AS (
  SELECT pos, count(*) AS n,
    CAST(sum(CAST(round(val * {Q}) AS BIGINT)) AS BIGINT) AS s
  FROM ex GROUP BY 1
), m AS (
  SELECT n,
    CAST(round((CAST(s AS DOUBLE) / {QF!r})
      * (CAST(s AS DOUBLE) / {QF!r}) * {Q}) AS BIGINT) AS m2q
  FROM dims
)
SELECT CAST(max(n) AS BIGINT) AS n,
  {round_portable_duck(
      f"(CAST(CAST(sum(m2q) AS BIGINT) AS DOUBLE) / {QF!r} "
      f"- CAST(max(n) AS DOUBLE)) / (CAST(max(n) AS DOUBLE) "
      f"* CAST(max(n) - 1 AS DOUBLE))", 6)} AS mean_pairwise_cos
FROM m
"""


QUERIES: dict = {
    "emb_centroid_geometry_embeddings": (
        _q_centroids, _ORACLE_CENTROIDS),
    "emb_medoid_embeddings": (_q_medoids, _ORACLE_MEDOIDS),
    "emb_anisotropy_embeddings": (_q_anisotropy, _ORACLE_ANISOTROPY),
}

"""Embedding cluster-validity indices: Davies-Bouldin,
Calinski-Harabasz, and the centroid Dunn index — the classical
internal cluster-quality scores next to the gated centroid silhouette
(``embgeo2``), cohesion (``emb_label_cohesion``) and separation
(``emb_label_separation``) tiers. Together they answer "is this
labeling / clustering worth trusting?" from three angles:
worst-pair overlap (DB), variance ratio (CH), and the
separation-to-diameter margin (Dunn).

- ``davies_bouldin``: per label i, scatter S_i = mean member
  distance to its centroid; DB_i = max over j != i of
  (S_i + S_j) / d(c_i, c_j); the index is the mean of the per-label
  rows this returns (lower = better).
- ``calinski_harabasz``: CH = (B/(k-1)) / (W/(n-k)) with
  B = sum n_i ||c_i - c||^2 (c = global centroid) and
  W = sum ||x - c_label(x)||^2 (higher = better).
- ``dunn_centroid``: min inter-centroid distance over twice the max
  member-to-centroid distance — the centroid-diameter variant of the
  Dunn index (the O(n^2) pairwise forms don't scale; this one is two
  broadcast joins).

Follows ``embgeo``'s exactness scheme: centroids from quantized
BIGINT component sums, squared-distance folds quantized at 1e8,
every distance rooted once and re-quantized before any mean/max.

Plan shape at 100 TB: the centroid relation is labels x dims (tiny,
localCheckpointed once, broadcast everywhere); member scoring is one
broadcast join on the dim index; the inter-centroid grid is a k^2
self-join of the tiny relation. No pairwise row joins, no windows.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (embedding tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .embgeo import _exploded
from .similarity import DIM

__all__ = ["davies_bouldin", "calinski_harabasz", "dunn_centroid"]

Q = 10 ** 8
QF = float(Q)


def _cent(ex: DataFrame, label_col: str) -> DataFrame:
    """(__cand, __pos, __c): per-label centroid components from
    quantized sums."""
    return (
        ex.groupBy(label_col, "__pos")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.sum(F.expr(
                 f"CAST(round(__val * {Q}) AS BIGINT)")).alias("__s"))
        .select(
            F.col(label_col).alias("__cand"), "__pos",
            F.expr(f"CAST(__s AS DOUBLE) / (CAST(__n AS DOUBLE) "
                   f"* {QF!r})").alias("__c"),
        )
    ).localCheckpoint()


def _own_dist(ex: DataFrame, cent: DataFrame,
              label_col: str) -> DataFrame:
    """(vec_id, label, __dq): quantized distance of each vector to
    its OWN label centroid."""
    own = cent.withColumnRenamed("__cand", label_col)
    return (
        ex.join(F.broadcast(own), [label_col, "__pos"])
        .withColumn("__t", F.expr(
            f"CAST(round((__val - __c) * (__val - __c) * {Q}) "
            f"AS BIGINT)"))
        .groupBy("vec_id", label_col)
        .agg(F.sum("__t").alias("__d2q"))
        .withColumn("__dq", F.expr(
            f"CAST(round(sqrt(CAST(__d2q AS DOUBLE) / {QF!r}) * {Q}) "
            f"AS BIGINT)"))
    )


def _cent_dists(cent: DataFrame) -> DataFrame:
    """(__i, __j, __cdq): quantized inter-centroid distances for
    every ordered pair i != j."""
    a = cent.selectExpr("__cand AS __i", "__pos", "__c AS __ci")
    b = cent.selectExpr("__cand AS __j", "__pos", "__c AS __cj")
    return (
        a.join(b, "__pos")
        .filter("__i != __j")
        .withColumn("__t", F.expr(
            f"CAST(round((__ci - __cj) * (__ci - __cj) * {Q}) "
            f"AS BIGINT)"))
        .groupBy("__i", "__j")
        .agg(F.sum("__t").alias("__d2q"))
        .withColumn("__cdq", F.expr(
            f"CAST(round(sqrt(CAST(__d2q AS DOUBLE) / {QF!r}) * {Q}) "
            f"AS BIGINT)"))
        .select("__i", "__j", "__cdq")
    )


def davies_bouldin(df: DataFrame, vec_col: str,
                   label_col: str) -> DataFrame:
    """(label, n, scatter, db_term): per-label scatter S_i and the
    Davies-Bouldin term max_j (S_i + S_j) / d_ij; the DB index is the
    mean of db_term."""
    ex = _exploded(df, vec_col, label_col, "vec_id")
    cent = _cent(ex, label_col)
    s = (
        _own_dist(ex, cent, label_col)
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             F.sum("__dq").alias("__sdq"))
        .withColumn("__s", F.expr(
            f"CAST(__sdq AS DOUBLE) / {QF!r} / CAST(n AS DOUBLE)"))
    )
    cd = _cent_dists(cent)
    si = s.selectExpr(f"{label_col} AS __i", "n AS __ni",
                      "__s AS __si")
    sj = s.selectExpr(f"{label_col} AS __j", "__s AS __sj")
    terms = (
        cd.join(F.broadcast(si), "__i")
        .join(F.broadcast(sj), "__j")
        .withColumn("__ratio_q", F.expr(
            f"CAST(round((__si + __sj) "
            f"/ (CAST(__cdq AS DOUBLE) / {QF!r}) * {Q}) AS BIGINT)"))
        .groupBy("__i", "__ni", "__si")
        .agg(F.max("__ratio_q").alias("__mr"))
    )
    return terms.select(
        F.col("__i").alias("label"),
        F.col("__ni").alias("n"),
        round_portable(F.col("__si"), 6).alias("scatter"),
        round_portable(F.expr(
            f"CAST(__mr AS DOUBLE) / {QF!r}"), 6).alias("db_term"),
    ).orderBy("label")


def calinski_harabasz(df: DataFrame, vec_col: str,
                      label_col: str) -> DataFrame:
    """One row (k, n, b_ss, w_ss, ch): the Calinski-Harabasz variance
    ratio of the labeling."""
    ex = _exploded(df, vec_col, label_col, "vec_id")
    cent = _cent(ex, label_col)
    w = (
        _own_dist(ex, cent, label_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             F.sum("__d2q").alias("__wq"))
    )
    sizes = (
        df.groupBy(label_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("__ni"))
        .selectExpr(f"{label_col} AS __cand", "__ni")
    )
    # global centroid = weighted mean of label centroids? NO — exact:
    # recompute from the same quantized component sums over ALL rows
    gcent = (
        ex.groupBy("__pos")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.sum(F.expr(
                 f"CAST(round(__val * {Q}) AS BIGINT)")).alias("__s"))
        .select("__pos",
                F.expr(f"CAST(__s AS DOUBLE) / (CAST(__n AS DOUBLE) "
                       f"* {QF!r})").alias("__g"))
    )
    b = (
        cent.join(F.broadcast(gcent), "__pos")
        .withColumn("__t", F.expr(
            f"CAST(round((__c - __g) * (__c - __g) * {Q}) "
            f"AS BIGINT)"))
        .groupBy("__cand")
        .agg(F.sum("__t").alias("__b2q"))
        .join(F.broadcast(sizes), "__cand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.sum(F.expr(
                "CAST(__ni AS BIGINT) * __b2q")).alias("__bq"),
        )
    )
    bss = f"(CAST(__bq AS DOUBLE) / {QF!r})"
    wss = f"(CAST(__wq AS DOUBLE) / {QF!r})"
    return b.crossJoin(F.broadcast(w)).select(
        "k", "n",
        round_portable(F.expr(bss), 6).alias("b_ss"),
        round_portable(F.expr(wss), 6).alias("w_ss"),
        round_portable(F.expr(
            f"({bss} / CAST(k - 1 AS DOUBLE)) "
            f"/ ({wss} / CAST(n - k AS DOUBLE))"), 6).alias("ch"),
    )


def dunn_centroid(df: DataFrame, vec_col: str,
                  label_col: str) -> DataFrame:
    """One row (k, min_sep, max_diam, dunn): centroid-variant Dunn
    index — min inter-centroid distance / (2 * max member-to-centroid
    distance)."""
    ex = _exploded(df, vec_col, label_col, "vec_id")
    cent = _cent(ex, label_col)
    sep = _cent_dists(cent).agg(
        F.min("__cdq").alias("__minsep"),
        F.expr(f"CAST(count(DISTINCT __i) AS BIGINT)").alias("k"),
    )
    diam = _own_dist(ex, cent, label_col).agg(
        F.max("__dq").alias("__maxd"))
    return sep.crossJoin(F.broadcast(diam)).select(
        "k",
        round_portable(F.expr(
            f"CAST(__minsep AS DOUBLE) / {QF!r}"), 6).alias("min_sep"),
        round_portable(F.expr(
            f"2.0 * CAST(__maxd AS DOUBLE) / {QF!r}"), 6)
        .alias("max_diam"),
        round_portable(F.expr(
            "CASE WHEN __maxd > 0 THEN CAST(__minsep AS DOUBLE) "
            "/ (2.0 * CAST(__maxd AS DOUBLE)) ELSE 0.0 END"), 6)
        .alias("dunn"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles
# --------------------------------------------------------------------------


def _q_db(spark: SparkSession, sf_dir: str) -> DataFrame:
    return davies_bouldin(load(spark, sf_dir, "embeddings"),
                          "embedding", "label")


def _q_ch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return calinski_harabasz(load(spark, sf_dir, "embeddings"),
                             "embedding", "label")


def _q_dunn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dunn_centroid(load(spark, sf_dir, "embeddings"),
                         "embedding", "label")


_DUCK_EX = f"""ex AS (
  SELECT label, vec_id, r.range AS pos,
    CAST(embedding[r.range] AS DOUBLE) AS val
  FROM embeddings, range(1, {DIM} + 1) r
), cent AS (
  SELECT label AS cand, pos,
    CAST(sum(CAST(round(val * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {QF!r}) AS c
  FROM ex GROUP BY 1, 2
), own AS (
  SELECT ex.vec_id, ex.label,
    CAST(round(sqrt(CAST(sum(CAST(round((ex.val - cent.c)
      * (ex.val - cent.c) * {Q}) AS BIGINT)) AS DOUBLE) / {QF!r})
      * {Q}) AS BIGINT) AS dq,
    CAST(sum(CAST(round((ex.val - cent.c) * (ex.val - cent.c)
      * {Q}) AS BIGINT)) AS BIGINT) AS d2q
  FROM ex JOIN cent ON ex.pos = cent.pos AND ex.label = cent.cand
  GROUP BY 1, 2
), cd AS (
  SELECT a.cand AS i, b.cand AS j,
    CAST(round(sqrt(CAST(sum(CAST(round((a.c - b.c) * (a.c - b.c)
      * {Q}) AS BIGINT)) AS DOUBLE) / {QF!r}) * {Q}) AS BIGINT)
      AS cdq
  FROM cent a JOIN cent b ON a.pos = b.pos AND a.cand != b.cand
  GROUP BY 1, 2
)"""

_ORACLE_DB = f"""
WITH {_DUCK_EX}, s AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(dq) AS DOUBLE) / {QF!r} / CAST(count(*) AS DOUBLE) AS sc
  FROM own GROUP BY 1
), terms AS (
  SELECT cd.i, si.n AS ni, si.sc AS sci,
    max(CAST(round((si.sc + sj.sc)
      / (CAST(cd.cdq AS DOUBLE) / {QF!r}) * {Q}) AS BIGINT)) AS mr
  FROM cd JOIN s si ON cd.i = si.label
  JOIN s sj ON cd.j = sj.label
  GROUP BY 1, 2, 3
)
SELECT i AS label, ni AS n,
  {round_portable_duck("sci", 6)} AS scatter,
  {round_portable_duck(f"CAST(mr AS DOUBLE) / {QF!r}", 6)} AS db_term
FROM terms ORDER BY 1
"""

_D_BSS = f"(CAST(bq AS DOUBLE) / {QF!r})"
_D_WSS = f"(CAST(wq AS DOUBLE) / {QF!r})"

_ORACLE_CH = f"""
WITH {_DUCK_EX}, w AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(d2q) AS BIGINT) AS wq
  FROM own
), gcent AS (
  SELECT pos,
    CAST(sum(CAST(round(val * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {QF!r}) AS g
  FROM ex GROUP BY 1
), sizes AS (
  SELECT label AS cand, CAST(count(*) AS BIGINT) AS ni
  FROM embeddings GROUP BY 1
), bterms AS (
  SELECT cent.cand,
    CAST(sum(CAST(round((cent.c - gcent.g) * (cent.c - gcent.g)
      * {Q}) AS BIGINT)) AS BIGINT) AS b2q
  FROM cent JOIN gcent ON cent.pos = gcent.pos
  GROUP BY 1
), b AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
    CAST(sum(sizes.ni * bterms.b2q) AS BIGINT) AS bq
  FROM bterms JOIN sizes ON bterms.cand = sizes.cand
)
SELECT b.k, w.n,
  {round_portable_duck(_D_BSS, 6)} AS b_ss,
  {round_portable_duck(_D_WSS, 6)} AS w_ss,
  {round_portable_duck(
      f"({_D_BSS} / CAST(b.k - 1 AS DOUBLE)) "
      f"/ ({_D_WSS} / CAST(w.n - b.k AS DOUBLE))", 6)} AS ch
FROM b, w
"""

_ORACLE_DUNN = f"""
WITH {_DUCK_EX}, sep AS (
  SELECT CAST(min(cdq) AS BIGINT) AS minsep,
    CAST(count(DISTINCT i) AS BIGINT) AS k
  FROM cd
), diam AS (SELECT CAST(max(dq) AS BIGINT) AS maxd FROM own)
SELECT sep.k,
  {round_portable_duck(
      f"CAST(sep.minsep AS DOUBLE) / {QF!r}", 6)} AS min_sep,
  {round_portable_duck(
      f"2.0 * CAST(diam.maxd AS DOUBLE) / {QF!r}", 6)} AS max_diam,
  {round_portable_duck(
      "CASE WHEN diam.maxd > 0 THEN CAST(sep.minsep AS DOUBLE) "
      "/ (2.0 * CAST(diam.maxd AS DOUBLE)) ELSE 0.0 END", 6)}
    AS dunn
FROM sep, diam
"""


QUERIES: dict = {
    "emb_davies_bouldin_embeddings": (_q_db, _ORACLE_DB),
    "emb_calinski_harabasz_embeddings": (_q_ch, _ORACLE_CH),
    "emb_dunn_embeddings": (_q_dunn, _ORACLE_DUNN),
}

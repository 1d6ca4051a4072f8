"""Embedding geometry #2: simplified (centroid-based) silhouette per
label — FOR EACH vector, a = distance to its own label centroid and
b = distance to the nearest OTHER centroid; s = (b - a) / max(a, b).
The per-label mean silhouette is the standard cluster-quality score
(1 = tight and well separated, 0 = on the boundary, < 0 = probably
mislabeled); the centroid variant avoids the O(n^2) pairwise form
and is the one that scales.

Follows ``embgeo.label_centroid_geometry``'s exactness scheme:
centroids from quantized BIGINT component sums (identical doubles
both engines), per-(vector, candidate-centroid) squared distances
summed as quantized BIGINTs, each distance rooted once and
re-quantized, and the per-row silhouette quantized at 1e8 BEFORE the
per-label mean.

Plan shape at 100 TB: the centroid table is labels x dims (tiny,
broadcast); scoring each vector against ALL centroids is one
broadcast join on the dim index (the embgeo pattern — k x dims rows
per vector, k = label count); two hash aggregates end it. No
pairwise joins, no windows.

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

__all__ = ["label_silhouette"]

Q = 10 ** 8
QF = float(Q)


def label_silhouette(df: DataFrame, vec_col: str,
                     label_col: str) -> DataFrame:
    """(label, n, silhouette): per-label mean centroid silhouette."""
    ex = _exploded(df, vec_col, label_col, "vec_id")
    cent = (
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
    d = (
        ex.join(F.broadcast(cent), "__pos")
        .withColumn("__t", F.expr(
            f"CAST(round((__val - __c) * (__val - __c) * {Q}) "
            f"AS BIGINT)"))
        .groupBy("vec_id", label_col, "__cand")
        .agg(F.sum("__t").alias("__d2q"))
        .withColumn("__dq", F.expr(
            f"CAST(round(sqrt(CAST(__d2q AS DOUBLE) / {QF!r}) * {Q}) "
            f"AS BIGINT)"))
    )
    ab = d.groupBy("vec_id", label_col).agg(
        F.max(F.expr(f"CASE WHEN __cand = {label_col} THEN __dq "
                     "END")).alias("__a"),
        F.min(F.expr(f"CASE WHEN __cand != {label_col} THEN __dq "
                     "END")).alias("__b"),
    )
    s = ("CASE WHEN greatest(__a, __b) = 0 THEN 0.0 ELSE "
         "CAST(__b - __a AS DOUBLE) "
         "/ CAST(greatest(__a, __b) AS DOUBLE) END")
    return (
        ab.withColumn("__sq", F.expr(
            f"CAST(round(({s}) * {Q}) AS BIGINT)"))
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             F.sum("__sq").alias("__ss"))
        .select(
            label_col, "n",
            round_portable(F.expr(
                f"CAST(__ss AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r})"
            ), 6).alias("silhouette"),
        )
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle
# --------------------------------------------------------------------------


def _q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_silhouette(load(spark, sf_dir, "embeddings"),
                            "embedding", "label")


_ORACLE_SILHOUETTE = f"""
WITH ex AS (
  SELECT label, vec_id, r.range AS pos,
    CAST(embedding[r.range] AS DOUBLE) AS val
  FROM embeddings, range(1, {DIM} + 1) r
), cent AS (
  SELECT label AS cand, pos,
    CAST(sum(CAST(round(val * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {QF!r}) AS c
  FROM ex GROUP BY 1, 2
), d AS (
  SELECT ex.vec_id, ex.label, cent.cand,
    CAST(round(sqrt(CAST(sum(CAST(round((ex.val - cent.c)
      * (ex.val - cent.c) * {Q}) AS BIGINT)) AS DOUBLE) / {QF!r})
      * {Q}) AS BIGINT) AS dq
  FROM ex JOIN cent ON ex.pos = cent.pos
  GROUP BY 1, 2, 3
), ab AS (
  SELECT vec_id, label,
    max(CASE WHEN cand = label THEN dq END) AS a,
    min(CASE WHEN cand != label THEN dq END) AS b
  FROM d GROUP BY 1, 2
), srows AS (
  SELECT label,
    CAST(round((CASE WHEN greatest(a, b) = 0 THEN 0.0 ELSE
      CAST(b - a AS DOUBLE) / CAST(greatest(a, b) AS DOUBLE) END)
      * {Q}) AS BIGINT) AS sq
  FROM ab
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
  {round_portable_duck(
      f"CAST(sum(sq) AS DOUBLE) / (CAST(count(*) AS DOUBLE) "
      f"* {QF!r})", 6)} AS silhouette
FROM srows GROUP BY 1
"""


QUERIES: dict = {
    "emb_silhouette_embeddings": (_q_silhouette, _ORACLE_SILHOUETTE),
}

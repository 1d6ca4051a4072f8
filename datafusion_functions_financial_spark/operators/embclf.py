"""Embedding classifier-eval: nearest-centroid confusion matrix —
"how separable are the labels under the cheapest possible
classifier?" — the centroid twin of the gated kNN label vote
(``knn_label_vote_embeddings`` prices the expensive local rule;
nearest-centroid is the O(labels) rule a pipeline actually deploys
for coarse routing, and its confusion matrix shows WHICH labels
bleed into each other, not just the accuracy).

Construction reuses the IVF machinery verbatim (``ivf._nearest``
assignment + the integer-quantized component means of the gated
index build, with labels as cells), so the oracle mirrors the
``knn_ivf`` SQL chain bit-for-bit: floor-quantized component sums,
cosine reassignment, deterministic (cos DESC, label ASC) ties.

Output: the dense (true_label x pred_label) grid — absent pairs
emit n = 0 so an SF change cannot change the result-set shape —
plus each row's share of its true label.

Plan shape at 100 TB: one posexplode aggregate to (label, pos)
component sums (map-side combinable), a label-count centroid
relation (broadcast), one assignment pass, one hash aggregate to
the bounded grid.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (embedding tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .ivf import QUANT, _nearest
from .similarity import DIM, _cos_duck

__all__ = ["centroid_confusion"]


def centroid_confusion(df: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """(true_label, pred_label, n, share): the nearest-centroid
    confusion grid (dense over observed labels; share = n over the
    true label's total)."""
    v = df.selectExpr(f"{id_col} AS vec_id",
                      f"{vec_col} AS embedding",
                      f"CAST({label_col} AS BIGINT) AS __lab")
    comp = v.select(
        "__lab", F.posexplode("embedding").alias("pos", "val"),
    ).groupBy("__lab", "pos").agg(
        F.sum(
            F.floor(F.col("val").cast("double")
                    * F.lit(float(QUANT))).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    cents = (
        comp.withColumn(
            "cval",
            F.col("s").cast("double")
            / (F.lit(float(QUANT)) * F.col("c").cast("double")))
        .groupBy("__lab")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(pos, cval))), "
            "x -> x.cval)").alias("centroid"))
        .selectExpr("__lab AS pred", "centroid")
    ).localCheckpoint()
    assigned = _nearest(v.select("vec_id", "embedding"), cents,
                        "pred", "centroid", 1)
    truth = v.selectExpr("vec_id", "__lab AS true_label")
    pairs = (
        assigned.select("vec_id", F.col("pred").alias("pred_label"))
        .join(truth, "vec_id")
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    labels = cents.selectExpr("pred AS __l").localCheckpoint()
    grid = (
        labels.selectExpr("__l AS true_label")
        .crossJoin(labels.selectExpr("__l AS pred_label"))
        .join(pairs, ["true_label", "pred_label"], "left")
        .withColumn("__n", F.coalesce(F.col("__n"), F.lit(0))
                    .cast("bigint"))
    )
    tot = grid.groupBy("true_label").agg(
        F.sum("__n").cast("bigint").alias("__tt"))
    return (
        grid.join(F.broadcast(tot), "true_label")
        .select(
            "true_label", "pred_label",
            F.col("__n").alias("n"),
            round_portable(F.expr(
                "CASE WHEN __tt > 0 THEN CAST(__n AS DOUBLE) "
                "/ CAST(__tt AS DOUBLE) ELSE 0.0 END"), 6)
            .alias("share"),
        )
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle
# --------------------------------------------------------------------------


def _q_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return centroid_confusion(load(spark, sf_dir, "embeddings"))


_ORACLE_CONFUSION = f"""
WITH v AS (
  SELECT vec_id, embedding, CAST(label AS BIGINT) AS lab
  FROM embeddings
), comp AS (
  SELECT lab, r.range AS pos,
         sum(CAST(floor(CAST(embedding[r.range] AS DOUBLE)
                  * {QUANT}.0) AS BIGINT)) AS s,
         count(*) AS c
  FROM v, range(1, {DIM} + 1) r
  GROUP BY 1, 2
), cent AS (
  SELECT lab AS pred,
         list(CAST(s AS DOUBLE) / ({QUANT}.0 * CAST(c AS DOUBLE))
              ORDER BY pos) AS centroid
  FROM comp GROUP BY 1
), a AS (
  SELECT v.vec_id, v.lab AS true_label, c.pred,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_cos_duck('v.embedding', 'c.centroid')} DESC,
                    c.pred ASC) AS rn
  FROM v, cent c
), pairs AS (
  SELECT true_label, pred AS pred_label,
    CAST(count(*) AS BIGINT) AS n
  FROM a WHERE rn = 1 GROUP BY 1, 2
), grid AS (
  SELECT t.pred AS true_label, p.pred AS pred_label,
    CAST(coalesce(pairs.n, 0) AS BIGINT) AS n
  FROM cent t CROSS JOIN cent p
  LEFT JOIN pairs ON pairs.true_label = t.pred
    AND pairs.pred_label = p.pred
), tot AS (
  SELECT true_label, CAST(sum(n) AS BIGINT) AS tt
  FROM grid GROUP BY 1
)
SELECT grid.true_label, grid.pred_label, grid.n,
  {round_portable_duck(
      "CASE WHEN tot.tt > 0 THEN CAST(grid.n AS DOUBLE) "
      "/ CAST(tot.tt AS DOUBLE) ELSE 0.0 END", 6)} AS share
FROM grid JOIN tot ON grid.true_label = tot.true_label
"""


QUERIES: dict = {
    "emb_centroid_confusion_embeddings": (_q_confusion,
                                          _ORACLE_CONFUSION),
}

"""Embedding label-geometry, part 2: pairwise centroid separation —
the complement of ``embstats.label_cohesion`` (how tight is each
cluster) answering "how far apart are the clusters": low separation
between two labels flags confusable classes / mislabeled data.

Centroids are the exact-integer quantized means of
``embstats.label_cohesion`` (order-free BIGINT component sums), so
both engines build bit-identical centroid vectors; the pairwise
cosine is the repo's sequential fold over the K² centroid pairs —
a broadcast-size relation at any corpus size (K = label count).

Plan shape at scale: one linear explode + integer aggregation builds
the K-row centroid table; the pair join is K×K on a tiny relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .embstats import QUANT, _norm_duck
from .similarity import DIM

__all__ = ["label_separation"]


def _centroids(df: DataFrame, label_col: str,
               vec_col: str) -> DataFrame:
    q = F.floor(F.col("val").cast("double") * F.lit(float(QUANT))) \
        .cast("long")
    return (
        df.select(F.col(label_col).alias("lbl"),
                  F.posexplode(vec_col).alias("pos", "val"))
        .select("lbl", "pos", q.alias("q"))
        .groupBy("lbl", "pos")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("c"))
        .withColumn(
            "m",
            F.col("s").cast("double")
            / (F.lit(float(QUANT)) * F.col("c").cast("double")),
        )
        .groupBy("lbl")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(pos, m))), "
            "x -> x.m) AS cvec"))
    )


def label_separation(df: DataFrame, label_col: str = "label",
                     vec_col: str = "embedding") -> DataFrame:
    """(label_a, label_b, centroid_cos): cosine similarity between
    every pair of per-label centroids (label_a < label_b)."""
    cents = _centroids(df, label_col, vec_col)
    a = cents.selectExpr("lbl AS label_a", "cvec AS va")
    b = cents.selectExpr("lbl AS label_b", "cvec AS vb")
    dot = ("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, "
           "(acc, v) -> acc + v)")
    na = "sqrt(aggregate(va, 0D, (acc, y) -> acc + y * y))"
    nb = "sqrt(aggregate(vb, 0D, (acc, y) -> acc + y * y))"
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a", "label_b",
            round_portable(
                F.expr(f"({dot}) / nullif(({na}) * ({nb}), 0D)")
            ).alias("centroid_cos"),
        )
    )


# --------------------------------------------------------------------------
# Gate query
# --------------------------------------------------------------------------


def _q_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_separation(load(spark, sf_dir, "embeddings"))


_ORACLE_SEPARATION = f"""
WITH comp AS (
  SELECT label AS lbl, pos - 1 AS pos,
         CAST(floor(CAST(val AS DOUBLE) * {float(QUANT)!r}) AS BIGINT)
           AS q
  FROM (SELECT label, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings)
), sums AS (
  SELECT lbl, pos, CAST(sum(q) AS BIGINT) AS s, count(*) AS c
  FROM comp GROUP BY 1, 2
), cents AS (
  SELECT lbl,
         list(CAST(s AS DOUBLE)
              / ({float(QUANT)!r} * CAST(c AS DOUBLE))
              ORDER BY pos) AS cvec
  FROM sums GROUP BY 1
)
SELECT a.lbl AS label_a, b.lbl AS label_b,
  {round_portable_duck(
      "list_reduce(list_concat([CAST(0 AS DOUBLE)], "
      "list_transform(range(1, " + str(DIM) + " + 1), i -> "
      "a.cvec[i] * b.cvec[i])), (acc, v) -> acc + v) "
      "/ nullif(sqrt(list_reduce(list_concat([CAST(0 AS DOUBLE)], "
      "list_transform(a.cvec, y -> y * y)), (acc, v) -> acc + v)) "
      "* sqrt(list_reduce(list_concat([CAST(0 AS DOUBLE)], "
      "list_transform(b.cvec, y -> y * y)), (acc, v) -> acc + v)), "
      "0.0)")} AS centroid_cos
FROM cents a JOIN cents b ON a.lbl < b.lbl
"""


QUERIES: dict = {
    "emb_label_separation_embeddings": (_q_separation,
                                        _ORACLE_SEPARATION),
}

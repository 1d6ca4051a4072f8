"""Embedding-corpus diagnostics: L2-norm histogram, deterministic
random projection (dimensionality reduction), and per-label cluster
quality (centroid cohesion) — the monitoring/feature-engineering side
of the embedding stack (ANN/dedup live in ``similarity``/``ivf``/
``quantize``; per-dim normalization in ``embnorm``).

- ``norm_histogram`` — the first sanity check on any embedding dump
  (collapsed norms ⇒ dead model; bimodal ⇒ mixed checkpoints);
- ``random_projection`` — Johnson-Lindenstrauss-style reduction to
  ``out_dim`` pseudo-random directions. Deterministic LCG plane
  components (the ``similarity`` SRP generator) instead of RNG, so
  Spark and the SQL oracle build bit-identical planes;
- ``label_cohesion`` — per-label centroid (exact-integer quantized
  means, the ``ivf``/``embnorm`` technique) and the mean cosine of
  members to their own centroid: the cheap cluster-quality /
  label-noise report.

Plan shape at scale: all three are scan-shaped. The histogram is one
map-side-combinable groupBy(bucket); the projection is a pure
``transform`` (zero shuffle); cohesion is two passes with a BROADCAST
K-row centroid table between them — the corpus never shuffles, and
both reductions sum exact BIGINTs (quantized contributions), so
partial-agg order can never flip a bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .similarity import (
    DIM, K_BRUTE, N_QUERIES, _cos_duck, _plane_component, cosine_topk,
)

__all__ = ["norm_histogram", "random_projection", "label_cohesion",
           "knn_label_vote"]

QUANT = 1 << 20          # component quantizer for exact centroid means
_DP_COS = 8              # per-row cosine contribution quantizer (dp)
_COS_SCALE = float(10 ** _DP_COS)
NORM_BUCKET = 0.25
OUT_DIM = 8


def _norm_spark(vec: str) -> str:
    return (f"sqrt(aggregate({vec}, 0D, "
            f"(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")


def _norm_duck(vec: str) -> str:
    return (
        "sqrt(list_reduce(list_concat([CAST(0 AS DOUBLE)], "
        f"list_transform({vec}, x -> CAST(x AS DOUBLE) "
        "* CAST(x AS DOUBLE))), (a, x) -> a + x))"
    )


def norm_histogram(df: DataFrame, vec_col: str = "embedding",
                   bucket: float = NORM_BUCKET) -> DataFrame:
    """(bucket_lo, n_vectors): fixed-width histogram of L2 norms.

    The norm is a sequential fold (bit-identical to the oracle's
    ``list_reduce``), so bucket boundaries can't disagree between
    engines."""
    lo = F.expr(f"floor({_norm_spark(vec_col)} / {bucket!r}) "
                f"* {bucket!r}")
    return (
        df.select(round_portable(lo).alias("bucket_lo"))
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def random_projection(df: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      out_dim: int = OUT_DIM) -> DataFrame:
    """(id, projected): project each vector onto ``out_dim``
    deterministic pseudo-random hyperplanes (LCG-generated, identical
    in the oracle). Pure ``transform`` — zero shuffle."""
    dot = (
        f"aggregate(zip_with({vec_col}, "
        f"transform(sequence(0, {DIM - 1}), "
        f"i -> {_plane_component('p', 'i')}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, v) -> a + v)"
    )
    proj = (
        f"transform(sequence(0, {out_dim - 1}), p -> "
        f"round(({dot}) * 10000.0) / 10000.0 + 0.0)"
    )
    return df.select(F.col(id_col), F.expr(proj).alias("projected"))


def label_cohesion(df: DataFrame, label_col: str = "label",
                   vec_col: str = "embedding") -> DataFrame:
    """(label, n_members, mean_cos_to_centroid): per-label centroid
    cohesion — how tightly each label's members cluster around their
    own mean vector. Low cohesion flags noisy labels.

    Pass 1 builds per-label centroids from exact-integer quantized
    component sums (order-free); pass 2 broadcasts the K-row centroid
    table and folds each member's cosine to its centroid, quantizing
    each cosine to BIGINT before the order-free mean."""
    q = F.floor(F.col("val").cast("double") * F.lit(float(QUANT))) \
        .cast("long")
    cents = (
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
    dot = (f"aggregate(zip_with({vec_col}, cvec, "
           f"(x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, v) -> a + v)")
    cnorm = ("sqrt(aggregate(cvec, 0D, (a, y) -> a + y * y))")
    cos = (f"({dot}) / nullif({_norm_spark(vec_col)} * {cnorm}, 0D)")
    contrib = (
        df.join(F.broadcast(cents), df[label_col] == F.col("lbl"))
        .select(
            F.col(label_col),
            F.expr(f"CAST(round(({cos}) * {_COS_SCALE!r}) AS BIGINT)")
            .alias("__qc"),
        )
    )
    return contrib.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n_members"),
        round_portable(
            F.sum("__qc") / F.lit(_COS_SCALE)
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_cos_to_centroid"),
    )


def knn_label_vote(vectors: DataFrame, queries: DataFrame,
                   k: int = K_BRUTE, label_col: str = "label") -> DataFrame:
    """(q_id, pred_label, votes): k-nearest-neighbor classification —
    each query's label predicted by majority vote over its ``k``
    nearest corpus vectors (ties to the larger label; the standard
    label-propagation / auto-labeling primitive).

    Composition: ``similarity.cosine_topk`` (broadcast query side, the
    pruned-window shape) → broadcast join to the corpus's (id, label)
    — two tiny columns — → per-query vote aggregation (max_by over
    (count, label), map-side combinable)."""
    nn = cosine_topk(vectors, queries, k=k)
    labels = vectors.select(F.col("vec_id").alias("n_id"),
                            F.col(label_col).cast("bigint").alias("lbl"))
    votes = (
        nn.join(labels, "n_id")
        .groupBy("q_id", "lbl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    pick = F.struct(F.col("votes"), F.col("lbl"))
    return votes.groupBy("q_id").agg(
        F.max_by("lbl", pick).alias("pred_label"),
        F.max("votes").alias("votes"),
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_norm_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return norm_histogram(load(spark, sf_dir, "embeddings"))


_ORACLE_NORM_HIST = f"""
SELECT
  {round_portable_duck(
      f"floor({_norm_duck('embedding')} / {NORM_BUCKET!r}) "
      f"* {NORM_BUCKET!r}")} AS bucket_lo,
  count(*) AS n_vectors
FROM embeddings GROUP BY 1
"""


def _q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gate shape: one scalar row per (vector, output dimension). The
    # library API (``random_projection``) returns the array column;
    # the gate explodes it because the driver's canonicalizer sorts
    # with pandas and cannot hash ``array<double>`` cells (the r04 red
    # row was a harness TypeError, not a value mismatch).
    proj = random_projection(load(spark, sf_dir, "embeddings"))
    return (
        proj.select(F.col("vec_id"),
                    F.posexplode("projected").alias("pos", "value"))
        .select("vec_id", F.col("pos").cast("bigint").alias("pos"),
                "value")
    )


_DUCK_PROJ_DOT = (
    "list_reduce(list_concat([CAST(0 AS DOUBLE)], "
    f"list_transform(range(1, {DIM} + 1), i -> "
    f"CAST(embedding[i] AS DOUBLE) * {_plane_component('p', '(i - 1)')})), "
    "(a, v) -> a + v)"
)

# The projection itself stays array-shaped in a CTE (bit-identical to
# the Spark ``transform``), then unnests positionally via a range
# cross join + 1-based list indexing (DuckDB here lacks WITH
# ORDINALITY; plain indexing avoids the vectorized-lambda
# outer-column-capture hazard).
_ORACLE_PROJECTION = f"""
WITH proj AS (
  SELECT vec_id,
    list_transform(range(0, {OUT_DIM}), p ->
      round(({_DUCK_PROJ_DOT}) * 10000.0) / 10000.0 + 0.0) AS projected
  FROM embeddings
), ps AS (SELECT unnest(range(0, {OUT_DIM})) AS pos)
SELECT proj.vec_id, ps.pos, proj.projected[ps.pos + 1] AS value
FROM proj, ps
"""


def _q_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_cohesion(load(spark, sf_dir, "embeddings"))


_ORACLE_COHESION = f"""
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
), contrib AS (
  SELECT e.label,
         CAST(round(
           (list_reduce(list_concat([CAST(0 AS DOUBLE)],
              list_transform(range(1, {DIM} + 1), i ->
                CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])),
              (a, v) -> a + v))
           / nullif({_norm_duck('e.embedding')}
             * sqrt(list_reduce(list_concat([CAST(0 AS DOUBLE)],
                 list_transform(c.cvec, y -> y * y)),
                 (a, v) -> a + v)), 0.0)
           * {_COS_SCALE!r}) AS BIGINT) AS qc
  FROM embeddings e JOIN cents c ON e.label = c.lbl
)
SELECT label, count(*) AS n_members,
  {round_portable_duck(
      f"CAST(sum(qc) AS BIGINT) / {_COS_SCALE!r} "
      f"/ CAST(count(*) AS DOUBLE)")} AS mean_cos_to_centroid
FROM contrib GROUP BY 1
"""


def _q_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return knn_label_vote(emb, emb.filter(F.col("vec_id") < N_QUERIES))


_ORACLE_LABEL_VOTE = f"""
WITH scored AS (
  SELECT q.vec_id AS q_id, v.vec_id AS n_id,
         CAST(v.label AS BIGINT) AS lbl,
         {_cos_duck('q.embedding', 'v.embedding')} AS cos_sim
  FROM embeddings v, embeddings q
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id != v.vec_id
), ranked AS (
  SELECT q_id, n_id, lbl,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, n_id ASC) AS rank
  FROM scored
), votes AS (
  SELECT q_id, lbl, count(*) AS votes
  FROM ranked WHERE rank <= {K_BRUTE}
  GROUP BY 1, 2
), best AS (
  SELECT q_id, lbl, votes,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY votes DESC, lbl DESC) AS rn,
         max(votes) OVER (PARTITION BY q_id) AS max_votes
  FROM votes
)
SELECT q_id, lbl AS pred_label, max_votes AS votes
FROM best WHERE rn = 1
"""


QUERIES: dict = {
    "emb_norm_hist_embeddings": (_q_norm_hist, _ORACLE_NORM_HIST),
    "emb_projection_embeddings": (_q_projection, _ORACLE_PROJECTION),
    "emb_label_cohesion_embeddings": (_q_cohesion, _ORACLE_COHESION),
    "knn_label_vote_embeddings": (_q_label_vote, _ORACLE_LABEL_VOTE),
}

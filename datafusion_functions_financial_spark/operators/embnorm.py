"""Per-dimension z-score normalization of an embedding column — the
standard pre-processing step before clustering, ANN indexing, or
feature fusion (mean-centers and unit-scales every dimension over the
whole corpus).

Scale shape: one ``posexplode`` + map-side-combined
``groupBy(dim)`` reduces the corpus to DIM rows of exact-integer
moments; the DIM-row stats table collapses to a single broadcast row of
(mu, sd) arrays; the normalization itself is a scan-side ``transform``
— the corpus never shuffles.

Determinism (the ``ivf`` centroid technique, extended to second
moments): components are quantized to integers ``q = floor(x * 2^20)``
so the cross-row sums of ``q`` and ``q*q`` are exact BIGINT arithmetic
— order-independent on any partial-aggregation schedule; mean and
(population) variance are then computed from those exact integers with
identical double expression trees in both engines. BIGINT bound:
``sum(q^2) <= rows * (|x|_max * 2^20)^2`` — fine to ~10^4 rows at
|x| <= 2 here; at corpus scale lower the quantizer or aggregate q^2 in
DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP, round_portable_duck
from ..sources.tables import load
from .similarity import DIM

__all__ = ["normalize_embeddings"]

QUANT = 1 << 20


def dimension_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One row: (mu, sd) arrays (population stddev) per dimension, from
    exact integer moment sums."""
    q = F.floor(F.col("val").cast("double") * F.lit(float(QUANT))) \
        .cast("long")
    comp = (
        df.select(F.posexplode(vec_col).alias("pos", "val"))
        .select("pos", q.alias("q"))
        .groupBy("pos")
        .agg(
            F.sum("q").alias("s"),
            F.sum(F.expr("q * q")).alias("ss"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    stats = comp.select(
        "pos",
        (F.col("s").cast("double")
         / (F.lit(float(QUANT)) * F.col("c").cast("double"))).alias("mu"),
        F.sqrt(
            F.col("ss").cast("double")
            / (F.lit(float(QUANT)) * F.lit(float(QUANT))
               * F.col("c").cast("double"))
            - F.pow(
                F.col("s").cast("double")
                / (F.lit(float(QUANT)) * F.col("c").cast("double")), 2)
        ).alias("sd"),
    )
    return stats.agg(
        F.expr("transform(array_sort(collect_list(struct(pos, mu))), "
               "x -> x.mu)").alias("mu"),
        F.expr("transform(array_sort(collect_list(struct(pos, sd))), "
               "x -> x.sd)").alias("sd"),
    )


def normalize_embeddings(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """(id, normalized): per-dimension ``(x - mu) / sd`` (NULL component
    where a dimension is constant)."""
    stats = dimension_stats(df, vec_col)
    return df.crossJoin(F.broadcast(stats)).select(
        F.col(id_col),
        F.expr(
            f"zip_with({vec_col}, sequence(0, {DIM - 1}), (x, i) -> "
            "(CAST(x AS DOUBLE) - mu[i]) / nullif(sd[i], 0D))"
        ).alias("normalized"),
    )


# --------------------------------------------------------------------------
# Gate query (r04 queue): portable scalar projection of the normalized
# vectors (same convention as operators/quantize.py — first/last
# component and the sequential-fold component sum).
# --------------------------------------------------------------------------


def _q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = normalize_embeddings(load(spark, sf_dir, "embeddings"))
    return out.selectExpr(
        "vec_id",
        f"round(normalized[0] * 10000.0) / 10000.0 AS n_first",
        f"round(normalized[{DIM - 1}] * 10000.0) / 10000.0 AS n_last",
        "round(aggregate(normalized, 0D, (acc, v) -> acc + v) * 10000.0)"
        " / 10000.0 AS n_sum",
    )


_DUCK_Q = f"CAST(floor(CAST(embedding[r.range] AS DOUBLE) * {QUANT}.0) AS BIGINT)"

_ORACLE_NORMALIZE = f"""
WITH comp AS (
  SELECT r.range AS pos,
         sum({_DUCK_Q}) AS s,
         sum({_DUCK_Q} * {_DUCK_Q}) AS ss,
         count(*) AS c
  FROM embeddings e, range(1, {DIM} + 1) r
  GROUP BY 1
), stats AS (
  SELECT pos,
         CAST(s AS DOUBLE) / ({QUANT}.0 * CAST(c AS DOUBLE)) AS mu,
         sqrt(CAST(ss AS DOUBLE) / ({QUANT}.0 * {QUANT}.0
                * CAST(c AS DOUBLE))
              - pow(CAST(s AS DOUBLE) / ({QUANT}.0 * CAST(c AS DOUBLE)),
                    2)) AS sd
  FROM comp
), arrs AS (
  SELECT list(mu ORDER BY pos) AS mu, list(sd ORDER BY pos) AS sd
  FROM stats
), norm AS (
  SELECT e.vec_id,
         list_transform(range(1, {DIM} + 1), i ->
           (CAST(e.embedding[i] AS DOUBLE) - a.mu[i])
           / nullif(a.sd[i], 0)) AS n
  FROM embeddings e CROSS JOIN arrs a
)
SELECT vec_id,
  {round_portable_duck("n[1]", ROUND_DP)} AS n_first,
  {round_portable_duck(f"n[{DIM}]", ROUND_DP)} AS n_last,
  {round_portable_duck(
      "list_reduce(list_concat([CAST(0 AS DOUBLE)], n), "
      "(acc, v) -> acc + v)", ROUND_DP)} AS n_sum
FROM norm
"""

QUERIES: dict = {
    "emb_normalize_embeddings": (_q_normalize, _ORACLE_NORMALIZE),
}

"""Johnson-Lindenstrauss random projection + distortion audit: shrink
embeddings to ``OUT_DIM`` dimensions with a deterministic LCG-derived
dense projection (the ANN pre-step that makes every downstream
distance computation 4x cheaper), and MEASURE what it costs — the
pairwise-distance distortion on deterministic consecutive-id pairs.

Determinism: the projection matrix is the package LCG over the
flattened (out_dim, in_dim) index (the LSH hyperplane recipe from
``similarity.py``), each projected coordinate is an in-order fold
over the input array (Spark ``aggregate`` == DuckDB ``list_reduce``,
identical trees), and the audit reductions sum per-pair quantized
BIGINTs.

Plan shape at scale: projection is a scan-local expression — zero
shuffles, whole-stage codegen around the fold; the audit pairs rows
by consecutive ids (a self-join on id+1 — equi-join, broadcastable
sample at scale) and reduces to one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["jl_project", "jl_distortion_audit"]

Q = 10 ** 8
QF = float(Q)
IN_DIM = 64
OUT_DIM = 16
# E[(r dot u)^2] per output dim = 1/12 for U[-0.5, 0.5) components,
# so distances calibrate by sqrt(12 / OUT_DIM).
_CAL = f"sqrt(12.0 / {float(OUT_DIM)!r})"


def _r_component(j: str, d: str) -> str:
    """LCG projection-matrix entry in [-0.5, 0.5) — same recipe as
    the LSH hyperplanes (similarity.py)."""
    idx = f"(CAST({j} AS BIGINT) * {IN_DIM} + {d} + 1)"
    return (
        f"(CAST((1103515245 * {idx} + 12345) % 2147483648 AS DOUBLE)"
        f" / 2147483648.0 - 0.5)"
    )


def _proj_expr_spark(vec: str, j: str) -> str:
    r = _r_component(j, "d")
    return (
        f"aggregate(transform(sequence(0, {IN_DIM - 1}), "
        f"d -> CAST(element_at({vec}, d + 1) AS DOUBLE) * {r}), "
        f"CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )


def _proj_expr_duck(vec: str, j: str) -> str:
    r = _r_component(j, "d")
    return (
        f"list_reduce(list_transform(range(0, {IN_DIM}), "
        f"d -> CAST({vec}[CAST(d + 1 AS INTEGER)] AS DOUBLE) * {r}), "
        f"(acc, t) -> acc + t)"
    )


def jl_project(df: DataFrame, vec_col: str, id_col: str,
               out_dim: int = OUT_DIM) -> DataFrame:
    """(id, __j, __p): the projected coordinates, one row per output
    dimension — the long form an ANN index consumes."""
    return (
        df.select(F.col(id_col).alias("__id"),
                  F.col(vec_col).alias("__v"))
        .selectExpr(
            "__id",
            f"posexplode(transform(sequence(0, {out_dim - 1}), "
            f"j -> {_proj_expr_spark('__v', 'j')})) AS (__j, __p)")
    )


def jl_distortion_audit(df: DataFrame, vec_col: str,
                        id_col: str) -> DataFrame:
    """One row (n_pairs, mean_ratio, mean_abs_distortion,
    max_abs_distortion): for each consecutive-id pair (2i, 2i+1),
    the calibrated projected distance over the true distance —
    ``ratio = sqrt(12/out_dim) * d_proj / d_orig``. A JL projection
    earning its keep has mean ratio near 1 and bounded tails."""
    base = df.select(F.col(id_col).alias("__id"),
                     F.col(vec_col).alias("__v"))
    a = base.filter(F.expr("__id % 2 = 0")).selectExpr(
        "__id AS __ia", "__v AS __va")
    b = base.filter(F.expr("__id % 2 = 1")).selectExpr(
        "(__id - 1) AS __ia", "__v AS __vb")
    sq = (
        f"aggregate(zip_with(__va, __vb, (x, y) -> "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        f"* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    pj_a = _proj_expr_spark("__va", "j")
    pj_b = _proj_expr_spark("__vb", "j")
    dp2 = (
        f"aggregate(transform(sequence(0, {OUT_DIM - 1}), "
        f"j -> ({pj_a} - {pj_b}) * ({pj_a} - {pj_b})), "
        f"CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    ratio = f"({_CAL} * sqrt({dp2}) / sqrt({sq}))"
    pairs = (
        a.join(b, "__ia")
        .selectExpr(f"{sq} AS __d2", f"{ratio} AS __r")
        .filter(F.col("__d2") > 0)
        .selectExpr(
            f"CAST(round(__r * {Q}) AS BIGINT) AS __rq",
            f"CAST(round(abs(__r - 1.0) * {Q}) AS BIGINT) AS __aq",
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("__rq").alias("__sr"),
        F.sum("__aq").alias("__sa"),
        F.max("__aq").alias("__ma"),
    ).select(
        "n_pairs",
        round_portable(F.expr(
            f"CAST(__sr AS DOUBLE) / (CAST(n_pairs AS DOUBLE) "
            f"* {QF!r})"), 6).alias("mean_ratio"),
        round_portable(F.expr(
            f"CAST(__sa AS DOUBLE) / (CAST(n_pairs AS DOUBLE) "
            f"* {QF!r})"), 6).alias("mean_abs_distortion"),
        round_portable(F.expr(
            f"CAST(__ma AS DOUBLE) / {QF!r}"), 6
        ).alias("max_abs_distortion"),
    )


def _q_jl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jl_distortion_audit(load(spark, sf_dir, "embeddings"),
                               "embedding", "vec_id")


def _duck_audit() -> str:
    sq = (
        "list_reduce(list_transform(range(1, 65), "
        "i -> (CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE) "
        "- CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) "
        "* (CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE) "
        "- CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE))), "
        "(acc, t) -> acc + t)"
    )
    pj_a = _proj_expr_duck("a.embedding", "j")
    pj_b = _proj_expr_duck("b.embedding", "j")
    dp2 = (
        f"list_reduce(list_transform(range(0, {OUT_DIM}), "
        f"j -> ({pj_a} - {pj_b}) * ({pj_a} - {pj_b})), "
        f"(acc, t) -> acc + t)"
    )
    ratio = f"({_CAL} * sqrt(dp2) / sqrt(d2))"
    return f"""
WITH pairs AS (
  SELECT {sq} AS d2, {dp2} AS dp2
  FROM embeddings a JOIN embeddings b
    ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
), flt AS (
  SELECT CAST(round({ratio} * {Q}) AS BIGINT) AS rq,
         CAST(round(abs({ratio} - 1.0) * {Q}) AS BIGINT) AS aq
  FROM pairs WHERE d2 > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
  {round_portable_duck(
      f"CAST(CAST(sum(rq) AS BIGINT) AS DOUBLE) "
      f"/ (CAST(count(*) AS DOUBLE) * {QF!r})", 6)} AS mean_ratio,
  {round_portable_duck(
      f"CAST(CAST(sum(aq) AS BIGINT) AS DOUBLE) "
      f"/ (CAST(count(*) AS DOUBLE) * {QF!r})", 6)}
    AS mean_abs_distortion,
  {round_portable_duck(
      f"CAST(max(aq) AS DOUBLE) / {QF!r}", 6)} AS max_abs_distortion
FROM flt
"""


QUERIES: dict = {
    "emb_jl_distortion_embeddings": (_q_jl_audit, _duck_audit()),
}

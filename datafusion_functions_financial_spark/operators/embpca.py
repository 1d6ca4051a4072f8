"""Leading principal direction of an embedding corpus via power
iteration — the cheap "what is this embedding space mostly doing"
diagnostic (a dominant component with high explained share usually
means un-centered embeddings or a degenerate model).

Power iteration without ever forming the covariance matrix: repeat
``v ← normalize(Σ_rows x · (x·v))`` from a fixed deterministic start
(uniform 1/√dim). A FIXED number of iterations is part of the
operator's definition — both engines run the identical unrolled
computation, so parity is exact rather than convergence-dependent.

Engine-exact: every cross-row float sum follows the repo's
integer-quantized contribution rule (SCALING.md): per-term products
quantize to BIGINT at 1e8 before summation (dots and component
accumulations) or 1e12 (the 64-term norm), so aggregation order can
never flip a bit; normalization and the final sign fix (component 0
non-negative) are fixed scalar expressions.

Plan shape at scale: each iteration is one explode of the corpus
(vec → dim rows) with the CURRENT direction broadcast-joined on the
dimension index, then two map-side-combinable integer aggregations
(per-vector dot, per-dimension accumulation) — linear scans, no
corpus shuffle beyond the groupBys, O(dim) state. Iterations
compose as repeated stages over the same scan.

Beyond-reference scope (SURVEY.md extension: embedding monitoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .similarity import DIM

__all__ = ["power_iteration_component", "power_iteration_two"]

Q = 10 ** 8          # dot / accumulation quantizer
QN = 10 ** 12        # norm-term quantizer
N_ITER = 2


def _dots(vecs: DataFrame, comp: DataFrame) -> DataFrame:
    """(vec_id, dot): quantized-exact x·comp per vector."""
    return (
        vecs.join(F.broadcast(comp), "pos")
        .withColumn("__t", F.expr(
            f"CAST(round(x * val * {Q}) AS BIGINT)"))
        .groupBy("vec_id")
        .agg(F.expr(
            f"CAST(sum(__t) AS DOUBLE) / {float(Q)!r} AS dot"))
    )


def _with_dot(vecs: DataFrame, comp: DataFrame) -> DataFrame:
    """(vec_id, pos, x, dot): the exploded corpus with the quantized
    x·comp dot attached via a window SUM over the vec_id partition.

    Same integers as ``_dots`` + join-back (the summed terms are the
    identical BIGINTs, and integer sums are order-free), but the
    corpus subplan is referenced ONCE instead of twice per iteration.
    Catalyst does not CSE repeated subplans, so the old
    aggregate-then-rejoin shape re-embedded the whole corpus tree at
    every reference — the unrolled two-component query planned 88
    corpus scans/explodes (r13 plan audit); this shape plans 8."""
    return (
        vecs.join(F.broadcast(comp), "pos")
        .withColumn("__t", F.expr(
            f"CAST(round(x * val * {Q}) AS BIGINT)"))
        .withColumn("dot", F.expr(
            f"CAST(sum(__t) OVER (PARTITION BY vec_id) AS DOUBLE) "
            f"/ {float(Q)!r}"))
        .select("vec_id", "pos", "x", "dot")
    )


def _iterate(comp: DataFrame, vecs: DataFrame, spark) -> DataFrame:
    """One power step: comp (pos, val) -> next normalized (pos, val)."""
    acc = (
        _with_dot(vecs, comp)
        .withColumn("__c", F.expr(
            f"CAST(round(x * dot * {Q}) AS BIGINT)"))
        .groupBy("pos")
        .agg(F.expr(
            f"CAST(sum(__c) AS DOUBLE) / {float(Q)!r} AS raw"))
    )
    # Rescale by max|raw| BEFORE quantizing the norm terms: the
    # un-normalized accumulation grows with corpus size, and
    # raw^2 * 1e12 overflows BIGINT past |raw| ~ 3e3 (a ~100K-vector
    # corpus already gets there). u = raw/max is in [-1, 1], so the
    # quantized terms are bounded for ANY corpus size, and
    # u / |u|_2 is the same unit vector.
    return (
        acc.withColumn("__u", F.expr(
            "raw / nullif(max(abs(raw)) OVER (), 0.0)"))
        .withColumn("__n2", F.expr(
            f"CAST(round(__u * __u * {QN}) AS BIGINT)"))
        .withColumn("__norm", F.expr(
            f"sqrt(CAST(sum(__n2) OVER () AS DOUBLE) / {float(QN)!r})"))
        .selectExpr("pos", "__u / __norm AS val")
    )


def power_iteration_component(df: DataFrame, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              n_iter: int = N_ITER) -> DataFrame:
    """(pos, loading): the unit leading direction after ``n_iter``
    power steps, sign-fixed so loading[0] ≥ 0."""
    spark = df.sparkSession
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(vec_col).alias("pos", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    start = spark.range(DIM).selectExpr(
        "CAST(id AS INT) AS pos",
        f"CAST(1.0 / sqrt(CAST({DIM} AS DOUBLE)) AS DOUBLE) AS val",
    )
    comp = start
    for _ in range(n_iter):
        comp = _iterate(comp, vecs, spark)
    # max() over the single non-null pos-0 value: order-free (first()
    # over an unordered frame is not deterministic).
    sign = F.expr(
        "CASE WHEN max(CASE WHEN pos = 0 THEN val END) "
        "OVER () >= 0 THEN 1.0 ELSE -1.0 END"
    )
    return (
        comp.withColumn("__s", sign)
        .select(
            F.col("pos").cast("bigint").alias("pos"),
            round_portable(F.col("val") * F.col("__s")).alias("loading"),
        )
    )


def _start(spark) -> DataFrame:
    return spark.range(DIM).selectExpr(
        "CAST(id AS INT) AS pos",
        f"CAST(1.0 / sqrt(CAST({DIM} AS DOUBLE)) AS DOUBLE) AS val",
    )


def _sign_fixed(comp: DataFrame, out: str) -> DataFrame:
    sign = F.expr(
        "CASE WHEN max(CASE WHEN pos = 0 THEN val END) "
        "OVER () >= 0 THEN 1.0 ELSE -1.0 END"
    )
    return comp.withColumn("__s", sign).select(
        F.col("pos").cast("bigint").alias("pos"),
        round_portable(F.col("val") * F.col("__s")).alias(out),
    )


def power_iteration_two(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        n_iter: int = N_ITER) -> DataFrame:
    """(pos, loading1, loading2): the leading direction plus the
    second one by DEFLATION — each vector is replaced by
    ``x - (x·v1) v1`` (a scalar per-row expression, engine-exact)
    and the same fixed-iteration power loop runs again in v1's
    orthocomplement. Both components sign-fixed at pos 0."""
    spark = df.sparkSession
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(vec_col).alias("pos", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    comp1 = _start(spark)
    for _ in range(n_iter):
        comp1 = _iterate(comp1, vecs, spark)
    # Deflation via the same single-reference window shape: attach
    # x·v1 per row, then subtract its projection (identical doubles —
    # the dot is the same quantized sum, the join-back it replaces
    # carried the same value to the same rows).
    vecs2 = (
        _with_dot(vecs, comp1)
        .join(F.broadcast(comp1.withColumnRenamed("val", "__v1")),
              "pos")
        .selectExpr("vec_id", "pos", "x - dot * __v1 AS x")
    )
    comp2 = _start(spark)
    for _ in range(n_iter):
        comp2 = _iterate(comp2, vecs2, spark)
    return (
        _sign_fixed(comp1, "loading1")
        .join(_sign_fixed(comp2, "loading2"), "pos")
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    return power_iteration_component(load(spark, sf_dir, "embeddings"))


def _q_pca2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return power_iteration_two(load(spark, sf_dir, "embeddings"))


def _duck_iter(prev: str, k: int, table: str = "vecs") -> str:
    return f"""
d{k} AS (
  SELECT v.vec_id,
         CAST(sum(CAST(round(v.x * c.val * {Q}) AS BIGINT)) AS DOUBLE)
           / {float(Q)!r} AS dot
  FROM {table} v JOIN {prev} c ON v.pos = c.pos
  GROUP BY 1
), a{k} AS (
  SELECT v.pos,
         CAST(sum(CAST(round(v.x * d.dot * {Q}) AS BIGINT)) AS DOUBLE)
           / {float(Q)!r} AS raw
  FROM {table} v JOIN d{k} d ON v.vec_id = d.vec_id
  GROUP BY 1
), u{k} AS (
  SELECT pos, raw / nullif(max(abs(raw)) OVER (), 0.0) AS u
  FROM a{k}
), c{k} AS (
  SELECT pos, u / sqrt(
           CAST(sum(CAST(round(u * u * {QN}) AS BIGINT)) OVER ()
             AS DOUBLE) / {float(QN)!r}) AS val
  FROM u{k}
)"""


_ORACLE_PCA = f"""
WITH vecs AS (
  SELECT vec_id, pos - 1 AS pos, CAST(x AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings)
), c0 AS (
  SELECT unnest(range(0, {DIM})) AS pos,
         CAST(1.0 / sqrt(CAST({DIM} AS DOUBLE)) AS DOUBLE) AS val
), {_duck_iter('c0', 1)}, {_duck_iter('c1', 2)},
signed AS (
  SELECT pos, val,
         CASE WHEN max(CASE WHEN pos = 0 THEN val END) OVER () >= 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM c2
)
SELECT CAST(pos AS BIGINT) AS pos,
  {round_portable_duck("val * s")} AS loading
FROM signed
"""


_ORACLE_PCA2 = f"""
WITH vecs AS (
  SELECT vec_id, pos - 1 AS pos, CAST(x AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings)
), c0 AS (
  SELECT unnest(range(0, {DIM})) AS pos,
         CAST(1.0 / sqrt(CAST({DIM} AS DOUBLE)) AS DOUBLE) AS val
), {_duck_iter('c0', 1)}, {_duck_iter('c1', 2)},
dp AS (
  SELECT v.vec_id,
         CAST(sum(CAST(round(v.x * c.val * {Q}) AS BIGINT)) AS DOUBLE)
           / {float(Q)!r} AS dot
  FROM vecs v JOIN c2 c ON v.pos = c.pos
  GROUP BY 1
), vecs2 AS (
  SELECT v.vec_id, v.pos, v.x - d.dot * c.val AS x
  FROM vecs v
  JOIN dp d ON v.vec_id = d.vec_id
  JOIN c2 c ON v.pos = c.pos
), {_duck_iter('c0', 3, 'vecs2')}, {_duck_iter('c3', 4, 'vecs2')},
s1 AS (
  SELECT CAST(pos AS BIGINT) AS pos,
    {round_portable_duck(
        "val * (CASE WHEN max(CASE WHEN pos = 0 THEN val END) "
        "OVER () >= 0 THEN 1.0 ELSE -1.0 END)")} AS loading1
  FROM c2
), s2 AS (
  SELECT CAST(pos AS BIGINT) AS pos,
    {round_portable_duck(
        "val * (CASE WHEN max(CASE WHEN pos = 0 THEN val END) "
        "OVER () >= 0 THEN 1.0 ELSE -1.0 END)")} AS loading2
  FROM c4
)
SELECT s1.pos, s1.loading1, s2.loading2
FROM s1 JOIN s2 ON s1.pos = s2.pos
"""


QUERIES: dict = {
    "emb_pca_power_embeddings": (_q_pca, _ORACLE_PCA),
    "emb_pca2_power_embeddings": (_q_pca2, _ORACLE_PCA2),
}

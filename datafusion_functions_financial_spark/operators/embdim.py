"""Embedding geometry #3: TwoNN intrinsic-dimension estimate — "how
many effective degrees of freedom does the embedding cloud use?" —
the capacity companion to the gated anisotropy / JL-distortion
audits: anisotropy says the mass is directionally concentrated, ID
says how large a manifold the vectors actually span. The number a
corpus owner reads before choosing PCA targets, IVF cell counts, or
quantization budgets (Facco et al., Scientific Reports 2017: the
MLE needs only each point's two nearest neighbors).

For each vector, mu = d2 / d1 over angular distances d = 1 - cos;
ID_hat = n_used / sum ln(mu). Points whose nearest neighbor is at
distance <= 0 (exact duplicates; zero-norm vectors were already
dropped by the NaN filter) are excluded and counted.

Engine-exactness: distances reuse the gated brute-force kNN chain
(``cosine_topk``'s fold UDF mirrors ``_cos_duck`` bit-for-bit);
each ln(mu) quantizes to BIGINT at 1e8 before the sum.

Plan shape at 100 TB: the gate query runs the documented brute-force
path (every vector as query — right for the <=100K-vector audit
corpus it targets); above that, the IVF cell-restricted search
supplies d1/d2 per vector with the same downstream reduction — the
estimator touches only (d1, d2) pairs either way.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (embedding tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .similarity import DIM, _cos_duck, cosine_topk

__all__ = ["twonn_id"]

Q = 10 ** 8
QF = float(Q)


def twonn_id(df: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """One row (n, n_used, id_twonn): the TwoNN maximum-likelihood
    intrinsic dimension over angular distances (duplicate-distance
    points excluded; NULL when no point survives)."""
    nn = cosine_topk(df, df, k=2, id_col=id_col, vec_col=vec_col)
    per = (
        nn.withColumn("__d", F.expr("1.0 - cos_sim"))
        .groupBy("q_id")
        .agg(
            F.min(F.expr("CASE WHEN rank = 1 THEN __d END"))
            .alias("__d1"),
            F.min(F.expr("CASE WHEN rank = 2 THEN __d END"))
            .alias("__d2"),
        )
        .filter("__d1 IS NOT NULL AND __d2 IS NOT NULL")
    )
    tot = df.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    red = per.agg(
        F.sum(F.expr("CASE WHEN __d1 > 0.0 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_used"),
        F.sum(F.expr(
            f"CASE WHEN __d1 > 0.0 THEN "
            f"CAST(round(ln(__d2 / __d1) * {Q}) AS BIGINT) "
            f"ELSE 0 END")).alias("__sq"),
    )
    return red.crossJoin(F.broadcast(tot)).select(
        "n", "n_used",
        round_portable(F.expr(
            f"CASE WHEN __sq > 0 THEN CAST(n_used AS DOUBLE) "
            f"/ (CAST(__sq AS DOUBLE) / {QF!r}) END"), 6)
        .alias("id_twonn"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (brute-force 2-NN over the full
# embeddings table — the knn_bruteforce oracle chain with every
# vector as a query)
# --------------------------------------------------------------------------


def _q_twonn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return twonn_id(load(spark, sf_dir, "embeddings"))


_ORACLE_TWONN = f"""
WITH scored AS (
  SELECT q.vec_id AS q_id,
         1.0 - ({_cos_duck('q.embedding', 'v.embedding')}) AS d,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_cos_duck('q.embedding', 'v.embedding')} DESC,
                    v.vec_id ASC) AS rank
  FROM embeddings q, embeddings v
  WHERE q.vec_id != v.vec_id
    AND NOT isnan({_cos_duck('q.embedding', 'v.embedding')})
), per AS (
  SELECT q_id,
    min(CASE WHEN rank = 1 THEN d END) AS d1,
    min(CASE WHEN rank = 2 THEN d END) AS d2
  FROM scored WHERE rank <= 2 GROUP BY 1
), red AS (
  SELECT
    CAST(sum(CASE WHEN d1 > 0.0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_used,
    CAST(sum(CASE WHEN d1 > 0.0 THEN
      CAST(round(ln(d2 / d1) * {Q}) AS BIGINT) ELSE 0 END)
      AS BIGINT) AS sq
  FROM per WHERE d1 IS NOT NULL AND d2 IS NOT NULL
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
)
SELECT n, n_used,
  {round_portable_duck(
      f"CASE WHEN sq > 0 THEN CAST(n_used AS DOUBLE) "
      f"/ (CAST(sq AS DOUBLE) / {QF!r}) END", 6)} AS id_twonn
FROM red, tot
"""


QUERIES: dict = {
    "emb_twonn_embeddings": (_q_twonn, _ORACLE_TWONN),
}

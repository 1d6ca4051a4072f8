"""Maximum mean discrepancy (RBF kernel) between two labeled
embedding populations — the modern two-sample test for distribution
shift in representation space ("did this source's embeddings drift
from that one's?"), complementing the scalar energy distance
(stats7) with a kernelized vector-space version.

Scale contract: MMD is inherently pairwise, so the estimator runs on
a DETERMINISTIC hash-subsample of at most ``m`` vectors per side
(LCG rank over ids — reproducible from the salt, and the standard
practice for MMD at corpus scale: the estimator's error is
O(1/sqrt(m)) regardless of population size). The pair grid is then
bounded at m², never data-sized.

Engine exactness: squared distances are the in-order zip_with folds
(bit-identical); the kernel ``exp(-d2 / (2 sigma^2))`` is one shared
expression of that distance; kernel values quantize to BIGINT before
the cross-pair sums, so the three MMD terms are add-order-free.
``sigma`` is FROZEN (not data-derived) to keep both engines and any
resample on the same scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["mmd_rbf"]

Q2 = 10 ** 8
Q2F = float(Q2)
M_SAMPLE = 200
SIGMA = 4.0
P = 2_147_483_647
A = 1_103_515_245
C = 12_345
DIM = 64

_SQDIST = ("aggregate(zip_with({a}, {b}, (x, y) -> "
           "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
           "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
           "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)")


def _kern(a: str, b: str, sigma: float) -> str:
    d2 = _SQDIST.format(a=a, b=b)
    return f"exp(-({d2}) / (2.0 * {sigma!r} * {sigma!r}))"


def _side(df: DataFrame, id_col: str, vec_col: str, label_expr: str,
          m: int, salt: int) -> DataFrame:
    """Deterministic m-subsample of one labeled side."""
    return (
        df.filter(F.expr(label_expr))
        .select(F.col(id_col).alias("__id"),
                F.expr(f"transform({vec_col}, "
                       f"x -> CAST(x AS DOUBLE))").alias("__v"))
        .withColumn("__h", F.expr(
            f"(((__id + 1) * {A} + {C} + {salt}) % {P} + {P}) % {P}"))
        .withColumn("__rk", F.row_number().over(
            Window.orderBy("__h", "__id")))
        .filter(F.col("__rk") <= m)
        .select("__id", "__v")
    )


def mmd_rbf(df: DataFrame, vec_col: str, id_col: str,
            label_a: str, label_b: str, m: int = M_SAMPLE,
            sigma: float = SIGMA, salt: int = 11) -> DataFrame:
    """One row (n_a, n_b, k_aa, k_bb, k_ab, mmd2): the biased
    (V-statistic) RBF-kernel MMD² between the two hash-subsampled
    sides. 0 for identical distributions; grows with shift."""
    sa = _side(df, id_col, vec_col, label_a, m, salt)
    sb = _side(df, id_col, vec_col, label_b, m, salt)

    def self_term(s: DataFrame):
        g = (s.select(F.col("__v").alias("__va"))
             .crossJoin(s.select(F.col("__v").alias("__vb"))))
        return g.agg(
            F.count(F.lit(1)).cast("bigint").alias("n2"),
            F.sum(F.expr(
                f"CAST(round({_kern('__va', '__vb', sigma)} * {Q2}) "
                f"AS BIGINT)")).alias("sk"),
        )

    cross = (
        sa.select(F.col("__v").alias("__va"))
        .crossJoin(sb.select(F.col("__v").alias("__vb")))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n2"),
            F.sum(F.expr(
                f"CAST(round({_kern('__va', '__vb', sigma)} * {Q2}) "
                f"AS BIGINT)")).alias("sk"),
        )
    )
    aa = self_term(sa).select(F.col("n2").alias("__naa"),
                              F.col("sk").alias("__saa"))
    bb = self_term(sb).select(F.col("n2").alias("__nbb"),
                              F.col("sk").alias("__sbb"))
    ab = cross.select(F.col("n2").alias("__nab"),
                      F.col("sk").alias("__sab"))
    joined = aa.crossJoin(bb).crossJoin(ab)
    kaa = f"(CAST(__saa AS DOUBLE) / (CAST(__naa AS DOUBLE) * {Q2F!r}))"
    kbb = f"(CAST(__sbb AS DOUBLE) / (CAST(__nbb AS DOUBLE) * {Q2F!r}))"
    kab = f"(CAST(__sab AS DOUBLE) / (CAST(__nab AS DOUBLE) * {Q2F!r}))"
    return joined.select(
        F.expr("CAST(sqrt(CAST(__naa AS DOUBLE)) AS BIGINT)")
        .alias("n_a"),
        F.expr("CAST(sqrt(CAST(__nbb AS DOUBLE)) AS BIGINT)")
        .alias("n_b"),
        round_portable(F.expr(kaa), 6).alias("k_aa"),
        round_portable(F.expr(kbb), 6).alias("k_bb"),
        round_portable(F.expr(kab), 6).alias("k_ab"),
        round_portable(F.expr(
            f"{kaa} + {kbb} - 2.0 * {kab}"), 6).alias("mmd2"),
    )


def _q_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mmd_rbf(load(spark, sf_dir, "embeddings"), "embedding",
                   "vec_id", "label = 0", "label = 1")


def _duck_kern(a: str, b: str) -> str:
    d2 = (f"list_reduce(list_transform(range(1, {DIM} + 1), "
          f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
          f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), "
          f"(acc, t) -> acc + t)")
    return f"exp(-({d2}) / (2.0 * {SIGMA!r} * {SIGMA!r}))"


def _duck_side(label: str) -> str:
    return f"""
  SELECT vec_id AS id,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM (
    SELECT vec_id, embedding,
      row_number() OVER (ORDER BY
        (((vec_id + 1) * {A} + {C} + 11) % {P} + {P}) % {P},
        vec_id) AS rk
    FROM embeddings WHERE {label}) t
  WHERE rk <= {M_SAMPLE}
"""


_ORACLE_MMD = f"""
WITH sa AS ({_duck_side("label = 0")}),
sb AS ({_duck_side("label = 1")}),
aa AS (
  SELECT CAST(count(*) AS BIGINT) AS n2,
    CAST(sum(CAST(round({_duck_kern("a.v", "b.v")} * {Q2})
      AS BIGINT)) AS BIGINT) AS sk
  FROM sa a CROSS JOIN sa b
), bb AS (
  SELECT CAST(count(*) AS BIGINT) AS n2,
    CAST(sum(CAST(round({_duck_kern("a.v", "b.v")} * {Q2})
      AS BIGINT)) AS BIGINT) AS sk
  FROM sb a CROSS JOIN sb b
), ab AS (
  SELECT CAST(count(*) AS BIGINT) AS n2,
    CAST(sum(CAST(round({_duck_kern("a.v", "b.v")} * {Q2})
      AS BIGINT)) AS BIGINT) AS sk
  FROM sa a CROSS JOIN sb b
)
SELECT
  CAST(sqrt(CAST(aa.n2 AS DOUBLE)) AS BIGINT) AS n_a,
  CAST(sqrt(CAST(bb.n2 AS DOUBLE)) AS BIGINT) AS n_b,
  {round_portable_duck(
      f"(CAST(aa.sk AS DOUBLE) / (CAST(aa.n2 AS DOUBLE) * {Q2F!r}))",
      6)} AS k_aa,
  {round_portable_duck(
      f"(CAST(bb.sk AS DOUBLE) / (CAST(bb.n2 AS DOUBLE) * {Q2F!r}))",
      6)} AS k_bb,
  {round_portable_duck(
      f"(CAST(ab.sk AS DOUBLE) / (CAST(ab.n2 AS DOUBLE) * {Q2F!r}))",
      6)} AS k_ab,
  {round_portable_duck(
      f"(CAST(aa.sk AS DOUBLE) / (CAST(aa.n2 AS DOUBLE) * {Q2F!r}))"
      f" + (CAST(bb.sk AS DOUBLE) / (CAST(bb.n2 AS DOUBLE) "
      f"* {Q2F!r})) - 2.0 * (CAST(ab.sk AS DOUBLE) "
      f"/ (CAST(ab.n2 AS DOUBLE) * {Q2F!r}))", 6)} AS mmd2
FROM aa, bb, ab
"""


QUERIES: dict = {
    "emb_mmd_labels_embeddings": (_q_mmd, _ORACLE_MMD),
}

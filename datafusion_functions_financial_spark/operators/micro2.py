"""Microstructure #2: Kyle's lambda (price impact per unit of signed
flow) and the Lo–MacKinlay variance-ratio diagnostic — the two
regression-grade microstructure estimators that complement the
VWAP/Roll/Amihud family in ``microstructure.py``.

Engine-exact: the tick-rule sign is a carried ``last(non-zero)``
(no recursion); every OLS/variance term quantizes to BIGINT before
the cross-row sum (1e8 linear, 1e6 products — events.value tops out
near 600, so products stay far under BIGINT range at every tested
SF); block sums re-quantize to 1e4 before squaring so block-variance
squares cannot overflow.

Plan shape: one shuffle on the series key for the diff/sign window,
then a hash aggregate on the SAME key — exchange reuse applies; no
joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["kyle_lambda", "variance_ratio"]

Q = 10 ** 8
QP = 10 ** 6   # product terms (x*y, x*x)
MIN_N = 10
VR_K = 4


def kyle_lambda(df: DataFrame, value_col: str, keys: list[str],
                order: list[str]) -> DataFrame:
    """(keys..., n, kyle_lambda): OLS slope of the price change on
    tick-rule signed volume, per key. Sign: +1/-1 from the price-move
    direction, carrying the last non-zero sign through flat ticks
    (rows before the first move are excluded)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    prepared = (
        df.withColumn("__dp", F.col(value_col) - F.lag(value_col).over(w))
        .withColumn("__sgn", F.last(
            F.expr("nullif(CAST(sign(__dp) AS BIGINT), 0)"),
            ignorenulls=True).over(wc))
        .filter(F.col("__dp").isNotNull() & F.col("__sgn").isNotNull())
        .withColumn("__sv", F.expr(
            f"CAST(__sgn AS DOUBLE) * {value_col}"))
    )
    terms = prepared.select(
        *keys,
        F.expr(f"CAST(round(__sv * {Q}) AS BIGINT)").alias("__x"),
        F.expr(f"CAST(round(__dp * {Q}) AS BIGINT)").alias("__y"),
        F.expr(f"CAST(round(__sv * __dp * {QP}) AS BIGINT)").alias("__xy"),
        F.expr(f"CAST(round(__sv * __sv * {QP}) AS BIGINT)").alias("__xx"),
    )
    slope = (
        f"(CAST(__n AS DOUBLE) * (CAST(__sxy AS DOUBLE) / {float(QP)!r})"
        f" - (CAST(__sx AS DOUBLE) / {float(Q)!r})"
        f" * (CAST(__sy AS DOUBLE) / {float(Q)!r}))"
        f" / (CAST(__n AS DOUBLE) * (CAST(__sxx AS DOUBLE) / {float(QP)!r})"
        f" - (CAST(__sx AS DOUBLE) / {float(Q)!r})"
        f" * (CAST(__sx AS DOUBLE) / {float(Q)!r}))"
    )
    return (
        terms.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__x").alias("__sx"),
            F.sum("__y").alias("__sy"),
            F.sum("__xy").alias("__sxy"),
            F.sum("__xx").alias("__sxx"),
        )
        .filter(F.col("__n") >= MIN_N)
        .select(
            *keys,
            F.col("__n").cast("bigint").alias("n"),
            round_portable(F.expr(slope), 6).alias("kyle_lambda"),
        )
    )


def variance_ratio(df: DataFrame, value_col: str, keys: list[str],
                   order: list[str], k: int = VR_K) -> DataFrame:
    """(keys..., n_diffs, n_blocks, vr): Lo–MacKinlay variance ratio
    Var(k-step change) / (k * Var(1-step change)) over NON-overlapping
    k-blocks of consecutive one-step changes. Near 1 for a random
    walk; < 1 mean-reverting; > 1 trending."""
    w = Window.partitionBy(*keys).orderBy(*order)
    diffs = (
        df.withColumn("__dp", F.col(value_col) - F.lag(value_col).over(w))
        # Diff index BEFORE the null filter so diffs are 1-based
        # (row 1 has no diff) — keeps (j-1) DIV k non-negative, where
        # Spark's truncating DIV and DuckDB's flooring // agree.
        .withColumn("__j", F.row_number().over(w) - 1)
        .filter(F.col("__dp").isNotNull())
        .withColumn("__rq", F.expr(
            f"CAST(round(__dp * {Q}) AS BIGINT)"))
        .withColumn("__rqq", F.expr(
            f"CAST(round(__dp * __dp * {QP}) AS BIGINT)"))
        .withColumn("__blk", F.expr(f"(__j - 1) DIV {k}"))
    )
    blocks = (
        diffs.groupBy(*keys, "__blk")
        .agg(F.sum("__rq").alias("__bs"), F.count(F.lit(1)).alias("__bc"))
        .filter(F.col("__bc") == k)
        # Re-quantize the block sum to 1e4 so its square stays in
        # BIGINT no matter how many blocks a key has.
        .withColumn("__bq", F.expr(
            "CAST(round(CAST(__bs AS DOUBLE) / 10000) AS BIGINT)"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__nb"),
            F.sum("__bq").alias("__sb"),
            F.sum(F.expr("__bq * __bq")).alias("__sbb"),
        )
    )
    ones = diffs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__nd"),
        F.sum("__rq").alias("__sr"),
        F.sum("__rqq").alias("__srr"),
    )
    # Sample variances from exact integer sums; block sums carry unit
    # 1e4 (after requantization), one-step sums unit 1e8 / 1e6.
    var1 = (
        f"(CAST(__srr AS DOUBLE) / {float(QP)!r}"
        f" - (CAST(__sr AS DOUBLE) / {float(Q)!r})"
        f" * (CAST(__sr AS DOUBLE) / {float(Q)!r})"
        f" / CAST(__nd AS DOUBLE)) / CAST(__nd - 1 AS DOUBLE)"
    )
    vark = (
        f"(CAST(__sbb AS DOUBLE) / {float(10 ** 8)!r}"
        f" - (CAST(__sb AS DOUBLE) / {float(10 ** 4)!r})"
        f" * (CAST(__sb AS DOUBLE) / {float(10 ** 4)!r})"
        f" / CAST(__nb AS DOUBLE)) / CAST(__nb - 1 AS DOUBLE)"
    )
    return (
        ones.join(blocks, keys)
        .filter((F.col("__nb") >= 2) & (F.col("__nd") >= 2))
        .filter(F.expr(f"({var1}) > 0"))
        .select(
            *keys,
            F.col("__nd").cast("bigint").alias("n_diffs"),
            F.col("__nb").cast("bigint").alias("n_blocks"),
            round_portable(F.expr(
                f"({vark}) / ({k} * ({var1}))"), 6).alias("vr"),
        )
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_kyle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kyle_lambda(load(spark, sf_dir, "events"), "value",
                       ["user_id"], ["ts", "event_id"])


_KL_SLOPE_DUCK = (
    f"(CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / {float(QP)!r})"
    f" - (CAST(sx AS DOUBLE) / {float(Q)!r})"
    f" * (CAST(sy AS DOUBLE) / {float(Q)!r}))"
    f" / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / {float(QP)!r})"
    f" - (CAST(sx AS DOUBLE) / {float(Q)!r})"
    f" * (CAST(sx AS DOUBLE) / {float(Q)!r}))"
)

_ORACLE_KYLE = f"""
WITH d AS (
  SELECT user_id, value, ts, event_id,
         value - lag(value) OVER w AS dp
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, value, dp,
         last_value(nullif(CAST(sign(dp) AS BIGINT), 0) IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
  FROM (
    SELECT user_id, value, dp, ts, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS ts_rn
    FROM d
  ) _x
), terms AS (
  SELECT user_id,
         CAST(sgn AS DOUBLE) * value AS sv, dp
  FROM s WHERE dp IS NOT NULL AND sgn IS NOT NULL
), q AS (
  SELECT user_id,
         CAST(round(sv * {Q}) AS BIGINT) AS x,
         CAST(round(dp * {Q}) AS BIGINT) AS y,
         CAST(round(sv * dp * {QP}) AS BIGINT) AS xy,
         CAST(round(sv * sv * {QP}) AS BIGINT) AS xx
  FROM terms
), agg AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(xy) AS BIGINT) AS sxy, CAST(sum(xx) AS BIGINT) AS sxx
  FROM q GROUP BY 1
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       {round_portable_duck(_KL_SLOPE_DUCK, 6)} AS kyle_lambda
FROM agg WHERE n >= {MIN_N}
"""


def _q_vr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return variance_ratio(load(spark, sf_dir, "events"), "value",
                          ["user_id"], ["ts", "event_id"])


_VAR1_DUCK = (
    f"(CAST(srr AS DOUBLE) / {float(QP)!r}"
    f" - (CAST(sr AS DOUBLE) / {float(Q)!r})"
    f" * (CAST(sr AS DOUBLE) / {float(Q)!r})"
    f" / CAST(nd AS DOUBLE)) / CAST(nd - 1 AS DOUBLE)"
)
_VARK_DUCK = (
    f"(CAST(sbb AS DOUBLE) / {float(10 ** 8)!r}"
    f" - (CAST(sb AS DOUBLE) / {float(10 ** 4)!r})"
    f" * (CAST(sb AS DOUBLE) / {float(10 ** 4)!r})"
    f" / CAST(nb AS DOUBLE)) / CAST(nb - 1 AS DOUBLE)"
)

_ORACLE_VR = f"""
WITH d AS (
  SELECT user_id,
         value - lag(value) OVER w AS dp,
         row_number() OVER w - 1 AS j
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), q AS (
  SELECT user_id,
         CAST(round(dp * {Q}) AS BIGINT) AS rq,
         CAST(round(dp * dp * {QP}) AS BIGINT) AS rqq,
         (j - 1) // {VR_K} AS blk
  FROM d WHERE dp IS NOT NULL
), blocks AS (
  SELECT user_id, count(*) AS nb,
         CAST(sum(bq) AS BIGINT) AS sb,
         CAST(sum(bq * bq) AS BIGINT) AS sbb
  FROM (
    SELECT user_id, blk,
           CAST(round(CAST(sum(rq) AS DOUBLE) / 10000) AS BIGINT) AS bq
    FROM q GROUP BY 1, 2 HAVING count(*) = {VR_K}
  ) b GROUP BY 1
), ones AS (
  SELECT user_id, count(*) AS nd,
         CAST(sum(rq) AS BIGINT) AS sr,
         CAST(sum(rqq) AS BIGINT) AS srr
  FROM q GROUP BY 1
)
SELECT o.user_id, CAST(nd AS BIGINT) AS n_diffs,
       CAST(nb AS BIGINT) AS n_blocks,
       {round_portable_duck(
           f"({_VARK_DUCK}) / ({VR_K} * ({_VAR1_DUCK}))", 6)} AS vr
FROM ones o JOIN blocks b ON o.user_id = b.user_id
WHERE nb >= 2 AND nd >= 2 AND ({_VAR1_DUCK}) > 0
"""


QUERIES: dict = {
    "micro_kyle_lambda_events": (_q_kyle, _ORACLE_KYLE),
    "micro_variance_ratio_events": (_q_vr, _ORACLE_VR),
}

"""Experimentation analytics: the delete-one-bucket jackknife
standard error for RATIO metrics (revenue per event, CTR — metrics
whose numerator and denominator are both random, where the naive
per-row variance is simply wrong), and the two-proportion z-test for
comparing conversion rates between two periods/arms.

Jackknife: users land in B deterministic hash buckets; each
leave-one-bucket-out replicate re-computes the ratio from the
remaining bucket totals, and ``SE² = (B-1)/B · Σ (θ_(b) − θ̄)²`` —
the production-standard error estimate for cluster-correlated ratio
metrics (users, not rows, are the independent units).

Exactness: bucket totals are BIGINT sums; every replicate θ_(b) is
quantized to BIGINT before the cross-replicate mean and squared-
deviation sums, so the SE survives any aggregation order.

Plan shape at scale: one hash aggregate to B bucket rows, then
closed forms over that bounded relation — the replicates never touch
the data again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["jackknife_ratio_se", "two_proportion_ztest"]

Q = 10 ** 8
QF = float(Q)
QT = 10 ** 12
QTF = float(QT)
N_BUCKETS = 50
P = 2_147_483_647
A = 1_103_515_245
C = 12_345


def jackknife_ratio_se(df: DataFrame, num_expr: str, den_expr: str,
                       unit_expr: str,
                       n_buckets: int = N_BUCKETS) -> DataFrame:
    """One row (n_buckets, ratio, se, ci_lo, ci_hi): the ratio
    ``sum(num)/sum(den)`` with its delete-one-bucket jackknife SE
    and the ±1.96·SE interval."""
    buckets = (
        df.selectExpr(
            f"((((CAST(({unit_expr}) AS BIGINT) + 1) * {A} + {C}) "
            f"% {P}) % {n_buckets}) AS __b",
            f"CAST(round(({num_expr}) * {Q}) AS BIGINT) AS __nq",
            f"CAST(({den_expr}) AS BIGINT) AS __d")
        .groupBy("__b")
        .agg(F.sum("__nq").alias("__y"), F.sum("__d").alias("__x"))
    )
    tot = buckets.agg(F.sum("__y").alias("__ty"),
                      F.sum("__x").alias("__tx"),
                      F.count(F.lit(1)).cast("bigint").alias("__nb"))
    # replicate theta_(b), quantized to BIGINT immediately
    reps = (
        buckets.crossJoin(F.broadcast(tot))
        .withColumn("__tq", F.expr(
            f"CAST(round(CAST(__ty - __y AS DOUBLE) / {QF!r} "
            f"/ CAST(__tx - __x AS DOUBLE) * {QT}) AS BIGINT)"))
    )
    s = reps.agg(
        F.max("__nb").alias("n_buckets"),
        F.max("__ty").alias("__ty"), F.max("__tx").alias("__tx"),
        F.sum("__tq").alias("__st"),
        F.count(F.lit(1)).cast("bigint").alias("__m"),
    )
    mean_t = f"(CAST(__st AS DOUBLE) / (CAST(__m AS DOUBLE) * {QTF!r}))"
    dev = (
        reps.crossJoin(F.broadcast(
            s.select("__st", F.col("__m").alias("__m2"))))
        .agg(F.sum(F.expr(
            f"CAST(round((CAST(__tq AS DOUBLE) / {QTF!r} "
            f"- CAST(__st AS DOUBLE) / (CAST(__m2 AS DOUBLE) "
            f"* {QTF!r})) * (CAST(__tq AS DOUBLE) / {QTF!r} "
            f"- CAST(__st AS DOUBLE) / (CAST(__m2 AS DOUBLE) "
            f"* {QTF!r})) * {QT}) AS BIGINT)")).alias("__ssq"))
    )
    out = s.crossJoin(F.broadcast(dev))
    ratio = (f"(CAST(__ty AS DOUBLE) / {QF!r} "
             f"/ CAST(__tx AS DOUBLE))")
    se = (f"sqrt(CAST(n_buckets - 1 AS DOUBLE) "
          f"/ CAST(n_buckets AS DOUBLE) "
          f"* CAST(__ssq AS DOUBLE) / {QTF!r})")
    return out.select(
        "n_buckets",
        round_portable(F.expr(ratio), 6).alias("ratio"),
        round_portable(F.expr(se), 6).alias("se"),
        round_portable(F.expr(
            f"{ratio} - 1.959963984540054 * {se}"), 6).alias("ci_lo"),
        round_portable(F.expr(
            f"{ratio} + 1.959963984540054 * {se}"), 6).alias("ci_hi"),
    )


def two_proportion_ztest(df: DataFrame, arm_expr: str, hit_expr: str
                         ) -> DataFrame:
    """One row (n_a, n_b, p_a, p_b, z): pooled two-proportion z-test
    between arm 0 and arm 1 (``arm_expr`` must yield 0/1)."""
    s = df.agg(
        F.sum(F.expr(f"CASE WHEN ({arm_expr}) = 0 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("na"),
        F.sum(F.expr(
            f"CASE WHEN ({arm_expr}) = 0 AND ({hit_expr}) THEN 1 "
            f"ELSE 0 END")).cast("bigint").alias("ha"),
        F.sum(F.expr(f"CASE WHEN ({arm_expr}) = 1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("nb"),
        F.sum(F.expr(
            f"CASE WHEN ({arm_expr}) = 1 AND ({hit_expr}) THEN 1 "
            f"ELSE 0 END")).cast("bigint").alias("hb"),
    )
    pa = "(CAST(ha AS DOUBLE) / CAST(na AS DOUBLE))"
    pb = "(CAST(hb AS DOUBLE) / CAST(nb AS DOUBLE))"
    pp = "(CAST(ha + hb AS DOUBLE) / CAST(na + nb AS DOUBLE))"
    z = (f"(({pa} - {pb}) / sqrt({pp} * (1.0 - {pp}) "
         f"* (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))))")
    return s.select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        round_portable(F.expr(pa), 6).alias("p_a"),
        round_portable(F.expr(pb), 6).alias("p_b"),
        round_portable(F.expr(z), 6).alias("z"),
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return jackknife_ratio_se(ev, "value", "1", "user_id")


def _jk_oracle(n_buckets: int = N_BUCKETS) -> str:
    mean_t = ("(CAST(st AS DOUBLE) / (CAST(m AS DOUBLE) "
              f"* {QTF!r}))")
    ratio = f"(CAST(ty AS DOUBLE) / {QF!r} / CAST(tx AS DOUBLE))"
    se = (f"sqrt(CAST(n_buckets - 1 AS DOUBLE) "
          f"/ CAST(n_buckets AS DOUBLE) "
          f"* CAST(ssq AS DOUBLE) / {QTF!r})")
    return f"""
WITH buckets AS (
  SELECT ((((CAST(user_id AS BIGINT) + 1) * {A} + {C}) % {P})
    % {n_buckets}) AS b,
    CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS BIGINT) AS y,
    CAST(sum(CAST(1 AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(sum(y) AS BIGINT) AS ty, CAST(sum(x) AS BIGINT) AS tx,
    CAST(count(*) AS BIGINT) AS nb
  FROM buckets
), reps AS (
  SELECT b.y, b.x, t.ty, t.tx, t.nb,
    CAST(round(CAST(t.ty - b.y AS DOUBLE) / {QF!r}
      / CAST(t.tx - b.x AS DOUBLE) * {QT}) AS BIGINT) AS tq
  FROM buckets b CROSS JOIN tot t
), s AS (
  SELECT max(nb) AS n_buckets, max(ty) AS ty, max(tx) AS tx,
    CAST(sum(tq) AS BIGINT) AS st,
    CAST(count(*) AS BIGINT) AS m
  FROM reps
), dev AS (
  SELECT CAST(sum(CAST(round((CAST(r.tq AS DOUBLE) / {QTF!r}
    - CAST(s.st AS DOUBLE) / (CAST(s.m AS DOUBLE) * {QTF!r}))
    * (CAST(r.tq AS DOUBLE) / {QTF!r}
    - CAST(s.st AS DOUBLE) / (CAST(s.m AS DOUBLE) * {QTF!r}))
    * {QT}) AS BIGINT)) AS BIGINT) AS ssq
  FROM reps r CROSS JOIN s
)
SELECT s.n_buckets,
  {round_portable_duck(ratio, 6)} AS ratio,
  {round_portable_duck(se, 6)} AS se,
  {round_portable_duck(
      f"{ratio} - 1.959963984540054 * {se}", 6)} AS ci_lo,
  {round_portable_duck(
      f"{ratio} + 1.959963984540054 * {se}", 6)} AS ci_hi
FROM s CROSS JOIN dev
"""


def _q_two_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return two_proportion_ztest(ev, "user_id % 2",
                                "event_type = 'purchase'")


_TP_PA = "(CAST(ha AS DOUBLE) / CAST(na AS DOUBLE))"
_TP_PB = "(CAST(hb AS DOUBLE) / CAST(nb AS DOUBLE))"
_TP_PP = "(CAST(ha + hb AS DOUBLE) / CAST(na + nb AS DOUBLE))"
_TP_Z = (f"(({_TP_PA} - {_TP_PB}) / sqrt({_TP_PP} * (1.0 - {_TP_PP}) "
         f"* (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))))")

_ORACLE_TWO_PROP = f"""
WITH s AS (
  SELECT
    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS na,
    CAST(sum(CASE WHEN user_id % 2 = 0
      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS ha,
    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS nb,
    CAST(sum(CASE WHEN user_id % 2 = 1
      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS hb
  FROM events
)
SELECT na AS n_a, nb AS n_b,
  {round_portable_duck(_TP_PA, 6)} AS p_a,
  {round_portable_duck(_TP_PB, 6)} AS p_b,
  {round_portable_duck(_TP_Z, 6)} AS z
FROM s
"""


QUERIES: dict = {
    "q_jackknife_ratio_events": (_q_jackknife, _jk_oracle()),
    "q_two_proportion_events": (_q_two_prop, _ORACLE_TWO_PROP),
}


# --------------------------------------------------------------------------
# Experiment design: required sample size, and the SRM guardrail
# --------------------------------------------------------------------------

Z_ALPHA = 1.959963984540054   # two-sided 5%
Z_BETA = 0.8416212335729143   # 80% power


def required_sample_size(df: DataFrame, arm_expr: str,
                         hit_expr: str) -> DataFrame:
    """One row (p_a, p_b, abs_lift, n_per_arm): the classical
    two-proportion sample-size closed form evaluated at the OBSERVED
    rates — "how many units per arm would this observed lift need to
    reach 80% power at alpha 5%?". NULL when the observed lift is
    zero (no finite answer)."""
    s = df.agg(
        F.sum(F.expr(f"CASE WHEN ({arm_expr}) = 0 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("na"),
        F.sum(F.expr(
            f"CASE WHEN ({arm_expr}) = 0 AND ({hit_expr}) THEN 1 "
            f"ELSE 0 END")).cast("bigint").alias("ha"),
        F.sum(F.expr(f"CASE WHEN ({arm_expr}) = 1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("nb"),
        F.sum(F.expr(
            f"CASE WHEN ({arm_expr}) = 1 AND ({hit_expr}) THEN 1 "
            f"ELSE 0 END")).cast("bigint").alias("hb"),
    )
    pa = "(CAST(ha AS DOUBLE) / CAST(na AS DOUBLE))"
    pb = "(CAST(hb AS DOUBLE) / CAST(nb AS DOUBLE))"
    d = f"abs({pa} - {pb})"
    n = (f"ceil(({Z_ALPHA!r} + {Z_BETA!r}) * ({Z_ALPHA!r} + {Z_BETA!r})"
         f" * ({pa} * (1.0 - {pa}) + {pb} * (1.0 - {pb})) "
         f"/ ({d} * {d}))")
    return s.select(
        round_portable(F.expr(pa), 6).alias("p_a"),
        round_portable(F.expr(pb), 6).alias("p_b"),
        round_portable(F.expr(d), 6).alias("abs_lift"),
        F.expr(f"CASE WHEN {d} > 0.0 THEN CAST({n} AS BIGINT) END")
        .alias("n_per_arm"),
    )


def srm_check(df: DataFrame, arm_expr: str) -> DataFrame:
    """One row (n_a, n_b, z_srm, srm_flag): sample-ratio-mismatch
    guardrail for a 50/50 split — z = (n_a - n_b)/sqrt(n), flag at
    |z| > 3 (the conventional SRM alarm; an imbalanced assignment
    invalidates the experiment before any metric is read)."""
    s = df.agg(
        F.sum(F.expr(f"CASE WHEN ({arm_expr}) = 0 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("na"),
        F.sum(F.expr(f"CASE WHEN ({arm_expr}) = 1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("nb"),
    )
    z = ("(CAST(na - nb AS DOUBLE) / sqrt(CAST(na + nb AS DOUBLE)))")
    return s.select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        round_portable(F.expr(z), 6).alias("z_srm"),
        F.expr(f"CAST(CASE WHEN abs({z}) > 3.0 THEN 1 ELSE 0 END "
               "AS BIGINT)").alias("srm_flag"),
    )


def _q_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return required_sample_size(ev, "user_id % 2",
                                "event_type = 'purchase'")


_SS_PA = "(CAST(ha AS DOUBLE) / CAST(na AS DOUBLE))"
_SS_PB = "(CAST(hb AS DOUBLE) / CAST(nb AS DOUBLE))"
_SS_D = f"abs({_SS_PA} - {_SS_PB})"
_SS_N = (f"ceil(({Z_ALPHA!r} + {Z_BETA!r}) * ({Z_ALPHA!r} + {Z_BETA!r})"
         f" * ({_SS_PA} * (1.0 - {_SS_PA}) + {_SS_PB} "
         f"* (1.0 - {_SS_PB})) / ({_SS_D} * {_SS_D}))")

_ORACLE_SAMPLE_SIZE = f"""
WITH s AS (
  SELECT
    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS na,
    CAST(sum(CASE WHEN user_id % 2 = 0
      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS ha,
    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS nb,
    CAST(sum(CASE WHEN user_id % 2 = 1
      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS hb
  FROM events
)
SELECT
  {round_portable_duck(_SS_PA, 6)} AS p_a,
  {round_portable_duck(_SS_PB, 6)} AS p_b,
  {round_portable_duck(_SS_D, 6)} AS abs_lift,
  CASE WHEN {_SS_D} > 0.0 THEN CAST({_SS_N} AS BIGINT) END
    AS n_per_arm
FROM s
"""


def _q_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return srm_check(ev, "user_id % 2")


_SRM_Z = "(CAST(na - nb AS DOUBLE) / sqrt(CAST(na + nb AS DOUBLE)))"

_ORACLE_SRM = f"""
WITH s AS (
  SELECT
    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS na,
    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS nb
  FROM events
)
SELECT na AS n_a, nb AS n_b,
  {round_portable_duck(_SRM_Z, 6)} AS z_srm,
  CAST(CASE WHEN abs({_SRM_Z}) > 3.0 THEN 1 ELSE 0 END AS BIGINT)
    AS srm_flag
FROM s
"""


QUERIES["q_sample_size_events"] = (_q_sample_size,
                                   _ORACLE_SAMPLE_SIZE)
QUERIES["dq_srm_events"] = (_q_srm, _ORACLE_SRM)

"""Dependence statistics #5: exact Kendall tau-b, the empirical
upper-tail dependence coefficient, and Lin's concordance correlation —
the rank/extreme/agreement complements to the Pearson-style estimators
in stats3/stats4.

All three run over the paired hourly-mean relation built by
``stats4.hourly_pair`` (two tiny per-hour hash aggregates joined on
the hour). The hourly means are exact quantized-BIGINT rationals, so
both engines materialize bit-identical doubles and every comparison
(sign, equality, threshold) lands identically.

Scale shapes:
- tau-b pair-joins the hourly relation with itself on h1 < h2 —
  O(H^2) where H is the number of HOURS IN THE TIME RANGE, bounded by
  the calendar and independent of row volume; a year is ~8.8k hours →
  ~38M comparison rows, one broadcast nested-loop join. (For
  decade-scale minute bars switch to merge-sort inversion counting
  over a range partition; the calendar bound makes the join the right
  default here.)
- tail dependence and CCC are single aggregates over the hourly
  relation plus one broadcast threshold row — nothing data-sized.

Every count is an exact BIGINT; the closed forms are the only doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .stats4 import _HOURLY_PAIR_DUCK, _xy_sums, hourly_pair

__all__ = ["kendall_tau", "tail_dependence", "lin_ccc"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)
TAIL_Q = 0.9


def kendall_tau(paired: DataFrame) -> DataFrame:
    """One row (n_pairs, concordant, discordant, tau_b) over a
    (__h, __x, __y) relation: exact tie-corrected Kendall tau-b via
    the h1 < h2 pair join. All-tied margins yield NULL tau_b."""
    a = paired.select(F.col("__h").alias("__h1"),
                      F.col("__x").alias("__x1"),
                      F.col("__y").alias("__y1"))
    b = paired.select(F.col("__h").alias("__h2"),
                      F.col("__x").alias("__x2"),
                      F.col("__y").alias("__y2"))
    pairs = a.join(b, F.col("__h1") < F.col("__h2"))
    s = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.expr(
            "CASE WHEN sign(__x2 - __x1) * sign(__y2 - __y1) > 0 "
            "THEN 1 ELSE 0 END")).cast("bigint").alias("concordant"),
        F.sum(F.expr(
            "CASE WHEN sign(__x2 - __x1) * sign(__y2 - __y1) < 0 "
            "THEN 1 ELSE 0 END")).cast("bigint").alias("discordant"),
        F.sum(F.expr("CASE WHEN __x1 = __x2 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("__tx"),
        F.sum(F.expr("CASE WHEN __y1 = __y2 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("__ty"),
    )
    tau = ("(CAST(concordant - discordant AS DOUBLE) "
           "/ sqrt(CAST(n_pairs - __tx AS DOUBLE) "
           "* CAST(n_pairs - __ty AS DOUBLE)))")
    return s.select(
        "n_pairs", "concordant", "discordant",
        round_portable(F.expr(
            f"CASE WHEN n_pairs > __tx AND n_pairs > __ty "
            f"THEN {tau} END"), 6).alias("tau_b"),
    )


def tail_dependence(paired: DataFrame, q: float = TAIL_Q) -> DataFrame:
    """One row (n_hours, thr_x, thr_y, n_joint, lambda_u): the
    empirical upper-tail dependence coefficient
    ``lambda_u = P(X > x_q, Y > y_q) / (1 - q)`` — 0 for independent
    tails, →1 when extremes co-occur. Thresholds are portably rounded
    BEFORE the comparison so both engines cut identically."""
    thr = paired.agg(
        round_portable(F.expr(f"percentile(__x, {q!r})"), 6)
        .alias("__tx"),
        round_portable(F.expr(f"percentile(__y, {q!r})"), 6)
        .alias("__ty"),
    )
    s = (
        paired.crossJoin(F.broadcast(thr))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.max("__tx").alias("thr_x"),
            F.max("__ty").alias("thr_y"),
            F.sum(F.expr(
                "CASE WHEN __x > __tx AND __y > __ty THEN 1 ELSE 0 "
                "END")).cast("bigint").alias("n_joint"),
        )
    )
    return s.select(
        "n_hours", "thr_x", "thr_y", "n_joint",
        round_portable(F.expr(
            f"CAST(n_joint AS DOUBLE) "
            f"/ ((1.0 - {q!r}) * CAST(n_hours AS DOUBLE))"), 6
        ).alias("lambda_u"),
    )


def lin_ccc(paired: DataFrame) -> DataFrame:
    """One row (n_hours, ccc): Lin's concordance correlation —
    ``2*s_xy / (s_xx + s_yy + n*(mx - my)^2)`` on the centered
    quantized sums; 1 only when the two series agree exactly, unlike
    Pearson which forgives scale and shift."""
    s = _xy_sums(paired.select("__x", "__y"))
    mx = f"(CAST(__sx AS DOUBLE) / (CAST(__n AS DOUBLE) * {QF!r}))"
    my = f"(CAST(__sy AS DOUBLE) / (CAST(__n AS DOUBLE) * {QF!r}))"
    sxx = (f"(CAST(__sxx AS DOUBLE) / {Q2F!r} "
           f"- CAST(__n AS DOUBLE) * {mx} * {mx})")
    syy = (f"(CAST(__syy AS DOUBLE) / {Q2F!r} "
           f"- CAST(__n AS DOUBLE) * {my} * {my})")
    sxy = (f"(CAST(__sxy AS DOUBLE) / {Q2F!r} "
           f"- CAST(__n AS DOUBLE) * {mx} * {my})")
    ccc = (f"(2.0 * ({sxy}) / (({sxx}) + ({syy}) "
           f"+ CAST(__n AS DOUBLE) * ({mx} - {my}) * ({mx} - {my})))")
    return s.select(
        F.col("__n").alias("n_hours"),
        round_portable(F.expr(ccc), 6).alias("ccc"),
    )


# --------------------------------------------------------------------------
# Gate queries: click vs view hourly means
# --------------------------------------------------------------------------


def _paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return hourly_pair(ev, "__us", "value", "event_type",
                       "click", "view")


def _q_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kendall_tau(_paired(spark, sf_dir))


_ORACLE_KENDALL = f"""
WITH {_HOURLY_PAIR_DUCK.format(a="click", b="view")}
, pr AS (
  SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
  FROM paired a JOIN paired b ON a.h < b.h
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(sum(CASE WHEN sign(x2 - x1) * sign(y2 - y1) > 0
      THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
    CAST(sum(CASE WHEN sign(x2 - x1) * sign(y2 - y1) < 0
      THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
    CAST(sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
    CAST(sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM pr
)
SELECT n_pairs, concordant, discordant,
  {round_portable_duck(
      "CASE WHEN n_pairs > tx AND n_pairs > ty THEN "
      "(CAST(concordant - discordant AS DOUBLE) "
      "/ sqrt(CAST(n_pairs - tx AS DOUBLE) "
      "* CAST(n_pairs - ty AS DOUBLE))) END", 6)} AS tau_b
FROM s
"""


def _q_tail_dep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tail_dependence(_paired(spark, sf_dir))


_ORACLE_TAIL_DEP = f"""
WITH {_HOURLY_PAIR_DUCK.format(a="click", b="view")}
, thr AS (
  SELECT {round_portable_duck(f"quantile_cont(x, {TAIL_Q!r})", 6)}
    AS tx,
  {round_portable_duck(f"quantile_cont(y, {TAIL_Q!r})", 6)} AS ty
  FROM paired
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hours,
    max(t.tx) AS thr_x, max(t.ty) AS thr_y,
    CAST(sum(CASE WHEN p.x > t.tx AND p.y > t.ty THEN 1 ELSE 0 END)
      AS BIGINT) AS n_joint
  FROM paired p CROSS JOIN thr t
)
SELECT n_hours, thr_x, thr_y, n_joint,
  {round_portable_duck(
      f"CAST(n_joint AS DOUBLE) "
      f"/ ((1.0 - {TAIL_Q!r}) * CAST(n_hours AS DOUBLE))", 6)}
    AS lambda_u
FROM s
"""


def _q_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lin_ccc(_paired(spark, sf_dir))


def _ccc_oracle() -> str:
    mx = f"(CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
    my = f"(CAST(sy AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
    sxx = (f"(CAST(sxx AS DOUBLE) / {Q2F!r} "
           f"- CAST(n AS DOUBLE) * {mx} * {mx})")
    syy = (f"(CAST(syy AS DOUBLE) / {Q2F!r} "
           f"- CAST(n AS DOUBLE) * {my} * {my})")
    sxy = (f"(CAST(sxy AS DOUBLE) / {Q2F!r} "
           f"- CAST(n AS DOUBLE) * {mx} * {my})")
    ccc = (f"(2.0 * ({sxy}) / (({sxx}) + ({syy}) "
           f"+ CAST(n AS DOUBLE) * ({mx} - {my}) * ({mx} - {my})))")
    return f"""
WITH {_HOURLY_PAIR_DUCK.format(a="click", b="view")}
, sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(x * {Q}) AS BIGINT)) AS BIGINT) AS sx,
    CAST(sum(CAST(round(y * {Q}) AS BIGINT)) AS BIGINT) AS sy,
    CAST(sum(CAST(round(x * x * {Q2}) AS BIGINT)) AS BIGINT) AS sxx,
    CAST(sum(CAST(round(x * y * {Q2}) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(sum(CAST(round(y * y * {Q2}) AS BIGINT)) AS BIGINT) AS syy
  FROM paired
)
SELECT n AS n_hours, {round_portable_duck(ccc, 6)} AS ccc
FROM sums
"""


QUERIES: dict = {
    "q_kendall_tau_events": (_q_kendall, _ORACLE_KENDALL),
    "q_tail_dependence_events": (_q_tail_dep, _ORACLE_TAIL_DEP),
    "q_lin_ccc_events": (_q_ccc, _ccc_oracle()),
}

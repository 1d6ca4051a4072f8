"""Dependence statistics #7: distance correlation (the Székely
dCor — zero iff INDEPENDENT, catching nonlinear relationships that
Pearson/Kendall miss) and the energy distance two-sample statistic
(2 E|X-Y| - E|X-X'| - E|Y-Y'| — zero iff identical distributions).

Both are pairwise statistics, run over the calendar-bounded
hourly-mean relation (stats4.hourly_pair): O(H²) comparison rows
where H is HOURS IN RANGE, independent of row volume — the same
bound as Kendall tau. Everything reduces to exact integers:

- pairwise distances quantize to BIGINT immediately
  (``round(|x_i - x_j| * Q)``), so row sums / grand sums are exact
  and the doubly-centered terms A_ij are exact rationals;
- the centered products A_ij·B_ij quantize per-term before the final
  sum (the SCALING.md rule), so dCov² is add-order-free;
- energy distance is three quantized mean-of-distance sums.

At decade-scale H, replace the pair join with the O(H log H)
sorted-prefix identities for 1-d distance sums (E|X-X'| has a
closed form over order statistics); the estimator is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .stats4 import _HOURLY_PAIR_DUCK, hourly_pair

__all__ = ["distance_correlation", "energy_distance"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)


def distance_correlation(paired: DataFrame) -> DataFrame:
    """One row (n_hours, dcov2, dcor) over a (__h, __x, __y)
    relation: the V-statistic distance correlation with
    double-centered quantized distance matrices."""
    a = paired.select(F.col("__h").alias("__i"),
                      F.col("__x").alias("__xi"),
                      F.col("__y").alias("__yi"))
    b = paired.select(F.col("__h").alias("__j"),
                      F.col("__x").alias("__xj"),
                      F.col("__y").alias("__yj"))
    # full H x H grid including the diagonal (V-statistic)
    pairs = (
        a.crossJoin(b)
        .select(
            "__i", "__j",
            F.expr(f"CAST(round(abs(__xi - __xj) * {Q}) AS BIGINT)")
            .alias("__dx"),
            F.expr(f"CAST(round(abs(__yi - __yj) * {Q}) AS BIGINT)")
            .alias("__dy"),
        )
    )
    rows = pairs.groupBy("__i").agg(
        F.sum("__dx").alias("__rx"), F.sum("__dy").alias("__ry"))
    tot = rows.agg(
        F.sum("__rx").alias("__gx"), F.sum("__ry").alias("__gy"),
        F.count(F.lit(1)).cast("bigint").alias("__n"))
    ri = rows.select(F.col("__i"), F.col("__rx").alias("__rxi"),
                     F.col("__ry").alias("__ryi"))
    rj = rows.select(F.col("__i").alias("__j"),
                     F.col("__rx").alias("__rxj"),
                     F.col("__ry").alias("__ryj"))
    centered = (
        pairs.join(F.broadcast(ri), "__i")
        .join(F.broadcast(rj), "__j")
        .crossJoin(F.broadcast(tot))
    )
    nA = "CAST(__n AS DOUBLE)"
    ax = (f"(CAST(__dx AS DOUBLE) / {QF!r} "
          f"- CAST(__rxi AS DOUBLE) / ({nA} * {QF!r}) "
          f"- CAST(__rxj AS DOUBLE) / ({nA} * {QF!r}) "
          f"+ CAST(__gx AS DOUBLE) / ({nA} * {nA} * {QF!r}))")
    ay = (f"(CAST(__dy AS DOUBLE) / {QF!r} "
          f"- CAST(__ryi AS DOUBLE) / ({nA} * {QF!r}) "
          f"- CAST(__ryj AS DOUBLE) / ({nA} * {QF!r}) "
          f"+ CAST(__gy AS DOUBLE) / ({nA} * {nA} * {QF!r}))")
    s = centered.agg(
        F.max("__n").alias("n_hours"),
        F.sum(F.expr(
            f"CAST(round({ax} * {ay} * {Q2}) AS BIGINT)"
        )).alias("__sxy"),
        F.sum(F.expr(
            f"CAST(round({ax} * {ax} * {Q2}) AS BIGINT)"
        )).alias("__sxx"),
        F.sum(F.expr(
            f"CAST(round({ay} * {ay} * {Q2}) AS BIGINT)"
        )).alias("__syy"),
    )
    n2 = "CAST(n_hours AS DOUBLE) * CAST(n_hours AS DOUBLE)"
    dcov2 = f"(CAST(__sxy AS DOUBLE) / ({Q2F!r} * {n2}))"
    dvx = f"(CAST(__sxx AS DOUBLE) / ({Q2F!r} * {n2}))"
    dvy = f"(CAST(__syy AS DOUBLE) / ({Q2F!r} * {n2}))"
    return s.select(
        "n_hours",
        round_portable(F.expr(dcov2), 6).alias("dcov2"),
        round_portable(F.expr(
            f"CASE WHEN {dvx} > 0.0 AND {dvy} > 0.0 AND {dcov2} > 0.0 "
            f"THEN sqrt({dcov2} / sqrt({dvx} * {dvy})) "
            f"ELSE 0.0 END"), 6).alias("dcor"),
    )


def energy_distance(paired: DataFrame) -> DataFrame:
    """One row (n_hours, e_xx, e_yy, e_xy, e_dist): the energy
    distance between the two hourly-mean distributions —
    ``2 E|X-Y| - E|X-X'| - E|Y-Y'|``, V-statistic means over the
    bounded grid; 0 iff the distributions coincide."""
    a = paired.select(F.col("__h").alias("__i"),
                      F.col("__x").alias("__xi"),
                      F.col("__y").alias("__yi"))
    b = paired.select(F.col("__h").alias("__j"),
                      F.col("__x").alias("__xj"),
                      F.col("__y").alias("__yj"))
    g = a.crossJoin(b)
    s = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n2"),
        F.sum(F.expr(
            f"CAST(round(abs(__xi - __xj) * {Q}) AS BIGINT)"
        )).alias("__sxx"),
        F.sum(F.expr(
            f"CAST(round(abs(__yi - __yj) * {Q}) AS BIGINT)"
        )).alias("__syy"),
        F.sum(F.expr(
            f"CAST(round(abs(__xi - __yj) * {Q}) AS BIGINT)"
        )).alias("__sxy"),
    )
    exx = f"(CAST(__sxx AS DOUBLE) / (CAST(__n2 AS DOUBLE) * {QF!r}))"
    eyy = f"(CAST(__syy AS DOUBLE) / (CAST(__n2 AS DOUBLE) * {QF!r}))"
    exy = f"(CAST(__sxy AS DOUBLE) / (CAST(__n2 AS DOUBLE) * {QF!r}))"
    return s.select(
        F.expr("CAST(sqrt(CAST(__n2 AS DOUBLE)) AS BIGINT)")
        .alias("n_hours"),
        round_portable(F.expr(exx), 6).alias("e_xx"),
        round_portable(F.expr(eyy), 6).alias("e_yy"),
        round_portable(F.expr(exy), 6).alias("e_xy"),
        round_portable(F.expr(
            f"2.0 * {exy} - {exx} - {eyy}"), 6).alias("e_dist"),
    )


# --------------------------------------------------------------------------
# Gate queries: click vs view hourly means
# --------------------------------------------------------------------------


def _paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return hourly_pair(ev, "__us", "value", "event_type",
                       "click", "view")


def _q_dcor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distance_correlation(_paired(spark, sf_dir))


_DCOR_N = "CAST(n AS DOUBLE)"
_DCOR_AX = (f"(CAST(dx AS DOUBLE) / {QF!r} "
            f"- CAST(rxi AS DOUBLE) / ({_DCOR_N} * {QF!r}) "
            f"- CAST(rxj AS DOUBLE) / ({_DCOR_N} * {QF!r}) "
            f"+ CAST(gx AS DOUBLE) / ({_DCOR_N} * {_DCOR_N} * {QF!r}))")
_DCOR_AY = (f"(CAST(dy AS DOUBLE) / {QF!r} "
            f"- CAST(ryi AS DOUBLE) / ({_DCOR_N} * {QF!r}) "
            f"- CAST(ryj AS DOUBLE) / ({_DCOR_N} * {QF!r}) "
            f"+ CAST(gy AS DOUBLE) / ({_DCOR_N} * {_DCOR_N} * {QF!r}))")

_DCOR_N2 = "CAST(n_hours AS DOUBLE) * CAST(n_hours AS DOUBLE)"
_DCOV2 = f"(CAST(sxy AS DOUBLE) / ({Q2F!r} * {_DCOR_N2}))"
_DVX = f"(CAST(sxx AS DOUBLE) / ({Q2F!r} * {_DCOR_N2}))"
_DVY = f"(CAST(syy AS DOUBLE) / ({Q2F!r} * {_DCOR_N2}))"

_ORACLE_DCOR = f"""
WITH {_HOURLY_PAIR_DUCK.format(a="click", b="view")}
, grid AS (
  SELECT a.h AS i, b.h AS j,
    CAST(round(abs(a.x - b.x) * {Q}) AS BIGINT) AS dx,
    CAST(round(abs(a.y - b.y) * {Q}) AS BIGINT) AS dy
  FROM paired a CROSS JOIN paired b
), rows_s AS (
  SELECT i, CAST(sum(dx) AS BIGINT) AS rx,
         CAST(sum(dy) AS BIGINT) AS ry
  FROM grid GROUP BY 1
), tot AS (
  SELECT CAST(sum(rx) AS BIGINT) AS gx,
         CAST(sum(ry) AS BIGINT) AS gy,
         CAST(count(*) AS BIGINT) AS n
  FROM rows_s
), centered AS (
  SELECT g.dx, g.dy, ri.rx AS rxi, ri.ry AS ryi,
         rj.rx AS rxj, rj.ry AS ryj, t.gx, t.gy, t.n
  FROM grid g
  JOIN rows_s ri ON ri.i = g.i
  JOIN rows_s rj ON rj.i = g.j
  CROSS JOIN tot t
), s AS (
  SELECT max(n) AS n_hours,
    CAST(sum(CAST(round({_DCOR_AX} * {_DCOR_AY} * {Q2}) AS BIGINT))
      AS BIGINT) AS sxy,
    CAST(sum(CAST(round({_DCOR_AX} * {_DCOR_AX} * {Q2}) AS BIGINT))
      AS BIGINT) AS sxx,
    CAST(sum(CAST(round({_DCOR_AY} * {_DCOR_AY} * {Q2}) AS BIGINT))
      AS BIGINT) AS syy
  FROM centered
)
SELECT CAST(n_hours AS BIGINT) AS n_hours,
  {round_portable_duck(_DCOV2, 6)} AS dcov2,
  {round_portable_duck(
      f"CASE WHEN {_DVX} > 0.0 AND {_DVY} > 0.0 AND {_DCOV2} > 0.0 "
      f"THEN sqrt({_DCOV2} / sqrt({_DVX} * {_DVY})) ELSE 0.0 END",
      6)} AS dcor
FROM s
"""


def _q_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return energy_distance(_paired(spark, sf_dir))


_E_XX = f"(CAST(sxx AS DOUBLE) / (CAST(n2 AS DOUBLE) * {QF!r}))"
_E_YY = f"(CAST(syy AS DOUBLE) / (CAST(n2 AS DOUBLE) * {QF!r}))"
_E_XY = f"(CAST(sxy AS DOUBLE) / (CAST(n2 AS DOUBLE) * {QF!r}))"

_ORACLE_ENERGY = f"""
WITH {_HOURLY_PAIR_DUCK.format(a="click", b="view")}
, s AS (
  SELECT CAST(count(*) AS BIGINT) AS n2,
    CAST(sum(CAST(round(abs(a.x - b.x) * {Q}) AS BIGINT)) AS BIGINT)
      AS sxx,
    CAST(sum(CAST(round(abs(a.y - b.y) * {Q}) AS BIGINT)) AS BIGINT)
      AS syy,
    CAST(sum(CAST(round(abs(a.x - b.y) * {Q}) AS BIGINT)) AS BIGINT)
      AS sxy
  FROM paired a CROSS JOIN paired b
)
SELECT CAST(sqrt(CAST(n2 AS DOUBLE)) AS BIGINT) AS n_hours,
  {round_portable_duck(_E_XX, 6)} AS e_xx,
  {round_portable_duck(_E_YY, 6)} AS e_yy,
  {round_portable_duck(_E_XY, 6)} AS e_xy,
  {round_portable_duck(
      f"2.0 * {_E_XY} - {_E_XX} - {_E_YY}", 6)} AS e_dist
FROM s
"""


QUERIES: dict = {
    "q_distance_corr_events": (_q_dcor, _ORACLE_DCOR),
    "q_energy_distance_events": (_q_energy, _ORACLE_ENERGY),
}

"""Spectral analysis #2: spectral flatness (Wiener entropy) of the
hourly activity series — the single-number "is this traffic periodic
or noise?" score next to the gated candidate-frequency periodogram
(``spectral.periodogram_hourly``): the periodogram reports power at
the daily/weekly bins; flatness = geometric mean / arithmetic mean
of power over the low-frequency spectrum (1 = white noise, -> 0 =
strongly periodic), the standard signal-processing measure.

Same single-bin DFT machinery as the periodogram (absent hours carry
x = 0; uncentered sums equal centered ones at integer k >= 1), at
the first ``n_bins`` fundamental multiples; the geometric mean folds
quantized ln-power terms.

Plan shape at 100 TB: one hash aggregate to the bounded hourly
series, one broadcast of the k relation, one reduction per bin, one
reduction over the n_bins-row relation. Scale costs grow with the
calendar, not the row count.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (time-series tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .spectral import QT, US_PER_HOUR

__all__ = ["spectral_flatness"]

Q = 10 ** 8
QF = float(Q)
N_BINS = 32


def spectral_flatness(df: DataFrame, us_col: str,
                      n_bins: int = N_BINS) -> DataFrame:
    """One row (n_hours, n_bins, mean_power, flatness): Wiener
    entropy of the hourly count series over bins k = 1..n_bins
    (bins with zero power are excluded from both means)."""
    hours = (
        df.selectExpr(f"({us_col}) DIV {US_PER_HOUR} AS __h")
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__x"))
    )
    span = hours.agg(
        F.min("__h").alias("__h0"),
        (F.max("__h") - F.min("__h") + 1).alias("__t"),
    )
    ks = span.selectExpr(
        "__t", "__h0",
        f"explode(sequence(1, least({n_bins}, __t - 1))) AS __k",
    )
    theta = ("CAST(2 AS DOUBLE) * pi() "
             "* CAST((__k * (__h - __h0)) % __t AS DOUBLE) "
             "/ CAST(__t AS DOUBLE)")
    terms = (
        hours.crossJoin(F.broadcast(ks))
        .select(
            "__k", "__t",
            F.expr(f"CAST(round(__x * cos({theta}) * {QT}) AS BIGINT)"
                   ).alias("__tc"),
            F.expr(f"CAST(round(__x * sin({theta}) * {QT}) AS BIGINT)"
                   ).alias("__ts"),
        )
    )
    qt = float(QT)
    power = (
        f"(CAST(__sc AS DOUBLE) / {qt!r} * (CAST(__sc AS DOUBLE) "
        f"/ {qt!r}) + CAST(__ss AS DOUBLE) / {qt!r} "
        f"* (CAST(__ss AS DOUBLE) / {qt!r})) / CAST(__t AS DOUBLE)"
    )
    bins = (
        terms.groupBy("__k", "__t")
        .agg(F.sum("__tc").alias("__sc"), F.sum("__ts").alias("__ss"))
        .select("__t", F.expr(power).alias("__p"))
        .filter("__p > 0.0")
    )
    red = bins.agg(
        F.max("__t").cast("bigint").alias("n_hours"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(F.expr(
            f"CAST(round(__p * {Q}) AS BIGINT)")).alias("__sp"),
        F.sum(F.expr(
            f"CAST(round(ln(__p) * {Q}) AS BIGINT)")).alias("__sl"),
    )
    am = f"(CAST(__sp AS DOUBLE) / {QF!r} / CAST(n_bins AS DOUBLE))"
    gm = (f"exp(CAST(__sl AS DOUBLE) / {QF!r} "
          f"/ CAST(n_bins AS DOUBLE))")
    return red.select(
        "n_hours", "n_bins",
        round_portable(F.expr(am), 6).alias("mean_power"),
        round_portable(F.expr(f"{gm} / {am}"), 6).alias("flatness"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle
# --------------------------------------------------------------------------


def _q_flatness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return spectral_flatness(ev, "__us")


_QTF = float(QT)
_D_THETA = ("CAST(2 AS DOUBLE) * pi() "
            "* CAST((ks.k * (h - h0)) % ks.t AS DOUBLE) "
            "/ CAST(ks.t AS DOUBLE)")
_D_POWER = (
    f"(CAST(sc AS DOUBLE) / {_QTF!r} * (CAST(sc AS DOUBLE) "
    f"/ {_QTF!r}) + CAST(ss AS DOUBLE) / {_QTF!r} "
    f"* (CAST(ss AS DOUBLE) / {_QTF!r})) / CAST(t AS DOUBLE)"
)
_D_AM = f"(CAST(sp AS DOUBLE) / {QF!r} / CAST(n_bins AS DOUBLE))"
_D_GM = f"exp(CAST(sl AS DOUBLE) / {QF!r} / CAST(n_bins AS DOUBLE))"

_ORACLE_FLATNESS = f"""
WITH hours AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS h, count(*) AS x
  FROM events GROUP BY 1
), span AS (
  SELECT min(h) AS h0, max(h) - min(h) + 1 AS t FROM hours
), ks AS (
  SELECT t, h0, unnest(range(1, least({N_BINS}, t - 1) + 1)) AS k
  FROM span
), terms AS (
  SELECT ks.k, ks.t,
    CAST(round(hours.x * cos({_D_THETA}) * {QT}) AS BIGINT) AS tcos,
    CAST(round(hours.x * sin({_D_THETA}) * {QT}) AS BIGINT) AS tsin
  FROM hours CROSS JOIN ks
), bins AS (
  SELECT t, {_D_POWER} AS p FROM (
    SELECT k, t, CAST(sum(tcos) AS BIGINT) AS sc,
           CAST(sum(tsin) AS BIGINT) AS ss
    FROM terms GROUP BY 1, 2
  ) WHERE {_D_POWER} > 0.0
), red AS (
  SELECT CAST(max(t) AS BIGINT) AS n_hours,
    CAST(count(*) AS BIGINT) AS n_bins,
    sum(CAST(round(p * {Q}) AS BIGINT)) AS sp,
    sum(CAST(round(ln(p) * {Q}) AS BIGINT)) AS sl
  FROM bins
)
SELECT n_hours, n_bins,
  {round_portable_duck(_D_AM, 6)} AS mean_power,
  {round_portable_duck(f"{_D_GM} / {_D_AM}", 6)} AS flatness
FROM red
"""


QUERIES: dict = {
    "q_spectral_flatness_events": (_q_flatness, _ORACLE_FLATNESS),
}

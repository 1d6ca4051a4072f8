"""Categorical + quick-trend tier #19: the likelihood-ratio G-test,
the 2x2 odds ratio with its Woolf confidence interval, the
Cox-Stuart trend test, and the records test — four small classics
rounding out the gated battery: Pearson chi-square (gated
``q_chi2_dow_events``) underweights sparse cells where the G-test is
the likelihood-ratio-correct form; Cramer's V gives association
STRENGTH but practitioners report 2x2 effects as odds ratios with a
CI; Mann-Kendall (gated) is O(grid^2) in banded values while
Cox-Stuart is the O(n) sign-test screen; the runs/turning-points
tests look at local structure while the records test detects
drift through the count of running maxima (E = harmonic number).

- ``g_test``: G = 2 sum O ln(O/E) over the r x c contingency of two
  categorical expressions (zero cells contribute 0).
- ``odds_ratio_ci``: OR = ad/bc with the Woolf (log) 95% CI,
  Haldane-Anscombe +1/2 correction when any cell is 0.
- ``cox_stuart``: pair x_i with x_{i+shift} for shift = ceil(T/2)
  (m = floor(T/2) pairs; the middle element of an odd series is
  dropped — the standard drop-the-middle convention; ties dropped);
  S = #(later > earlier), z against Binomial(n_pairs, 1/2).
- ``records_test``: R = #{t : x_t > max(x_1..x_{t-1})} (strict; the
  first observation is a record by convention), E[R] = H_T,
  Var[R] = H_T - H_T2 (harmonic sums), z-normalized.

Engine-exactness: contingencies and sign/record counts are exact
integers; each G / harmonic term quantizes to BIGINT at 1e8 before
its sum; the cents-quantized bucket-mean series (the house staging)
feeds the two trend tests.

Plan shape at 100 TB: one hash aggregate to the bounded contingency
(g_test / odds ratio); the trend tests reduce to the span-bounded
global hourly series first — the pairing join is an equi-join on the
shifted row number, the record scan one running-max window.

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .tsa2 import _series

__all__ = ["g_test", "odds_ratio_ci", "cox_stuart", "records_test"]

Q = 10 ** 8
QF = float(Q)
US_PER_HOUR = 3_600_000_000
Z95 = 1.959963984540054  # Phi^-1(0.975), double literal both engines


def g_test(df: DataFrame, row_expr: str, col_expr: str) -> DataFrame:
    """One row (n, r, c, dof, g_stat): the likelihood-ratio G
    statistic of the r x c contingency (cells with O = 0 contribute
    0 by the 0*ln(0) = 0 convention)."""
    # materialize once: the r x c contingency feeds both margins,
    # the total, and the term join (measured 7 exchanges otherwise)
    cells = (
        df.selectExpr(f"({row_expr}) AS __r", f"({col_expr}) AS __c")
        .filter("__r IS NOT NULL AND __c IS NOT NULL")
        .groupBy("__r", "__c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__o"))
    ).localCheckpoint()
    rm = cells.groupBy("__r").agg(F.sum("__o").alias("__rm"))
    cm = cells.groupBy("__c").agg(F.sum("__o").alias("__cm"))
    nt = cells.agg(F.sum("__o").cast("bigint").alias("__n"))
    j = (cells.join(F.broadcast(rm), "__r")
         .join(F.broadcast(cm), "__c")
         .crossJoin(F.broadcast(nt)))
    # O ln(O/E) with E = rm*cm/n: ln(O*n/(rm*cm)) via one-factor
    # DOUBLE casts (rm*cm passes 2^63 at large n)
    term = ("(CAST(__o AS DOUBLE) * ln(CAST(__o AS DOUBLE) "
            "* CAST(__n AS DOUBLE) / (CAST(__rm AS DOUBLE) "
            "* CAST(__cm AS DOUBLE))))")
    red = j.agg(
        F.max("__n").cast("bigint").alias("n"),
        F.countDistinct("__r").cast("bigint").alias("r"),
        F.countDistinct("__c").cast("bigint").alias("c"),
        F.sum(F.expr(
            f"CAST(round(({term}) * {Q}) AS BIGINT)")).alias("__gq"),
    )
    return red.select(
        "n", "r", "c",
        F.expr("(r - 1) * (c - 1)").cast("bigint").alias("dof"),
        round_portable(F.expr(
            f"2.0 * CAST(__gq AS DOUBLE) / {QF!r}"), 6)
        .alias("g_stat"),
    )


def odds_ratio_ci(df: DataFrame, exposure_expr: str,
                  outcome_expr: str) -> DataFrame:
    """One row (a, b, c, d, odds_ratio, ci_lo, ci_hi): the 2x2 odds
    ratio with the Woolf 95% CI (Haldane-Anscombe +0.5 on every cell
    when any cell is 0)."""
    red = (
        df.selectExpr(
            f"CAST(({exposure_expr}) AS INT) AS __e",
            f"CAST(({outcome_expr}) AS INT) AS __o")
        .filter("__e IS NOT NULL AND __o IS NOT NULL")
        .agg(
            F.sum(F.expr("CASE WHEN __e = 1 AND __o = 1 THEN 1 "
                         "ELSE 0 END")).cast("bigint").alias("a"),
            F.sum(F.expr("CASE WHEN __e = 1 AND __o = 0 THEN 1 "
                         "ELSE 0 END")).cast("bigint").alias("b"),
            F.sum(F.expr("CASE WHEN __e = 0 AND __o = 1 THEN 1 "
                         "ELSE 0 END")).cast("bigint").alias("c"),
            F.sum(F.expr("CASE WHEN __e = 0 AND __o = 0 THEN 1 "
                         "ELSE 0 END")).cast("bigint").alias("d"),
        )
    )
    anyz = "(a = 0 OR b = 0 OR c = 0 OR d = 0)"
    cell = ("(CAST({x} AS DOUBLE) "
            f"+ CASE WHEN {anyz} THEN 0.5 ELSE 0.0 END)")
    ca, cb = cell.format(x="a"), cell.format(x="b")
    cc, cd = cell.format(x="c"), cell.format(x="d")
    orr = f"({ca} * {cd} / ({cb} * {cc}))"
    se = f"sqrt(1.0/{ca} + 1.0/{cb} + 1.0/{cc} + 1.0/{cd})"
    return red.select(
        "a", "b", "c", "d",
        round_portable(F.expr(orr), 6).alias("odds_ratio"),
        round_portable(F.expr(
            f"exp(ln({orr}) - {Z95!r} * {se})"), 6).alias("ci_lo"),
        round_portable(F.expr(
            f"exp(ln({orr}) + {Z95!r} * {se})"), 6).alias("ci_hi"),
    )


def cox_stuart(df: DataFrame, bucket_expr: str,
               value_col: str) -> DataFrame:
    """One row (t, n_pairs, n_pos, z): the Cox-Stuart sign test for
    monotone trend of the bucket-mean series (ties dropped; z NULL
    when no untied pair survives)."""
    series = _series(df, bucket_expr, value_col)
    w = Window.partitionBy().orderBy("__h")
    rn = series.withColumn(
        "__rn", F.row_number().over(w).cast("bigint"))
    tot = rn.agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
    half = rn.crossJoin(F.broadcast(tot)).withColumn(
        "__m", F.expr("__t DIV 2"))
    a = half.filter("__rn <= __m").selectExpr(
        "__rn AS __i", "__yq AS __y1", "__t", "__m")
    b = half.filter("__rn > __t - __m").selectExpr(
        "__rn - (__t - __m) AS __i", "__yq AS __y2")
    pairs = a.join(b, "__i")
    red = pairs.agg(
        F.max("__t").cast("bigint").alias("t"),
        F.sum(F.expr("CASE WHEN __y2 <> __y1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_pairs"),
        F.sum(F.expr("CASE WHEN __y2 > __y1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_pos"),
    )
    nd = "CAST(n_pairs AS DOUBLE)"
    return red.select(
        "t", "n_pairs", "n_pos",
        round_portable(F.expr(
            f"CASE WHEN n_pairs > 0 THEN "
            f"(CAST(n_pos AS DOUBLE) - {nd} / 2.0) "
            f"/ sqrt({nd} / 4.0) END"), 6).alias("z"),
    )


def records_test(df: DataFrame, bucket_expr: str,
                 value_col: str) -> DataFrame:
    """One row (t, n_records, e_records, z): the upper-records
    randomness test on the bucket-mean series (first observation
    counts; strict records only; z NULL below 2 observations)."""
    series = _series(df, bucket_expr, value_col)
    w = Window.partitionBy().orderBy("__h")
    rec = (
        series
        .withColumn("__pm", F.max("__yq").over(
            w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("__rec", F.expr(
            "CASE WHEN __pm IS NULL OR __yq > __pm THEN 1 "
            "ELSE 0 END"))
        .withColumn("__rn", F.row_number().over(w).cast("bigint"))
    )
    # harmonic terms 1/t and 1/t^2, quantized per rank
    red = rec.agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum("__rec").cast("bigint").alias("n_records"),
        F.sum(F.expr(
            f"CAST(round(1.0 / CAST(__rn AS DOUBLE) * {Q}) "
            f"AS BIGINT)")).alias("__h1"),
        F.sum(F.expr(
            f"CAST(round(1.0 / (CAST(__rn AS DOUBLE) "
            f"* CAST(__rn AS DOUBLE)) * {Q}) AS BIGINT)"))
        .alias("__h2"),
    )
    e = f"(CAST(__h1 AS DOUBLE) / {QF!r})"
    v = f"((CAST(__h1 AS DOUBLE) - CAST(__h2 AS DOUBLE)) / {QF!r})"
    return red.select(
        "t", "n_records",
        round_portable(F.expr(e), 6).alias("e_records"),
        round_portable(F.expr(
            f"CASE WHEN t >= 2 AND {v} > 0.0 THEN "
            f"(CAST(n_records AS DOUBLE) - {e}) / sqrt({v}) END"), 6)
        .alias("z"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events: event-type x hour-band
# contingency; click-vs-view 2x2; global hourly series)
# --------------------------------------------------------------------------

_SPARK_H = f"(ts DIV 1000) DIV {US_PER_HOUR}"
_DUCK_H = f"epoch_us(ts) // {US_PER_HOUR}"
_SPARK_BAND = f"(({_SPARK_H}) % 24) DIV 6"
_DUCK_BAND = f"(({_DUCK_H}) % 24) // 6"
_EXPO = ("CASE WHEN event_type = 'click' THEN 1 "
         "WHEN event_type = 'view' THEN 0 END")
_OUT = "CASE WHEN value >= 50.0 THEN 1 ELSE 0 END"


def _q_gtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return g_test(load(spark, sf_dir, "events"), "event_type",
                  _SPARK_BAND)


def _q_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    return odds_ratio_ci(load(spark, sf_dir, "events"), _EXPO, _OUT)


def _q_coxstuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cox_stuart(load(spark, sf_dir, "events"), _SPARK_H,
                      "value")


def _q_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return records_test(load(spark, sf_dir, "events"), _SPARK_H,
                        "value")


_D_GTERM = ("(CAST(o AS DOUBLE) * ln(CAST(o AS DOUBLE) "
            "* CAST(n AS DOUBLE) / (CAST(rm AS DOUBLE) "
            "* CAST(cm AS DOUBLE))))")

_ORACLE_GTEST = f"""
WITH cells AS (
  SELECT event_type AS r, CAST({_DUCK_BAND} AS BIGINT) AS c,
    CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), rm AS (
  SELECT r, CAST(sum(o) AS BIGINT) AS rm FROM cells GROUP BY 1
), cm AS (
  SELECT c, CAST(sum(o) AS BIGINT) AS cm FROM cells GROUP BY 1
), nt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
red AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
    CAST(count(DISTINCT cells.r) AS BIGINT) AS r,
    CAST(count(DISTINCT cells.c) AS BIGINT) AS c,
    CAST(sum(CAST(round(({_D_GTERM}) * {Q}) AS BIGINT)) AS BIGINT)
      AS gq
  FROM cells JOIN rm ON cells.r = rm.r JOIN cm ON cells.c = cm.c, nt
)
SELECT n, r, c, CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
  {round_portable_duck(f"2.0 * CAST(gq AS DOUBLE) / {QF!r}", 6)}
    AS g_stat
FROM red
"""

_D_ANYZ = "(a = 0 OR b = 0 OR c = 0 OR d = 0)"
_D_CELL = ("(CAST({x} AS DOUBLE) "
           f"+ CASE WHEN {_D_ANYZ} THEN 0.5 ELSE 0.0 END)")
_D_OR = (f"({_D_CELL.format(x='a')} * {_D_CELL.format(x='d')} "
         f"/ ({_D_CELL.format(x='b')} * {_D_CELL.format(x='c')}))")
_D_SE = (f"sqrt(1.0/{_D_CELL.format(x='a')} "
         f"+ 1.0/{_D_CELL.format(x='b')} "
         f"+ 1.0/{_D_CELL.format(x='c')} "
         f"+ 1.0/{_D_CELL.format(x='d')})")

_ORACLE_OR = f"""
WITH red AS (
  SELECT
    CAST(sum(CASE WHEN ({_EXPO}) = 1 AND ({_OUT}) = 1 THEN 1
      ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN ({_EXPO}) = 1 AND ({_OUT}) = 0 THEN 1
      ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN ({_EXPO}) = 0 AND ({_OUT}) = 1 THEN 1
      ELSE 0 END) AS BIGINT) AS c,
    CAST(sum(CASE WHEN ({_EXPO}) = 0 AND ({_OUT}) = 0 THEN 1
      ELSE 0 END) AS BIGINT) AS d
  FROM events
  WHERE ({_EXPO}) IS NOT NULL AND ({_OUT}) IS NOT NULL
)
SELECT a, b, c, d,
  {round_portable_duck(_D_OR, 6)} AS odds_ratio,
  {round_portable_duck(
      f"exp(ln({_D_OR}) - {Z95!r} * {_D_SE})", 6)} AS ci_lo,
  {round_portable_duck(
      f"exp(ln({_D_OR}) + {Z95!r} * {_D_SE})", 6)} AS ci_hi
FROM red
"""

_SERIES_DUCK = f"""series AS (
  SELECT {_DUCK_H} AS h,
    CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT))
      AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) * {Q})
      AS BIGINT) AS yq
  FROM events WHERE value IS NOT NULL GROUP BY 1
)"""

_ORACLE_COXSTUART = f"""
WITH {_SERIES_DUCK}, rn AS (
  SELECT CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rn, yq
  FROM series
), tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM rn),
pairs AS (
  SELECT a.yq AS y1, b.yq AS y2, tot.t
  FROM rn a, tot
  JOIN rn b ON b.rn = a.rn + (tot.t - tot.t // 2)
  WHERE a.rn <= tot.t // 2
), red AS (
  SELECT CAST(max(t) AS BIGINT) AS t,
    CAST(sum(CASE WHEN y2 <> y1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_pairs,
    CAST(sum(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_pos
  FROM pairs
)
SELECT t, n_pairs, n_pos,
  {round_portable_duck(
      "CASE WHEN n_pairs > 0 THEN "
      "(CAST(n_pos AS DOUBLE) - CAST(n_pairs AS DOUBLE) / 2.0) "
      "/ sqrt(CAST(n_pairs AS DOUBLE) / 4.0) END", 6)} AS z
FROM red
"""

_ORACLE_RECORDS = f"""
WITH {_SERIES_DUCK}, rec AS (
  SELECT yq,
    max(yq) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING) AS pm,
    CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rn
  FROM series
), red AS (
  SELECT CAST(count(*) AS BIGINT) AS t,
    CAST(sum(CASE WHEN pm IS NULL OR yq > pm THEN 1 ELSE 0 END)
      AS BIGINT) AS n_records,
    CAST(sum(CAST(round(1.0 / CAST(rn AS DOUBLE) * {Q}) AS BIGINT))
      AS BIGINT) AS h1,
    CAST(sum(CAST(round(1.0 / (CAST(rn AS DOUBLE)
      * CAST(rn AS DOUBLE)) * {Q}) AS BIGINT)) AS BIGINT) AS h2
  FROM rec
)
SELECT t, n_records,
  {round_portable_duck(f"CAST(h1 AS DOUBLE) / {QF!r}", 6)}
    AS e_records,
  {round_portable_duck(
      f"CASE WHEN t >= 2 "
      f"AND (CAST(h1 AS DOUBLE) - CAST(h2 AS DOUBLE)) / {QF!r} > 0.0"
      f" THEN (CAST(n_records AS DOUBLE) "
      f"- CAST(h1 AS DOUBLE) / {QF!r}) "
      f"/ sqrt((CAST(h1 AS DOUBLE) - CAST(h2 AS DOUBLE)) / {QF!r}) "
      f"END", 6)} AS z
FROM red
"""


QUERIES: dict = {
    "q_gtest_events": (_q_gtest, _ORACLE_GTEST),
    "q_odds_ratio_ci_events": (_q_or, _ORACLE_OR),
    "q_cox_stuart_events": (_q_coxstuart, _ORACLE_COXSTUART),
    "q_records_test_events": (_q_records, _ORACLE_RECORDS),
}

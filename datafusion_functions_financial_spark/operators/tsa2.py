"""Long-memory + randomness tier #2: detrended fluctuation analysis
(DFA) and the turning-points test — two gaps beside the gated
long-memory/randomness battery: the rescaled-range Hurst exponent
(``q_hurst_events``) is biased by short-range trends, which DFA
removes by construction (per-box linear detrending of the profile);
the runs test (``q_runs_test_events``) randomizes around the MEDIAN,
while turning points test local extrema — sensitive to oscillation
structure the runs test misses.

- ``dfa``: profile Y_t = cumsum(x_t - xbar); for each box size n in
  ``BOX_SIZES``, split into complete boxes, OLS-detrend each box
  (closed form from the 5 box sums), F(n) = sqrt(mean residual
  variance); alpha = OLS slope of ln F(n) on ln n (0.5 = white
  noise, 1.0 = 1/f, 1.5 = brownian).
- ``turning_points``: T = #{t : x_{t-1} < x_t > x_{t+1} or
  x_{t-1} > x_t < x_{t+1}} (flat neighbors break a turning point by
  contract); E[T] = 2(n-2)/3, Var[T] = (16n - 29)/90, z-normalized.

Engine-exactness: the profile is exact BIGINT arithmetic (the KPSS
staging convention: cents-quantized bucket means, en = yq*T - SQ);
per-box y / i*y / y^2 terms quantize to BIGINT at 1e8 before the box
sums, box residual variances quantize again before the per-size
mean. Turning points are pure integer counting on exact doubles.

Plan shape at 100 TB: both reduce events to ONE bounded global
hourly series (span-bounded, not volume-bounded) before any window;
DFA's box aggregation is a hash aggregate on (size, box) over the
exploded-by-size series (|BOX_SIZES| x T rows, still span-bounded).

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (time-series tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["dfa", "turning_points"]

Q = 10 ** 8
QF = float(Q)
US_PER_HOUR = 3_600_000_000
BOX_SIZES = (8, 16, 32, 64)


def _series(df: DataFrame, bucket_expr: str,
            value_col: str) -> DataFrame:
    """(h, yq): the cents-exact bucket-mean series, 1e8-quantized."""
    cents = f"CAST(round(({value_col}) * 100) AS BIGINT)"
    return (
        df.selectExpr(f"({bucket_expr}) AS __h", f"{cents} AS __c")
        .filter("__c IS NOT NULL")
        .groupBy("__h")
        .agg(F.expr(
            f"CAST(round(CAST(sum(__c) AS DOUBLE) / 100.0 "
            f"/ CAST(count(*) AS DOUBLE) * {Q}) AS BIGINT)")
            .alias("__yq"))
    )


def _profile(df: DataFrame, bucket_expr: str,
             value_col: str) -> DataFrame:
    """(rn, t, y): the cumulative demeaned bucket-mean series in
    exact double units (numerators exact BIGINTs end to end)."""
    series = _series(df, bucket_expr, value_col)
    tot = series.agg(
        F.count(F.lit(1)).cast("bigint").alias("__t"),
        F.sum("__yq").cast("bigint").alias("__sq"))
    w = Window.partitionBy().orderBy("__h")
    return (
        series.crossJoin(F.broadcast(tot))
        .withColumn("__rn", F.row_number().over(w).cast("bigint"))
        .withColumn("__sn", F.sum(F.expr("__yq * __t - __sq"))
                    .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .selectExpr(
            "__rn AS rn", "__t AS t",
            f"CAST(__sn AS DOUBLE) / (CAST(__t AS DOUBLE) * {QF!r})"
            " AS y")
    )


def dfa(df: DataFrame, bucket_expr: str, value_col: str) -> DataFrame:
    """(n, n_boxes, fn, alpha): the DFA fluctuation function at each
    box size and the common scaling exponent (alpha NULL when fewer
    than 2 sizes produce a positive F)."""
    prof = _profile(df, bucket_expr, value_col)
    sizes = ", ".join(str(int(n)) for n in BOX_SIZES)
    boxed = prof.selectExpr(
        f"explode(array({sizes})) AS n", "rn", "y").selectExpr(
        "n", "(rn - 1) DIV n AS box",
        "CAST((rn - 1) % n + 1 AS BIGINT) AS i", "y")
    per_box = (
        boxed.groupBy("n", "box")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__c"),
            F.sum("i").cast("bigint").alias("__sx"),
            F.sum(F.expr("i * i")).cast("bigint").alias("__sxx"),
            F.sum(F.expr(
                f"CAST(round(y * {Q}) AS BIGINT)")).alias("__s1"),
            F.sum(F.expr(
                f"CAST(round(i * y * {Q}) AS BIGINT)")).alias("__sxy"),
            F.sum(F.expr(
                f"CAST(round(y * y * {Q}) AS BIGINT)")).alias("__syy"),
        )
        .filter("__c = n")
    )
    nd = "CAST(n AS DOUBLE)"
    s1 = f"(CAST(__s1 AS DOUBLE) / {QF!r})"
    sxy = f"(CAST(__sxy AS DOUBLE) / {QF!r})"
    syy = f"(CAST(__syy AS DOUBLE) / {QF!r})"
    sx, sxx = "CAST(__sx AS DOUBLE)", "CAST(__sxx AS DOUBLE)"
    b = (f"(({nd} * {sxy} - {sx} * {s1}) "
         f"/ ({nd} * {sxx} - {sx} * {sx}))")
    a = f"(({s1} - {b} * {sx}) / {nd})"
    rss = f"greatest({syy} - {a} * {s1} - {b} * {sxy}, 0.0)"
    per_size = (
        per_box.groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_boxes"),
            F.sum(F.expr(
                f"CAST(round(({rss}) / {nd} * {Q}) AS BIGINT)"))
            .alias("__f2q"),
        )
        .withColumn("fn", F.expr(
            f"sqrt(CAST(__f2q AS DOUBLE) / {QF!r} "
            f"/ CAST(n_boxes AS DOUBLE))"))
    )
    lf = (
        per_size.filter("fn > 0.0")
        .selectExpr("ln(CAST(n AS DOUBLE)) AS lx", "ln(fn) AS ly")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__k"),
            F.sum(F.expr(
                f"CAST(round(lx * {Q}) AS BIGINT)")).alias("__lx"),
            F.sum(F.expr(
                f"CAST(round(ly * {Q}) AS BIGINT)")).alias("__ly"),
            F.sum(F.expr(
                f"CAST(round(lx * ly * {Q}) AS BIGINT)")).alias("__lxy"),
            F.sum(F.expr(
                f"CAST(round(lx * lx * {Q}) AS BIGINT)")).alias("__lxx"),
        )
    )
    kd = "CAST(__k AS DOUBLE)"
    alpha = (
        f"CASE WHEN __k >= 2 THEN "
        f"(({kd}) * CAST(__lxy AS DOUBLE) "
        f"- CAST(__lx AS DOUBLE) * CAST(__ly AS DOUBLE) / {QF!r}) "
        f"/ (({kd}) * CAST(__lxx AS DOUBLE) "
        f"- CAST(__lx AS DOUBLE) * CAST(__lx AS DOUBLE) / {QF!r}) END")
    return (
        per_size.crossJoin(F.broadcast(lf))
        .select(
            F.col("n").cast("bigint").alias("n"), "n_boxes",
            round_portable(F.col("fn"), 6).alias("fn"),
            round_portable(F.expr(alpha), 6).alias("alpha"),
        )
    )


def turning_points(df: DataFrame, bucket_expr: str,
                   value_col: str) -> DataFrame:
    """One row (t, n_turning, e_turning, z): the turning-points
    randomness test on the RAW bucket-mean series — not its
    cumulative profile, which turns only at sign changes of the
    demeaned series (z NULL below 3 observations)."""
    series = _series(df, bucket_expr, value_col)
    w = Window.partitionBy().orderBy("__h")
    tp = (
        series.withColumn("__p", F.lag("__yq").over(w))
        .withColumn("__f", F.lead("__yq").over(w))
        .withColumn("__tp", F.expr(
            "CASE WHEN __p IS NOT NULL AND __f IS NOT NULL AND "
            "((__p < __yq AND __yq > __f) "
            "OR (__p > __yq AND __yq < __f)) "
            "THEN 1 ELSE 0 END"))
    )
    red = tp.agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum("__tp").cast("bigint").alias("n_turning"))
    td = "CAST(t AS DOUBLE)"
    e = f"(2.0 * ({td} - 2.0) / 3.0)"
    v = f"((16.0 * {td} - 29.0) / 90.0)"
    return red.select(
        "t", "n_turning",
        round_portable(F.expr(e), 6).alias("e_turning"),
        round_portable(F.expr(
            f"CASE WHEN t >= 3 THEN "
            f"(CAST(n_turning AS DOUBLE) - {e}) / sqrt({v}) END"), 6)
        .alias("z"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events: global hourly series)
# --------------------------------------------------------------------------

_SPARK_H = f"(ts DIV 1000) DIV {US_PER_HOUR}"
_DUCK_H = f"epoch_us(ts) // {US_PER_HOUR}"


def _q_dfa(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dfa(load(spark, sf_dir, "events"), _SPARK_H, "value")


def _q_tp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return turning_points(load(spark, sf_dir, "events"), _SPARK_H,
                          "value")


_PROFILE_DUCK = f"""series AS (
  SELECT {_DUCK_H} AS h,
    CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT))
      AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) * {Q})
      AS BIGINT) AS yq
  FROM events WHERE value IS NOT NULL GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS t,
    CAST(sum(yq) AS BIGINT) AS sq
  FROM series
), prof AS (
  SELECT CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rn, t,
    CAST(CAST(sum(yq * t - sq) OVER (ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS DOUBLE) / (CAST(t AS DOUBLE) * {QF!r}) AS y
  FROM series, tot
)"""

_D_ND = "CAST(n AS DOUBLE)"
_D_S1 = f"(CAST(s1 AS DOUBLE) / {QF!r})"
_D_SXY = f"(CAST(sxy AS DOUBLE) / {QF!r})"
_D_SYY = f"(CAST(syy AS DOUBLE) / {QF!r})"
_D_SX, _D_SXX = "CAST(sx AS DOUBLE)", "CAST(sxx AS DOUBLE)"
_D_B = (f"(({_D_ND} * {_D_SXY} - {_D_SX} * {_D_S1}) "
        f"/ ({_D_ND} * {_D_SXX} - {_D_SX} * {_D_SX}))")
_D_A = f"(({_D_S1} - {_D_B} * {_D_SX}) / {_D_ND})"
_D_RSS = (f"greatest({_D_SYY} - {_D_A} * {_D_S1} "
          f"- {_D_B} * {_D_SXY}, 0.0)")
_D_KD = "CAST(k AS DOUBLE)"
_D_ALPHA = (
    f"CASE WHEN k >= 2 THEN "
    f"(({_D_KD}) * CAST(lxy AS DOUBLE) "
    f"- CAST(lx AS DOUBLE) * CAST(ly AS DOUBLE) / {QF!r}) "
    f"/ (({_D_KD}) * CAST(lxx AS DOUBLE) "
    f"- CAST(lx AS DOUBLE) * CAST(lx AS DOUBLE) / {QF!r}) END")

_ORACLE_DFA = f"""
WITH {_PROFILE_DUCK}, boxed AS (
  SELECT s.n, (rn - 1) // s.n AS box,
    CAST((rn - 1) % s.n + 1 AS BIGINT) AS i, y
  FROM prof, (SELECT unnest([{', '.join(str(n) for n in BOX_SIZES)}])
    AS n) s
), per_box AS (
  SELECT n, box,
    CAST(count(*) AS BIGINT) AS c,
    CAST(sum(i) AS BIGINT) AS sx,
    CAST(sum(i * i) AS BIGINT) AS sxx,
    CAST(sum(CAST(round(y * {Q}) AS BIGINT)) AS BIGINT) AS s1,
    CAST(sum(CAST(round(i * y * {Q}) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(sum(CAST(round(y * y * {Q}) AS BIGINT)) AS BIGINT) AS syy
  FROM boxed GROUP BY 1, 2
), complete AS (
  SELECT * FROM per_box WHERE c = n
), per_size AS (
  SELECT n, CAST(count(*) AS BIGINT) AS n_boxes,
    sqrt(CAST(CAST(sum(CAST(round(({_D_RSS}) / {_D_ND} * {Q})
      AS BIGINT)) AS BIGINT) AS DOUBLE) / {QF!r}
      / CAST(count(*) AS DOUBLE)) AS fn
  FROM complete GROUP BY 1
), lf AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
    CAST(sum(CAST(round(ln(CAST(n AS DOUBLE)) * {Q}) AS BIGINT))
      AS BIGINT) AS lx,
    CAST(sum(CAST(round(ln(fn) * {Q}) AS BIGINT)) AS BIGINT) AS ly,
    CAST(sum(CAST(round(ln(CAST(n AS DOUBLE)) * ln(fn) * {Q})
      AS BIGINT)) AS BIGINT) AS lxy,
    CAST(sum(CAST(round(ln(CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE))
      * {Q}) AS BIGINT)) AS BIGINT) AS lxx
  FROM per_size WHERE fn > 0.0
)
SELECT CAST(n AS BIGINT) AS n, n_boxes,
  {round_portable_duck("fn", 6)} AS fn,
  {round_portable_duck(_D_ALPHA, 6)} AS alpha
FROM per_size, lf
"""

_D_E = "(2.0 * (CAST(t AS DOUBLE) - 2.0) / 3.0)"
_D_V = "((16.0 * CAST(t AS DOUBLE) - 29.0) / 90.0)"

_ORACLE_TP = f"""
WITH series AS (
  SELECT {_DUCK_H} AS h,
    CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT))
      AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) * {Q})
      AS BIGINT) AS yq
  FROM events WHERE value IS NOT NULL GROUP BY 1
), tp AS (
  SELECT yq,
    lag(yq) OVER (ORDER BY h) AS p,
    lead(yq) OVER (ORDER BY h) AS f
  FROM series
), red AS (
  SELECT CAST(count(*) AS BIGINT) AS t,
    CAST(sum(CASE WHEN p IS NOT NULL AND f IS NOT NULL AND
      ((p < yq AND yq > f) OR (p > yq AND yq < f))
      THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
  FROM tp
)
SELECT t, n_turning,
  {round_portable_duck(_D_E, 6)} AS e_turning,
  {round_portable_duck(
      f"CASE WHEN t >= 3 THEN "
      f"(CAST(n_turning AS DOUBLE) - {_D_E}) / sqrt({_D_V}) END",
      6)} AS z
FROM red
"""


QUERIES: dict = {
    "q_dfa_events": (_q_dfa, _ORACLE_DFA),
    "q_turning_points_events": (_q_tp, _ORACLE_TP),
}

"""Robust trend fitting: Theil–Sen slope (median of pairwise slopes)
and Zipf's-law slope for a token-frequency distribution — the two
"is this series/corpus shaped the way it should be" regressions a
pipeline runs without trusting least squares on raw outliers.

Engine-exact by construction:
- Theil–Sen aggregates to one row per (group, day) FIRST — daily
  means from exact 1e8-quantized BIGINT sums — then forms pairwise
  slopes over that bounded relation (days² per group, not events²)
  and selects the ORDER-STATISTIC lower median (no interpolation;
  interpolated quantiles differ bitwise across engines).
- The Zipf fit ranks tokens with a unique tiebreak, and every OLS
  term (x, y, xy, x²) quantizes to BIGINT at 1e8 BEFORE the
  cross-row sum — the float-determinism rule — so the normal-equation
  slope is one double expression over four exact integers. ln() on
  identical doubles is libm on both engines (parity-established by
  the bar-range volatility family).

Plan shape at scale: both queries collapse the big relation with one
hash aggregation before anything quadratic or sorted happens; the
pair expansion is days²/group (bounded by the calendar), the Zipf
rank is one window over the token-count relation.

Beyond-reference scope (SURVEY.md extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["theil_sen_daily", "zipf_slope"]

Q = 10 ** 8
US_PER_DAY = 86_400_000_000


def theil_sen_daily(df: DataFrame, value_col: str, key: str,
                    us_col: str) -> DataFrame:
    """(key, n_days, ts_slope): Theil–Sen estimator of the per-day
    trend of the daily mean value, per key. Robust to outlier days —
    the median of all pairwise slopes."""
    daily = (
        df.select(
            F.col(key),
            F.expr(f"{us_col} DIV {US_PER_DAY}").alias("__d"),
            F.expr(f"CAST(round({value_col} * {Q}) AS BIGINT)")
            .alias("__q"),
        )
        .groupBy(key, "__d")
        .agg(F.sum("__q").alias("__s"), F.count(F.lit(1)).alias("__c"))
        .withColumn("__m", F.expr(
            f"CAST(__s AS DOUBLE) / (CAST(__c AS DOUBLE) * {float(Q)!r})"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col(f"a.{key}") == F.col(f"b.{key}"))
        & (F.col("a.__d") < F.col("b.__d")),
    ).select(
        F.col(f"a.{key}").alias(key),
        F.col("a.__d").alias("__da"),
        F.col("b.__d").alias("__db"),
        F.expr("(b.__m - a.__m) "
               "/ CAST(b.__d - a.__d AS DOUBLE)").alias("__sl"),
    )
    w = Window.partitionBy(key).orderBy(
        F.col("__sl").asc(), F.col("__da").asc(), F.col("__db").asc())
    n = Window.partitionBy(key)
    med = (
        slopes.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(n))
        .filter((F.col("__rn") * 2 >= F.col("__n"))
                & ((F.col("__rn") - 1) * 2 < F.col("__n")))
    )
    ndays = daily.groupBy(key).agg(F.count(F.lit(1)).alias("n_days"))
    return ndays.join(
        med.select(key, round_portable(F.col("__sl")).alias("ts_slope")),
        key,
    )


def zipf_slope(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(n_tokens, vocab_size, zipf_slope): OLS slope of
    ln(frequency) ~ ln(rank) over the whole-corpus token-frequency
    table (a healthy natural-language corpus sits near −1)."""
    toks = df.select(
        F.explode(F.expr(
            f"split(trim(lower({text_col})), '\\\\s+')")).alias("__t")
    ).filter(F.col("__t") != "")
    counts = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__f"))
    w = Window.orderBy(F.col("__f").desc(), F.col("__t").asc())
    terms = counts.withColumn("__r", F.row_number().over(w)).selectExpr(
        "__f",
        "CAST(round(ln(CAST(__r AS DOUBLE)) * 1e8) AS BIGINT) AS x",
        "CAST(round(ln(CAST(__f AS DOUBLE)) * 1e8) AS BIGINT) AS y",
        "CAST(round(ln(CAST(__r AS DOUBLE)) * ln(CAST(__f AS DOUBLE))"
        " * 1e8) AS BIGINT) AS xy",
        "CAST(round(ln(CAST(__r AS DOUBLE)) * ln(CAST(__r AS DOUBLE))"
        " * 1e8) AS BIGINT) AS xx",
    )
    slope = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / 1e8) "
        "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / 1e8)"
    )
    return (
        terms.agg(
            F.sum("__f").alias("__nt"),
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum("xy").alias("sxy"),
            F.sum("xx").alias("sxx"),
        )
        .select(
            F.col("__nt").cast("bigint").alias("n_tokens"),
            F.col("n").cast("bigint").alias("vocab_size"),
            round_portable(F.expr(slope)).alias("zipf_slope"),
        )
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return theil_sen_daily(ev, "value", "event_type", "__us")


_ORACLE_THEIL_SEN = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {US_PER_DAY} AS d,
         CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS BIGINT) AS s,
         count(*) AS c
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, d,
         CAST(s AS DOUBLE) / (CAST(c AS DOUBLE) * {float(Q)!r}) AS mv
  FROM daily
), slopes AS (
  SELECT a.event_type, a.d AS da, b.d AS db,
         (b.mv - a.mv) / CAST(b.d - a.d AS DOUBLE) AS sl
  FROM m a JOIN m b ON a.event_type = b.event_type AND a.d < b.d
), med AS (
  SELECT event_type, sl
  FROM (
    SELECT event_type, sl,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY sl ASC, da ASC, db ASC) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM slopes
  ) WHERE rn * 2 >= n AND (rn - 1) * 2 < n
), nd AS (
  SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1
)
SELECT nd.event_type, nd.n_days,
  {round_portable_duck("med.sl")} AS ts_slope
FROM nd JOIN med USING (event_type)
"""


def _q_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zipf_slope(load(spark, sf_dir, "documents"))


_ORACLE_ZIPF = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
  FROM documents
), counts AS (
  SELECT t, count(*) AS f FROM toks WHERE t != '' GROUP BY 1
), terms AS (
  SELECT f,
    CAST(round(ln(CAST(r AS DOUBLE)) * 1e8) AS BIGINT) AS x,
    CAST(round(ln(CAST(f AS DOUBLE)) * 1e8) AS BIGINT) AS y,
    CAST(round(ln(CAST(r AS DOUBLE)) * ln(CAST(f AS DOUBLE)) * 1e8)
      AS BIGINT) AS xy,
    CAST(round(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) * 1e8)
      AS BIGINT) AS xx
  FROM (SELECT f, t,
          row_number() OVER (ORDER BY f DESC, t ASC) AS r
        FROM counts)
), agg AS (
  SELECT CAST(sum(f) AS BIGINT) AS nt, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(xy) AS BIGINT) AS sxy, CAST(sum(xx) AS BIGINT) AS sxx
  FROM terms
)
SELECT nt AS n_tokens, CAST(n AS BIGINT) AS vocab_size,
  {round_portable_duck(
      "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / 1e8) "
      "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / 1e8)")}
    AS zipf_slope
FROM agg
"""


QUERIES: dict = {
    "q_theil_sen_events": (_q_theil_sen, _ORACLE_THEIL_SEN),
    "text_zipf_documents": (_q_zipf, _ORACLE_ZIPF),
}


# --------------------------------------------------------------------------
# OLS trend + autocorrelation over the daily collapse (same scale story
# as Theil-Sen: aggregate to days first, quantized sums after)
# --------------------------------------------------------------------------

_QY = 10 ** 8   # linear-term quantizer (x·y, y)
_QYY = 10 ** 6  # squared-term quantizer (y², products of deviations)


def _daily_means(df: DataFrame, value_col: str, key: str,
                 us_col: str) -> DataFrame:
    return (
        df.select(
            F.col(key),
            F.expr(f"{us_col} DIV {US_PER_DAY}").alias("__d"),
            F.expr(f"CAST(round({value_col} * {Q}) AS BIGINT)")
            .alias("__q"),
        )
        .groupBy(key, "__d")
        .agg(F.sum("__q").alias("__s"), F.count(F.lit(1)).alias("__c"))
        .withColumn("__m", F.expr(
            f"CAST(__s AS DOUBLE) / (CAST(__c AS DOUBLE) * {float(Q)!r})"))
    )


def ols_trend_daily(df: DataFrame, value_col: str, key: str,
                    us_col: str) -> DataFrame:
    """(key, n_days, slope, intercept, r2): least-squares fit of the
    daily mean against the 0-based day index. Every cross-day sum is
    an exact BIGINT of quantized terms; the normal-equation algebra is
    one identical double expression on both engines."""
    daily = _daily_means(df, value_col, key, us_col)
    w = Window.partitionBy(key).orderBy("__d")
    t = daily.withColumn("__x", F.row_number().over(w) - F.lit(1))
    agg = t.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").cast("bigint").alias("sx"),
        F.sum(F.col("__x") * F.col("__x")).cast("bigint").alias("sxx"),
        F.sum(F.expr(f"CAST(round(__m * {_QY}) AS BIGINT)"))
        .alias("sy"),
        F.sum(F.expr(
            f"CAST(round(CAST(__x AS DOUBLE) * __m * {_QY}) AS BIGINT)"))
        .alias("sxy"),
        F.sum(F.expr(f"CAST(round(__m * __m * {_QYY}) AS BIGINT)"))
        .alias("syy"),
    )
    num = (f"(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) / {float(_QY)!r} "
           f"- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / {float(_QY)!r})")
    den_x = ("(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
             "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
    den_y = (f"(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) / {float(_QYY)!r} "
             f"- (CAST(sy AS DOUBLE) / {float(_QY)!r}) "
             f"* (CAST(sy AS DOUBLE) / {float(_QY)!r}))")
    slope = f"({num}) / ({den_x})"
    intercept = (f"(CAST(sy AS DOUBLE) / {float(_QY)!r} "
                 f"- ({slope}) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)")
    r2 = f"(({num}) * ({num})) / (({den_x}) * ({den_y}))"
    return agg.select(
        F.col(key),
        F.col("n").alias("n_days"),
        round_portable(F.expr(slope)).alias("slope"),
        round_portable(F.expr(intercept)).alias("intercept"),
        round_portable(F.expr(r2)).alias("r2"),
    )


def acf_daily(df: DataFrame, value_col: str, key: str, us_col: str,
              max_lag: int = 3) -> DataFrame:
    """(key, lag, acf): autocorrelation of the daily mean series at
    lags 1..max_lag (deviations from the exact quantized mean;
    deviation products quantized before the cross-day sum)."""
    daily = _daily_means(df, value_col, key, us_col)
    wt = Window.partitionBy(key)
    w = Window.partitionBy(key).orderBy("__d")
    mbar = (f"CAST(sum(CAST(round(__m * {_QY}) AS BIGINT)) "
            f"OVER (PARTITION BY {key}) AS DOUBLE) "
            f"/ (CAST(count(*) OVER (PARTITION BY {key}) AS DOUBLE) "
            f"* {float(_QY)!r})")
    dev = daily.withColumn("__dev", F.expr(f"__m - ({mbar})"))
    lags = [dev.withColumn("__lag", F.lit(k)).withColumn(
        "__devk", F.lag("__dev", k).over(w)) for k in range(1, max_lag + 1)]
    stacked = lags[0]
    for ldf in lags[1:]:
        stacked = stacked.unionByName(ldf)
    qprod = (f"CAST(round(__dev * __devk * {_QYY}) AS BIGINT)")
    qsq = (f"CAST(round(__dev * __dev * {_QYY}) AS BIGINT)")
    return (
        stacked.groupBy(key, "__lag")
        .agg(
            F.sum(F.expr(f"CASE WHEN __devk IS NOT NULL THEN {qprod} "
                         "END")).alias("__num"),
            F.sum(F.expr(qsq)).alias("__den"),
        )
        .select(
            F.col(key),
            F.col("__lag").alias("lag"),
            round_portable(F.expr(
                "CAST(__num AS DOUBLE) / CAST(__den AS DOUBLE)"
            )).alias("acf"),
        )
    )


def _q_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return ols_trend_daily(ev, "value", "event_type", "__us")


_DUCK_DAILY = f"""
  SELECT event_type, epoch_us(ts) // {US_PER_DAY} AS d,
         CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS DOUBLE)
           / (CAST(count(*) AS DOUBLE) * {float(Q)!r}) AS m
  FROM events GROUP BY 1, 2
"""

_OLS_NUM = (f"(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) / {float(_QY)!r} "
            f"- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / {float(_QY)!r})")
_OLS_DEN_X = ("(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
              "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
_OLS_DEN_Y = (f"(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) / {float(_QYY)!r} "
              f"- (CAST(sy AS DOUBLE) / {float(_QY)!r}) "
              f"* (CAST(sy AS DOUBLE) / {float(_QY)!r}))")
_OLS_SLOPE = f"({_OLS_NUM}) / ({_OLS_DEN_X})"

_ORACLE_OLS = f"""
WITH daily AS ({_DUCK_DAILY}), t AS (
  SELECT event_type, m,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
           - 1 AS BIGINT) AS x
  FROM daily
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(CAST(round(m * {_QY}) AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(CAST(round(CAST(x AS DOUBLE) * m * {_QY}) AS BIGINT))
           AS BIGINT) AS sxy,
         CAST(sum(CAST(round(m * m * {_QYY}) AS BIGINT)) AS BIGINT)
           AS syy
  FROM t GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
  {round_portable_duck(_OLS_SLOPE)} AS slope,
  {round_portable_duck(
      f"(CAST(sy AS DOUBLE) / {float(_QY)!r} "
      f"- ({_OLS_SLOPE}) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)")}
    AS intercept,
  {round_portable_duck(
      f"(({_OLS_NUM}) * ({_OLS_NUM})) / (({_OLS_DEN_X}) * ({_OLS_DEN_Y}))")}
    AS r2
FROM agg
"""


def _q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return acf_daily(ev, "value", "event_type", "__us")


_ORACLE_ACF = f"""
WITH daily AS ({_DUCK_DAILY}), dev AS (
  SELECT event_type, d,
         m - (CAST(sum(CAST(round(m * {_QY}) AS BIGINT))
                OVER (PARTITION BY event_type) AS DOUBLE)
              / (CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE)
                 * {float(_QY)!r})) AS dv
  FROM daily
), lagged AS (
  SELECT event_type, k.lag AS lag, dv,
         lag(dv, k.lag) OVER (PARTITION BY event_type, k.lag
                              ORDER BY d) AS dvk
  FROM dev, (SELECT unnest(range(1, 4)) AS lag) k
)
SELECT event_type, CAST(lag AS INT) AS lag,
  {round_portable_duck(
      f"CAST(sum(CASE WHEN dvk IS NOT NULL THEN "
      f"CAST(round(dv * dvk * {_QYY}) AS BIGINT) END) AS DOUBLE) "
      f"/ CAST(sum(CAST(round(dv * dv * {_QYY}) AS BIGINT)) AS DOUBLE)")}
    AS acf
FROM lagged GROUP BY 1, 2
"""


QUERIES.update({
    "q_ols_trend_events": (_q_ols, _ORACLE_OLS),
    "q_acf_events": (_q_acf, _ORACLE_ACF),
})

"""Time-series / robust statistics #6: the Mann-Kendall trend test
(the nonparametric partner of theil_sen_daily), the Huber M-estimator
of location (two unrolled IRLS steps — the robust mean that, unlike
trimmed/winsorized means, downweights rather than discards), and the
Ljung-Box portmanteau test of residual autocorrelation (closed-form
even-df p-value, same trick as mlmetrics' BH-FDR).

All three run on the bounded per-key daily-mean relation (exact
quantized rationals, so sign/equality comparisons and IRLS weights
land identically on Spark and the oracle).

Plan shapes at scale:
- Mann-Kendall pair-joins the per-key daily relation with itself —
  O(D²) per key where D is CALENDAR DAYS, independent of row volume
  (tie-corrected variance comes from a per-value count aggregate of
  the same bounded relation);
- Huber is sequential scans: median, MAD, then one conditional
  weighted aggregate per IRLS step — every weight is a closed-form
  expression of the broadcast (median, threshold) row, and the
  weighted means are exact BIGINT-quotient rationals, so iteration k
  starts from a bit-identical location on both engines;
- Ljung-Box reuses the lag-stack ACF shape (one shuffle on the key),
  with per-lag terms quantized to BIGINT before the cross-lag sum.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["mann_kendall", "huber_location", "ljung_box"]

Q = 10 ** 8
QF = float(Q)
QY = 10 ** 8
QYY = 10 ** 6
QT = 10 ** 12
US_PER_DAY = 86_400_000_000
HUBER_C = 1.345
MAD_K = 1.4826
LB_LAGS = 6


def _daily(df: DataFrame, value_col: str, key: str,
           us_col: str) -> DataFrame:
    return (
        df.select(
            F.col(key),
            F.expr(f"({us_col}) DIV {US_PER_DAY}").alias("__d"),
            F.expr(f"CAST(round({value_col} * {Q}) AS BIGINT)")
            .alias("__q"))
        .groupBy(key, "__d")
        .agg(F.expr(
            f"CAST(sum(__q) AS DOUBLE) "
            f"/ (CAST(count(*) AS DOUBLE) * {QF!r})").alias("__m"))
    )


_DUCK_DAILY = f"""
  SELECT event_type, epoch_us(ts) // {US_PER_DAY} AS d,
         CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS DOUBLE)
           / (CAST(count(*) AS DOUBLE) * {QF!r}) AS m
  FROM events GROUP BY 1, 2
"""


def mann_kendall(df: DataFrame, value_col: str, key: str,
                 us_col: str) -> DataFrame:
    """(key, n_days, s, var_s, z): Mann-Kendall monotone-trend test
    on the daily means — ``S = sum over day pairs of sign(m_j - m_i)``
    (j later), tie-corrected variance, and the continuity-corrected
    normal score. |z| > 1.96 rejects "no monotone trend" at 5%."""
    daily = _daily(df, value_col, key, us_col)
    a = daily.select(F.col(key), F.col("__d").alias("__d1"),
                     F.col("__m").alias("__m1"))
    b = daily.select(F.col(key).alias("__k2"),
                     F.col("__d").alias("__d2"),
                     F.col("__m").alias("__m2"))
    pairs = a.join(b, (F.col(key) == F.col("__k2"))
                   & (F.col("__d1") < F.col("__d2")))
    s = pairs.groupBy(key).agg(
        F.sum(F.expr(
            "CAST(sign(__m2 - __m1) AS BIGINT)")).alias("s"))
    n = daily.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy(key, "__m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
        .groupBy(key)
        .agg(F.sum(F.expr(
            "__t * (__t - 1) * (2 * __t + 5)")).alias("__tt"))
    )
    var = ("(CAST(n_days * (n_days - 1) * (2 * n_days + 5) - __tt "
           "AS DOUBLE) / 18.0)")
    z = (f"CASE WHEN {var} <= 0.0 THEN NULL "
         f"WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt({var}) "
         f"WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt({var}) "
         f"ELSE 0.0 END")
    return (
        n.join(s, key).join(ties, key)
        .select(
            F.col(key), "n_days", "s",
            round_portable(F.expr(var), 6).alias("var_s"),
            round_portable(F.expr(z), 6).alias("z"),
        )
    )


_MK_VAR = ("(CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tt "
           "AS DOUBLE) / 18.0)")

_ORACLE_MANN_KENDALL = f"""
WITH daily AS ({_DUCK_DAILY}), s AS (
  SELECT a.event_type,
    CAST(sum(CAST(sign(b.m - a.m) AS BIGINT)) AS BIGINT) AS s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
  GROUP BY 1
), n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
), ties AS (
  SELECT event_type,
    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
  FROM (SELECT event_type, m, CAST(count(*) AS BIGINT) AS t
        FROM daily GROUP BY 1, 2) g
  GROUP BY 1
)
SELECT n.event_type, n.n_days, s.s,
  {round_portable_duck(_MK_VAR, 6)} AS var_s,
  {round_portable_duck(
      f"CASE WHEN {_MK_VAR} <= 0.0 THEN NULL "
      f"WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt({_MK_VAR}) "
      f"WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt({_MK_VAR}) "
      f"ELSE 0.0 END", 6)} AS z
FROM n JOIN s ON n.event_type = s.event_type
JOIN ties ON n.event_type = ties.event_type
"""


def huber_location(df: DataFrame, value_col: str, group_col: str,
                   c: float = HUBER_C, iters: int = 2) -> DataFrame:
    """(group, n, median, mad, huber_mean): Huber M-estimator of
    location — start at the median, threshold t = c * 1.4826 * MAD
    (both portably rounded, then FROZEN), and ``iters`` IRLS steps
    ``m <- sum(w x)/sum(w)`` with w = min(1, t/|x - m|). Weighted
    sums quantize per-term to BIGINT, so each step's location is an
    exact rational — iteration k starts bit-identical everywhere.
    Degenerate groups (MAD = 0) return the median.

    Scale precondition (SCALING.md §"r08 notes"): the exact
    ``percentile()`` seeds buffer each group's values in aggregate
    memory — per-group cardinality must fit one task's heap. For
    billion-row groups use ``qsketch`` registers or
    ``quantile2.distributed_median`` for the seeds instead."""
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__x"))
    med = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        round_portable(F.expr("percentile(__x, 0.5)"), 6).alias("__med"))
    j1 = base.join(F.broadcast(med), "__g")
    mad = j1.groupBy("__g").agg(round_portable(F.expr(
        "percentile(abs(__x - __med), 0.5)"), 6).alias("__mad"))
    t = round_portable(
        F.expr(f"{c!r} * {MAD_K!r} * __mad"), 6)
    cur = (
        med.join(F.broadcast(mad), "__g")
        .withColumn("__t", t)
        .select("__g", "n", "__med", "__mad", "__t",
                F.col("__med").alias("__m"))
    )
    for _ in range(iters):
        w = ("CASE WHEN abs(__x - __m) <= __t THEN 1.0 "
             "ELSE __t / abs(__x - __m) END")
        step = (
            base.join(F.broadcast(cur), "__g")
            .groupBy("__g")
            .agg(
                F.max("n").alias("n"),
                F.max("__med").alias("__med"),
                F.max("__mad").alias("__mad"),
                F.max("__t").alias("__t"),
                F.sum(F.expr(
                    f"CAST(round(({w}) * __x * {Q}) AS BIGINT)"
                )).alias("__num"),
                F.sum(F.expr(
                    f"CAST(round(({w}) * {Q}) AS BIGINT)"
                )).alias("__den"),
            )
            .withColumn("__m", F.expr(
                "CASE WHEN __t > 0.0 THEN "
                "CAST(__num AS DOUBLE) / CAST(__den AS DOUBLE) "
                "ELSE __med END"))
            .select("__g", "n", "__med", "__mad", "__t", "__m")
        )
        cur = step
    return cur.select(
        F.col("__g").alias(group_col), "n",
        F.col("__med").alias("median"),
        F.col("__mad").alias("mad"),
        round_portable(F.col("__m"), 6).alias("huber_mean"),
    )


def _huber_oracle(c: float = HUBER_C, iters: int = 2) -> str:
    parts = [f"""base AS (
  SELECT o_orderpriority AS g, o_totalprice AS x
  FROM orders WHERE o_totalprice IS NOT NULL
), med AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    {round_portable_duck("quantile_cont(x, 0.5)", 6)} AS med
  FROM base GROUP BY 1
), mad AS (
  SELECT b.g,
    {round_portable_duck(
        "quantile_cont(abs(b.x - m.med), 0.5)", 6)} AS mad
  FROM base b JOIN med m ON b.g = m.g GROUP BY 1
), cur0 AS (
  SELECT med.g, med.n, med.med, mad.mad,
    {round_portable_duck(f"{c!r} * {MAD_K!r} * mad.mad", 6)} AS t,
    med.med AS m
  FROM med JOIN mad ON med.g = mad.g
)"""]
    for i in range(1, iters + 1):
        w = ("CASE WHEN abs(b.x - c.m) <= c.t THEN 1.0 "
             "ELSE c.t / abs(b.x - c.m) END")
        parts.append(f"""cur{i} AS (
  SELECT c.g, max(c.n) AS n, max(c.med) AS med, max(c.mad) AS mad,
    max(c.t) AS t,
    CASE WHEN max(c.t) > 0.0 THEN
      CAST(CAST(sum(CAST(round(({w}) * b.x * {Q}) AS BIGINT))
        AS BIGINT) AS DOUBLE)
      / CAST(CAST(sum(CAST(round(({w}) * {Q}) AS BIGINT))
        AS BIGINT) AS DOUBLE)
    ELSE max(c.med) END AS m
  FROM base b JOIN cur{i - 1} c ON b.g = c.g
  GROUP BY 1
)""")
    return f"""
WITH {', '.join(parts)}
SELECT g AS o_orderpriority, n, med AS median, mad,
  {round_portable_duck("m", 6)} AS huber_mean
FROM cur{iters}
"""


def ljung_box(df: DataFrame, value_col: str, key: str, us_col: str,
              h: int = LB_LAGS) -> DataFrame:
    """(key, n_days, q_stat, p_value): Ljung-Box portmanteau test at
    lags 1..h over the daily-mean series — ``Q = n(n+2) sum_k
    rho_k^2/(n-k)`` with per-lag terms quantized before the cross-lag
    sum; p from the exact even-df (df = h) chi-square survival
    closed form. Keys with n <= h are dropped (undefined test)."""
    daily = _daily(df, value_col, key, us_col)
    mbar = (f"CAST(sum(CAST(round(__m * {QY}) AS BIGINT)) "
            f"OVER (PARTITION BY {key}) AS DOUBLE) "
            f"/ (CAST(count(*) OVER (PARTITION BY {key}) AS DOUBLE) "
            f"* {float(QY)!r})")
    w = Window.partitionBy(key).orderBy("__d")
    dev = daily.withColumn("__dev", F.expr(f"__m - ({mbar})"))
    lags = [dev.withColumn("__lag", F.lit(k)).withColumn(
        "__devk", F.lag("__dev", k).over(w)) for k in range(1, h + 1)]
    stacked = lags[0]
    for ldf in lags[1:]:
        stacked = stacked.unionByName(ldf)
    per_lag = (
        stacked.groupBy(key, "__lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.sum(F.expr(
                f"CASE WHEN __devk IS NOT NULL THEN "
                f"CAST(round(__dev * __devk * {QYY}) AS BIGINT) END"
            )).alias("__num"),
            F.sum(F.expr(
                f"CAST(round(__dev * __dev * {QYY}) AS BIGINT)"
            )).alias("__den"),
        )
        .withColumn("__rho", F.expr(
            "CAST(__num AS DOUBLE) / CAST(__den AS DOUBLE)"))
    )
    agg = per_lag.groupBy(key).agg(
        F.max("__n").alias("n_days"),
        F.sum(F.expr(
            f"CAST(round(__rho * __rho "
            f"/ CAST(__n - __lag AS DOUBLE) * {QT}) AS BIGINT)"
        )).alias("__sq"),
    ).filter(F.col("n_days") > h)
    qstat = (f"(CAST(n_days AS DOUBLE) * CAST(n_days + 2 AS DOUBLE) "
             f"* CAST(__sq AS DOUBLE) / {float(QT)!r})")
    m = h // 2
    terms = " + ".join(
        f"pow(({qstat}) / 2.0, {j}) / {float(math.factorial(j))!r}"
        for j in range(m))
    p = f"(exp(-({qstat}) / 2.0) * ({terms}))"
    return agg.select(
        F.col(key), "n_days",
        round_portable(F.expr(qstat), 6).alias("q_stat"),
        round_portable(F.expr(p), 6).alias("p_value"),
    )


def _lb_oracle(h: int = LB_LAGS) -> str:
    lag_sel = " UNION ALL ".join(
        f"SELECT event_type, d, dev, {k} AS lag, "
        f"lag(dev, {k}) OVER (PARTITION BY event_type ORDER BY d) "
        f"AS devk FROM dev" for k in range(1, h + 1))
    qstat = (f"(CAST(n_days AS DOUBLE) * CAST(n_days + 2 AS DOUBLE) "
             f"* CAST(sq AS DOUBLE) / {float(QT)!r})")
    m = h // 2
    terms = " + ".join(
        f"pow(({qstat}) / 2.0, {j}) / {float(math.factorial(j))!r}"
        for j in range(m))
    p = f"(exp(-({qstat}) / 2.0) * ({terms}))"
    return f"""
WITH daily AS ({_DUCK_DAILY}), dev AS (
  SELECT event_type, d,
    m - (CAST(sum(CAST(round(m * {QY}) AS BIGINT))
           OVER (PARTITION BY event_type) AS DOUBLE)
         / (CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE)
            * {float(QY)!r})) AS dev
  FROM daily
), stacked AS (
  {lag_sel}
), per_lag AS (
  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN devk IS NOT NULL THEN
      CAST(round(dev * devk * {QYY}) AS BIGINT) END) AS BIGINT)
      AS num,
    CAST(sum(CAST(round(dev * dev * {QYY}) AS BIGINT)) AS BIGINT)
      AS den
  FROM stacked GROUP BY 1, 2
), agg AS (
  SELECT event_type, max(n) AS n_days,
    CAST(sum(CAST(round((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
      * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
      / CAST(n - lag AS DOUBLE) * {QT}) AS BIGINT)) AS BIGINT) AS sq
  FROM per_lag GROUP BY 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
  {round_portable_duck(qstat, 6)} AS q_stat,
  {round_portable_duck(p, 6)} AS p_value
FROM agg WHERE n_days > {h}
"""


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return mann_kendall(ev, "value", "event_type", "__us")


def _q_huber(spark: SparkSession, sf_dir: str) -> DataFrame:
    return huber_location(load(spark, sf_dir, "orders"),
                          "o_totalprice", "o_orderpriority")


def _q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return ljung_box(ev, "value", "event_type", "__us")


QUERIES: dict = {
    "q_mann_kendall_events": (_q_mann_kendall, _ORACLE_MANN_KENDALL),
    "q_huber_mean_orders": (_q_huber, _huber_oracle()),
    "q_ljung_box_events": (_q_ljung_box, _lb_oracle()),
}


# --------------------------------------------------------------------------
# Seasonal strength: day-of-week eta-squared over the daily means
# --------------------------------------------------------------------------


def seasonal_strength(df: DataFrame, value_col: str, key: str,
                      us_col: str) -> DataFrame:
    """(key, n_days, eta2): share of daily-mean variance explained by
    the day-of-week — the seasonality EFFECT SIZE (the dow ANOVA's F
    says "significant", eta² says "how much"). Weekday buckets are
    epoch-day mod 7, so no calendar translation enters the compare;
    both sums of squares come from quantized BIGINTs."""
    daily = _daily(df, value_col, key, us_col).withColumn(
        "__dow", F.expr("__d % 7"))
    qm = f"CAST(round(__m * {Q}) AS BIGINT)"
    qmm = f"CAST(round(__m * __m * {QYY}) AS BIGINT)"
    per_dow = daily.groupBy(key, "__dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nd"),
        F.sum(F.expr(qm)).alias("__sd"),
    )
    per_key = daily.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.expr(qm)).alias("__s"),
        F.sum(F.expr(qmm)).alias("__ss"),
    )
    # SS_between = sum_d nd*(md - mbar)^2 = sum_d sd^2/nd/Q^2 - n*mbar^2
    bet = per_dow.groupBy(key).agg(
        F.sum(F.expr(
            f"CAST(round(CAST(__sd AS DOUBLE) "
            f"* CAST(__sd AS DOUBLE) / CAST(__nd AS DOUBLE) "
            f"/ {float(Q)!r} / {float(Q)!r} * {QYY}) AS BIGINT)"
        )).alias("__bq"))
    mbar = f"(CAST(__s AS DOUBLE) / (CAST(n_days AS DOUBLE) * {float(Q)!r}))"
    ss_tot = (f"(CAST(__ss AS DOUBLE) / {float(QYY)!r} "
              f"- CAST(n_days AS DOUBLE) * {mbar} * {mbar})")
    ss_bet = (f"(CAST(__bq AS DOUBLE) / {float(QYY)!r} "
              f"- CAST(n_days AS DOUBLE) * {mbar} * {mbar})")
    return (
        per_key.join(bet, key)
        .select(
            F.col(key), "n_days",
            round_portable(F.expr(
                f"CASE WHEN {ss_tot} > 0.0 THEN ({ss_bet}) / ({ss_tot}) "
                f"ELSE 0.0 END"), 6).alias("eta2"),
        )
    )


def _q_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return seasonal_strength(ev, "value", "event_type", "__us")


_SS_MBAR = (f"(CAST(s AS DOUBLE) / (CAST(n_days AS DOUBLE) "
            f"* {float(Q)!r}))")
_SS_TOT = (f"(CAST(ss AS DOUBLE) / {float(QYY)!r} "
           f"- CAST(n_days AS DOUBLE) * {_SS_MBAR} * {_SS_MBAR})")
_SS_BET = (f"(CAST(bq AS DOUBLE) / {float(QYY)!r} "
           f"- CAST(n_days AS DOUBLE) * {_SS_MBAR} * {_SS_MBAR})")

_ORACLE_SEASONAL_STRENGTH = f"""
WITH daily AS ({_DUCK_DAILY}), dd AS (
  SELECT event_type, d % 7 AS dow, m,
    CAST(round(m * {Q}) AS BIGINT) AS qm,
    CAST(round(m * m * {QYY}) AS BIGINT) AS qmm
  FROM daily
), per_dow AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS nd,
    CAST(sum(qm) AS BIGINT) AS sd
  FROM dd GROUP BY 1, 2
), per_key AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(qm) AS BIGINT) AS s,
    CAST(sum(qmm) AS BIGINT) AS ss
  FROM dd GROUP BY 1
), bet AS (
  SELECT event_type,
    CAST(sum(CAST(round(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
      / CAST(nd AS DOUBLE) / {float(Q)!r} / {float(Q)!r} * {QYY})
      AS BIGINT)) AS BIGINT) AS bq
  FROM per_dow GROUP BY 1
)
SELECT k.event_type, k.n_days,
  {round_portable_duck(
      f"CASE WHEN {_SS_TOT} > 0.0 THEN ({_SS_BET}) / ({_SS_TOT}) "
      f"ELSE 0.0 END", 6)} AS eta2
FROM per_key k JOIN bet b ON k.event_type = b.event_type
"""


QUERIES["q_seasonal_strength_events"] = (
    _q_seasonal_strength, _ORACLE_SEASONAL_STRENGTH)

"""Time-series statistics #3: mean-reversion and state-space
estimators — AR(1)/Ornstein-Uhlenbeck half-life, the Dickey-Fuller
unit-root t-statistic, a 1-D local-level Kalman filter, RiskMetrics
EWMA covariance/correlation, and a chi-square distribution-drift
test (the batch anchor for the streaming drift monitor).

Determinism scheme (house rules): every data reduction is an exact
quantized-BIGINT sum (order-independent under any partial-agg
schedule); the closed-form OLS/variance algebra then runs in doubles
with the SAME expression tree on both engines. The two sequential
recursions (Kalman, EWMA) are single-pass Arrow kernels on the Spark
side and ``list_reduce`` prefix folds in the DuckDB oracles, with
operation-for-operation identical float arithmetic — the same
contract the EMA/RSI indicator kernels are held to
(``plans/indicator_queries.py``).

Plan shapes at scale: AR(1)/ADF are one window-lag pass plus one
hash aggregate per key (map-side combinable). The Kalman/EWMA
kernels carry O(1) state per series and stream through each key's
rows once — per-key work, no global sort. The chi-square drift test
reuses ``stats2.chi2_independence`` (margin grid + single-row
reduction).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .stats2 import _CHI2_VAL, chi2_independence

__all__ = ["ar1_halflife", "adf_test", "kalman_level", "ewma_cov",
           "KALMAN_Q", "KALMAN_R", "KALMAN_P0", "EWMA_LAMBDA"]

Q = 10 ** 8
Q2 = 10 ** 6
US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000

KALMAN_Q = 0.05   # state (level) noise variance
KALMAN_R = 5.0    # observation noise variance
KALMAN_P0 = 1.0   # prior level variance
EWMA_LAMBDA = 0.94


# --------------------------------------------------------------------------
# Shared lag-pair sums
# --------------------------------------------------------------------------


def _pair_sums(df: DataFrame, value_col: str, keys: list[str],
               order: list[str], y_is_diff: bool) -> DataFrame:
    """Per key: exact quantized sums over (x = lag(v), y = v or
    v - lag(v)) pairs — the sufficient statistics for the AR(1) and
    Dickey-Fuller regressions."""
    okeys = ", ".join(keys)
    oorder = ", ".join(order)
    part = f"PARTITION BY {okeys} ORDER BY {oorder}"
    y = (f"({value_col} - lag({value_col}) OVER ({part}))"
         if y_is_diff else f"{value_col}")
    staged = (
        df.withColumn("__x", F.expr(
            f"lag({value_col}) OVER ({part})"))
        .withColumn("__y", F.expr(y))
        .filter(F.col("__x").isNotNull())
    )
    return staged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr(f"CAST(round(__x * {Q}) AS BIGINT)")).alias("__sx"),
        F.sum(F.expr(f"CAST(round(__y * {Q}) AS BIGINT)")).alias("__sy"),
        F.sum(F.expr(
            f"CAST(round(__x * __x * {Q2}) AS BIGINT)")).alias("__sxx"),
        F.sum(F.expr(
            f"CAST(round(__x * __y * {Q2}) AS BIGINT)")).alias("__sxy"),
        F.sum(F.expr(
            f"CAST(round(__y * __y * {Q2}) AS BIGINT)")).alias("__syy"),
    )


_MX = f"(CAST(__sx AS DOUBLE) / (CAST(__n AS DOUBLE) * {float(Q)!r}))"
_MY = f"(CAST(__sy AS DOUBLE) / (CAST(__n AS DOUBLE) * {float(Q)!r}))"
# Centered cross-products from the exact sums (doubles; one tree).
_SCXX = (f"(CAST(__sxx AS DOUBLE) / {float(Q2)!r} "
         f"- CAST(__n AS DOUBLE) * {_MX} * {_MX})")
_SCXY = (f"(CAST(__sxy AS DOUBLE) / {float(Q2)!r} "
         f"- CAST(__n AS DOUBLE) * {_MX} * {_MY})")
_SCYY = (f"(CAST(__syy AS DOUBLE) / {float(Q2)!r} "
         f"- CAST(__n AS DOUBLE) * {_MY} * {_MY})")

_PAIR_SUMS_DUCK = f"""
  SELECT {{keys}}, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(x * {Q}) AS BIGINT)) AS BIGINT) AS sx,
    CAST(sum(CAST(round(y * {Q}) AS BIGINT)) AS BIGINT) AS sy,
    CAST(sum(CAST(round(x * x * {Q2}) AS BIGINT)) AS BIGINT) AS sxx,
    CAST(sum(CAST(round(x * y * {Q2}) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(sum(CAST(round(y * y * {Q2}) AS BIGINT)) AS BIGINT) AS syy
  FROM pairs WHERE x IS NOT NULL GROUP BY {{keys}}
"""

_MX_D = f"(CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * {float(Q)!r}))"
_MY_D = f"(CAST(sy AS DOUBLE) / (CAST(n AS DOUBLE) * {float(Q)!r}))"
_SCXX_D = (f"(CAST(sxx AS DOUBLE) / {float(Q2)!r} "
           f"- CAST(n AS DOUBLE) * {_MX_D} * {_MX_D})")
_SCXY_D = (f"(CAST(sxy AS DOUBLE) / {float(Q2)!r} "
           f"- CAST(n AS DOUBLE) * {_MX_D} * {_MY_D})")
_SCYY_D = (f"(CAST(syy AS DOUBLE) / {float(Q2)!r} "
           f"- CAST(n AS DOUBLE) * {_MY_D} * {_MY_D})")


# --------------------------------------------------------------------------
# AR(1) / OU half-life
# --------------------------------------------------------------------------


def ar1_halflife(df: DataFrame, value_col: str, keys: list[str],
                 order: list[str]) -> DataFrame:
    """(keys..., n_pairs, phi, halflife): OLS slope of v_t on
    v_{t-1} (with intercept) and the mean-reversion half-life
    ``-ln 2 / ln phi`` (NULL unless 0 < phi < 1 — a non-reverting or
    oscillating series has no half-life)."""
    sums = _pair_sums(df, value_col, keys, order, y_is_diff=False)
    phi = f"({_SCXY} / {_SCXX})"
    return sums.select(
        *keys,
        F.col("__n").alias("n_pairs"),
        round_portable(F.expr(phi), 6).alias("phi"),
        round_portable(F.expr(
            f"CASE WHEN {phi} > 0.0 AND {phi} < 1.0 "
            f"THEN -ln(2.0) / ln({phi}) END"), 6).alias("halflife"),
    )


def _q_ar1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ar1_halflife(load(spark, sf_dir, "events"), "value",
                        ["event_type"], ["ts", "event_id"])


_ORACLE_AR1 = f"""
WITH pairs AS (
  SELECT event_type,
    lag(value) OVER (PARTITION BY event_type
                     ORDER BY ts, event_id) AS x,
    value AS y
  FROM events
), sums AS (
{_PAIR_SUMS_DUCK.format(keys="event_type")}
)
SELECT event_type, n AS n_pairs,
  {round_portable_duck(f"({_SCXY_D} / {_SCXX_D})", 6)} AS phi,
  {round_portable_duck(
      f"CASE WHEN ({_SCXY_D} / {_SCXX_D}) > 0.0 "
      f"AND ({_SCXY_D} / {_SCXX_D}) < 1.0 "
      f"THEN -ln(2.0) / ln(({_SCXY_D} / {_SCXX_D})) END", 6)}
    AS halflife
FROM sums
"""


# --------------------------------------------------------------------------
# Dickey-Fuller unit-root t-statistic
# --------------------------------------------------------------------------


def adf_test(df: DataFrame, value_col: str, keys: list[str],
             order: list[str]) -> DataFrame:
    """(keys..., n_pairs, beta, t_stat): Dickey-Fuller regression
    ``diff(v) = a + beta * v_{t-1}``, t-stat of beta (no lag
    augmentation). Strongly negative t rejects the unit root; compare
    to the DF critical values (-2.86 at 5%)."""
    sums = _pair_sums(df, value_col, keys, order, y_is_diff=True)
    beta = f"({_SCXY} / {_SCXX})"
    s2 = (f"(({_SCYY} - {beta} * {_SCXY}) "
          f"/ CAST(__n - 2 AS DOUBLE))")
    return sums.filter(F.col("__n") > 2).select(
        *keys,
        F.col("__n").alias("n_pairs"),
        round_portable(F.expr(beta), 6).alias("beta"),
        round_portable(F.expr(
            f"{beta} / sqrt({s2} / {_SCXX})"), 6).alias("t_stat"),
    )


def _q_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return adf_test(load(spark, sf_dir, "events"), "value",
                    ["event_type"], ["ts", "event_id"])


_DUCK_BETA = f"({_SCXY_D} / {_SCXX_D})"
_DUCK_S2 = (f"(({_SCYY_D} - {_DUCK_BETA} * {_SCXY_D}) "
            f"/ CAST(n - 2 AS DOUBLE))")

_ORACLE_ADF = f"""
WITH pairs AS (
  SELECT event_type,
    lag(value) OVER (PARTITION BY event_type
                     ORDER BY ts, event_id) AS x,
    (value - lag(value) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id)) AS y
  FROM events
), sums AS (
{_PAIR_SUMS_DUCK.format(keys="event_type")}
)
SELECT event_type, n AS n_pairs,
  {round_portable_duck(_DUCK_BETA, 6)} AS beta,
  {round_portable_duck(
      f"{_DUCK_BETA} / sqrt({_DUCK_S2} / {_SCXX_D})", 6)} AS t_stat
FROM sums WHERE n > 2
"""


# --------------------------------------------------------------------------
# 1-D local-level Kalman filter
# --------------------------------------------------------------------------


def _kalman_walk(vals, q: float, r: float, p0: float):
    """The fold: k = (p+q)/(p+q+r); l += k*(v-l); p = (1-k)*(p+q).
    Seeded from the first observation (l = v_1, p = p0) — the same
    tree the oracle's list_reduce evaluates."""
    out = []
    l = p = None
    for v in vals:
        v = float(v)
        if l is None:
            l, p = v, p0
        else:
            k = (p + q) / (p + q + r)
            l = l + k * (v - l)
            p = (1.0 - k) * (p + q)
        out.append(l)
    return out


def kalman_level(df: DataFrame, value_col: str, key_col: str,
                 order_cols: list[str], q: float = KALMAN_Q,
                 r: float = KALMAN_R, p0: float = KALMAN_P0,
                 out_col: str = "level") -> DataFrame:
    """Adds ``out_col``: the filtered local-level state per key —
    the optimal (least-squares) online smoother for a level + noise
    model, the adaptive-gain generalization of EMA. One Arrow-batched
    sequential pass per key; O(1) state."""
    fields = ", ".join(
        f"{c} {t}" for c, t in df.select(
            key_col, *order_cols, value_col).dtypes)
    schema = f"{fields}, {out_col} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort",
                              ignore_index=True)
        pdf[out_col] = _kalman_walk(
            pdf[value_col].to_numpy(dtype="float64"), q, r, p0)
        return pdf

    return (
        df.select(key_col, *order_cols, value_col)
        .groupBy(key_col).applyInPandas(fn, schema=schema)
    )


def _q_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = kalman_level(load(spark, sf_dir, "events"), "value",
                       "event_type", ["ts", "event_id"])
    return out.select(
        "event_type", "event_id",
        round_portable(F.col("level"), 6).alias("level"))


_KAL_K = f"((acc.l2 + {KALMAN_Q!r}) / (acc.l2 + {KALMAN_Q!r} + {KALMAN_R!r}))"
_ORACLE_KALMAN = f"""
WITH base AS (
  SELECT event_type, event_id,
    list(struct_pack(l1 := value, l2 := CAST({KALMAN_P0!r} AS DOUBLE)))
      OVER (PARTITION BY event_type ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
  FROM events
)
SELECT event_type, event_id,
  {round_portable_duck(
      f"list_reduce(pfx, (acc, x) -> struct_pack("
      f"l1 := acc.l1 + {_KAL_K} * (x.l1 - acc.l1), "
      f"l2 := (1.0 - {_KAL_K}) * (acc.l2 + {KALMAN_Q!r}))).l1", 6)}
    AS level
FROM base
"""


# --------------------------------------------------------------------------
# EWMA covariance / correlation (RiskMetrics)
# --------------------------------------------------------------------------


def ewma_cov(df: DataFrame, us_col: str, value_col: str,
             series_expr: str, series_a: str, series_b: str,
             lam: float = EWMA_LAMBDA) -> DataFrame:
    """(hour, ewma_cov, ewma_corr) over the hours where BOTH series
    exist: RiskMetrics recursions ``m_t = lam*m_{t-1} +
    (1-lam)*z_t`` on demeaned hourly-mean products (cov) and squares
    (the two variances), corr = cov/sqrt(vx*vy). Demeaning uses the
    full-sample means from exact quantized sums so both engines
    subtract the identical constant."""

    def hourly(side: str):
        return (
            df.filter(F.expr(series_expr) == F.lit(side))
            .selectExpr(f"({us_col}) DIV {US_PER_HOUR} AS __h",
                        f"{value_col} AS __v")
            .groupBy("__h")
            .agg(F.count(F.lit(1)).alias("__c"),
                 F.sum(F.expr(
                     f"CAST(round(__v * {Q}) AS BIGINT)")).alias("__s"))
            .selectExpr(
                "__h",
                f"CAST(__s AS DOUBLE) / (CAST(__c AS DOUBLE) "
                f"* {float(Q)!r}) AS __m")
        )

    paired = (
        hourly(series_a).withColumnRenamed("__m", "__ma")
        .join(hourly(series_b).withColumnRenamed("__m", "__mb"), "__h")
    )
    means = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr(
            f"CAST(round(__ma * {Q}) AS BIGINT)")).alias("__sa"),
        F.sum(F.expr(
            f"CAST(round(__mb * {Q}) AS BIGINT)")).alias("__sb"),
    ).selectExpr(
        f"CAST(__sa AS DOUBLE) / (CAST(__n AS DOUBLE) * {float(Q)!r}) "
        "AS __mua",
        f"CAST(__sb AS DOUBLE) / (CAST(__n AS DOUBLE) * {float(Q)!r}) "
        "AS __mub",
    )
    staged = (
        paired.crossJoin(F.broadcast(means))
        .selectExpr(
            "__h",
            "(__ma - __mua) * (__mb - __mub) AS __z",
            "(__ma - __mua) * (__ma - __mua) AS __u",
            "(__mb - __mub) * (__mb - __mub) AS __w",
        )
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__h", kind="mergesort",
                              ignore_index=True)
        cov = vx = vy = None
        covs, vxs, vys = [], [], []
        for z, u, w in zip(pdf["__z"], pdf["__u"], pdf["__w"]):
            z, u, w = float(z), float(u), float(w)
            if cov is None:
                cov, vx, vy = z, u, w
            else:
                cov = lam * cov + (1.0 - lam) * z
                vx = lam * vx + (1.0 - lam) * u
                vy = lam * vy + (1.0 - lam) * w
            covs.append(cov)
            vxs.append(vx)
            vys.append(vy)
        return pd.DataFrame(
            {"__h": pdf["__h"], "__cov": covs, "__vx": vxs,
             "__vy": vys})

    folded = (
        staged.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(
            fn,
            schema="__h bigint, __cov double, __vx double, __vy double")
    )
    return folded.select(
        F.col("__h").alias("hour"),
        round_portable(F.col("__cov"), 6).alias("ewma_cov"),
        round_portable(F.expr(
            "CASE WHEN __vx > 0.0 AND __vy > 0.0 "
            "THEN __cov / sqrt(__vx * __vy) END"), 6
        ).alias("ewma_corr"),
    )


def _q_ewma_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return ewma_cov(ev, "__us", "value", "event_type",
                    "click", "view")


_EWMA_FOLD = ("list_reduce({lst}, (acc, v) -> "
              f"{EWMA_LAMBDA!r}*acc + (1.0 - {EWMA_LAMBDA!r})*v)")

_ORACLE_EWMA_COV = f"""
WITH ha AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS h,
    CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {float(Q)!r}) AS ma
  FROM events WHERE event_type = 'click' GROUP BY 1
), hb AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS h,
    CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {float(Q)!r}) AS mb
  FROM events WHERE event_type = 'view' GROUP BY 1
), paired AS (
  SELECT ha.h, ha.ma, hb.mb FROM ha JOIN hb ON ha.h = hb.h
), means AS (
  SELECT
    CAST(sum(CAST(round(ma * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {float(Q)!r}) AS mua,
    CAST(sum(CAST(round(mb * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {float(Q)!r}) AS mub
  FROM paired
), staged AS (
  SELECT h,
    (ma - mua) * (mb - mub) AS z,
    (ma - mua) * (ma - mua) AS u,
    (mb - mub) * (mb - mub) AS w
  FROM paired, means
), lists AS (
  SELECT h,
    list(z) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS zl,
    list(u) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS ul,
    list(w) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS wl
  FROM staged
)
SELECT CAST(h AS BIGINT) AS hour,
  {round_portable_duck(_EWMA_FOLD.format(lst="zl"), 6)} AS ewma_cov,
  {round_portable_duck(
      "CASE WHEN " + _EWMA_FOLD.format(lst="ul") + " > 0.0 AND "
      + _EWMA_FOLD.format(lst="wl") + " > 0.0 THEN "
      + _EWMA_FOLD.format(lst="zl") + " / sqrt("
      + _EWMA_FOLD.format(lst="ul") + " * "
      + _EWMA_FOLD.format(lst="wl") + ") END", 6)} AS ewma_corr
FROM lists
"""


# --------------------------------------------------------------------------
# Chi-square drift (batch anchor of the streaming drift monitor)
# --------------------------------------------------------------------------


def _q_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even-epoch-day vs odd-epoch-day event_type mix, tested for
    homogeneity — the 2 x K drift chi-square whose windowed streaming
    twin lives in streaming/drift.py."""
    ev = load(spark, sf_dir, "events")
    return chi2_independence(
        ev, f"((ts DIV 1000) DIV {US_PER_DAY}) % 2", "event_type")


_ORACLE_CHI2_DRIFT = f"""
WITH obs AS (
  SELECT (epoch_us(ts) // {US_PER_DAY}) % 2 AS x,
         event_type AS y, count(*) AS nxy
  FROM events GROUP BY 1, 2
), mx AS (SELECT x, sum(nxy) AS nx FROM obs GROUP BY 1),
my AS (SELECT y, sum(nxy) AS ny FROM obs GROUP BY 1),
grid AS (
  SELECT mx.x, my.y, mx.nx, my.ny, COALESCE(obs.nxy, 0) AS o,
         sum(COALESCE(obs.nxy, 0)) OVER () AS nt
  FROM mx CROSS JOIN my
  LEFT JOIN obs ON obs.x = mx.x AND obs.y = my.y
), red AS (
  SELECT CAST(max(nt) AS BIGINT) AS n,
         CAST(count(DISTINCT x) AS BIGINT) AS r,
         CAST(count(DISTINCT y) AS BIGINT) AS c,
         {_CHI2_VAL} AS chi2v
  FROM grid
)
SELECT n, r, c, CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
  {round_portable_duck("chi2v", 6)} AS chi2,
  {round_portable_duck(
      "sqrt(chi2v / (CAST(n AS DOUBLE) "
      "* CAST(least(r - 1, c - 1) AS DOUBLE)))", 6)} AS cramers_v
FROM red
"""


QUERIES: dict = {
    "q_ar1_halflife_events": (_q_ar1, _ORACLE_AR1),
    "q_adf_events": (_q_adf, _ORACLE_ADF),
    "q_kalman_level_events": (_q_kalman, _ORACLE_KALMAN),
    "q_ewma_cov_events": (_q_ewma_cov, _ORACLE_EWMA_COV),
    "q_chi2_drift_events": (_q_chi2_drift, _ORACLE_CHI2_DRIFT),
}

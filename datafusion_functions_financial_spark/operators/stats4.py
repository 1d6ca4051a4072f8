"""Time-series statistics #4: pairs-trading and tail-risk
econometrics — Engle-Granger cointegration (hedge-ratio OLS + ADF on
the residual), lag-1 Granger causality (two-regressor OLS F-test),
the Hill tail-index estimator, Gumbel block-maxima fitting (method
of moments), and the two-asset minimum-variance portfolio.

Everything reduces to exact quantized-BIGINT sufficient statistics
(order-free under any partial-agg schedule) followed by one shared
closed-form double expression tree per estimator — the stats3
convention; rank-based pieces (Hill's top-k) use deterministic
tie-broken windows.

Plan shapes at scale: the hourly pairing is two tiny per-hour hash
aggregates joined on the hour; every estimator then reduces to a
one-row (or per-key) aggregate of quantized products — no data-sized
joins, sorts, or windows except Hill's per-key top-k rank (bounded
by k after the window filter; at 100 TB pre-filter with a per-key
approximate threshold so the sort touches ~k rows, the k-per-group
trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["hourly_pair", "engle_granger", "granger_lag1",
           "hill_tail", "gumbel_block_maxima", "min_variance_pair"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)
US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
HILL_K = 100
EULER_GAMMA = 0.5772156649015329


def hourly_pair(df: DataFrame, us_col: str, value_col: str,
                series_expr: str, series_a: str,
                series_b: str) -> DataFrame:
    """(__h, __x, __y): exact-quantized hourly means of the two
    series over the hours where BOTH exist (the ewma_cov pairing)."""

    def hourly(side: str, out: str):
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
                f"* {QF!r}) AS {out}")
        )

    return hourly(series_a, "__x").join(hourly(series_b, "__y"), "__h")


_HOURLY_PAIR_DUCK = f"""
ha AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS h,
    CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {QF!r}) AS x
  FROM events WHERE event_type = '{{a}}' GROUP BY 1
), hb AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS h,
    CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS DOUBLE)
      / (CAST(count(*) AS DOUBLE) * {QF!r}) AS y
  FROM events WHERE event_type = '{{b}}' GROUP BY 1
), paired AS (
  SELECT ha.h, ha.x, hb.y FROM ha JOIN hb ON ha.h = hb.h
)"""


def _xy_sums(paired: DataFrame) -> DataFrame:
    return paired.agg(
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


_XY_SUMS_DUCK = f"""
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(x * {Q}) AS BIGINT)) AS BIGINT) AS sx,
    CAST(sum(CAST(round(y * {Q}) AS BIGINT)) AS BIGINT) AS sy,
    CAST(sum(CAST(round(x * x * {Q2}) AS BIGINT)) AS BIGINT) AS sxx,
    CAST(sum(CAST(round(x * y * {Q2}) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(sum(CAST(round(y * y * {Q2}) AS BIGINT)) AS BIGINT) AS syy
  FROM paired
"""

# Shared closed forms over the (n, sx, sy, sxx, sxy, syy) relation —
# one textual tree, instantiated for both engines via {p} prefix.
_MX = f"(CAST({{p}}sx AS DOUBLE) / (CAST({{p}}n AS DOUBLE) * {QF!r}))"
_MY = f"(CAST({{p}}sy AS DOUBLE) / (CAST({{p}}n AS DOUBLE) * {QF!r}))"
_SCXX = (f"(CAST({{p}}sxx AS DOUBLE) / {Q2F!r} "
         f"- CAST({{p}}n AS DOUBLE) * {_MX} * {_MX})")
_SCXY = (f"(CAST({{p}}sxy AS DOUBLE) / {Q2F!r} "
         f"- CAST({{p}}n AS DOUBLE) * {_MX} * {_MY})")
_SCYY = (f"(CAST({{p}}syy AS DOUBLE) / {Q2F!r} "
         f"- CAST({{p}}n AS DOUBLE) * {_MY} * {_MY})")
_BETA = f"({_SCXY} / {_SCXX})"
_ALPHA = f"({_MY} - {_BETA} * {_MX})"


def engle_granger(df: DataFrame, us_col: str, value_col: str,
                  series_expr: str, series_a: str,
                  series_b: str) -> DataFrame:
    """One row (n_hours, beta, alpha, adf_t): Engle-Granger step 1
    (OLS ``y = alpha + beta x`` on the paired hourly means) and
    step 2 (Dickey-Fuller t-stat of the residual series, intercept
    included). ``adf_t`` well below the EG critical value (~-3.34 at
    5%) rejects "no cointegration"."""
    paired = hourly_pair(df, us_col, value_col, series_expr,
                         series_a, series_b)
    sums = _xy_sums(paired)
    beta, alpha = _BETA.format(p="__"), _ALPHA.format(p="__")
    fit = sums.select(
        F.col("__n").alias("__nh"),
        F.expr(beta).alias("__b"),
        F.expr(alpha).alias("__a"),
    )
    resid = (
        paired.crossJoin(F.broadcast(fit))
        .selectExpr("__h", "(__y - (__a + __b * __x)) AS __e",
                    "__nh", "__b", "__a")
    )
    # DF regression on the residual: x = lag(e), y = e - lag(e).
    pairs = (
        resid.withColumn("__xl", F.expr(
            "lag(__e) OVER (ORDER BY __h)"))
        .filter(F.col("__xl").isNotNull())
        .selectExpr("__xl AS __x", "(__e - __xl) AS __y",
                    "__nh", "__b", "__a")
    )
    s2 = _xy_sums(pairs.select("__x", "__y"))
    b2 = _BETA.format(p="__")
    scxx2 = _SCXX.format(p="__")
    scxy2 = _SCXY.format(p="__")
    scyy2 = _SCYY.format(p="__")
    sse = f"(({scyy2}) - ({b2}) * ({scxy2}))"
    t = (f"(({b2}) / sqrt(({sse}) / CAST(__n - 2 AS DOUBLE) "
         f"/ ({scxx2})))")
    return (
        s2.crossJoin(F.broadcast(fit))
        .select(
            F.col("__nh").alias("n_hours"),
            round_portable(F.col("__b"), 6).alias("beta"),
            round_portable(F.col("__a"), 6).alias("alpha"),
            round_portable(F.expr(t), 6).alias("adf_t"),
        )
    )


def _q_engle_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return engle_granger(ev, "__us", "value", "event_type",
                         "click", "view")


def _eg_oracle() -> str:
    beta, alpha = _BETA.format(p=""), _ALPHA.format(p="")
    b2 = _BETA.format(p="r.")
    scxx2 = _SCXX.format(p="r.")
    scxy2 = _SCXY.format(p="r.")
    scyy2 = _SCYY.format(p="r.")
    sse = f"(({scyy2}) - ({b2}) * ({scxy2}))"
    t = (f"(({b2}) / sqrt(({sse}) / CAST(r.n - 2 AS DOUBLE) "
         f"/ ({scxx2})))")
    return f"""
WITH {_HOURLY_PAIR_DUCK.format(a="click", b="view")}
, sums AS (
{_XY_SUMS_DUCK}
), fit AS (
  SELECT n AS nh, {beta} AS b, {alpha} AS a FROM sums
), resid AS (
  SELECT p.h, (p.y - (f.a + f.b * p.x)) AS e
  FROM paired p, fit f
), rp AS (
  SELECT lag(e) OVER (ORDER BY h) AS x,
         (e - lag(e) OVER (ORDER BY h)) AS y
  FROM resid
), paired2 AS (
  SELECT x, y FROM rp WHERE x IS NOT NULL
), rsums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(x * {Q}) AS BIGINT)) AS BIGINT) AS sx,
    CAST(sum(CAST(round(y * {Q}) AS BIGINT)) AS BIGINT) AS sy,
    CAST(sum(CAST(round(x * x * {Q2}) AS BIGINT)) AS BIGINT) AS sxx,
    CAST(sum(CAST(round(x * y * {Q2}) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(sum(CAST(round(y * y * {Q2}) AS BIGINT)) AS BIGINT) AS syy
  FROM paired2
)
SELECT f.nh AS n_hours,
  {round_portable_duck("f.b", 6)} AS beta,
  {round_portable_duck("f.a", 6)} AS alpha,
  {round_portable_duck(t, 6)} AS adf_t
FROM rsums r, fit f
"""


def granger_lag1(df: DataFrame, us_col: str, value_col: str,
                 series_expr: str, cause: str,
                 effect: str) -> DataFrame:
    """One row (n, psi, f_stat): does ``cause`` Granger-cause
    ``effect`` at lag 1? Unrestricted ``y_t = c + phi y_{t-1} +
    psi x_{t-1}`` vs restricted (no x term); F = (RSS_r - RSS_u) /
    (RSS_u / (n - 3)). Closed-form two-regressor OLS on centered
    quantized sums."""
    paired = hourly_pair(df, us_col, value_col, series_expr,
                         cause, effect)
    rows = (
        paired.withColumn("__yl", F.expr(
            "lag(__y) OVER (ORDER BY __h)"))
        .withColumn("__xl", F.expr("lag(__x) OVER (ORDER BY __h)"))
        .filter(F.col("__yl").isNotNull())
        .selectExpr("__yl AS u", "__xl AS v", "__y AS w")
    )
    sums = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(F.expr(
            f"CAST(round({e} * {q}) AS BIGINT)")).alias(a)
          for e, q, a in (
              ("u", Q, "su"), ("v", Q, "sv"), ("w", Q, "sw"),
              ("u * u", Q2, "suu"), ("v * v", Q2, "svv"),
              ("w * w", Q2, "sww"), ("u * v", Q2, "suv"),
              ("u * w", Q2, "suw"), ("v * w", Q2, "svw"))],
    )
    return sums.select(
        "n",
        round_portable(F.expr(_GRANGER_PSI), 6).alias("psi"),
        round_portable(F.expr(_GRANGER_F), 6).alias("f_stat"),
    )


def _granger_forms() -> tuple[str, str]:
    mu = f"(CAST(su AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
    mv = f"(CAST(sv AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
    mw = f"(CAST(sw AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
    s11 = (f"(CAST(suu AS DOUBLE) / {Q2F!r} "
           f"- CAST(n AS DOUBLE) * {mu} * {mu})")
    s22 = (f"(CAST(svv AS DOUBLE) / {Q2F!r} "
           f"- CAST(n AS DOUBLE) * {mv} * {mv})")
    syy = (f"(CAST(sww AS DOUBLE) / {Q2F!r} "
           f"- CAST(n AS DOUBLE) * {mw} * {mw})")
    s12 = (f"(CAST(suv AS DOUBLE) / {Q2F!r} "
           f"- CAST(n AS DOUBLE) * {mu} * {mv})")
    s1y = (f"(CAST(suw AS DOUBLE) / {Q2F!r} "
           f"- CAST(n AS DOUBLE) * {mu} * {mw})")
    s2y = (f"(CAST(svw AS DOUBLE) / {Q2F!r} "
           f"- CAST(n AS DOUBLE) * {mv} * {mw})")
    det = f"(({s11}) * ({s22}) - ({s12}) * ({s12}))"
    phi = f"((({s1y}) * ({s22}) - ({s2y}) * ({s12})) / {det})"
    psi = f"((({s2y}) * ({s11}) - ({s1y}) * ({s12})) / {det})"
    rss_u = f"(({syy}) - {phi} * ({s1y}) - {psi} * ({s2y}))"
    rss_r = f"(({syy}) - ({s1y}) * ({s1y}) / ({s11}))"
    f_stat = (f"((({rss_r}) - ({rss_u})) "
              f"/ (({rss_u}) / CAST(n - 3 AS DOUBLE)))")
    return psi, f_stat


_GRANGER_PSI, _GRANGER_F = _granger_forms()


def _q_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return granger_lag1(ev, "__us", "value", "event_type",
                        "click", "view")


_ORACLE_GRANGER = f"""
WITH {_HOURLY_PAIR_DUCK.format(a="click", b="view")}
, rows_l AS (
  SELECT lag(y) OVER (ORDER BY h) AS u,
         lag(x) OVER (ORDER BY h) AS v,
         y AS w
  FROM paired
), flt AS (
  SELECT u, v, w FROM rows_l WHERE u IS NOT NULL
), sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(u * {Q}) AS BIGINT)) AS BIGINT) AS su,
    CAST(sum(CAST(round(v * {Q}) AS BIGINT)) AS BIGINT) AS sv,
    CAST(sum(CAST(round(w * {Q}) AS BIGINT)) AS BIGINT) AS sw,
    CAST(sum(CAST(round(u * u * {Q2}) AS BIGINT)) AS BIGINT) AS suu,
    CAST(sum(CAST(round(v * v * {Q2}) AS BIGINT)) AS BIGINT) AS svv,
    CAST(sum(CAST(round(w * w * {Q2}) AS BIGINT)) AS BIGINT) AS sww,
    CAST(sum(CAST(round(u * v * {Q2}) AS BIGINT)) AS BIGINT) AS suv,
    CAST(sum(CAST(round(u * w * {Q2}) AS BIGINT)) AS BIGINT) AS suw,
    CAST(sum(CAST(round(v * w * {Q2}) AS BIGINT)) AS BIGINT) AS svw
  FROM flt
)
SELECT n,
  {round_portable_duck(_GRANGER_PSI, 6)} AS psi,
  {round_portable_duck(_GRANGER_F, 6)} AS f_stat
FROM sums
"""


def hill_tail(df: DataFrame, value_col: str, key_col: str,
              id_col: str, k: int = HILL_K) -> DataFrame:
    """(key, k, x_k, hill_alpha): Hill tail-index over each key's
    top-k positive values (rank ties broken by id). ``hill_alpha =
    (k - 1) / sum_{i<k} ln(x_i / x_k)``; heavier tails give smaller
    alpha. Log terms quantize to BIGINT before the sum."""
    topk = (
        df.filter(F.col(value_col) > 0)
        .withColumn("__rk", F.expr(
            f"row_number() OVER (PARTITION BY {key_col} "
            f"ORDER BY {value_col} DESC, {id_col} ASC)"))
        .filter(F.col("__rk") <= k)
    )
    kth = topk.filter(F.col("__rk") == k).select(
        key_col, F.col(value_col).alias("__xk"))
    return (
        topk.filter(F.col("__rk") < k)
        .join(F.broadcast(kth), key_col)
        .groupBy(key_col)
        .agg(
            F.max("__xk").alias("__xkv"),
            F.sum(F.expr(
                f"CAST(round(ln({value_col} / __xk) * {Q}) AS BIGINT)"
            )).alias("__sl"),
        )
        .select(
            key_col,
            F.lit(k).cast("bigint").alias("k"),
            round_portable(F.col("__xkv"), 6).alias("x_k"),
            round_portable(F.expr(
                f"CAST({k - 1} AS DOUBLE) "
                f"/ (CAST(__sl AS DOUBLE) / {QF!r})"), 6
            ).alias("hill_alpha"),
        )
    )


def _q_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hill_tail(load(spark, sf_dir, "events"), "value",
                     "event_type", "event_id")


_ORACLE_HILL = f"""
WITH ranked AS (
  SELECT event_type, value,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC) AS rk
  FROM events WHERE value > 0
), topk AS (
  SELECT * FROM ranked WHERE rk <= {HILL_K}
), kth AS (
  SELECT event_type, value AS xk FROM topk WHERE rk = {HILL_K}
)
SELECT t.event_type,
  CAST({HILL_K} AS BIGINT) AS k,
  {round_portable_duck("max(kth.xk)", 6)} AS x_k,
  {round_portable_duck(
      f"CAST({HILL_K - 1} AS DOUBLE) / (CAST(CAST(sum(CAST(round("
      f"ln(t.value / kth.xk) * {Q}) AS BIGINT)) AS BIGINT) "
      f"AS DOUBLE) / {QF!r})", 6)} AS hill_alpha
FROM topk t JOIN kth ON t.event_type = kth.event_type
WHERE t.rk < {HILL_K}
GROUP BY 1
"""


def gumbel_block_maxima(df: DataFrame, value_col: str, us_col: str,
                        key_col: str) -> DataFrame:
    """(key, n_days, mu, beta): Gumbel fit to the daily block maxima
    by method of moments — ``beta = s * sqrt(6) / pi``, ``mu =
    mean - gamma * beta`` (Euler-Mascheroni gamma). The 100-year-
    event starter kit for extreme-value monitoring."""
    maxima = (
        df.withColumn("__day", F.expr(f"({us_col}) DIV {US_PER_DAY}"))
        .groupBy(key_col, "__day")
        .agg(F.max(value_col).alias("__m"))
    )
    sums = maxima.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.expr(f"CAST(round(__m * {Q}) AS BIGINT)")).alias("__s"),
        F.sum(F.expr(
            f"CAST(round(__m * __m * {Q2}) AS BIGINT)")).alias("__ss"),
    )
    mean = (f"(CAST(__s AS DOUBLE) / (CAST(n_days AS DOUBLE) "
            f"* {QF!r}))")
    var = (f"((CAST(__ss AS DOUBLE) / {Q2F!r} "
           f"- CAST(n_days AS DOUBLE) * {mean} * {mean}) "
           f"/ CAST(n_days - 1 AS DOUBLE))")
    beta = f"(sqrt({var}) * sqrt(6.0) / pi())"
    return sums.filter(F.col("n_days") > 1).select(
        key_col, "n_days",
        round_portable(F.expr(
            f"({mean} - {EULER_GAMMA!r} * {beta})"), 6).alias("mu"),
        round_portable(F.expr(beta), 6).alias("beta"),
    )


def _q_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return gumbel_block_maxima(ev, "value", "__us", "event_type")


_G_MEAN = f"(CAST(s AS DOUBLE) / (CAST(n_days AS DOUBLE) * {QF!r}))"
_G_VAR = (f"((CAST(ss AS DOUBLE) / {Q2F!r} "
          f"- CAST(n_days AS DOUBLE) * {_G_MEAN} * {_G_MEAN}) "
          f"/ CAST(n_days - 1 AS DOUBLE))")
_G_BETA = f"(sqrt({_G_VAR}) * sqrt(6.0) / pi())"

_ORACLE_GUMBEL = f"""
WITH maxima AS (
  SELECT event_type, epoch_us(ts) // {US_PER_DAY} AS day,
         max(value) AS m
  FROM events GROUP BY 1, 2
), sums AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(CAST(round(m * {Q}) AS BIGINT)) AS BIGINT) AS s,
    CAST(sum(CAST(round(m * m * {Q2}) AS BIGINT)) AS BIGINT) AS ss
  FROM maxima GROUP BY 1
)
SELECT event_type, n_days,
  {round_portable_duck(
      f"({_G_MEAN} - {EULER_GAMMA!r} * {_G_BETA})", 6)} AS mu,
  {round_portable_duck(_G_BETA, 6)} AS beta
FROM sums WHERE n_days > 1
"""


def min_variance_pair(df: DataFrame, us_col: str, value_col: str,
                      series_expr: str, series_a: str,
                      series_b: str) -> DataFrame:
    """One row (n_hours, w_a, w_b, port_var): the two-asset
    minimum-variance weights over the paired hourly means —
    ``w_a = (var_b - cov) / (var_a + var_b - 2 cov)`` — and the
    resulting portfolio variance."""
    sums = _xy_sums(hourly_pair(df, us_col, value_col, series_expr,
                                series_a, series_b))
    scxx = _SCXX.format(p="__")
    scyy = _SCYY.format(p="__")
    scxy = _SCXY.format(p="__")
    nm1 = "CAST(__n - 1 AS DOUBLE)"
    va = f"({scxx} / {nm1})"
    vb = f"({scyy} / {nm1})"
    cab = f"({scxy} / {nm1})"
    wa = f"((({vb}) - ({cab})) / (({va}) + ({vb}) - 2.0 * ({cab})))"
    pv = (f"(({wa}) * ({wa}) * ({va}) "
          f"+ (1.0 - ({wa})) * (1.0 - ({wa})) * ({vb}) "
          f"+ 2.0 * ({wa}) * (1.0 - ({wa})) * ({cab}))")
    return sums.select(
        F.col("__n").alias("n_hours"),
        round_portable(F.expr(wa), 6).alias("w_a"),
        round_portable(F.expr(f"(1.0 - {wa})"), 6).alias("w_b"),
        round_portable(F.expr(pv), 6).alias("port_var"),
    )


def _q_minvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return min_variance_pair(ev, "__us", "value", "event_type",
                             "click", "view")


def _minvar_oracle() -> str:
    scxx = _SCXX.format(p="")
    scyy = _SCYY.format(p="")
    scxy = _SCXY.format(p="")
    nm1 = "CAST(n - 1 AS DOUBLE)"
    va = f"({scxx} / {nm1})"
    vb = f"({scyy} / {nm1})"
    cab = f"({scxy} / {nm1})"
    wa = f"((({vb}) - ({cab})) / (({va}) + ({vb}) - 2.0 * ({cab})))"
    pv = (f"(({wa}) * ({wa}) * ({va}) "
          f"+ (1.0 - ({wa})) * (1.0 - ({wa})) * ({vb}) "
          f"+ 2.0 * ({wa}) * (1.0 - ({wa})) * ({cab}))")
    return f"""
WITH {_HOURLY_PAIR_DUCK.format(a="click", b="view")}
, sums AS (
{_XY_SUMS_DUCK}
)
SELECT n AS n_hours,
  {round_portable_duck(wa, 6)} AS w_a,
  {round_portable_duck(f"(1.0 - {wa})", 6)} AS w_b,
  {round_portable_duck(pv, 6)} AS port_var
FROM sums
"""


_ORACLE_MINVAR = _minvar_oracle()


QUERIES: dict = {
    "q_engle_granger_events": (_q_engle_granger, _eg_oracle()),
    "q_granger_lag1_events": (_q_granger, _ORACLE_GRANGER),
    "q_hill_tail_events": (_q_hill, _ORACLE_HILL),
    "q_gumbel_maxima_events": (_q_gumbel, _ORACLE_GUMBEL),
    "q_minvar_pair_events": (_q_minvar, _ORACLE_MINVAR),
}

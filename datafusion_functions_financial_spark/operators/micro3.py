"""Microstructure #3: volume-synchronized probability of informed
trading (VPIN), realized-variance/bipower-variation jump
decomposition, the Corwin–Schultz high-low spread estimator, and
Yang–Zhang OHLC volatility — the bucket/bar-level estimators that
complement the tick-level Kyle-lambda/variance-ratio pair in
``micro2.py`` and the Parkinson/GK bars in ``functions/technical6.py``.

Engine-exact (SCALING.md rules): volume buckets cut on EXACT BIGINT
cumulative volume (quantized at 1e6) so bucket membership is integer
arithmetic; the tick-rule sign is the carried ``last(non-zero)``
from micro2; every floating term (log returns, spread terms)
quantizes to BIGINT before its cross-row sum; constants are
integer-ratio doubles (``CAST(34 AS DOUBLE) / 100``), never float
literals.

Plan shapes at scale:
- VPIN: one window pass per series key (diff + sign + cumulative
  volume), then a hash aggregate on (key, bucket) and one on key —
  all on the same key prefix, so the single exchange is reused.
- RV/BV: one window pass per (key, day) + keyed aggregate.
- Corwin–Schultz / Yang–Zhang: daily-bar pre-aggregation shrinks the
  data to one row per (key, day) before the adjacent-day window —
  the window runs over the tiny bar relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["vpin", "vpin_buckets", "rv_bipower", "corwin_schultz",
           "yang_zhang"]

Q = 10 ** 8
QV = 10 ** 6          # volume quantization
US_PER_DAY = 86_400_000_000
VPIN_BUCKET_VOL = 2000.0  # value units per volume bucket


def _keyed(keys: list[str], order: list[str]) -> tuple[str, str]:
    return ", ".join(keys), ", ".join(order)


# --------------------------------------------------------------------------
# VPIN
# --------------------------------------------------------------------------


def vpin_buckets(df: DataFrame, value_col: str, keys: list[str],
                 order: list[str],
                 bucket_vol: float = VPIN_BUCKET_VOL) -> DataFrame:
    """(keys..., __bkt, __buy, __sell, __last): the equal-volume
    bucket table behind ``vpin`` — exposed so the streaming VPIN
    (``streaming/vpin.py``) can assert stream==batch equality on the
    bucket rows themselves."""
    okeys, oorder = _keyed(keys, order)
    w = Window.partitionBy(*keys).orderBy(*order)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    bq = int(round(bucket_vol * QV))
    prepared = (
        df.withColumn("__dp", F.col(value_col) - F.lag(value_col).over(w))
        .withColumn("__sgn", F.last(
            F.expr("nullif(CAST(sign(__dp) AS BIGINT), 0)"),
            ignorenulls=True).over(wc))
        .filter(F.col("__sgn").isNotNull())
        .withColumn("__vq", F.expr(
            f"CAST(round(abs({value_col}) * {QV}) AS BIGINT)"))
        .withColumn("__cum", F.expr(
            f"sum(__vq) OVER (PARTITION BY {okeys} ORDER BY {oorder} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
        # greatest(.., 0) clamps the cum=0 corner (leading ticks whose
        # |value| quantizes to vq=0) so trunc-DIV here and floor-// in
        # the DuckDB oracle see the same non-negative numerator.
        .withColumn("__bkt", F.expr(
            f"greatest(__cum - 1, CAST(0 AS BIGINT)) DIV {bq}"))
    )
    return prepared.groupBy(*keys, "__bkt").agg(
        F.sum(F.expr(
            "CASE WHEN __sgn = 1 THEN __vq ELSE 0 END")).alias("__buy"),
        F.sum(F.expr(
            "CASE WHEN __sgn = -1 THEN __vq ELSE 0 END")).alias("__sell"),
    ).withColumn("__last", F.expr(
        f"max(__bkt) OVER (PARTITION BY {okeys})"))


def vpin(df: DataFrame, value_col: str, keys: list[str],
         order: list[str],
         bucket_vol: float = VPIN_BUCKET_VOL) -> DataFrame:
    """(keys..., n_buckets, vpin): Easley–López de Prado–O'Hara VPIN.
    Ticks get a tick-rule side (carried last non-zero sign of the
    price change); |value| is the volume proxy; the tape is cut into
    equal-volume buckets on the EXACT quantized cumulative volume,
    the trailing partial bucket is dropped, and
    ``VPIN = mean(|buyV - sellV| / bucketV)``."""
    buckets = vpin_buckets(df, value_col, keys, order, bucket_vol)
    term = (
        f"CAST(round(CAST(abs(__buy - __sell) AS DOUBLE) "
        f"/ CAST(__buy + __sell AS DOUBLE) * {Q}) AS BIGINT)"
    )
    return (
        buckets.filter(F.col("__bkt") != F.col("__last"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum(F.expr(term)).alias("__s"),
        )
        .select(
            *keys, "n_buckets",
            round_portable(F.expr(
                f"CAST(__s AS DOUBLE) "
                f"/ (CAST(n_buckets AS DOUBLE) * {float(Q)!r})"), 6
            ).alias("vpin"),
        )
    )


# --------------------------------------------------------------------------
# Realized variance / bipower variation / jump share (per key, day)
# --------------------------------------------------------------------------


def rv_bipower(df: DataFrame, value_col: str, us_col: str,
               keys: list[str], order: list[str]) -> DataFrame:
    """(keys..., day, n_returns, rv, bv, jump_share) per (key, day):
    realized variance ``sum r^2`` of intraday log returns, bipower
    variation ``(pi/2) * sum |r_t||r_t-1|`` (jump-robust), and the
    Barndorff-Nielsen–Shephard jump share ``max(0, 1 - BV/RV)``
    (NULL on a flat day where RV = 0). Non-positive prices are
    excluded before the return diff."""
    okeys, oorder = _keyed(keys, order)
    pos = df.filter(F.col(value_col) > 0).withColumn(
        "__day", F.expr(f"({us_col}) DIV {US_PER_DAY}"))
    part = f"PARTITION BY {okeys}, __day ORDER BY {oorder}"
    staged = (
        pos.withColumn("__r", F.expr(
            f"ln({value_col} / lag({value_col}) OVER ({part}))"))
        .filter(F.col("__r").isNotNull())
        .withColumn("__rp", F.expr(f"lag(__r) OVER ({part})"))
    )
    return (
        staged.groupBy(*keys, "__day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_returns"),
            F.sum(F.expr(
                f"CAST(round(__r * __r * {Q}) AS BIGINT)")).alias("__rv"),
            F.sum(F.expr(
                f"CASE WHEN __rp IS NOT NULL THEN "
                f"CAST(round(abs(__r) * abs(__rp) * {Q}) AS BIGINT) "
                f"END")).alias("__bv"),
        )
        .select(
            *keys,
            F.col("__day").cast("bigint").alias("day"),
            "n_returns",
            round_portable(F.expr(
                f"CAST(__rv AS DOUBLE) / {float(Q)!r}"), 6).alias("rv"),
            round_portable(F.expr(
                f"pi() / 2 * CAST(__bv AS DOUBLE) / {float(Q)!r}"), 6
            ).alias("bv"),
            # __rv = 0 (flat intraday prices: every log return 0)
            # would make the share 0/0; a flat day has no jump.
            round_portable(F.expr(
                f"CASE WHEN __rv > 0 THEN greatest(CAST(0 AS DOUBLE), "
                f"1 - (pi() / 2 * CAST(__bv AS DOUBLE)) "
                f"/ CAST(__rv AS DOUBLE)) END"), 6).alias("jump_share"),
        )
    )


# --------------------------------------------------------------------------
# Corwin–Schultz high-low spread estimator
# --------------------------------------------------------------------------

_CS_DEN = "(3 - 2 * sqrt(CAST(2 AS DOUBLE)))"


def corwin_schultz(df: DataFrame, value_col: str, us_col: str,
                   keys: list[str]) -> DataFrame:
    """(keys..., n_pairs, cs_spread, cs_spread_pos): Corwin–Schultz
    (2012) bid-ask spread from daily high/low over adjacent-day
    pairs: ``beta = ln(H1/L1)^2 + ln(H2/L2)^2``,
    ``gamma = ln(H12/L12)^2``,
    ``alpha = (sqrt(2 beta) - sqrt(beta)) / (3 - 2 sqrt(2))
    - sqrt(gamma / (3 - 2 sqrt(2)))``,
    ``S = 2 (e^a - 1) / (1 + e^a)`` averaged over pairs —
    ``cs_spread_pos`` clamps each pair's S at 0 first (the standard
    negative-spread adjustment)."""
    okeys = ", ".join(keys)
    daily = (
        df.filter(F.col(value_col) > 0)
        .withColumn("__day", F.expr(f"({us_col}) DIV {US_PER_DAY}"))
        .groupBy(*keys, "__day")
        .agg(F.max(value_col).alias("__h"), F.min(value_col).alias("__l"))
    )
    part = f"PARTITION BY {okeys} ORDER BY __day"
    paired = (
        daily
        .withColumn("__hp", F.expr(f"lag(__h) OVER ({part})"))
        .withColumn("__lp", F.expr(f"lag(__l) OVER ({part})"))
        .withColumn("__dp", F.expr(f"lag(__day) OVER ({part})"))
        .filter(F.expr("__dp IS NOT NULL AND __day = __dp + 1"))
    )
    beta = ("(ln(__h / __l) * ln(__h / __l) "
            "+ ln(__hp / __lp) * ln(__hp / __lp))")
    gamma = ("(ln(greatest(__h, __hp) / least(__l, __lp)) "
             "* ln(greatest(__h, __hp) / least(__l, __lp)))")
    alpha = (
        f"((sqrt(2 * {beta}) - sqrt({beta})) / {_CS_DEN} "
        f"- sqrt({gamma} / {_CS_DEN}))"
    )
    s = f"(2 * (exp({alpha}) - 1) / (1 + exp({alpha})))"
    qs = f"CAST(round({s} * {Q}) AS BIGINT)"
    qsp = (f"CAST(round(greatest({s}, CAST(0 AS DOUBLE)) * {Q}) "
           f"AS BIGINT)")
    return (
        paired.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.expr(qs)).alias("__s"),
            F.sum(F.expr(qsp)).alias("__sp"),
        )
        .select(
            *keys, "n_pairs",
            round_portable(F.expr(
                f"CAST(__s AS DOUBLE) "
                f"/ (CAST(n_pairs AS DOUBLE) * {float(Q)!r})"), 6
            ).alias("cs_spread"),
            round_portable(F.expr(
                f"CAST(__sp AS DOUBLE) "
                f"/ (CAST(n_pairs AS DOUBLE) * {float(Q)!r})"), 6
            ).alias("cs_spread_pos"),
        )
    )


# --------------------------------------------------------------------------
# Yang–Zhang OHLC volatility
# --------------------------------------------------------------------------


def yang_zhang(df: DataFrame, value_col: str, us_col: str,
               keys: list[str], order: list[str]) -> DataFrame:
    """(keys..., n_days, sigma2_yz, sigma_yz): Yang–Zhang (2000)
    drift-independent volatility from daily OHLC bars —
    ``sigma2 = var(overnight) + k var(open-close) + (1-k) RS`` with
    ``k = 0.34 / (1.34 + (n+1)/(n-1))`` and Rogers–Satchell
    ``RS = mean[ln(H/C)ln(H/O) + ln(L/C)ln(L/O)]``. Bars need a
    previous close, positive prices throughout."""
    okeys, oorder = _keyed(keys, order)
    pos = df.filter(F.col(value_col) > 0).withColumn(
        "__day", F.expr(f"({us_col}) DIV {US_PER_DAY}"))
    part = f"PARTITION BY {okeys}, __day ORDER BY {oorder}"
    bars = (
        pos
        .withColumn("__rna", F.expr(f"row_number() OVER ({part})"))
        .withColumn("__rnd", F.expr(
            f"row_number() OVER (PARTITION BY {okeys}, __day "
            f"ORDER BY {', '.join(c + ' DESC' for c in order)})"))
        .groupBy(*keys, "__day")
        .agg(
            F.max(F.expr(
                f"CASE WHEN __rna = 1 THEN {value_col} END")).alias("__o"),
            F.max(F.expr(
                f"CASE WHEN __rnd = 1 THEN {value_col} END")).alias("__c"),
            F.max(value_col).alias("__h"),
            F.min(value_col).alias("__l"),
        )
    )
    wday = f"PARTITION BY {okeys} ORDER BY __day"
    ret = (
        bars.withColumn("__cp", F.expr(f"lag(__c) OVER ({wday})"))
        .filter(F.col("__cp").isNotNull())
        .withColumn("__ro", F.expr("ln(__o / __cp)"))
        .withColumn("__rc", F.expr("ln(__c / __o)"))
        .withColumn("__rs", F.expr(
            "ln(__h / __c) * ln(__h / __o) + ln(__l / __c) * ln(__l / __o)"))
    )
    red = ret.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.expr(
            f"CAST(round(__ro * {Q}) AS BIGINT)")).alias("__so"),
        F.sum(F.expr(
            f"CAST(round(__ro * __ro * {Q}) AS BIGINT)")).alias("__sso"),
        F.sum(F.expr(
            f"CAST(round(__rc * {Q}) AS BIGINT)")).alias("__sc"),
        F.sum(F.expr(
            f"CAST(round(__rc * __rc * {Q}) AS BIGINT)")).alias("__ssc"),
        F.sum(F.expr(
            f"CAST(round(__rs * {Q}) AS BIGINT)")).alias("__srs"),
    )
    nn = "CAST(n_days AS DOUBLE)"

    def svar(s: str, ss: str) -> str:
        mean = f"(CAST({s} AS DOUBLE) / ({nn} * {float(Q)!r}))"
        return (
            f"((CAST({ss} AS DOUBLE) / ({nn} * {float(Q)!r}) "
            f"- ({mean}) * ({mean})) * {nn} / ({nn} - 1))"
        )

    vo = svar("__so", "__sso")
    vc = svar("__sc", "__ssc")
    rs = f"(CAST(__srs AS DOUBLE) / ({nn} * {float(Q)!r}))"
    k = (f"(CAST(34 AS DOUBLE) / 100 "
         f"/ (CAST(134 AS DOUBLE) / 100 + ({nn} + 1) / ({nn} - 1)))")
    s2 = f"({vo} + {k} * {vc} + (1 - {k}) * {rs})"
    return red.filter(F.col("n_days") >= 2).select(
        *keys, "n_days",
        round_portable(F.expr(s2), 6).alias("sigma2_yz"),
        round_portable(F.expr(
            f"sqrt(greatest({s2}, CAST(0 AS DOUBLE)))"), 6
        ).alias("sigma_yz"),
    )


# --------------------------------------------------------------------------
# Gate queries (events: per-event_type tape, ordered ts, event_id)
# --------------------------------------------------------------------------


def _q_vpin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vpin(load(spark, sf_dir, "events"), "value",
                ["event_type"], ["ts", "event_id"])


_VPIN_BQ = int(round(VPIN_BUCKET_VOL * QV))
_VPIN_TERM = (
    f"CAST(round(CAST(abs(buy - sell) AS DOUBLE) "
    f"/ CAST(buy + sell AS DOUBLE) * {Q}) AS BIGINT)"
)

_ORACLE_VPIN = f"""
WITH diffed AS (
  SELECT event_type, ts, event_id, value,
         value - lag(value) OVER w AS dp
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), signed AS (
  SELECT event_type, ts, event_id, value,
         last_value(nullif(CAST(sign(dp) AS BIGINT), 0) IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sgn
  FROM diffed
), vols AS (
  SELECT event_type, ts, event_id, sgn,
         CAST(round(abs(value) * {QV}) AS BIGINT) AS vq
  FROM signed WHERE sgn IS NOT NULL
), cut AS (
  SELECT event_type, sgn, vq,
         greatest(sum(vq) OVER (PARTITION BY event_type
                        ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                        ROW) - 1, 0) // {_VPIN_BQ} AS bkt
  FROM vols
), buckets AS (
  SELECT event_type, bkt,
         CAST(sum(CASE WHEN sgn = 1 THEN vq ELSE 0 END) AS BIGINT)
           AS buy,
         CAST(sum(CASE WHEN sgn = -1 THEN vq ELSE 0 END) AS BIGINT)
           AS sell,
         max(bkt) OVER (PARTITION BY event_type) AS lastb
  FROM cut GROUP BY 1, 2
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
  {round_portable_duck(
      f"CAST(sum({_VPIN_TERM}) AS DOUBLE) "
      f"/ (CAST(count(*) AS DOUBLE) * {float(Q)!r})", 6)} AS vpin
FROM buckets WHERE bkt != lastb GROUP BY 1
"""


def _q_rv_bipower(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return rv_bipower(ev, "value", "__us", ["event_type"],
                      ["ts", "event_id"])


_ORACLE_RV_BIPOWER = f"""
WITH pos AS (
  SELECT event_type, ts, event_id, value,
         epoch_us(ts) // {US_PER_DAY} AS day
  FROM events WHERE value > 0
), staged AS (
  SELECT event_type, day, ts, event_id,
         ln(value / lag(value) OVER w) AS r
  FROM pos
  WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id)
), flt AS (
  SELECT event_type, day, ts, event_id, r
  FROM staged WHERE r IS NOT NULL
), paired AS (
  SELECT event_type, day, r,
         lag(r) OVER (PARTITION BY event_type, day
                      ORDER BY ts, event_id) AS rp
  FROM flt
), red AS (
  SELECT event_type, day,
    CAST(count(*) AS BIGINT) AS n_returns,
    CAST(sum(CAST(round(r * r * {Q}) AS BIGINT)) AS BIGINT) AS rvq,
    CAST(sum(CASE WHEN rp IS NOT NULL THEN
      CAST(round(abs(r) * abs(rp) * {Q}) AS BIGINT) END) AS BIGINT)
      AS bvq
  FROM paired GROUP BY 1, 2
)
SELECT event_type, CAST(day AS BIGINT) AS day, n_returns,
  {round_portable_duck(f"CAST(rvq AS DOUBLE) / {float(Q)!r}", 6)}
    AS rv,
  {round_portable_duck(
      f"pi() / 2 * CAST(bvq AS DOUBLE) / {float(Q)!r}", 6)} AS bv,
  {round_portable_duck(
      f"CASE WHEN rvq > 0 THEN greatest(CAST(0 AS DOUBLE), "
      f"1 - (pi() / 2 * CAST(bvq AS DOUBLE)) "
      f"/ CAST(rvq AS DOUBLE)) END", 6)} AS jump_share
FROM red
"""


def _q_corwin_schultz(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return corwin_schultz(ev, "value", "__us", ["event_type"])


_CS_BETA = ("(ln(h / l) * ln(h / l) + ln(hp / lp) * ln(hp / lp))")
_CS_GAMMA = ("(ln(greatest(h, hp) / least(l, lp)) "
             "* ln(greatest(h, hp) / least(l, lp)))")
_CS_ALPHA = (
    f"((sqrt(2 * {_CS_BETA}) - sqrt({_CS_BETA})) / {_CS_DEN} "
    f"- sqrt({_CS_GAMMA} / {_CS_DEN}))"
)
_CS_S = f"(2 * (exp({_CS_ALPHA}) - 1) / (1 + exp({_CS_ALPHA})))"

_ORACLE_CS = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {US_PER_DAY} AS day,
         max(value) AS h, min(value) AS l
  FROM events WHERE value > 0 GROUP BY 1, 2
), paired AS (
  SELECT event_type, h, l,
         lag(h) OVER w AS hp, lag(l) OVER w AS lp,
         lag(day) OVER w AS dp, day
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
), flt AS (
  SELECT * FROM paired WHERE dp IS NOT NULL AND day = dp + 1
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
  {round_portable_duck(
      f"CAST(sum(CAST(round({_CS_S} * {Q}) AS BIGINT)) AS DOUBLE) "
      f"/ (CAST(count(*) AS DOUBLE) * {float(Q)!r})", 6)} AS cs_spread,
  {round_portable_duck(
      f"CAST(sum(CAST(round(greatest({_CS_S}, CAST(0 AS DOUBLE)) "
      f"* {Q}) AS BIGINT)) AS DOUBLE) "
      f"/ (CAST(count(*) AS DOUBLE) * {float(Q)!r})", 6)}
    AS cs_spread_pos
FROM flt GROUP BY 1
"""


def _q_yang_zhang(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return yang_zhang(ev, "value", "__us", ["event_type"],
                      ["ts", "event_id"])


def _yz_svar_duck(s: str, ss: str) -> str:
    nn = "CAST(n_days AS DOUBLE)"
    mean = f"(CAST({s} AS DOUBLE) / ({nn} * {float(Q)!r}))"
    return (
        f"((CAST({ss} AS DOUBLE) / ({nn} * {float(Q)!r}) "
        f"- ({mean}) * ({mean})) * {nn} / ({nn} - 1))"
    )


_YZ_VO = _yz_svar_duck("so", "sso")
_YZ_VC = _yz_svar_duck("sc", "ssc")
_YZ_NN = "CAST(n_days AS DOUBLE)"
_YZ_RS = f"(CAST(srs AS DOUBLE) / ({_YZ_NN} * {float(Q)!r}))"
_YZ_K = (f"(CAST(34 AS DOUBLE) / 100 "
         f"/ (CAST(134 AS DOUBLE) / 100 "
         f"+ ({_YZ_NN} + 1) / ({_YZ_NN} - 1)))")
_YZ_S2 = f"({_YZ_VO} + {_YZ_K} * {_YZ_VC} + (1 - {_YZ_K}) * {_YZ_RS})"

_ORACLE_YZ = f"""
WITH pos AS (
  SELECT event_type, ts, event_id, value,
         epoch_us(ts) // {US_PER_DAY} AS day
  FROM events WHERE value > 0
), rns AS (
  SELECT event_type, day, value,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts, event_id) AS rna,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts DESC, event_id DESC) AS rnd
  FROM pos
), bars AS (
  SELECT event_type, day,
         max(CASE WHEN rna = 1 THEN value END) AS o,
         max(CASE WHEN rnd = 1 THEN value END) AS c,
         max(value) AS h, min(value) AS l
  FROM rns GROUP BY 1, 2
), ret AS (
  SELECT event_type,
         ln(o / lag(c) OVER w) AS ro,
         ln(c / o) AS rc,
         ln(h / c) * ln(h / o) + ln(l / c) * ln(l / o) AS rs,
         lag(c) OVER w AS cp
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
), red AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(CAST(round(ro * {Q}) AS BIGINT)) AS BIGINT) AS so,
    CAST(sum(CAST(round(ro * ro * {Q}) AS BIGINT)) AS BIGINT) AS sso,
    CAST(sum(CAST(round(rc * {Q}) AS BIGINT)) AS BIGINT) AS sc,
    CAST(sum(CAST(round(rc * rc * {Q}) AS BIGINT)) AS BIGINT) AS ssc,
    CAST(sum(CAST(round(rs * {Q}) AS BIGINT)) AS BIGINT) AS srs
  FROM ret WHERE cp IS NOT NULL GROUP BY 1
)
SELECT event_type, n_days,
  {round_portable_duck(_YZ_S2, 6)} AS sigma2_yz,
  {round_portable_duck(
      f"sqrt(greatest({_YZ_S2}, CAST(0 AS DOUBLE)))", 6)} AS sigma_yz
FROM red WHERE n_days >= 2
"""


def _q_sign_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-flow persistence: PACF of the tick-rule trade-sign
    series — the classic 'order flow is long-memory' diagnostic.
    Reuses the spectral PACF on the carried-sign column."""
    from .spectral import pacf
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    signed = (
        ev.withColumn("__dp", F.col("value") - F.lag("value").over(w))
        .withColumn("__sgn", F.last(
            F.expr("nullif(CAST(sign(__dp) AS BIGINT), 0)"),
            ignorenulls=True).over(wc))
        .filter(F.col("__sgn").isNotNull())
        .withColumn("__sv", F.expr("CAST(__sgn AS DOUBLE)"))
    )
    return pacf(signed, "__sv", ["event_type"], ["ts", "event_id"])


def _sign_pacf_oracle() -> str:
    from .spectral import _DP22, _DP33, _DR1, _DR2, _DR3
    from .spectral import Q as SQ
    from .spectral import Q2 as SQ2
    return f"""
WITH diffed AS (
  SELECT event_type, ts, event_id,
         value - lag(value) OVER w AS dp
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), signed AS (
  SELECT event_type, ts, event_id,
         CAST(last_value(nullif(CAST(sign(dp) AS BIGINT), 0)
                         IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS sv
  FROM diffed
), flt AS (
  SELECT * FROM signed WHERE sv IS NOT NULL
), means AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(round(sv * {SQ}) AS BIGINT)) AS s
  FROM flt GROUP BY 1
), dev AS (
  SELECT f.event_type, m.n,
    f.sv - (CAST(m.s AS DOUBLE)
            / (CAST(m.n AS DOUBLE) * {float(SQ)!r})) AS d,
    f.ts, f.event_id
  FROM flt f JOIN means m ON f.event_type = m.event_type
), lagged AS (
  SELECT event_type, n, d,
         lag(d, 1) OVER w AS dl1,
         lag(d, 2) OVER w AS dl2,
         lag(d, 3) OVER w AS dl3
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), red AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
    CAST(sum(CAST(round(d * d * {SQ2}) AS BIGINT)) AS BIGINT) AS den,
    CAST(sum(CASE WHEN dl1 IS NOT NULL THEN
      CAST(round(d * dl1 * {SQ2}) AS BIGINT) END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN dl2 IS NOT NULL THEN
      CAST(round(d * dl2 * {SQ2}) AS BIGINT) END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN dl3 IS NOT NULL THEN
      CAST(round(d * dl3 * {SQ2}) AS BIGINT) END) AS BIGINT) AS n3
  FROM lagged GROUP BY 1
)
SELECT event_type, n,
  {round_portable_duck(_DR1, 6)} AS acf_1,
  {round_portable_duck(_DR2, 6)} AS acf_2,
  {round_portable_duck(_DR3, 6)} AS acf_3,
  {round_portable_duck(_DR1, 6)} AS pacf_1,
  {round_portable_duck(_DP22, 6)} AS pacf_2,
  {round_portable_duck(_DP33, 6)} AS pacf_3
FROM red
"""


QUERIES: dict = {
    "micro_vpin_events": (_q_vpin, _ORACLE_VPIN),
    "micro_sign_pacf_events": (_q_sign_pacf, _sign_pacf_oracle()),
    "micro_rv_bipower_events": (_q_rv_bipower, _ORACLE_RV_BIPOWER),
    "micro_corwin_schultz_events": (_q_corwin_schultz, _ORACLE_CS),
    "micro_yang_zhang_events": (_q_yang_zhang, _ORACLE_YZ),
}

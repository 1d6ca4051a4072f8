"""Range-based volatility estimators over daily OHLC bars:
Parkinson, Garman-Klass, and Rogers-Satchell.

These squeeze ~5-8x the statistical efficiency of close-to-close
volatility (``rollstats.rolling_volatility``) out of the same data by
using the intraday high/low range — the estimators a realized-vol desk
actually runs on bar data. Inputs are the ``candles.daily_candles``
bars, so the whole pipeline is: one map-side-combinable groupBy to
bars, then frame-local windows over DAYS per key (thousands of rows,
not ticks) — the tick table is never windowed.

Per-bar closed forms (H/L/O/C the bar's high/low/open/close):

- Parkinson:       ``pk = ln(H/L)^2``, vol = sqrt(K_P * mean_n(pk)),
  K_P = 1/(4 ln 2)
- Garman-Klass:    ``gk = 0.5 ln(H/L)^2 - (2 ln 2 - 1) ln(C/O)^2``,
  vol = sqrt(mean_n(gk)) (NULL if the mean is negative - GK's per-bar
  term can be, though the mean rarely is)
- Rogers-Satchell: ``rs = ln(H/C) ln(H/O) + ln(L/C) ln(L/O)``
  (drift-independent; per-bar term always >= 0), vol = sqrt(mean_n(rs))

Determinism: bars with a non-positive low are FILTERED on both engines
(log undefined; sf0.1 events carry value == 0.0 ticks), keeping frame
lists element-aligned; the n-bar means fold ordered ``collect_list``
arrays sequentially (the SCALING.md partial-agg-order rule); ``ln`` is
the platform libm on both engines (bit-identical on one host, same as
the gated ``ind_logret_events``).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .candles import _BARS_CTE, daily_candles

__all__ = ["bar_volatility"]

K_PARKINSON = 1.0 / (4.0 * math.log(2.0))
K_GK = 2.0 * math.log(2.0) - 1.0


def bar_volatility(bars: DataFrame, keys: Sequence[str] = ("user_id",),
                   order: Sequence[str] = ("day",),
                   n: int = 10) -> DataFrame:
    """Append ``vol_parkinson``, ``vol_gk``, ``vol_rs`` (rolling
    ``n``-bar estimates) to a bar relation with open/high/low/close
    columns. Bars with ``low <= 0`` are dropped (undefined logs)."""
    nf = float(n)
    b = bars.filter(F.col("low") > 0)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(-(n - 1), 0)
    )
    terms = (
        b.withColumn("__pk", F.expr("pow(ln(high / low), 2)"))
        .withColumn("__gk", F.expr(
            f"0.5 * pow(ln(high / low), 2) "
            f"- {K_GK!r} * pow(ln(close / open), 2)"))
        .withColumn("__rs", F.expr(
            "ln(high / close) * ln(high / open) "
            "+ ln(low / close) * ln(low / open)"))
    )
    staged = terms
    for c in ("__pk", "__gk", "__rs"):
        staged = staged.withColumn(
            f"{c}a", F.collect_list(F.col(c)).over(w))
        staged = staged.withColumn(
            f"{c}m", F.expr(
                f"aggregate({c}a, 0D, (a, x) -> a + x) / {nf!r}"))
    guard = f"size(__pka) >= {n}"
    vol_p = f"CASE WHEN {guard} THEN sqrt({K_PARKINSON!r} * __pkm) END"
    vol_gk = f"CASE WHEN {guard} AND __gkm >= 0.0 THEN sqrt(__gkm) END"
    vol_rs = f"CASE WHEN {guard} AND __rsm >= 0.0 THEN sqrt(__rsm) END"
    out = (
        staged
        .withColumn("vol_parkinson", round_portable(F.expr(vol_p)))
        .withColumn("vol_gk", round_portable(F.expr(vol_gk)))
        .withColumn("vol_rs", round_portable(F.expr(vol_rs)))
    )
    drop = [c for pre in ("__pk", "__gk", "__rs")
            for c in (pre, f"{pre}a", f"{pre}m")]
    return out.drop(*drop)


# ---------------------------------------------------------------------------
# Gate query (R05 queue): daily event bars per user, n=10.
# ---------------------------------------------------------------------------

_N = 10


def _q_barvol(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = daily_candles(load(spark, sf_dir, "events"))
    out = bar_volatility(bars, ("user_id",), ("day",), n=_N)
    return out.select("user_id", "day",
                      "vol_parkinson", "vol_gk", "vol_rs")


_W = "PARTITION BY user_id ORDER BY day ASC"
_NF = float(_N)


def _fold_mean(arr: str) -> str:
    return (f"list_reduce(list_concat([CAST(0 AS DOUBLE)], {arr}), "
            f"(a, x) -> a + x) / {_NF!r}")


_ORACLE_BARVOL = f"""
WITH {_BARS_CTE},
terms AS (
  SELECT user_id, day,
         pow(ln(high / low), 2) AS pk,
         0.5 * pow(ln(high / low), 2)
           - {K_GK!r} * pow(ln(close / open), 2) AS gk,
         ln(high / close) * ln(high / open)
           + ln(low / close) * ln(low / open) AS rs
  FROM bars WHERE low > 0
),
f AS (
  SELECT user_id, day,
         list(pk) OVER w AS pka,
         list(gk) OVER w AS gka,
         list(rs) OVER w AS rsa
  FROM terms
  WINDOW w AS ({_W} ROWS BETWEEN {_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT user_id, day,
  {round_portable_duck(
      f"CASE WHEN len(pka) >= {_N} "
      f"THEN sqrt({K_PARKINSON!r} * ({_fold_mean('pka')})) END"
  )} AS vol_parkinson,
  {round_portable_duck(
      f"CASE WHEN len(pka) >= {_N} AND ({_fold_mean('gka')}) >= 0.0 "
      f"THEN sqrt({_fold_mean('gka')}) END")} AS vol_gk,
  {round_portable_duck(
      f"CASE WHEN len(pka) >= {_N} AND ({_fold_mean('rsa')}) >= 0.0 "
      f"THEN sqrt({_fold_mean('rsa')}) END")} AS vol_rs
FROM f
"""


QUERIES: dict = {
    "barvol_events": (_q_barvol, _ORACLE_BARVOL),
}

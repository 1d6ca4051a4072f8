"""Fourth tier of technical indicators: Ichimoku cloud and classic
floor-trader pivot points — both pure Catalyst (frame max/min + lag
arithmetic; no Python anywhere in the plan).

Ichimoku on a single-price series (high = low = close = value, the
same degradation every single-price indicator here uses):

- ``tenkan``  = (max_p + min_p) / 2 over the last ``p`` rows
- ``kijun``   = (max_q + min_q) / 2 over the last ``q`` rows
- ``senkou_a``= midpoint of tenkan/kijun from ``q`` rows AGO (the
  cloud is plotted forward, so today's cloud edge was computed then)
- ``senkou_b``= (max_r + min_r) / 2 over ``r`` rows, from ``q`` ago
- ``chikou``  = the value from ``q`` rows AHEAD (lagging span)

Pivot points from the PRIOR day's bar (candles.daily_candles):
``P = (H + L + C) / 3``, ``R1 = 2P − L``, ``S1 = 2P − H``,
``R2 = P + (H − L)``, ``S2 = P − (H − L)``.

Scale: one hash shuffle on the series key for the windows (bars for
pivots are already per-day relations). Determinism: frame max/min are
order-free; midpoints and pivot arithmetic are fixed expression trees
over exactly-stored doubles, rounded portably.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .candles import _BARS_CTE, daily_candles

__all__ = ["ichimoku", "pivot_points"]


def _row_window(keys: Sequence[str], order: Sequence[str]):
    return Window.partitionBy(*keys).orderBy(
        *[F.col(c).asc() for c in order]
    )


def ichimoku(df: DataFrame, value_col: str, keys: Sequence[str],
             order: Sequence[str], p: int = 9, q: int = 26,
             r: int = 52) -> DataFrame:
    """Append tenkan/kijun/senkou_a/senkou_b/chikou (NULL until the
    relevant frame fills; senkou lines need a further ``q``-row
    history, chikou a ``q``-row future)."""
    wrow = _row_window(keys, order)

    def mid(n: int) -> F.Column:
        w = wrow.rowsBetween(-(n - 1), 0)
        full = F.count(F.col(value_col)).over(w) >= n
        return F.when(
            full,
            (F.max(value_col).over(w) + F.min(value_col).over(w))
            / F.lit(2.0),
        )

    staged = (
        df.withColumn("__tenkan", mid(p))
        .withColumn("__kijun", mid(q))
        .withColumn("__spanb_now", mid(r))
    )
    senkou_a = F.lag(
        (F.col("__tenkan") + F.col("__kijun")) / F.lit(2.0), q
    ).over(wrow)
    senkou_b = F.lag(F.col("__spanb_now"), q).over(wrow)
    chikou = F.lead(F.col(value_col), q).over(wrow)
    return (
        staged
        .withColumn("tenkan", round_portable(F.col("__tenkan")))
        .withColumn("kijun", round_portable(F.col("__kijun")))
        .withColumn("senkou_a", round_portable(senkou_a))
        .withColumn("senkou_b", round_portable(senkou_b))
        .withColumn("chikou", round_portable(chikou))
        .drop("__tenkan", "__kijun", "__spanb_now")
    )


def pivot_points(bars: DataFrame, keys: Sequence[str] = ("user_id",),
                 order: Sequence[str] = ("day",)) -> DataFrame:
    """Append pivot/r1/s1/r2/s2 from each bar's PRIOR bar (first bar
    of a key has no priors — NULL)."""
    wrow = _row_window(keys, order)
    ph = F.lag("high", 1).over(wrow)
    pl = F.lag("low", 1).over(wrow)
    pc = F.lag("close", 1).over(wrow)
    staged = (
        bars.withColumn("__ph", ph).withColumn("__pl", pl)
        .withColumn("__pp", (ph + pl + pc) / F.lit(3.0))
    )
    return (
        staged
        .withColumn("pivot", round_portable(F.col("__pp")))
        .withColumn("r1", round_portable(
            F.lit(2.0) * F.col("__pp") - F.col("__pl")))
        .withColumn("s1", round_portable(
            F.lit(2.0) * F.col("__pp") - F.col("__ph")))
        .withColumn("r2", round_portable(
            F.col("__pp") + (F.col("__ph") - F.col("__pl"))))
        .withColumn("s2", round_portable(
            F.col("__pp") - (F.col("__ph") - F.col("__pl"))))
        .drop("__ph", "__pl", "__pp")
    )


# ---------------------------------------------------------------------------
# Gate queries (R05 queue). Ichimoku params scale to the ~66-99
# rows/user event series (5/10/20 instead of 9/26/52) so every output
# column is populated at every sf.
# ---------------------------------------------------------------------------

_P, _Q, _R = 5, 10, 20
_EVENTS_W = "PARTITION BY user_id ORDER BY ts, event_id"


def _q_ichimoku(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ichimoku(load(spark, sf_dir, "events"), "value",
                   ["user_id"], ["ts", "event_id"], p=_P, q=_Q, r=_R)
    return out.select("user_id", "event_id", "tenkan", "kijun",
                      "senkou_a", "senkou_b", "chikou")


def _duck_mid(n: int, alias: str) -> str:
    w = (f"({_EVENTS_W} ROWS BETWEEN {n - 1} PRECEDING "
         f"AND CURRENT ROW)")
    return (
        f"CASE WHEN count(value) OVER {w} >= {n} THEN "
        f"(max(value) OVER {w} + min(value) OVER {w}) / 2.0 END"
        f" AS {alias}"
    )


_ORACLE_ICHIMOKU = f"""
WITH s AS (
  SELECT user_id, event_id, ts, value,
         {_duck_mid(_P, "tk")},
         {_duck_mid(_Q, "kj")},
         {_duck_mid(_R, "sbn")}
  FROM events
), l AS (
  SELECT user_id, event_id,
         tk, kj,
         lag((tk + kj) / 2.0, {_Q}) OVER ({_EVENTS_W}) AS sa,
         lag(sbn, {_Q}) OVER ({_EVENTS_W}) AS sb,
         lead(value, {_Q}) OVER ({_EVENTS_W}) AS ck
  FROM s
)
SELECT user_id, event_id,
  {round_portable_duck("tk")} AS tenkan,
  {round_portable_duck("kj")} AS kijun,
  {round_portable_duck("sa")} AS senkou_a,
  {round_portable_duck("sb")} AS senkou_b,
  {round_portable_duck("ck")} AS chikou
FROM l
"""


def _q_pivots(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = daily_candles(load(spark, sf_dir, "events"))
    out = pivot_points(bars)
    return out.select("user_id", "day", "pivot", "r1", "s1", "r2", "s2")


_BARS_W = "PARTITION BY user_id ORDER BY day ASC"

_ORACLE_PIVOTS = f"""
WITH {_BARS_CTE},
l AS (
  SELECT user_id, day,
         lag(high) OVER ({_BARS_W}) AS ph,
         lag(low) OVER ({_BARS_W}) AS pl,
         (lag(high) OVER ({_BARS_W}) + lag(low) OVER ({_BARS_W})
          + lag(close) OVER ({_BARS_W})) / 3.0 AS pp
  FROM bars
)
SELECT user_id, day,
  {round_portable_duck("pp")} AS pivot,
  {round_portable_duck("2.0 * pp - pl")} AS r1,
  {round_portable_duck("2.0 * pp - ph")} AS s1,
  {round_portable_duck("pp + (ph - pl)")} AS r2,
  {round_portable_duck("pp - (ph - pl)")} AS s2
FROM l
"""


QUERIES: dict = {
    "ind_ichimoku_events": (_q_ichimoku, _ORACLE_ICHIMOKU),
    "ind_pivots_events": (_q_pivots, _ORACLE_PIVOTS),
}

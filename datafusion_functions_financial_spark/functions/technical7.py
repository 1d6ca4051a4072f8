"""Tier-7 technical indicators: the volume-flow and multi-horizon
momentum family over intraday (hourly) OHLC bars — Chaikin Money
Flow, the Accumulation/Distribution line, the Ultimate Oscillator,
Balance of Power, and the Know Sure Thing (KST) oscillator. All five
are CLOSED-FORM window compositions (no recursion), so unlike the
EMA-seeded tiers they need no fold kernel: every value is a ratio of
windowed sums.

- ``cmf`` (20): money-flow multiplier ((c-l)-(h-c))/(h-l) times bar
  volume, summed over the window and normalized by the volume sum.
- ``adl``: the running (unbounded-preceding) money-flow-volume sum.
- ``ultimate`` (7/14/28): buying pressure c - min(l, prev_c) over
  true range, blended 4:2:1 across the three horizons.
- ``bop`` (+SMA 14): (c - o)/(h - l) per bar, flat-bar -> 0.
- ``kst`` (10/15/20/30 ROC; 10/10/10/15 SMA; weights 1..4).

Engine-exactness: every per-bar term (money-flow volume, buying
pressure, true range, BOP, ROC) quantizes to BIGINT at 1e8 BEFORE
any window sum (window sums then add integers — associative, so
Spark's sequential frame evaluation and DuckDB's segment tree agree
bit-for-bit); warmup rows emit NULL via full-window row-number
gates. Bars come from ``ohlcv_bars``'s min_by/max_by staging, the
same engine-exact chain the gated ``vol_parkinson_gk_events`` uses
((user_id, ts) is unique, so arg ties cannot occur).

Plan shape at 100 TB: one hash aggregate to hourly bars (map-side
combinable), then one shuffle on the series key for all window
expressions — every indicator in a tier shares that single sort.
No UDFs, no self-joins; whole-stage codegen end to end.

Reference anchor: extends the reference's indicator surface
(src/functions/{sma,ema,rsi,macd}.rs) with the standard
volume/momentum tier, re-derived closed-form per SURVEY.md
extension scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .bars import ohlcv_bars

__all__ = ["cmf", "adl", "ultimate_oscillator", "balance_of_power",
           "kst"]

Q = 10 ** 8
QF = float(Q)
CMF_N = 20
UO_FAST, UO_MID, UO_SLOW = 7, 14, 28
BOP_N = 14
KST_ROCS = (10, 15, 20, 30)
KST_SMAS = (10, 10, 10, 15)
BAR_SECONDS = 3600

_MULT = ("CASE WHEN high > low THEN "
         "((close - low) - (high - close)) / (high - low) "
         "ELSE CAST(0 AS DOUBLE) END")
_MFVQ = (f"CAST(round(({_MULT}) * CAST(n_ticks AS DOUBLE) * {Q}) "
         f"AS BIGINT)")
_BOP = ("CASE WHEN high > low THEN (close - open) / (high - low) "
        "ELSE CAST(0 AS DOUBLE) END")


def _bars(df: DataFrame, us_col: str, price_col: str,
          keys: list[str]) -> DataFrame:
    return ohlcv_bars(df, us_col, price_col, keys,
                      bar_seconds=BAR_SECONDS)


def cmf(df: DataFrame, us_col: str, price_col: str,
        keys: list[str], n: int = CMF_N) -> DataFrame:
    """(keys..., bar_start, cmf): Chaikin Money Flow over ``n`` hourly
    bars (volume = tick count); NULL until the window fills."""
    b = _bars(df, us_col, price_col, keys)
    w = Window.partitionBy(*keys).orderBy("bar_start")
    wn = w.rowsBetween(-(n - 1), 0)
    out = (
        b.withColumn("__rn", F.row_number().over(w))
        .withColumn("__mfv", F.sum(F.expr(_MFVQ)).over(wn))
        .withColumn("__vol", F.sum("n_ticks").over(wn))
    )
    return out.select(
        *keys, "bar_start",
        round_portable(F.expr(
            f"CASE WHEN __rn >= {n} AND __vol > 0 THEN "
            f"CAST(__mfv AS DOUBLE) / {QF!r} "
            f"/ CAST(__vol AS DOUBLE) END"), 6).alias("cmf"),
    )


def adl(df: DataFrame, us_col: str, price_col: str,
        keys: list[str]) -> DataFrame:
    """(keys..., bar_start, adl): the Accumulation/Distribution line
    (running money-flow-volume sum, exact BIGINT cumulative)."""
    b = _bars(df, us_col, price_col, keys)
    w = (Window.partitionBy(*keys).orderBy("bar_start")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        b.withColumn("__adl", F.sum(F.expr(_MFVQ)).over(w))
        .select(*keys, "bar_start",
                round_portable(F.expr(
                    f"CAST(__adl AS DOUBLE) / {QF!r}"), 6)
                .alias("adl"))
    )


def ultimate_oscillator(df: DataFrame, us_col: str, price_col: str,
                        keys: list[str]) -> DataFrame:
    """(keys..., bar_start, uo): the 7/14/28 Ultimate Oscillator;
    NULL until the slow window fills (and whenever a true-range sum
    is zero)."""
    b = _bars(df, us_col, price_col, keys)
    w = Window.partitionBy(*keys).orderBy("bar_start")
    pc = "lag(close) OVER (PARTITION BY {k} ORDER BY bar_start)"
    pcs = pc.format(k=", ".join(keys))
    bp = f"(close - least(low, {pcs}))"
    tr = f"(greatest(high, {pcs}) - least(low, {pcs}))"
    staged = (
        b.withColumn("__rn", F.row_number().over(w))
        .withColumn("__bpq", F.expr(
            f"CAST(round(({bp}) * {Q}) AS BIGINT)"))
        .withColumn("__trq", F.expr(
            f"CAST(round(({tr}) * {Q}) AS BIGINT)"))
    )
    sums = staged
    for lbl, n in (("f", UO_FAST), ("m", UO_MID), ("s", UO_SLOW)):
        wn = w.rowsBetween(-(n - 1), 0)
        sums = (sums
                .withColumn(f"__bp{lbl}", F.sum("__bpq").over(wn))
                .withColumn(f"__tr{lbl}", F.sum("__trq").over(wn)))
    avg = "(CAST(__bp{l} AS DOUBLE) / CAST(__tr{l} AS DOUBLE))"
    return sums.select(
        *keys, "bar_start",
        round_portable(F.expr(
            f"CASE WHEN __rn >= {UO_SLOW + 1} AND __trf > 0 "
            f"AND __trm > 0 AND __trs > 0 THEN "
            f"100.0 * (4.0 * {avg.format(l='f')} "
            f"+ 2.0 * {avg.format(l='m')} "
            f"+ {avg.format(l='s')}) / 7.0 END"), 6).alias("uo"),
    )


def balance_of_power(df: DataFrame, us_col: str, price_col: str,
                     keys: list[str], n: int = BOP_N) -> DataFrame:
    """(keys..., bar_start, bop, bop_sma): per-bar Balance of Power
    and its ``n``-bar SMA (NULL until the window fills)."""
    b = _bars(df, us_col, price_col, keys)
    w = Window.partitionBy(*keys).orderBy("bar_start")
    wn = w.rowsBetween(-(n - 1), 0)
    out = (
        b.withColumn("__rn", F.row_number().over(w))
        .withColumn("__bq", F.expr(
            f"CAST(round(({_BOP}) * {Q}) AS BIGINT)"))
        .withColumn("__bs", F.sum("__bq").over(wn))
    )
    return out.select(
        *keys, "bar_start",
        round_portable(F.expr(_BOP), 6).alias("bop"),
        round_portable(F.expr(
            f"CASE WHEN __rn >= {n} THEN CAST(__bs AS DOUBLE) "
            f"/ ({n}.0 * {QF!r}) END"), 6).alias("bop_sma"),
    )


def kst(df: DataFrame, us_col: str, price_col: str,
        keys: list[str]) -> DataFrame:
    """(keys..., bar_start, kst): the Know Sure Thing oscillator —
    weighted sum of smoothed rates of change (ROC 10/15/20/30, SMA
    10/10/10/15, weights 1..4); NULL until every component fills."""
    b = _bars(df, us_col, price_col, keys)
    w = Window.partitionBy(*keys).orderBy("bar_start")
    kpart = ", ".join(keys)
    staged = b.withColumn("__rn", F.row_number().over(w))
    for i, rn in enumerate(KST_ROCS, 1):
        lagc = (f"lag(close, {rn}) OVER "
                f"(PARTITION BY {kpart} ORDER BY bar_start)")
        # a zero prior close has no defined ROC (and divides by zero
        # under ANSI); such rows poison their window via the count
        # gate below rather than silently shrinking the SMA
        roc = (f"CASE WHEN ({lagc}) <> CAST(0 AS DOUBLE) THEN "
               f"(100.0 * (close / ({lagc}) - 1.0)) END")
        staged = staged.withColumn(f"__r{i}q", F.expr(
            f"CAST(round(({roc}) * {Q}) AS BIGINT)"))
    for i, sn in enumerate(KST_SMAS, 1):
        wn = w.rowsBetween(-(sn - 1), 0)
        staged = (staged
                  .withColumn(f"__s{i}", F.sum(f"__r{i}q").over(wn))
                  .withColumn(f"__c{i}", F.count(f"__r{i}q").over(wn)))
    warm = max(r + s for r, s in zip(KST_ROCS, KST_SMAS))
    full = " AND ".join(
        f"__c{i} = {sn}" for i, sn in enumerate(KST_SMAS, 1))
    comps = " + ".join(
        f"{i}.0 * CAST(__s{i} AS DOUBLE) / ({sn}.0 * {QF!r})"
        for i, sn in enumerate(KST_SMAS, 1))
    return staged.select(
        *keys, "bar_start",
        round_portable(F.expr(
            f"CASE WHEN __rn >= {warm} AND {full} THEN {comps} END"),
            6).alias("kst"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (hourly bars from events, per user)
# --------------------------------------------------------------------------


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))


def _q_cmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cmf(_ev(spark, sf_dir), "__us", "value", ["user_id"])


def _q_adl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return adl(_ev(spark, sf_dir), "__us", "value", ["user_id"])


def _q_uo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ultimate_oscillator(_ev(spark, sf_dir), "__us", "value",
                               ["user_id"])


def _q_bop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return balance_of_power(_ev(spark, sf_dir), "__us", "value",
                            ["user_id"])


def _q_kst(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kst(_ev(spark, sf_dir), "__us", "value", ["user_id"])


_BARS_DUCK = f"""bars AS (
  SELECT user_id,
         (epoch_us(ts) // {BAR_SECONDS * 1_000_000}) * {BAR_SECONDS}
           AS bar_start,
         arg_min(value, epoch_us(ts)) AS open,
         max(value) AS high,
         min(value) AS low,
         arg_max(value, epoch_us(ts)) AS close,
         CAST(count(*) AS BIGINT) AS n_ticks
  FROM events GROUP BY 1, 2
)"""

_ORACLE_CMF = f"""
WITH {_BARS_DUCK}, st AS (
  SELECT user_id, bar_start,
         row_number() OVER w AS rn,
         CAST(sum({_MFVQ}) OVER (w ROWS BETWEEN {CMF_N - 1} PRECEDING
           AND CURRENT ROW) AS BIGINT) AS mfv,
         CAST(sum(n_ticks) OVER (w ROWS BETWEEN {CMF_N - 1} PRECEDING
           AND CURRENT ROW) AS BIGINT) AS vol
  FROM bars
  WINDOW w AS (PARTITION BY user_id ORDER BY bar_start)
)
SELECT user_id, bar_start,
  CASE WHEN rn >= {CMF_N} AND vol > 0 THEN {round_portable_duck(
      f"CAST(mfv AS DOUBLE) / {QF!r} / CAST(vol AS DOUBLE)", 6)}
  END AS cmf
FROM st
"""

_ORACLE_ADL = f"""
WITH {_BARS_DUCK}, st AS (
  SELECT user_id, bar_start,
         CAST(sum({_MFVQ}) OVER (
           PARTITION BY user_id ORDER BY bar_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS adlq
  FROM bars
)
SELECT user_id, bar_start,
  {round_portable_duck(f"CAST(adlq AS DOUBLE) / {QF!r}", 6)} AS adl
FROM st
"""

_PC_DUCK = "lag(close) OVER (PARTITION BY user_id ORDER BY bar_start)"
_BP_DUCK = f"(close - least(low, {_PC_DUCK}))"
_TR_DUCK = f"(greatest(high, {_PC_DUCK}) - least(low, {_PC_DUCK}))"
_UO_AVG = "(CAST(bp{l} AS DOUBLE) / CAST(tr{l} AS DOUBLE))"

_ORACLE_UO = f"""
WITH {_BARS_DUCK}, st AS (
  SELECT user_id, bar_start,
         row_number() OVER w AS rn,
         CAST(round(({_BP_DUCK}) * {Q}) AS BIGINT) AS bpq,
         CAST(round(({_TR_DUCK}) * {Q}) AS BIGINT) AS trq
  FROM bars
  WINDOW w AS (PARTITION BY user_id ORDER BY bar_start)
), sums AS (
  SELECT user_id, bar_start, rn,
    CAST(sum(bpq) OVER (w ROWS BETWEEN {UO_FAST - 1} PRECEDING
      AND CURRENT ROW) AS BIGINT) AS bpf,
    CAST(sum(trq) OVER (w ROWS BETWEEN {UO_FAST - 1} PRECEDING
      AND CURRENT ROW) AS BIGINT) AS trf,
    CAST(sum(bpq) OVER (w ROWS BETWEEN {UO_MID - 1} PRECEDING
      AND CURRENT ROW) AS BIGINT) AS bpm,
    CAST(sum(trq) OVER (w ROWS BETWEEN {UO_MID - 1} PRECEDING
      AND CURRENT ROW) AS BIGINT) AS trm,
    CAST(sum(bpq) OVER (w ROWS BETWEEN {UO_SLOW - 1} PRECEDING
      AND CURRENT ROW) AS BIGINT) AS bps,
    CAST(sum(trq) OVER (w ROWS BETWEEN {UO_SLOW - 1} PRECEDING
      AND CURRENT ROW) AS BIGINT) AS trs
  FROM st
  WINDOW w AS (PARTITION BY user_id ORDER BY bar_start)
)
SELECT user_id, bar_start,
  CASE WHEN rn >= {UO_SLOW + 1} AND trf > 0 AND trm > 0
    AND trs > 0 THEN {round_portable_duck(
      f"100.0 * (4.0 * {_UO_AVG.format(l='f')} "
      f"+ 2.0 * {_UO_AVG.format(l='m')} "
      f"+ {_UO_AVG.format(l='s')}) / 7.0", 6)}
  END AS uo
FROM sums
"""

_ORACLE_BOP = f"""
WITH {_BARS_DUCK}, st AS (
  SELECT user_id, bar_start,
         row_number() OVER w AS rn,
         {_BOP} AS bop,
         CAST(sum(CAST(round(({_BOP}) * {Q}) AS BIGINT)) OVER (
           w ROWS BETWEEN {BOP_N - 1} PRECEDING AND CURRENT ROW)
         AS BIGINT) AS bs
  FROM bars
  WINDOW w AS (PARTITION BY user_id ORDER BY bar_start)
)
SELECT user_id, bar_start,
  {round_portable_duck("bop", 6)} AS bop,
  CASE WHEN rn >= {BOP_N} THEN {round_portable_duck(
      f"CAST(bs AS DOUBLE) / ({BOP_N}.0 * {QF!r})", 6)}
  END AS bop_sma
FROM st
"""


def _kst_roc_duck(n: int) -> str:
    lagc = (f"lag(close, {n}) OVER "
            f"(PARTITION BY user_id ORDER BY bar_start)")
    return (f"CASE WHEN ({lagc}) <> CAST(0 AS DOUBLE) THEN "
            f"(100.0 * (close / ({lagc}) - 1.0)) END")


_KST_WARM = max(r + s for r, s in zip(KST_ROCS, KST_SMAS))
_KST_ROC_COLS = ",\n         ".join(
    f"CAST(round(({_kst_roc_duck(rn)}) * {Q}) AS BIGINT) AS r{i}q"
    for i, rn in enumerate(KST_ROCS, 1))
_KST_SUM_COLS = ",\n    ".join(
    f"CAST(sum(r{i}q) OVER (w ROWS BETWEEN {sn - 1} PRECEDING "
    f"AND CURRENT ROW) AS BIGINT) AS s{i},\n    "
    f"count(r{i}q) OVER (w ROWS BETWEEN {sn - 1} PRECEDING "
    f"AND CURRENT ROW) AS c{i}"
    for i, sn in enumerate(KST_SMAS, 1))
_KST_FULL = " AND ".join(
    f"c{i} = {sn}" for i, sn in enumerate(KST_SMAS, 1))
_KST_COMPS = " + ".join(
    f"{i}.0 * CAST(s{i} AS DOUBLE) / ({sn}.0 * {QF!r})"
    for i, sn in enumerate(KST_SMAS, 1))

_ORACLE_KST = f"""
WITH {_BARS_DUCK}, st AS (
  SELECT user_id, bar_start,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY bar_start) AS rn,
         {_KST_ROC_COLS}
  FROM bars
), sums AS (
  SELECT user_id, bar_start, rn,
    {_KST_SUM_COLS}
  FROM st
  WINDOW w AS (PARTITION BY user_id ORDER BY bar_start)
)
SELECT user_id, bar_start,
  CASE WHEN rn >= {_KST_WARM} AND {_KST_FULL}
  THEN {round_portable_duck(_KST_COMPS, 6)}
  END AS kst
FROM sums
"""


QUERIES: dict = {
    "ind_cmf_events": (_q_cmf, _ORACLE_CMF),
    "ind_adl_events": (_q_adl, _ORACLE_ADL),
    "ind_ultimate_events": (_q_uo, _ORACLE_UO),
    "ind_bop_events": (_q_bop, _ORACLE_BOP),
    "ind_kst_events": (_q_kst, _ORACLE_KST),
}

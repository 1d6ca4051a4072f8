"""Market-relative performance tier #4: upside/downside capture
ratios and the Jensen-alpha / Treynor pair — the attribution
companions to the gated per-key beta (``q_market_beta_events``):
beta says how much a key co-moves with the market; capture says how
asymmetric that co-movement is (a key can be low-beta overall yet
capture 120% of down moves), and alpha/Treynor say whether the key
earns more than its beta explains. Risk-free rate is 0 by contract
(the synthetic series carry no funding leg).

- ``capture_ratios``: per key, sum of key returns over sum of market
  returns restricted to market-up buckets (upside) and market-down
  buckets (downside) — the total-return form, an exact ratio of two
  BIGINT fixed-point sums.
- ``jensen_treynor``: per key, the OLS beta (same moments as the
  gated beta), alpha = mean(r_key) - beta * mean(r_mkt) per bucket,
  and Treynor = mean(r_key) / beta (NULL when beta is 0 or the
  moment determinant degenerates).

Both run on ``plans.portfolio.key_vs_market_quantized`` — the exact
(key, bucket, qx, qy) 1e6 fixed-point staging the gated beta uses
(the oracle reuses ``portfolio.ORACLE_RET_PREFIX`` so the chains
cannot drift).

Engine-exactness: every aggregate is an exact BIGINT sum of
quantized returns (conditional sums included); the only doubles are
the final ratios.

Plan shape at 100 TB: the tick table shuffles once into (key,
bucket) prices; the bucket-count-sized market series broadcasts;
capture and alpha are one map-side-combinable hash aggregate each.

Reference anchor: extends the reference's indicator/risk surface per
SURVEY.md extension scope (financial tier).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.portfolio import (
    _WEIGHTS, BUCKET_NS, ORACLE_RET_PREFIX, key_vs_market_quantized,
)
from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["capture_ratios", "jensen_treynor"]


def capture_ratios(df: DataFrame, weights_bp: Mapping[int, int],
                   key_col: str = "user_id", ts_ns_col: str = "ts",
                   value_col: str = "value",
                   bucket_ns: int = BUCKET_NS) -> DataFrame:
    """(key, n_up, n_down, upside_capture, downside_capture): total
    key return over total market return, split by the market's sign
    (zero-return market buckets belong to neither side; a side with
    zero market mass reports NULL)."""
    j = key_vs_market_quantized(df, weights_bp, key_col, ts_ns_col,
                                value_col, bucket_ns)
    agg = j.groupBy("key").agg(
        F.sum(F.expr("CASE WHEN qx > 0 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_up"),
        F.sum(F.expr("CASE WHEN qx < 0 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_down"),
        F.sum(F.expr("CASE WHEN qx > 0 THEN qy ELSE 0 END"))
        .cast("bigint").alias("__uy"),
        F.sum(F.expr("CASE WHEN qx > 0 THEN qx ELSE 0 END"))
        .cast("bigint").alias("__ux"),
        F.sum(F.expr("CASE WHEN qx < 0 THEN qy ELSE 0 END"))
        .cast("bigint").alias("__dy"),
        F.sum(F.expr("CASE WHEN qx < 0 THEN qx ELSE 0 END"))
        .cast("bigint").alias("__dx"),
    )
    return agg.select(
        "key", "n_up", "n_down",
        round_portable(F.expr(
            "CASE WHEN __ux != 0 THEN CAST(__uy AS DOUBLE) "
            "/ CAST(__ux AS DOUBLE) END"), 6).alias("upside_capture"),
        round_portable(F.expr(
            "CASE WHEN __dx != 0 THEN CAST(__dy AS DOUBLE) "
            "/ CAST(__dx AS DOUBLE) END"), 6)
        .alias("downside_capture"),
    )


def jensen_treynor(df: DataFrame, weights_bp: Mapping[int, int],
                   key_col: str = "user_id", ts_ns_col: str = "ts",
                   value_col: str = "value",
                   bucket_ns: int = BUCKET_NS,
                   min_obs: int = 5) -> DataFrame:
    """(key, n, beta, alpha, treynor): per-bucket Jensen's alpha and
    the Treynor ratio at rf = 0, from the same exact moment sums as
    the gated beta (alpha/treynor NULL whenever beta is)."""
    j = key_vs_market_quantized(df, weights_bp, key_col, ts_ns_col,
                                value_col, bucket_ns)
    mom = j.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qx").cast("bigint").alias("__sx"),
        F.sum("qy").cast("bigint").alias("__sy"),
        F.sum(F.expr("qx * qy")).cast("bigint").alias("__sxy"),
        F.sum(F.expr("qx * qx")).cast("bigint").alias("__sxx"),
    )
    beta = (f"CASE WHEN n >= {min_obs} "
            "AND (n * __sxx - __sx * __sx) != 0 THEN "
            "CAST(n * __sxy - __sx * __sy AS DOUBLE) "
            "/ CAST(n * __sxx - __sx * __sx AS DOUBLE) END")
    # means back in return units (the 1e6 quantization divides out)
    my = "(CAST(__sy AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)"
    mx = "(CAST(__sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)"
    return mom.select(
        "key", "n",
        round_portable(F.expr(beta), 6).alias("beta"),
        round_portable(F.expr(
            f"{my} - ({beta}) * {mx}"), 6).alias("alpha"),
        round_portable(F.expr(
            f"CASE WHEN ({beta}) != 0.0 THEN {my} / ({beta}) END"),
            6).alias("treynor"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (the gated-beta staging, reused
# verbatim via portfolio.ORACLE_RET_PREFIX)
# --------------------------------------------------------------------------


def _q_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return capture_ratios(load(spark, sf_dir, "events"), _WEIGHTS)


def _q_jensen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jensen_treynor(load(spark, sf_dir, "events"), _WEIGHTS)


_ORACLE_CAPTURE = ORACLE_RET_PREFIX + f""", agg AS (
  SELECT key,
    CAST(sum(CASE WHEN qx > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
    CAST(sum(CASE WHEN qx < 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_down,
    CAST(sum(CASE WHEN qx > 0 THEN qy ELSE 0 END) AS BIGINT) AS uy,
    CAST(sum(CASE WHEN qx > 0 THEN qx ELSE 0 END) AS BIGINT) AS ux,
    CAST(sum(CASE WHEN qx < 0 THEN qy ELSE 0 END) AS BIGINT) AS dy,
    CAST(sum(CASE WHEN qx < 0 THEN qx ELSE 0 END) AS BIGINT) AS dx
  FROM uret JOIN mret USING (bucket)
  GROUP BY key
)
SELECT key, n_up, n_down,
  {round_portable_duck(
      "CASE WHEN ux != 0 THEN CAST(uy AS DOUBLE) "
      "/ CAST(ux AS DOUBLE) END", 6)} AS upside_capture,
  {round_portable_duck(
      "CASE WHEN dx != 0 THEN CAST(dy AS DOUBLE) "
      "/ CAST(dx AS DOUBLE) END", 6)} AS downside_capture
FROM agg
"""

_D_BETA = ("CASE WHEN n >= 5 AND (n * sxx - sx * sx) != 0 THEN "
           "CAST(n * sxy - sx * sy AS DOUBLE) "
           "/ CAST(n * sxx - sx * sx AS DOUBLE) END")
_D_MY = "(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)"
_D_MX = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)"

_ORACLE_JENSEN = ORACLE_RET_PREFIX + f""", mom AS (
  SELECT key,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qx) AS BIGINT) AS sx,
         CAST(sum(qy) AS BIGINT) AS sy,
         CAST(sum(qx * qy) AS BIGINT) AS sxy,
         CAST(sum(qx * qx) AS BIGINT) AS sxx
  FROM uret JOIN mret USING (bucket)
  GROUP BY key
)
SELECT key, n,
  {round_portable_duck(_D_BETA, 6)} AS beta,
  {round_portable_duck(
      f"{_D_MY} - ({_D_BETA}) * {_D_MX}", 6)} AS alpha,
  {round_portable_duck(
      f"CASE WHEN ({_D_BETA}) != 0.0 THEN {_D_MY} / ({_D_BETA}) END",
      6)} AS treynor
FROM mom
"""


QUERIES: dict = {
    "risk_capture_events": (_q_capture, _ORACLE_CAPTURE),
    "risk_jensen_treynor_events": (_q_jensen, _ORACLE_JENSEN),
}

"""Risk backtesting #3: the Kupiec proportion-of-failures test and
Christoffersen's independence test — the BACKTEST tier the gated
risk measures report into: ``risk_var_cvar_events`` produces a VaR;
these two say whether a VaR is any good — do violations happen at
the promised rate (Kupiec, 1995), and do they CLUSTER (Christoffersen,
1998 — clustered violations mean the model misses volatility
regimes even when the headline rate looks right).

Staging: hourly log returns of the mean-price series (the micro6
bucket staging, one global series); VaR_p = the empirical p-quantile
of the returns (in-sample — the documented contract; a production
backtest would pass a held-out VaR column). A violation is
r < VaR_p.

  LR_pof = -2[ (n-x) ln(1-p) + x ln p
               - (n-x) ln(1-x/n) - x ln(x/n) ]
  LR_ind = -2[ (n00+n10) ln(1-pi) + (n01+n11) ln pi
               - n00 ln(1-pi01) - n01 ln pi01
               - n10 ln(1-pi11) - n11 ln pi11 ]

with pi01 = n01/(n00+n01), pi11 = n11/(n10+n11),
pi = (n01+n11)/(n00+n01+n10+n11). Degenerate cells (x = 0, a pi of
0/1) zero their ln terms by the CASE guards — the standard
convention, identical on both engines.

Engine-exactness: violation indicators compare against the portably
rounded quantile (both engines cut on the same double); transition
counts are exact BIGINT LAG aggregates over the bounded hourly
series; the LR formulas combine scalars.

Plan shape at 100 TB: one hash aggregate to the hourly series,
windows over THAT bounded relation only, two scalar reductions.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (risk tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["kupiec_pof", "christoffersen_independence"]

US_PER_HOUR = 3_600_000_000
VAR_P = 0.05


def _returns(df: DataFrame, us_expr: str,
             price_col: str) -> DataFrame:
    """(__h, __r): hourly log returns of the global mean-price
    series (exact cent sums; the micro6 bucket staging)."""
    b = (
        df.select(
            F.expr(f"({us_expr}) DIV {US_PER_HOUR}").alias("__h"),
            F.expr(f"CAST(round(({price_col}) * 100) AS BIGINT)")
            .alias("__c"),
        )
        .filter("__c IS NOT NULL")
        .groupBy("__h")
        .agg(F.sum("__c").alias("__sc"),
             F.count(F.lit(1)).cast("bigint").alias("__n"))
        .select("__h", F.expr(
            "CAST(__sc AS DOUBLE) / 100.0 / CAST(__n AS DOUBLE)")
            .alias("__p"))
        .filter("__p > 0.0")
    )
    w = Window.orderBy("__h")
    return (
        b.withColumn("__r", F.expr("ln(__p)")
                     - F.lag(F.expr("ln(__p)")).over(w))
        .filter("__r IS NOT NULL")
        .select("__h", "__r")
    )


def _violations(rets: DataFrame, p: float) -> DataFrame:
    """(__h, __v): violation indicator vs the portably rounded
    in-sample empirical p-quantile."""
    q = rets.agg(round_portable(
        F.expr(f"percentile(__r, {p!r})"), 6).alias("__q"))
    return (
        rets.crossJoin(F.broadcast(q))
        .select("__h", F.expr(
            "CASE WHEN __r < __q THEN 1 ELSE 0 END").alias("__v"))
    )


def kupiec_pof(df: DataFrame, us_expr: str, price_col: str,
               p: float = VAR_P) -> DataFrame:
    """One row (n, n_violations, viol_rate, lr_pof): Kupiec's
    proportion-of-failures likelihood ratio for VaR_p."""
    v = _violations(_returns(df, us_expr, price_col), p)
    red = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__v").cast("bigint").alias("n_violations"),
    )
    x = "CAST(n_violations AS DOUBLE)"
    n = "CAST(n AS DOUBLE)"
    rate = f"({x} / {n})"
    lnull = (f"(({n} - {x}) * ln(1.0 - {p!r}) + "
             f"CASE WHEN n_violations > 0 THEN {x} * ln({p!r}) "
             f"ELSE 0.0 END)")
    lalt = (f"(CASE WHEN n_violations < n THEN "
            f"({n} - {x}) * ln(1.0 - {rate}) ELSE 0.0 END + "
            f"CASE WHEN n_violations > 0 THEN {x} * ln({rate}) "
            f"ELSE 0.0 END)")
    return red.select(
        "n", "n_violations",
        round_portable(F.expr(rate), 6).alias("viol_rate"),
        round_portable(F.expr(
            f"-2.0 * ({lnull} - {lalt})"), 6).alias("lr_pof"),
    )


def christoffersen_independence(df: DataFrame, us_expr: str,
                                price_col: str,
                                p: float = VAR_P) -> DataFrame:
    """One row (n00, n01, n10, n11, lr_ind): Christoffersen's
    violation-clustering likelihood ratio."""
    v = _violations(_returns(df, us_expr, price_col), p)
    w = Window.orderBy("__h")
    t = (
        v.withColumn("__pv", F.lag("__v").over(w))
        .filter("__pv IS NOT NULL")
    )
    red = t.agg(*[
        F.sum(F.expr(f"CASE WHEN __pv = {a} AND __v = {b} "
                     f"THEN 1 ELSE 0 END")).cast("bigint")
        .alias(f"n{a}{b}")
        for a in (0, 1) for b in (0, 1)
    ])

    def _d(e):
        return f"CAST({e} AS DOUBLE)"

    pi01 = f"({_d('n01')} / {_d('n00 + n01')})"
    pi11 = f"({_d('n11')} / {_d('n10 + n11')})"
    pi = f"({_d('n01 + n11')} / {_d('n00 + n01 + n10 + n11')})"

    def _term(count, prob):
        return (f"CASE WHEN {count} > 0 THEN {_d(count)} "
                f"* ln({prob}) ELSE 0.0 END")

    lnull = (f"({_term('n00 + n10', f'1.0 - {pi}')} "
             f"+ {_term('n01 + n11', pi)})")
    lalt = (f"({_term('n00', f'1.0 - {pi01}')} "
            f"+ {_term('n01', pi01)} "
            f"+ {_term('n10', f'1.0 - {pi11}')} "
            f"+ {_term('n11', pi11)})")
    return red.select(
        "n00", "n01", "n10", "n11",
        round_portable(F.expr(
            f"-2.0 * ({lnull} - {lalt})"), 6).alias("lr_ind"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (price = value — the micro staging;
# ts is ns-BIGINT on Spark, us-TIMESTAMP in DuckDB)
# --------------------------------------------------------------------------


def _q_kupiec(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kupiec_pof(load(spark, sf_dir, "events"), "ts DIV 1000",
                      "value")


def _q_christoffersen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return christoffersen_independence(
        load(spark, sf_dir, "events"), "ts DIV 1000", "value")


_DUCK_RETS = f"""b AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS h,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
      / 100.0 / CAST(count(*) AS DOUBLE) AS p
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
), rets AS (
  SELECT h, r FROM (
    SELECT h, ln(p) - lag(ln(p)) OVER (ORDER BY h) AS r
    FROM b WHERE p > 0.0
  ) WHERE r IS NOT NULL
), q AS (
  SELECT {round_portable_duck(f'quantile_cont(r, {VAR_P!r})', 6)}
    AS q
  FROM rets
), viol AS (
  SELECT h, CASE WHEN r < q THEN 1 ELSE 0 END AS v
  FROM rets, q
)"""

_K_X = "CAST(n_violations AS DOUBLE)"
_K_N = "CAST(n AS DOUBLE)"
_K_RATE = f"({_K_X} / {_K_N})"
_K_LNULL = (f"(({_K_N} - {_K_X}) * ln(1.0 - {VAR_P!r}) + "
            f"CASE WHEN n_violations > 0 THEN {_K_X} * ln({VAR_P!r}) "
            f"ELSE 0.0 END)")
_K_LALT = (f"(CASE WHEN n_violations < n THEN "
           f"({_K_N} - {_K_X}) * ln(1.0 - {_K_RATE}) ELSE 0.0 END + "
           f"CASE WHEN n_violations > 0 THEN {_K_X} * ln({_K_RATE}) "
           f"ELSE 0.0 END)")

_ORACLE_KUPIEC = f"""
WITH {_DUCK_RETS}, red AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(v) AS BIGINT) AS n_violations
  FROM viol
)
SELECT n, n_violations,
  {round_portable_duck(_K_RATE, 6)} AS viol_rate,
  {round_portable_duck(
      f"-2.0 * ({_K_LNULL} - {_K_LALT})", 6)} AS lr_pof
FROM red
"""

_C_PI01 = "(CAST(n01 AS DOUBLE) / CAST(n00 + n01 AS DOUBLE))"
_C_PI11 = "(CAST(n11 AS DOUBLE) / CAST(n10 + n11 AS DOUBLE))"
_C_PI = ("(CAST(n01 + n11 AS DOUBLE) "
         "/ CAST(n00 + n01 + n10 + n11 AS DOUBLE))")


def _c_term(count, prob):
    return (f"CASE WHEN {count} > 0 THEN CAST({count} AS DOUBLE) "
            f"* ln({prob}) ELSE 0.0 END")


_C_LNULL = (f"({_c_term('n00 + n10', f'1.0 - {_C_PI}')} "
            f"+ {_c_term('n01 + n11', _C_PI)})")
_C_LALT = (f"({_c_term('n00', f'1.0 - {_C_PI01}')} "
           f"+ {_c_term('n01', _C_PI01)} "
           f"+ {_c_term('n10', f'1.0 - {_C_PI11}')} "
           f"+ {_c_term('n11', _C_PI11)})")

_ORACLE_CHRISTOFFERSEN = f"""
WITH {_DUCK_RETS}, t AS (
  SELECT v, lag(v) OVER (ORDER BY h) AS pv FROM viol
), red AS (
  SELECT
    CAST(sum(CASE WHEN pv = 0 AND v = 0 THEN 1 ELSE 0 END)
      AS BIGINT) AS n00,
    CAST(sum(CASE WHEN pv = 0 AND v = 1 THEN 1 ELSE 0 END)
      AS BIGINT) AS n01,
    CAST(sum(CASE WHEN pv = 1 AND v = 0 THEN 1 ELSE 0 END)
      AS BIGINT) AS n10,
    CAST(sum(CASE WHEN pv = 1 AND v = 1 THEN 1 ELSE 0 END)
      AS BIGINT) AS n11
  FROM t WHERE pv IS NOT NULL
)
SELECT n00, n01, n10, n11,
  {round_portable_duck(
      f"-2.0 * ({_C_LNULL} - {_C_LALT})", 6)} AS lr_ind
FROM red
"""


QUERIES: dict = {
    "risk_kupiec_events": (_q_kupiec, _ORACLE_KUPIEC),
    "risk_christoffersen_events": (_q_christoffersen,
                                   _ORACLE_CHRISTOFFERSEN),
}

"""Inequality indices beyond Gini: Theil's T entropy index
(decomposable across subgroups — the property Gini lacks) and the
Atkinson index at epsilon = 1/2 (the welfare-theoretic index; its
epsilon-=1/2 closed form needs only a sqrt mean). Complements the
gated ``q_gini_orders`` / ``q_lorenz_deciles_orders`` concentration
suite.

  Theil T    = (1/n) sum_i (x_i/mu) ln(x_i/mu)
  Atkinson_.5 = 1 - ( (1/n) sum_i sqrt(x_i) )^2 / mu

Engine-exactness: mu derives from the exact cents BIGINT sum (one
double expression, identical bits both engines); each Theil term and
each sqrt(x) quantizes to BIGINT per row BEFORE the cross-row sum
(the SCALING.md integer-quantized contribution rule — ln/sqrt are
correctly-rounded on both engines for these inputs, proven by the
gated entropy/KL queries that already rely on it).

Plan shape at 100 TB: one aggregate for (sum, count), a 1-row
broadcast, one quantized-terms aggregate — two scans, no shuffle
beyond the partial-agg exchanges, no windows.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (analytics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["theil_atkinson"]

Q = 10 ** 8
QF = float(Q)
QS = 10 ** 6
QSF = float(QS)

_MU = "(CAST(__s AS DOUBLE) / (100.0 * CAST(__n AS DOUBLE)))"


def theil_atkinson(df: DataFrame, value_col: str) -> DataFrame:
    """One row (n, mean, theil_t, atkinson_05) over the positive
    values of ``value_col``."""
    rows = df.select(F.col(value_col).cast("double").alias("__x")) \
        .filter(F.col("__x") > 0)
    tot = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr("CAST(round(__x * 100) AS BIGINT)")).alias("__s"),
    )
    terms = (
        rows.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                f"CAST(round((__x / {_MU}) * ln(__x / {_MU}) * {Q}) "
                f"AS BIGINT)").alias("__tq"),
            F.expr(f"CAST(round(sqrt(__x) * {QS}) AS BIGINT)")
            .alias("__hq"),
        )
        .agg(F.sum("__tq").alias("__t"), F.sum("__hq").alias("__h"))
    )
    mh = f"(CAST(__h AS DOUBLE) / ({QSF!r} * CAST(__n AS DOUBLE)))"
    return terms.crossJoin(F.broadcast(tot)).select(
        F.col("__n").alias("n"),
        round_portable(F.expr(_MU), 2).alias("mean"),
        round_portable(F.expr(
            f"CAST(__t AS DOUBLE) / ({QF!r} * CAST(__n AS DOUBLE))"),
            6).alias("theil_t"),
        round_portable(F.expr(
            f"1.0 - ({mh} * {mh}) / {_MU}"), 6).alias("atkinson_05"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle
# --------------------------------------------------------------------------


def _q_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    return theil_atkinson(load(spark, sf_dir, "orders"),
                          "o_totalprice")


_D_MU = "(CAST(s AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)))"
_D_MH = f"(CAST(h AS DOUBLE) / ({QSF!r} * CAST(n AS DOUBLE)))"

_ORACLE_THEIL = f"""
WITH rows_l AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
  WHERE o_totalprice > 0
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(x * 100) AS BIGINT)) AS BIGINT) AS s
  FROM rows_l
), terms AS (
  SELECT
    CAST(sum(CAST(round((x / {_D_MU}) * ln(x / {_D_MU}) * {Q})
      AS BIGINT)) AS BIGINT) AS t,
    CAST(sum(CAST(round(sqrt(x) * {QS}) AS BIGINT)) AS BIGINT) AS h
  FROM rows_l, tot
)
SELECT tot.n,
  {round_portable_duck(_D_MU, 2)} AS mean,
  {round_portable_duck(
      f"CAST(terms.t AS DOUBLE) / ({QF!r} * CAST(tot.n AS DOUBLE))",
      6)} AS theil_t,
  {round_portable_duck(
      f"1.0 - ({_D_MH} * {_D_MH}) / {_D_MU}", 6)} AS atkinson_05
FROM terms, tot
"""


QUERIES: dict = {
    "q_theil_atkinson_orders": (_q_theil, _ORACLE_THEIL),
}

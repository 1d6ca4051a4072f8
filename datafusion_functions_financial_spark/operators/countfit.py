"""Count-data model fit: Poisson goodness-of-fit of per-bucket event
counts with the overdispersion (variance-to-mean) index — "are
arrivals Poisson, or bursty/clumped?" — the distributional companion
to the gated arrival-burstiness and chi-square-drift tiers: those
compare windows to each other; this compares the count DISTRIBUTION
to the model a capacity plan or anomaly threshold usually assumes.

Per (user, day) count histogram vs Poisson(lambda-hat) expectations:
cells k = 0..K-1 plus a K+ tail, expected share from the pmf
e^-l l^k / k! with FACTORIAL LITERALS (k <= 12 — both engines
compare against identical compile-time constants), chi-square
distance, plus the index of dispersion D = s^2 / mean whose
(n-1) * D is chi-square_{n-1} under H0.

Engine-exactness: counts and their squares are exact BIGINT (counts
are small integers; sum c^2 stays far inside int64); pmf terms are
literal-driven doubles; the chi-square fold quantizes to BIGINT at
1e8.

Plan shape at 100 TB: one hash aggregate to (user, day) counts, one
to the count histogram (bounded by K), one reduction. The histogram
relation is tiny regardless of scale.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["poisson_fit"]

Q = 10 ** 8
QF = float(Q)
US_PER_DAY = 86_400_000_000
K_CELLS = 8  # cells 0..K-1 plus the K+ tail
_FACT = [math.factorial(k) for k in range(K_CELLS)]


def poisson_fit(df: DataFrame, key_expr: str,
                bucket_expr: str) -> DataFrame:
    """One row (n_units, lambda_hat, dispersion, chi2, dof): Poisson
    GoF of the per-(key, bucket) counts.

    ``lambda_hat`` is the mean count; ``dispersion`` the
    variance-to-mean ratio (1 under Poisson); ``chi2`` the distance
    between the observed count histogram and Poisson(lambda_hat)
    expectations over cells 0..K-1 and the K+ tail (zero cells for
    (key, bucket) pairs with NO events are not observable here —
    the fit is CONDITIONAL on activity, which is the honest contract
    for an event stream with an unknown user universe; cell 0 is
    therefore structurally absent and folded into the comparison by
    renormalizing over k >= 1)."""
    counts = (
        df.selectExpr(f"({key_expr}) AS __k",
                      f"({bucket_expr}) AS __b")
        .groupBy("__k", "__b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    mom = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("__c").cast("bigint").alias("__s"),
        F.sum(F.expr("__c * __c")).cast("bigint").alias("__s2"),
    )
    lam = "(CAST(__s AS DOUBLE) / CAST(n_units AS DOUBLE))"
    var = (f"(CAST(__s2 AS DOUBLE) / CAST(n_units AS DOUBLE) "
           f"- {lam} * {lam})")
    hist = (
        counts.select(F.expr(
            f"CASE WHEN __c >= {K_CELLS} THEN {K_CELLS} "
            f"ELSE CAST(__c AS INT) END").alias("__cell"))
        .groupBy("__cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__o"))
    )
    # conditional-on-activity pmf over k >= 1: p_k = pmf_k/(1-pmf_0);
    # tail = 1 - sum_{1..K-1}
    pmf = " + ".join(
        f"CASE WHEN __cell = {k} THEN exp(-{lam}) * pow({lam}, {k}) "
        f"/ {float(_FACT[k])!r} ELSE 0.0 END"
        for k in range(1, K_CELLS))
    below = " + ".join(
        f"exp(-{lam}) * pow({lam}, {k}) / {float(_FACT[k])!r}"
        for k in range(1, K_CELLS))
    p0 = f"(exp(-{lam}))"
    pk = (f"(CASE WHEN __cell = {K_CELLS} "
          f"THEN 1.0 - {p0} - ({below}) "
          f"ELSE ({pmf}) END) / (1.0 - {p0})")
    term = (f"(CAST(__o AS DOUBLE) "
            f"- CAST(n_units AS DOUBLE) * ({pk})) "
            f"* (CAST(__o AS DOUBLE) "
            f"- CAST(n_units AS DOUBLE) * ({pk})) "
            f"/ (CAST(n_units AS DOUBLE) * ({pk}))")
    red = (
        hist.crossJoin(F.broadcast(mom))
        .agg(
            F.max("n_units").alias("n_units"),
            F.max("__s").alias("__s"),
            F.max("__s2").alias("__s2"),
            F.count(F.lit(1)).cast("bigint").alias("__cells"),
            F.sum(F.expr(
                f"CAST(round(({term}) * {Q}) AS BIGINT)"))
            .alias("__chiq"),
        )
    )
    return red.select(
        "n_units",
        round_portable(F.expr(lam), 6).alias("lambda_hat"),
        round_portable(F.expr(f"{var} / {lam}"), 6)
        .alias("dispersion"),
        round_portable(F.expr(
            f"CAST(__chiq AS DOUBLE) / {QF!r}"), 6).alias("chi2"),
        F.expr("CAST(__cells - 2 AS BIGINT)").alias("dof"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (per (user, day) event counts)
# --------------------------------------------------------------------------


def _q_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    return poisson_fit(load(spark, sf_dir, "events"), "user_id",
                       f"(ts DIV 1000) DIV {US_PER_DAY}")


_D_LAM = "(CAST(s AS DOUBLE) / CAST(n_units AS DOUBLE))"
_D_VAR = (f"(CAST(s2 AS DOUBLE) / CAST(n_units AS DOUBLE) "
          f"- {_D_LAM} * {_D_LAM})")
_D_PMF = " + ".join(
    f"CASE WHEN cell = {k} THEN exp(-{_D_LAM}) * pow({_D_LAM}, {k}) "
    f"/ {float(_FACT[k])!r} ELSE 0.0 END"
    for k in range(1, K_CELLS))
_D_BELOW = " + ".join(
    f"exp(-{_D_LAM}) * pow({_D_LAM}, {k}) / {float(_FACT[k])!r}"
    for k in range(1, K_CELLS))
_D_P0 = f"(exp(-{_D_LAM}))"
_D_PK = (f"(CASE WHEN cell = {K_CELLS} "
         f"THEN 1.0 - {_D_P0} - ({_D_BELOW}) "
         f"ELSE ({_D_PMF}) END) / (1.0 - {_D_P0})")
_D_TERM = (f"(CAST(o AS DOUBLE) "
           f"- CAST(n_units AS DOUBLE) * ({_D_PK})) "
           f"* (CAST(o AS DOUBLE) "
           f"- CAST(n_units AS DOUBLE) * ({_D_PK})) "
           f"/ (CAST(n_units AS DOUBLE) * ({_D_PK}))")

_ORACLE_POISSON = f"""
WITH counts AS (
  SELECT user_id AS k, epoch_us(ts) // {US_PER_DAY} AS b,
    CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n_units,
    CAST(sum(c) AS BIGINT) AS s,
    CAST(sum(c * c) AS BIGINT) AS s2
  FROM counts
), hist AS (
  SELECT CASE WHEN c >= {K_CELLS} THEN {K_CELLS}
    ELSE CAST(c AS INT) END AS cell,
    CAST(count(*) AS BIGINT) AS o
  FROM counts GROUP BY 1
), red AS (
  SELECT max(n_units) AS n_units, max(s) AS s, max(s2) AS s2,
    CAST(count(*) AS BIGINT) AS cells,
    sum(CAST(round(({_D_TERM}) * {Q}) AS BIGINT)) AS chiq
  FROM hist, mom
)
SELECT CAST(n_units AS BIGINT) AS n_units,
  {round_portable_duck(_D_LAM, 6)} AS lambda_hat,
  {round_portable_duck(f"{_D_VAR} / {_D_LAM}", 6)} AS dispersion,
  {round_portable_duck(f"CAST(chiq AS DOUBLE) / {QF!r}", 6)}
    AS chi2,
  CAST(cells - 2 AS BIGINT) AS dof
FROM red
"""


QUERIES: dict = {
    "q_poisson_fit_events": (_q_poisson, _ORACLE_POISSON),
}

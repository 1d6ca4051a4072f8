"""Post-hoc + stratified-contingency tier #18: Tukey's HSD pairwise
comparisons and the Cochran-Mantel-Haenszel test — two gaps beside
the gated omnibus battery: the ANOVA family (``q_dow_anova_events``,
Welch, Brown-Forsythe) reports THAT group means differ but not which
pairs; Tukey's studentized-range q is the standard follow-up. The
chi-square independence tests (``q_chi2_dow_events``, Cramer's V)
pool strata, which Simpson's paradox can invert; CMH tests the 2x2
association WITHIN strata and pools the evidence (with the
Mantel-Haenszel common odds ratio).

- ``tukey_hsd``: per group pair, the mean difference and
  q = |diff| / sqrt(MSE/2 * (1/n_i + 1/n_j)) against the pooled
  within-group MSE (the studentized-range statistic; critical
  values are a table lookup the caller applies).
- ``cmh_test``: continuity-corrected CMH chi-square
  max(|sum(a - E[a])| - 0.5, 0)^2 / sum(Var[a]) and the MH common
  odds ratio sum(a*d/T) / sum(b*c/T) over the per-stratum 2x2
  tables (the correction clamps at 0 so a deviation < 0.5 reports
  ~0 rather than an inflated statistic — ADVICE r10).

Engine-exactness: group sums/sumsquares are exact cents BIGINTs
(squares cast to DOUBLE one factor at a time — sum-of-cents squared
passes 2^63 at sf0.1 already); each per-stratum CMH term quantizes
to BIGINT at 1e8 before its sum.

Plan shape at 100 TB: one hash aggregate to the k-row group relation
(tukey: k^2/2 broadcast self-join pairs) or the bounded stratum
grid (cmh); everything after runs on tiny relations.

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["tukey_hsd", "cmh_test"]

Q = 10 ** 8
QF = float(Q)
US_PER_DAY = 86_400_000_000


def tukey_hsd(df: DataFrame, value_col: str,
              group_expr: str) -> DataFrame:
    """(g1, g2, n1, n2, mean_diff, q_stat): Tukey's studentized-range
    statistic for every group pair (g1 < g2; mean_diff = mean(g1) -
    mean(g2); q NULL when the pooled MSE is 0)."""
    cents = f"CAST(round(({value_col}) * 100) AS BIGINT)"
    g = (
        df.selectExpr(f"({group_expr}) AS __g", f"{cents} AS __c")
        .filter("__g IS NOT NULL AND __c IS NOT NULL")
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.sum("__c").cast("bigint").alias("__sx"),
            F.sum(F.expr("__c * __c")).cast("bigint").alias("__sxx"),
        )
    )
    # pooled within-group sum of squares, value units (cents^2/1e4);
    # sx*sx via one-factor DOUBLE casts (overflows BIGINT at sf0.1)
    ssw_g = ("(CAST(__sxx AS DOUBLE) - CAST(__sx AS DOUBLE) "
             "* CAST(__sx AS DOUBLE) / CAST(__n AS DOUBLE)) / 10000.0")
    mse_rel = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("__k"),
        F.sum("__n").cast("bigint").alias("__nt"),
        F.sum(F.expr(
            f"CAST(round(({ssw_g}) * 100.0) AS BIGINT)"))
        .alias("__sswq"))
    mean = "(CAST(__s{i} AS DOUBLE) / 100.0 / CAST(__m{i} AS DOUBLE))"
    a = g.selectExpr("__g AS g1", "__n AS __m1", "__sx AS __s1")
    b = g.selectExpr("__g AS g2", "__n AS __m2", "__sx AS __s2")
    pairs = a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
    mse = ("(CAST(__sswq AS DOUBLE) / 100.0 "
           "/ (CAST(__nt AS DOUBLE) - CAST(__k AS DOUBLE)))")
    diff = f"({mean.format(i=1)} - {mean.format(i=2)})"
    se = (f"sqrt({mse} / 2.0 * (1.0 / CAST(__m1 AS DOUBLE) "
          f"+ 1.0 / CAST(__m2 AS DOUBLE)))")
    return (
        pairs.crossJoin(F.broadcast(mse_rel))
        .select(
            "g1", "g2",
            F.col("__m1").alias("n1"), F.col("__m2").alias("n2"),
            round_portable(F.expr(diff), 6).alias("mean_diff"),
            round_portable(F.expr(
                f"CASE WHEN {mse} > 0.0 THEN abs({diff}) / {se} END"),
                6).alias("q_stat"),
        )
    )


def cmh_test(df: DataFrame, stratum_expr: str, exposure_expr: str,
             outcome_expr: str) -> DataFrame:
    """One row (n_strata, n, or_mh, cmh_chi2): the Mantel-Haenszel
    common odds ratio and the continuity-corrected CMH chi-square
    over per-stratum 2x2 tables (strata with a margin of zero
    contribute nothing, the standard convention; or_mh NULL when the
    b*c mass is zero)."""
    cells = (
        df.selectExpr(
            f"({stratum_expr}) AS __s",
            f"CAST(({exposure_expr}) AS INT) AS __e",
            f"CAST(({outcome_expr}) AS INT) AS __o")
        .filter("__s IS NOT NULL AND __e IS NOT NULL "
                "AND __o IS NOT NULL")
        .groupBy("__s")
        .agg(
            F.sum(F.expr("CASE WHEN __e = 1 AND __o = 1 THEN 1 "
                         "ELSE 0 END")).cast("bigint").alias("__a"),
            F.sum(F.expr("CASE WHEN __e = 1 AND __o = 0 THEN 1 "
                         "ELSE 0 END")).cast("bigint").alias("__b"),
            F.sum(F.expr("CASE WHEN __e = 0 AND __o = 1 THEN 1 "
                         "ELSE 0 END")).cast("bigint").alias("__c"),
            F.sum(F.expr("CASE WHEN __e = 0 AND __o = 0 THEN 1 "
                         "ELSE 0 END")).cast("bigint").alias("__d"),
        )
        .withColumn("__t", F.expr("__a + __b + __c + __d"))
    )
    td = "CAST(__t AS DOUBLE)"
    n1, n0 = "CAST(__a + __b AS DOUBLE)", "CAST(__c + __d AS DOUBLE)"
    m1, m0 = "CAST(__a + __c AS DOUBLE)", "CAST(__b + __d AS DOUBLE)"
    dev = f"(CAST(__a AS DOUBLE) - {n1} * {m1} / {td})"
    var = (f"({n1} * {n0} / {td} * {m1} / {td} * {m0} "
           f"/ ({td} - 1.0))")
    orn = f"(CAST(__a AS DOUBLE) * CAST(__d AS DOUBLE) / {td})"
    ord_ = f"(CAST(__b AS DOUBLE) * CAST(__c AS DOUBLE) / {td})"
    qt = "CAST(round(({x}) * {q}) AS BIGINT)"
    red = cells.filter("__t >= 2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("__t").cast("bigint").alias("n"),
        F.sum(F.expr(qt.format(x=dev, q=Q))).alias("__dev"),
        F.sum(F.expr(qt.format(x=var, q=Q))).alias("__var"),
        F.sum(F.expr(qt.format(x=orn, q=Q))).alias("__orn"),
        F.sum(F.expr(qt.format(x=ord_, q=Q))).alias("__ord"),
    )
    return red.select(
        "n_strata", "n",
        round_portable(F.expr(
            "CASE WHEN __ord > 0 THEN CAST(__orn AS DOUBLE) "
            "/ CAST(__ord AS DOUBLE) END"), 6).alias("or_mh"),
        round_portable(F.expr(
            f"CASE WHEN __var > 0 THEN "
            f"greatest(abs(CAST(__dev AS DOUBLE) / {QF!r}) - 0.5, 0.0) "
            f"* greatest(abs(CAST(__dev AS DOUBLE) / {QF!r}) - 0.5, 0.0) "
            f"/ (CAST(__var AS DOUBLE) / {QF!r}) END"), 6)
        .alias("cmh_chi2"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events: event-type groups on
# value; day-of-week strata, click-vs-view exposure, value-band
# outcome)
# --------------------------------------------------------------------------

_STRATUM = f"((ts DIV 1000) DIV {US_PER_DAY}) % 7"
_STRATUM_DUCK = f"(epoch_us(ts) // {US_PER_DAY}) % 7"
_EXPO = "CASE WHEN event_type = 'click' THEN 1 WHEN "\
    "event_type = 'view' THEN 0 END"
_OUT = "CASE WHEN value >= 50.0 THEN 1 ELSE 0 END"


def _q_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tukey_hsd(load(spark, sf_dir, "events"), "value",
                     "event_type")


def _q_cmh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cmh_test(load(spark, sf_dir, "events"), _STRATUM, _EXPO,
                    _OUT)


_D_SSWG = ("(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) "
           "* CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 10000.0")
_D_MSE = ("(CAST(sswq AS DOUBLE) / 100.0 "
          "/ (CAST(nt AS DOUBLE) - CAST(k AS DOUBLE)))")
_D_MEAN = "(CAST(s{i} AS DOUBLE) / 100.0 / CAST(m{i} AS DOUBLE))"
_D_DIFF = f"({_D_MEAN.format(i=1)} - {_D_MEAN.format(i=2)})"
_D_SE = (f"sqrt({_D_MSE} / 2.0 * (1.0 / CAST(m1 AS DOUBLE) "
         f"+ 1.0 / CAST(m2 AS DOUBLE)))")

_ORACLE_TUKEY = f"""
WITH g AS (
  SELECT event_type AS gg, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
    CAST(sum(CAST(round(value * 100) AS BIGINT)
      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx
  FROM events WHERE value IS NOT NULL GROUP BY 1
), mse_rel AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
    CAST(sum(n) AS BIGINT) AS nt,
    CAST(sum(CAST(round(({_D_SSWG}) * 100.0) AS BIGINT)) AS BIGINT)
      AS sswq
  FROM g
), pairs AS (
  SELECT a.gg AS g1, b.gg AS g2, a.n AS m1, b.n AS m2,
    a.sx AS s1, b.sx AS s2
  FROM g a JOIN g b ON a.gg < b.gg
)
SELECT g1, g2, m1 AS n1, m2 AS n2,
  {round_portable_duck(_D_DIFF, 6)} AS mean_diff,
  {round_portable_duck(
      f"CASE WHEN {_D_MSE} > 0.0 THEN abs({_D_DIFF}) / {_D_SE} END",
      6)} AS q_stat
FROM pairs, mse_rel
"""

_D_TD = "CAST(t AS DOUBLE)"
_D_N1, _D_N0 = "CAST(a + b AS DOUBLE)", "CAST(c + d AS DOUBLE)"
_D_M1, _D_M0 = "CAST(a + c AS DOUBLE)", "CAST(b + d AS DOUBLE)"
_D_DEV = f"(CAST(a AS DOUBLE) - {_D_N1} * {_D_M1} / {_D_TD})"
_D_VAR = (f"({_D_N1} * {_D_N0} / {_D_TD} * {_D_M1} / {_D_TD} "
          f"* {_D_M0} / ({_D_TD} - 1.0))")
_D_ORN = f"(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / {_D_TD})"
_D_ORD = f"(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / {_D_TD})"

_ORACLE_CMH = f"""
WITH cells AS (
  SELECT {_STRATUM_DUCK} AS s,
    CAST(sum(CASE WHEN ({_EXPO}) = 1 AND ({_OUT}) = 1 THEN 1
      ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN ({_EXPO}) = 1 AND ({_OUT}) = 0 THEN 1
      ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN ({_EXPO}) = 0 AND ({_OUT}) = 1 THEN 1
      ELSE 0 END) AS BIGINT) AS c,
    CAST(sum(CASE WHEN ({_EXPO}) = 0 AND ({_OUT}) = 0 THEN 1
      ELSE 0 END) AS BIGINT) AS d
  FROM events
  WHERE ({_EXPO}) IS NOT NULL AND ({_OUT}) IS NOT NULL
  GROUP BY 1
), wt AS (
  SELECT *, a + b + c + d AS t FROM cells
), red AS (
  SELECT CAST(count(*) AS BIGINT) AS n_strata,
    CAST(sum(t) AS BIGINT) AS n,
    CAST(sum(CAST(round(({_D_DEV}) * {Q}) AS BIGINT)) AS BIGINT)
      AS dev,
    CAST(sum(CAST(round(({_D_VAR}) * {Q}) AS BIGINT)) AS BIGINT)
      AS var,
    CAST(sum(CAST(round(({_D_ORN}) * {Q}) AS BIGINT)) AS BIGINT)
      AS orn,
    CAST(sum(CAST(round(({_D_ORD}) * {Q}) AS BIGINT)) AS BIGINT)
      AS ord
  FROM wt WHERE t >= 2
)
SELECT n_strata, n,
  {round_portable_duck(
      "CASE WHEN ord > 0 THEN CAST(orn AS DOUBLE) "
      "/ CAST(ord AS DOUBLE) END", 6)} AS or_mh,
  {round_portable_duck(
      f"CASE WHEN var > 0 THEN "
      f"greatest(abs(CAST(dev AS DOUBLE) / {QF!r}) - 0.5, 0.0) "
      f"* greatest(abs(CAST(dev AS DOUBLE) / {QF!r}) - 0.5, 0.0) "
      f"/ (CAST(var AS DOUBLE) / {QF!r}) END", 6)} AS cmh_chi2
FROM red
"""


QUERIES: dict = {
    "q_tukey_hsd_events": (_q_tukey, _ORACLE_TUKEY),
    "q_cmh_events": (_q_cmh, _ORACLE_CMH),
}

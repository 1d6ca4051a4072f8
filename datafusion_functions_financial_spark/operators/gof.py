"""Goodness-of-fit tier: one-sample Anderson-Darling and
Kolmogorov-Smirnov tests of inter-arrival EXPONENTIALITY — "is this
event stream actually Poisson?" — the distributional upgrade of the
gated arrival diagnostics (``q_arrival_burstiness_events`` scores
dispersion, ``q_poisson_fit_events`` the count marginal; these two
test the full gap DISTRIBUTION against the exponential with the
MLE rate, AD weighting the tails where burstiness shows first).

Both run entirely on the distinct-gap cumulative relation — no
row-level rank sort. The AD order-statistic weights collapse per
distinct value v occupying ranks a..b:

  sum_{i=a..b} (2i-1)            = b^2 - (a-1)^2
  sum_{i=a..b} (2(n+1-i)-1)      = (2n+1)(b-a+1) - (b(b+1)-(a-1)a)

and under the exponential, ln(1-F(v)) = -v/mean EXACTLY (no log
call on the survival side). Gaps are raw microsecond integers
(strictly positive — (subject, ts) is unique), so F(v) > 0 always
and exp(-v/mean) < 1 at any realistic rate; a degenerate value with
exp(-v/mean) = 1.0 in doubles contributes 0 by the documented clamp.

- ``ad_exponential``: A^2 = -n - (1/n) sum (2i-1)[ln F(x_(i)) +
  ln(1-F(x_(n+1-i)))], per-value normalized terms quantized at 1e8.
- ``ks_exponential``: D = max over distinct values of
  max(|cum/n - F(v)|, |(cum-cnt)/n - F(v)|) (both one-sided gaps at
  the step).

Plan shape at 100 TB: the gap staging is the gated KM shuffle; the
tests add one distinct-value hash aggregate, one bounded cumulative
window, one reduction.

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["ad_exponential", "ks_exponential"]

Q = 10 ** 8
QF = float(Q)


def _gap_cum(df: DataFrame, us_col: str,
             subject_col: str) -> DataFrame:
    """(v, cnt, cum, n, s): distinct observed inter-arrival gaps
    (microseconds) with cumulative counts and the total moments."""
    part = f"PARTITION BY {subject_col} ORDER BY {us_col}"
    gaps = (
        df.withColumn("__nxt", F.expr(
            f"lead({us_col}) OVER ({part})"))
        .filter("__nxt IS NOT NULL")
        .selectExpr(f"__nxt - ({us_col}) AS __v")
    )
    vals = gaps.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    w = (Window.partitionBy().orderBy("__v")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = vals.withColumn("__cum", F.sum("__cnt").over(w))
    tot = vals.agg(F.sum("__cnt").cast("bigint").alias("__n"),
                   F.sum(F.expr("__v * __cnt")).cast("bigint")
                   .alias("__s"))
    return cum.crossJoin(F.broadcast(tot))


_MEAN = "(CAST(__s AS DOUBLE) / CAST(__n AS DOUBLE))"
_SURV = f"exp(-(CAST(__v AS DOUBLE)) / {_MEAN})"   # 1 - F(v)
_FV = f"(1.0 - {_SURV})"


def ad_exponential(df: DataFrame, us_col: str,
                   subject_col: str) -> DataFrame:
    """One row (n, mean_gap_min, ad_stat): the one-sample
    Anderson-Darling statistic of the observed inter-arrival gaps
    against Exp(rate = 1/mean) (MLE-fitted; the Stephens "case 3"
    statistic before any small-sample correction)."""
    j = _gap_cum(df, us_col, subject_col)
    w1 = "(CAST(__cum AS DOUBLE) * CAST(__cum AS DOUBLE) " \
         "- (CAST(__cum AS DOUBLE) - CAST(__cnt AS DOUBLE)) " \
         "* (CAST(__cum AS DOUBLE) - CAST(__cnt AS DOUBLE)))"
    w2 = ("((2.0 * CAST(__n AS DOUBLE) + 1.0) "
          "* CAST(__cnt AS DOUBLE) "
          "- (CAST(__cum AS DOUBLE) * (CAST(__cum AS DOUBLE) + 1.0) "
          "- (CAST(__cum AS DOUBLE) - CAST(__cnt AS DOUBLE)) "
          "* (CAST(__cum AS DOUBLE) - CAST(__cnt AS DOUBLE) + 1.0)))")
    term = (f"(CASE WHEN {_SURV} < 1.0 THEN "
            f"({w1} * ln({_FV}) + {w2} * (-(CAST(__v AS DOUBLE)) "
            f"/ {_MEAN})) / CAST(__n AS DOUBLE) ELSE 0.0 END)")
    red = j.agg(
        F.max("__n").cast("bigint").alias("n"),
        F.max(F.expr(_MEAN)).alias("__mean"),
        F.sum(F.expr(
            f"CAST(round(({term}) * {Q}) AS BIGINT)")).alias("__sq"))
    return red.select(
        "n",
        round_portable(F.expr("__mean / 60000000.0"), 6)
        .alias("mean_gap_min"),
        # the per-value terms are already /n-normalized: the sum IS
        # S/n, so A^2 = -n - sum
        round_portable(F.expr(
            f"-CAST(n AS DOUBLE) "
            f"- CAST(__sq AS DOUBLE) / {QF!r}"), 6).alias("ad_stat"),
    )


def ks_exponential(df: DataFrame, us_col: str,
                   subject_col: str) -> DataFrame:
    """One row (n, mean_gap_min, ks_d): the one-sample KS distance
    of the observed gaps against the MLE-fitted exponential."""
    j = _gap_cum(df, us_col, subject_col)
    up = (f"abs(CAST(__cum AS DOUBLE) / CAST(__n AS DOUBLE) "
          f"- {_FV})")
    lo = (f"abs((CAST(__cum AS DOUBLE) - CAST(__cnt AS DOUBLE)) "
          f"/ CAST(__n AS DOUBLE) - {_FV})")
    red = j.agg(
        F.max("__n").cast("bigint").alias("n"),
        F.max(F.expr(_MEAN)).alias("__mean"),
        F.max(F.expr(f"greatest({up}, {lo})")).alias("__d"))
    return red.select(
        "n",
        round_portable(F.expr("__mean / 60000000.0"), 6)
        .alias("mean_gap_min"),
        round_portable(F.col("__d"), 6).alias("ks_d"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events: per-user microsecond gaps)
# --------------------------------------------------------------------------


def _q_ad_exp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return ad_exponential(ev, "__us", "user_id")


def _q_ks_exp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return ks_exponential(ev, "__us", "user_id")


_GAPS_DUCK = """gaps AS (
  SELECT nxt - us AS v
  FROM (
    SELECT epoch_us(ts) AS us,
      lead(epoch_us(ts)) OVER (PARTITION BY user_id
        ORDER BY epoch_us(ts)) AS nxt
    FROM events
  ) WHERE nxt IS NOT NULL
), vals AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM gaps GROUP BY 1
), cum AS (
  SELECT v, cnt,
    CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM vals
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
    CAST(sum(v * cnt) AS BIGINT) AS s
  FROM vals
)"""

_D_MEAN = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
_D_SURV = f"exp(-(CAST(v AS DOUBLE)) / {_D_MEAN})"
_D_FV = f"(1.0 - {_D_SURV})"
_D_W1 = ("(CAST(cum AS DOUBLE) * CAST(cum AS DOUBLE) "
         "- (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE)) "
         "* (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE)))")
_D_W2 = ("((2.0 * CAST(n AS DOUBLE) + 1.0) * CAST(cnt AS DOUBLE) "
         "- (CAST(cum AS DOUBLE) * (CAST(cum AS DOUBLE) + 1.0) "
         "- (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE)) "
         "* (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE) + 1.0)))")
_D_TERM = (f"(CASE WHEN {_D_SURV} < 1.0 THEN "
           f"({_D_W1} * ln({_D_FV}) + {_D_W2} "
           f"* (-(CAST(v AS DOUBLE)) / {_D_MEAN})) "
           f"/ CAST(n AS DOUBLE) ELSE 0.0 END)")

_ORACLE_AD_EXP = f"""
WITH {_GAPS_DUCK}, red AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
    max({_D_MEAN}) AS mean,
    CAST(sum(CAST(round(({_D_TERM}) * {Q}) AS BIGINT)) AS BIGINT)
      AS sq
  FROM cum, tot
)
SELECT n,
  {round_portable_duck("mean / 60000000.0", 6)} AS mean_gap_min,
  {round_portable_duck(
      f"-CAST(n AS DOUBLE) - CAST(sq AS DOUBLE) / {QF!r}", 6)}
    AS ad_stat
FROM red
"""

_D_UP = f"abs(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) - {_D_FV})"
_D_LO = (f"abs((CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE)) "
         f"/ CAST(n AS DOUBLE) - {_D_FV})")

_ORACLE_KS_EXP = f"""
WITH {_GAPS_DUCK}, red AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
    max({_D_MEAN}) AS mean,
    max(greatest({_D_UP}, {_D_LO})) AS d
  FROM cum, tot
)
SELECT n,
  {round_portable_duck("mean / 60000000.0", 6)} AS mean_gap_min,
  {round_portable_duck("d", 6)} AS ks_d
FROM red
"""


QUERIES: dict = {
    "q_ad_exponential_events": (_q_ad_exp, _ORACLE_AD_EXP),
    "q_ks_exponential_events": (_q_ks_exp, _ORACLE_KS_EXP),
}

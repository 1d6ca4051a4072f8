"""Stationarity + distribution-free two-sample tier #17: the KPSS
level-stationarity statistic, the two-sample Anderson-Darling test
(Scholz-Stephens tie-adjusted midrank version), and Cliff's delta —
three gaps in the gated battery: ADF (``q_adf_events``) tests a
unit-root NULL while KPSS tests the stationary NULL (the pair is the
standard confirmatory protocol); KS/CvM/Kuiper (gated) weight the
CDF gap uniformly while Anderson-Darling weights the tails, where
drift shows first; Mann-Whitney's z (gated) gives significance but
no magnitude — Cliff's delta is its standard ordinal effect size.

- ``kpss_level``: eta = sum_t S_t^2 / T^2 over partial sums S_t of
  the demeaned series, normalized by the Bartlett long-run variance
  s^2(l) = g0 + 2 sum_{s<=l} (1 - s/(l+1)) g_s with FIXED bandwidth
  l (a data-dependent l = f(T) would change the formula's SHAPE
  across SFs; the fixed default 8 is documented in the signature).
- ``anderson_darling_2s``: A^2_akN over the distinct-value relation;
  with doubled midpoint counts m2 = 2*M_a, b2 = 2*B_a the per-value
  term is EXACTLY (l_j/(N*n_i)) * (N*m2 - n_i*b2)^2 /
  (b2*(2N - b2) - N*l_j) — every input an exact BIGINT (the /4s
  cancel), squaring done in DOUBLE after a one-factor cast.
- ``cliffs_delta``: (#(a>b) - #(a<b))/(na*nb) = (2U - na*nb)/(na*nb)
  from the exact doubled-midrank U (ties contribute half), plus the
  Vargha-Delaney A = U/(na*nb) and the conventional magnitude label
  (0.147/0.33/0.474 cuts).

Engine-exactness: all three run on exact integers (cents-quantized
hourly means, doubled midranks, distinct-value multiplicities) until
one final double expression per term; every term sum quantizes to
BIGINT at 1e8 first (the SCALING.md associativity rule).

Plan shape at 100 TB: KPSS reduces events to ONE bounded global
hourly series (span-bounded, not volume-bounded — the q_acf_events
argument) before any window; AD and Cliff's delta run their windows
over the DISTINCT-VALUE relation (map-side combinable group-by
first), never over rows.

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .stats2 import _MR2_DUCK, _midrank2

__all__ = ["kpss_level", "anderson_darling_2s", "cliffs_delta"]

Q = 10 ** 8
QF = float(Q)
US_PER_HOUR = 3_600_000_000
KPSS_BANDWIDTH = 8


def kpss_level(df: DataFrame, bucket_expr: str, value_col: str,
               bandwidth: int = KPSS_BANDWIDTH) -> DataFrame:
    """One row (t, bandwidth, eta, lrv, kpss): the KPSS level
    statistic of the per-bucket mean series (NULL kpss when the
    long-run variance is not positive)."""
    cents = f"CAST(round(({value_col}) * 100) AS BIGINT)"
    series = (
        df.selectExpr(f"({bucket_expr}) AS __h", f"{cents} AS __c")
        .filter("__c IS NOT NULL")
        .groupBy("__h")
        .agg(F.expr(
            f"CAST(round(CAST(sum(__c) AS DOUBLE) / 100.0 "
            f"/ CAST(count(*) AS DOUBLE) * {Q}) AS BIGINT)")
            .alias("__yq"))
    )
    tot = series.agg(
        F.count(F.lit(1)).cast("bigint").alias("__t"),
        F.sum("__yq").cast("bigint").alias("__sq"))
    w = Window.partitionBy().orderBy("__h")
    e = (series.crossJoin(F.broadcast(tot))
         .withColumn("__en", F.expr("__yq * __t - __sq"))
         .withColumn("__sn", F.sum("__en").over(
             w.rowsBetween(Window.unboundedPreceding, 0))))
    for s in range(1, bandwidth + 1):
        e = e.withColumn(f"__en{s}", F.expr(
            f"lag(__en, {s}) OVER (ORDER BY __h)"))
    ed = f"(CAST(__en AS DOUBLE) / (CAST(__t AS DOUBLE) * {QF!r}))"
    sd = f"(CAST(__sn AS DOUBLE) / (CAST(__t AS DOUBLE) * {QF!r}))"
    lag_e = ("(CAST(__en{s} AS DOUBLE) "
             f"/ (CAST(__t AS DOUBLE) * {QF!r}))")
    aggs = [
        F.max("__t").alias("t"),
        F.sum(F.expr(
            f"CAST(round(({sd}) * ({sd}) * {Q}) AS BIGINT)"))
        .alias("__eta_q"),
        F.sum(F.expr(
            f"CAST(round(({ed}) * ({ed}) * {Q}) AS BIGINT)"))
        .alias("__g0_q"),
    ]
    for s in range(1, bandwidth + 1):
        aggs.append(F.sum(F.expr(
            f"CAST(round(({ed}) * ({lag_e.format(s=s)}) * {Q}) "
            f"AS BIGINT)")).alias(f"__g{s}_q"))
    red = e.agg(*aggs)
    td = "CAST(t AS DOUBLE)"
    eta = (f"(CAST(__eta_q AS DOUBLE) / {QF!r} "
           f"/ ({td} * {td}))")
    gam = "(CAST(__g{s}_q AS DOUBLE) / {qf!r} / {td})"
    # Bartlett weight in explicit-DOUBLE arithmetic: a bare `1.0 -
    # 1.0 / 9.0` is DECIMAL division in Spark SQL (rounds at decimal
    # scale, ~1e-7 off the double value DuckDB computes).
    lrv = " + ".join(
        [gam.format(s=0, qf=QF, td=td)]
        + [f"2.0 * (CAST(1 AS DOUBLE) - CAST({s} AS DOUBLE) "
           f"/ CAST({bandwidth + 1} AS DOUBLE)) "
           f"* {gam.format(s=s, qf=QF, td=td)}"
           for s in range(1, bandwidth + 1)])
    return red.select(
        "t", F.lit(bandwidth).cast("bigint").alias("bandwidth"),
        round_portable(F.expr(eta), 6).alias("eta"),
        round_portable(F.expr(lrv), 6).alias("lrv"),
        round_portable(F.expr(
            f"CASE WHEN ({lrv}) > 0.0 THEN ({eta}) / ({lrv}) END"),
            6).alias("kpss"),
    )


def anderson_darling_2s(df: DataFrame, value_col: str,
                        group_expr: str, group_a: str,
                        group_b: str) -> DataFrame:
    """One row (n_a, n_b, n_distinct, ad_stat): the two-sample
    Anderson-Darling statistic (tie-adjusted midrank version);
    distinct values whose variance term degenerates (den <= 0, only
    possible when one value holds the whole sample) are skipped, the
    scipy convention."""
    flt = df.selectExpr(f"{group_expr} AS __g",
                        f"{value_col} AS __v").filter(
        F.col("__g").isin([group_a, group_b]))
    vals = flt.groupBy("__v").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.when(F.col("__g") == F.lit(group_a), 1).otherwise(0))
        .alias("__ca"))
    w = (Window.partitionBy().orderBy("__v")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (vals
           .withColumn("__cl", F.sum("__cnt").over(w))
           .withColumn("__cca", F.sum("__ca").over(w)))
    red = vals.agg(
        F.sum("__ca").cast("bigint").alias("__na"),
        F.sum(F.expr("__cnt - __ca")).cast("bigint").alias("__nb"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
    j = cum.crossJoin(F.broadcast(red)).selectExpr(
        "__cnt", "__na", "__nb", "n_distinct",
        "__na + __nb AS __n",
        "2 * __cca - __ca AS __m2a",
        "2 * (__cl - __cca) - (__cnt - __ca) AS __m2b",
        "2 * __cl - __cnt AS __b2")
    num = ("(CAST(__n AS DOUBLE) * CAST(__m2{i} AS DOUBLE) "
           "- CAST(__n{i} AS DOUBLE) * CAST(__b2 AS DOUBLE))")
    den = "(CAST(__b2 AS DOUBLE) * (2.0 * CAST(__n AS DOUBLE) - CAST(__b2 AS DOUBLE)) - CAST(__n AS DOUBLE) * CAST(__cnt AS DOUBLE))"
    term = ("(CASE WHEN {d} > 0.0 THEN CAST(__cnt AS DOUBLE) "
            "* {n} * {n} / {d} "
            "/ (CAST(__n AS DOUBLE) * CAST(__n{i} AS DOUBLE)) "
            "ELSE 0.0 END)")
    tq = ("CAST(round(({t}) * {q}) AS BIGINT)")
    out = j.agg(
        F.max("__na").alias("n_a"), F.max("__nb").alias("n_b"),
        F.max("n_distinct").alias("n_distinct"),
        F.max("__n").alias("__nn"),
        F.sum(F.expr(tq.format(
            t=term.format(i="a", n=num.format(i="a"), d=den), q=Q)))
        .alias("__sa"),
        F.sum(F.expr(tq.format(
            t=term.format(i="b", n=num.format(i="b"), d=den), q=Q)))
        .alias("__sb"))
    return out.select(
        "n_a", "n_b", "n_distinct",
        round_portable(F.expr(
            f"(CAST(__nn AS DOUBLE) - 1.0) / CAST(__nn AS DOUBLE) "
            f"* (CAST(__sa AS DOUBLE) + CAST(__sb AS DOUBLE)) "
            f"/ {QF!r}"), 6).alias("ad_stat"),
    )


def cliffs_delta(df: DataFrame, value_col: str, group_expr: str,
                 group_a: str, group_b: str) -> DataFrame:
    """One row (n_a, n_b, cliffs_delta, vd_a, magnitude): Cliff's
    ordinal dominance delta of group_a over group_b (ties cancel),
    the equivalent Vargha-Delaney A, and the conventional magnitude
    label at the 0.147 / 0.33 / 0.474 cuts."""
    flt = df.selectExpr(f"{group_expr} AS __g",
                        f"{value_col} AS __v").filter(
        F.col("__g").isin([group_a, group_b]))
    vals = flt.groupBy("__v").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.when(F.col("__g") == F.lit(group_a), 1).otherwise(0))
        .alias("__ca"))
    ranked = _midrank2(vals)
    red = ranked.agg(
        F.sum("__ca").cast("bigint").alias("__na"),
        F.sum(F.expr("__cnt - __ca")).cast("bigint").alias("__nb"),
        F.sum(F.expr("__ca * __mr2")).cast("bigint").alias("__ra2"))
    # 2U = ra2 - na*(na+1); delta = (2U - na*nb) / (na*nb), exact
    # BIGINT numerator.
    dnum = "(__ra2 - __na * (__na + 1) - __na * __nb)"
    dden = "(CAST(__na AS DOUBLE) * CAST(__nb AS DOUBLE))"
    delta = f"(CAST({dnum} AS DOUBLE) / {dden})"
    return red.select(
        F.col("__na").alias("n_a"), F.col("__nb").alias("n_b"),
        round_portable(F.expr(delta), 6).alias("cliffs_delta"),
        round_portable(F.expr(f"(({delta}) + 1.0) / 2.0"), 6)
        .alias("vd_a"),
        F.expr(
            f"CASE WHEN abs({delta}) < 0.147 THEN 'negligible' "
            f"WHEN abs({delta}) < 0.33 THEN 'small' "
            f"WHEN abs({delta}) < 0.474 THEN 'medium' "
            f"ELSE 'large' END").alias("magnitude"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events: global hourly series;
# click-vs-view value distributions)
# --------------------------------------------------------------------------

_SPARK_H = f"(ts DIV 1000) DIV {US_PER_HOUR}"
_DUCK_H = f"epoch_us(ts) // {US_PER_HOUR}"


def _q_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kpss_level(load(spark, sf_dir, "events"), _SPARK_H,
                      "value")


def _q_ad(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anderson_darling_2s(load(spark, sf_dir, "events"),
                               "value", "event_type", "click", "view")


def _q_cliffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cliffs_delta(load(spark, sf_dir, "events"), "value",
                        "event_type", "click", "view")


_KPSS_ED = f"(CAST(en AS DOUBLE) / (CAST(t AS DOUBLE) * {QF!r}))"
_KPSS_SD = f"(CAST(sn AS DOUBLE) / (CAST(t AS DOUBLE) * {QF!r}))"
_KPSS_LAGCOLS = ",\n    ".join(
    f"lag(en, {s}) OVER (ORDER BY h) AS en{s}"
    for s in range(1, KPSS_BANDWIDTH + 1))
_KPSS_LAGE = (f"(CAST(en{{s}} AS DOUBLE) "
              f"/ (CAST(t AS DOUBLE) * {QF!r}))")
_KPSS_GCOLS = ",\n    ".join(
    f"CAST(sum(CAST(round(({_KPSS_ED}) * ({_KPSS_LAGE.format(s=s)}) "
    f"* {Q}) AS BIGINT)) AS BIGINT) AS g{s}_q"
    for s in range(1, KPSS_BANDWIDTH + 1))
_KPSS_TD = "CAST(t AS DOUBLE)"
_KPSS_ETA = (f"(CAST(eta_q AS DOUBLE) / {QF!r} "
             f"/ ({_KPSS_TD} * {_KPSS_TD}))")
_KPSS_LRV = " + ".join(
    [f"(CAST(g0_q AS DOUBLE) / {QF!r} / {_KPSS_TD})"]
    + [f"2.0 * (CAST(1 AS DOUBLE) - CAST({s} AS DOUBLE) "
       f"/ CAST({KPSS_BANDWIDTH + 1} AS DOUBLE)) "
       f"* (CAST(g{s}_q AS DOUBLE) / {QF!r} / {_KPSS_TD})"
       for s in range(1, KPSS_BANDWIDTH + 1)])

_ORACLE_KPSS = f"""
WITH series AS (
  SELECT {_DUCK_H} AS h,
    CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT))
      AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) * {Q})
      AS BIGINT) AS yq
  FROM events WHERE value IS NOT NULL GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS t,
    CAST(sum(yq) AS BIGINT) AS sq
  FROM series
), e AS (
  SELECT h, t, yq * t - sq AS en,
    CAST(sum(yq * t - sq) OVER (ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS BIGINT) AS sn
  FROM series, tot
), lagged AS (
  SELECT h, t, en, sn,
    {_KPSS_LAGCOLS}
  FROM e
), red AS (
  SELECT CAST(max(t) AS BIGINT) AS t,
    CAST(sum(CAST(round(({_KPSS_SD}) * ({_KPSS_SD}) * {Q})
      AS BIGINT)) AS BIGINT) AS eta_q,
    CAST(sum(CAST(round(({_KPSS_ED}) * ({_KPSS_ED}) * {Q})
      AS BIGINT)) AS BIGINT) AS g0_q,
    {_KPSS_GCOLS}
  FROM lagged
)
SELECT t, CAST({KPSS_BANDWIDTH} AS BIGINT) AS bandwidth,
  {round_portable_duck(_KPSS_ETA, 6)} AS eta,
  {round_portable_duck(_KPSS_LRV, 6)} AS lrv,
  {round_portable_duck(
      f"CASE WHEN ({_KPSS_LRV}) > 0.0 "
      f"THEN ({_KPSS_ETA}) / ({_KPSS_LRV}) END", 6)} AS kpss
FROM red
"""

_AD_NUM = ("(CAST(n AS DOUBLE) * CAST(m2{i} AS DOUBLE) "
           "- CAST(n{i} AS DOUBLE) * CAST(b2 AS DOUBLE))")
_AD_DEN = ("(CAST(b2 AS DOUBLE) * (2.0 * CAST(n AS DOUBLE) "
           "- CAST(b2 AS DOUBLE)) "
           "- CAST(n AS DOUBLE) * CAST(cnt AS DOUBLE))")
_AD_TERM = ("(CASE WHEN {d} > 0.0 THEN CAST(cnt AS DOUBLE) "
            "* {n} * {n} / {d} "
            "/ (CAST(n AS DOUBLE) * CAST(n{i} AS DOUBLE)) "
            "ELSE 0.0 END)")

_ORACLE_AD = f"""
WITH vals AS (
  SELECT value AS v, count(*) AS cnt,
    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
), cum AS (
  SELECT v, cnt, ca,
    sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) AS cl,
    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) AS cca
  FROM vals
), red AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na,
    CAST(sum(cnt - ca) AS BIGINT) AS nb,
    CAST(count(*) AS BIGINT) AS n_distinct
  FROM vals
), j AS (
  SELECT cnt, na, nb, n_distinct, na + nb AS n,
    2 * cca - ca AS m2a,
    2 * (cl - cca) - (cnt - ca) AS m2b,
    2 * cl - cnt AS b2
  FROM cum, red
), out AS (
  SELECT CAST(max(na) AS BIGINT) AS n_a,
    CAST(max(nb) AS BIGINT) AS n_b,
    CAST(max(n_distinct) AS BIGINT) AS n_distinct,
    CAST(max(n) AS BIGINT) AS nn,
    CAST(sum(CAST(round(({_AD_TERM.format(
        i='a', n=_AD_NUM.format(i='a'), d=_AD_DEN)}) * {Q})
      AS BIGINT)) AS BIGINT) AS sa,
    CAST(sum(CAST(round(({_AD_TERM.format(
        i='b', n=_AD_NUM.format(i='b'), d=_AD_DEN)}) * {Q})
      AS BIGINT)) AS BIGINT) AS sb
  FROM j
)
SELECT n_a, n_b, n_distinct,
  {round_portable_duck(
      f"(CAST(nn AS DOUBLE) - 1.0) / CAST(nn AS DOUBLE) "
      f"* (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / {QF!r}", 6)}
    AS ad_stat
FROM out
"""

_CD_NUM = "(ra2 - na * (na + 1) - na * nb)"
_CD_DEN = "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"
_CD = f"(CAST({_CD_NUM} AS DOUBLE) / {_CD_DEN})"

_ORACLE_CLIFFS = f"""
WITH vals AS (
  SELECT value AS v, count(*) AS cnt,
    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
), ranked AS ({_MR2_DUCK}
), red AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na,
    CAST(sum(cnt - ca) AS BIGINT) AS nb,
    CAST(sum(ca * mr2) AS BIGINT) AS ra2
  FROM ranked
)
SELECT na AS n_a, nb AS n_b,
  {round_portable_duck(_CD, 6)} AS cliffs_delta,
  {round_portable_duck(f"(({_CD}) + 1.0) / 2.0", 6)} AS vd_a,
  CASE WHEN abs({_CD}) < 0.147 THEN 'negligible'
    WHEN abs({_CD}) < 0.33 THEN 'small'
    WHEN abs({_CD}) < 0.474 THEN 'medium'
    ELSE 'large' END AS magnitude
FROM red
"""


QUERIES: dict = {
    "q_kpss_events": (_q_kpss, _ORACLE_KPSS),
    "q_anderson_darling_events": (_q_ad, _ORACLE_AD),
    "q_cliffs_delta_events": (_q_cliffs, _ORACLE_CLIFFS),
}

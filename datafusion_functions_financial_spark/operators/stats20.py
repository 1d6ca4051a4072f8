"""Structural-break + outlier-screen tier #20: the Chow test, its
sup-F (Quandt) sweep over candidate breakpoints, generalized ESD,
and Hartley's Fmax — four classics beside the gated battery: the
CUSUM/binary-segmentation changepoint detectors locate a LEVEL
shift, while Chow tests whether the REGRESSION (trend) differs
across a split and sup-Chow scans candidate splits; Grubbs (gated)
removes ONE outlier, generalized ESD iterates with recomputed
moments (the masking-proof screen); Bartlett/Levene (gated) test
variance equality globally, Hartley's Fmax is the max/min ratio
practitioners screen with first.

- ``chow_sup``: OLS-on-time per segment from CUMULATIVE moment
  prefix sums, so EVERY candidate breakpoint costs O(1) — segment 1
  moments are the prefix at s, segment 2 the total minus it;
  F = ((SSR_p - SSR_1 - SSR_2)/2) / ((SSR_1 + SSR_2)/(T-4)).
  Emits one row per candidate (deciles 2..8 of the series) plus
  ``is_sup`` marking the Quandt argmax.
- ``gesd``: 3 unrolled rounds of max-|deviation| removal with
  recomputed moments; the round-r argmax compares the exact integer
  |c*n - S| (equivalent to |x - mean| at fixed round moments).
- ``hartley_fmax``: max/min group variance ratio with the group
  count and the largest per-group df.

Engine-exactness: series means quantize to BIGINT at 1e4 (NOT the
usual 1e8 — Syy = sum y^2 passes 2^63 at the 1e8 scale), documented
in the output contract; all moment sums are exact integers with
one-factor DOUBLE casts on the products that could overflow.

Plan shape at 100 TB: chow reduces to the span-bounded hourly
series; gesd is 3 map-side-combinable aggregate passes over the
cents relation (no sort, no window); hartley is one hash aggregate
to the k-row group relation.

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["chow_sup", "gesd", "hartley_fmax"]

Q4 = 10 ** 4
US_PER_HOUR = 3_600_000_000
CHOW_DECILES = (2, 3, 4, 5, 6, 7, 8)
GESD_ROUNDS = 3


def _series4(df: DataFrame, bucket_expr: str,
             value_col: str) -> DataFrame:
    """(h, y4): bucket-mean series quantized at 1e4 (sum-of-squares
    headroom; see module docstring)."""
    cents = f"CAST(round(({value_col}) * 100) AS BIGINT)"
    return (
        df.selectExpr(f"({bucket_expr}) AS __h", f"{cents} AS __c")
        .filter("__c IS NOT NULL")
        .groupBy("__h")
        .agg(F.expr(
            f"CAST(round(CAST(sum(__c) AS DOUBLE) / 100.0 "
            f"/ CAST(count(*) AS DOUBLE) * {Q4}) AS BIGINT)")
            .alias("__y4"))
    )


def _ssr(n: str, sx: str, sy: str, sxy: str, sxx: str,
         syy: str) -> str:
    """OLS-on-time residual sum of squares from raw moment sums
    (1e4-scaled y units; one-factor DOUBLE casts throughout)."""
    nd = f"CAST({n} AS DOUBLE)"
    cxx = (f"(CAST({sxx} AS DOUBLE) - CAST({sx} AS DOUBLE) "
           f"* CAST({sx} AS DOUBLE) / {nd})")
    cxy = (f"(CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) "
           f"* CAST({sy} AS DOUBLE) / {nd})")
    cyy = (f"(CAST({syy} AS DOUBLE) - CAST({sy} AS DOUBLE) "
           f"* CAST({sy} AS DOUBLE) / {nd})")
    return (f"(CASE WHEN {cxx} > 0.0 THEN greatest({cyy} "
            f"- {cxy} * {cxy} / {cxx}, 0.0) ELSE {cyy} END)")


def chow_sup(df: DataFrame, bucket_expr: str,
             value_col: str) -> DataFrame:
    """(decile, split_at, t, f_chow, is_sup): the Chow F statistic
    at each decile breakpoint of the bucket-mean series and the
    Quandt sup marker (F NULL when a segment has < 3 points)."""
    series = _series4(df, bucket_expr, value_col)
    w = Window.partitionBy().orderBy("__h")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    pre = (
        series
        .withColumn("__rn", F.row_number().over(w).cast("bigint"))
        .withColumn("__cx", F.sum("__rn").over(wc))
        .withColumn("__cxx", F.sum(F.expr("__rn * __rn")).over(wc))
        .withColumn("__cy", F.sum("__y4").over(wc))
        .withColumn("__cxy", F.sum(F.expr("__rn * __y4")).over(wc))
        .withColumn("__cyy", F.sum(F.expr("__y4 * __y4")).over(wc))
    )
    tot = pre.agg(
        F.max("__rn").alias("__t"), F.max("__cx").alias("__tx"),
        F.max("__cxx").alias("__txx"), F.max("__cy").alias("__ty"),
        F.max("__cxy").alias("__txy"), F.max("__cyy").alias("__tyy"))
    ds = ", ".join(str(d) for d in CHOW_DECILES)
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .withColumn("__dec", F.expr(
            f"explode(array({ds}))"))
        .filter(F.expr("__rn = CAST(__dec * __t AS BIGINT) DIV 10"))
    )
    ssr1 = _ssr("__rn", "__cx", "__cy", "__cxy", "__cxx", "__cyy")
    ssr2 = _ssr("(__t - __rn)", "(__tx - __cx)", "(__ty - __cy)",
                "(__txy - __cxy)", "(__txx - __cxx)",
                "(__tyy - __cyy)")
    ssrp = _ssr("__t", "__tx", "__ty", "__txy", "__txx", "__tyy")
    f = (f"CASE WHEN __rn >= 3 AND __t - __rn >= 3 "
         f"AND ({ssr1}) + ({ssr2}) > 0.0 THEN "
         f"((({ssrp}) - ({ssr1}) - ({ssr2})) / 2.0) "
         f"/ ((({ssr1}) + ({ssr2})) "
         f"/ (CAST(__t AS DOUBLE) - 4.0)) END")
    scored = cand.select(
        F.col("__dec").cast("bigint").alias("decile"),
        F.col("__rn").alias("split_at"),
        F.col("__t").cast("bigint").alias("t"),
        round_portable(F.expr(f), 6).alias("f_chow"),
    )
    return scored.withColumn(
        "is_sup",
        F.expr("CAST(f_chow IS NOT NULL AND f_chow = "
               "max(f_chow) OVER () AS INT)").cast("bigint"))


def gesd(df: DataFrame, value_col: str, id_col: str,
         rounds: int = GESD_ROUNDS) -> DataFrame:
    """(round, removed_id, removed_value, z): ``rounds`` iterations
    of generalized-ESD removal — each round removes the observation
    farthest from the CURRENT mean (ties break on larger value then
    smaller id) and reports its studentized deviation."""
    cents = f"CAST(round(({value_col}) * 100) AS BIGINT)"
    base = df.selectExpr(f"{cents} AS __c",
                         f"{id_col} AS __id").filter(
        "__c IS NOT NULL").localCheckpoint()
    out = None
    cur = base
    for r in range(1, rounds + 1):
        # sum of squares at 1e4-reduced scale: cents^2 sums pass 2^63
        # on the orders table at sf0.01 already; the integer DIV is
        # bit-identical on both engines (deterministic, order-free)
        mom = cur.agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.sum("__c").cast("bigint").alias("__s"),
            F.sum(F.expr("(__c * __c) DIV 10000")).cast("bigint")
            .alias("__ss4"))
        dev = cur.crossJoin(F.broadcast(mom)).withColumn(
            "__dev", F.expr("abs(__c * __n - __s)"))
        top = (dev.orderBy(F.desc("__dev"), F.desc("__c"),
                           F.asc("__id")).limit(1)
               .localCheckpoint())
        nd = "CAST(__n AS DOUBLE)"
        sd = (f"sqrt((CAST(__ss4 AS DOUBLE) * 10000.0 "
              f"- CAST(__s AS DOUBLE) "
              f"* CAST(__s AS DOUBLE) / {nd}) / ({nd} - 1.0))")
        row = top.select(
            F.lit(r).cast("bigint").alias("round"),
            F.col("__id").cast("bigint").alias("removed_id"),
            round_portable(F.expr("CAST(__c AS DOUBLE) / 100.0"), 6)
            .alias("removed_value"),
            round_portable(F.expr(
                f"CASE WHEN {sd} > 0.0 THEN "
                f"(CAST(__dev AS DOUBLE) / {nd}) / 100.0 / ({sd} "
                f"/ 100.0) END"), 6).alias("z"),
        )
        out = row if out is None else out.unionAll(row)
        cur = cur.join(F.broadcast(top.select("__id")), "__id",
                       "left_anti")
    return out


def hartley_fmax(df: DataFrame, value_col: str,
                 group_expr: str) -> DataFrame:
    """One row (k, max_df, fmax): Hartley's max/min group-variance
    ratio (NULL when the smallest variance is 0 or any group has
    < 2 observations)."""
    cents = f"CAST(round(({value_col}) * 100) AS BIGINT)"
    g = (
        df.selectExpr(f"({group_expr}) AS __g", f"{cents} AS __c")
        .filter("__g IS NOT NULL AND __c IS NOT NULL")
        .groupBy("__g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"),
             F.sum("__c").cast("bigint").alias("__s"),
             F.sum(F.expr("__c * __c")).cast("bigint").alias("__ss"))
    )
    nd = "CAST(__n AS DOUBLE)"
    var = (f"(CASE WHEN __n >= 2 THEN (CAST(__ss AS DOUBLE) "
           f"- CAST(__s AS DOUBLE) * CAST(__s AS DOUBLE) / {nd}) "
           f"/ ({nd} - 1.0) / 10000.0 END)")
    red = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max(F.expr("__n - 1")).cast("bigint").alias("max_df"),
        F.min(F.expr("__n")).cast("bigint").alias("__minn"),
        F.max(F.expr(var)).alias("__vmax"),
        F.min(F.expr(var)).alias("__vmin"))
    return red.select(
        "k", "max_df",
        round_portable(F.expr(
            "CASE WHEN __minn >= 2 AND __vmin > 0.0 "
            "THEN __vmax / __vmin END"), 6).alias("fmax"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events: global hourly series;
# order totalprice outliers; event-type variance groups)
# --------------------------------------------------------------------------

_SPARK_H = f"(ts DIV 1000) DIV {US_PER_HOUR}"
_DUCK_H = f"epoch_us(ts) // {US_PER_HOUR}"


def _q_chow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chow_sup(load(spark, sf_dir, "events"), _SPARK_H, "value")


def _q_gesd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gesd(load(spark, sf_dir, "orders"), "o_totalprice",
                "o_orderkey")


def _q_hartley(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hartley_fmax(load(spark, sf_dir, "events"), "value",
                        "event_type")


_D_SSR1 = _ssr("rn", "cx", "cy", "cxy", "cxx", "cyy")
_D_SSR2 = _ssr("(t - rn)", "(tx - cx)", "(ty - cy)", "(txy - cxy)",
               "(txx - cxx)", "(tyy - cyy)")
_D_SSRP = _ssr("t", "tx", "ty", "txy", "txx", "tyy")
_D_F = (f"CASE WHEN rn >= 3 AND t - rn >= 3 "
        f"AND ({_D_SSR1}) + ({_D_SSR2}) > 0.0 THEN "
        f"((({_D_SSRP}) - ({_D_SSR1}) - ({_D_SSR2})) / 2.0) "
        f"/ ((({_D_SSR1}) + ({_D_SSR2})) "
        f"/ (CAST(t AS DOUBLE) - 4.0)) END")

_ORACLE_CHOW = f"""
WITH series AS (
  SELECT {_DUCK_H} AS h,
    CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT))
      AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) * {Q4})
      AS BIGINT) AS y4
  FROM events WHERE value IS NOT NULL GROUP BY 1
), pre AS (
  SELECT CAST(row_number() OVER w AS BIGINT) AS rn,
    CAST(sum(rn0) OVER cw AS BIGINT) AS cx,
    CAST(sum(rn0 * rn0) OVER cw AS BIGINT) AS cxx,
    CAST(sum(y4) OVER cw AS BIGINT) AS cy,
    CAST(sum(rn0 * y4) OVER cw AS BIGINT) AS cxy,
    CAST(sum(y4 * y4) OVER cw AS BIGINT) AS cyy
  FROM (
    SELECT h, y4,
      CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rn0
    FROM series
  )
  WINDOW w AS (ORDER BY h),
    cw AS (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW)
), tot AS (
  SELECT CAST(max(rn) AS BIGINT) AS t, CAST(max(cx) AS BIGINT) AS tx,
    CAST(max(cxx) AS BIGINT) AS txx, CAST(max(cy) AS BIGINT) AS ty,
    CAST(max(cxy) AS BIGINT) AS txy, CAST(max(cyy) AS BIGINT) AS tyy
  FROM pre
), cand AS (
  SELECT d.decile, pre.rn, tot.t, pre.cx, pre.cxx, pre.cy, pre.cxy,
    pre.cyy, tot.tx, tot.txx, tot.ty, tot.txy, tot.tyy
  FROM pre, tot,
    (SELECT unnest([{', '.join(str(d) for d in CHOW_DECILES)}])
     AS decile) d
  WHERE pre.rn = CAST(d.decile * tot.t AS BIGINT) // 10
), scored AS (
  SELECT CAST(decile AS BIGINT) AS decile, rn AS split_at, t,
    {round_portable_duck(_D_F, 6)} AS f_chow
  FROM cand
)
SELECT decile, split_at, t, f_chow,
  CAST(CASE WHEN f_chow IS NOT NULL
    AND f_chow = max(f_chow) OVER () THEN 1 ELSE 0 END AS BIGINT)
    AS is_sup
FROM scored
"""


def _gesd_round_sql(src: str, r: int) -> str:
    sd = ("sqrt((CAST(ss4 AS DOUBLE) * 10000.0 - CAST(s AS DOUBLE) "
          "* CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
          "/ (CAST(n AS DOUBLE) - 1.0))")
    return f"""mom{r} AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
    CAST(sum((c * c) // 10000) AS BIGINT) AS ss4
  FROM {src}
), top{r} AS (
  SELECT c, id, n, s, ss4, abs(c * n - s) AS dev
  FROM {src}, mom{r}
  ORDER BY dev DESC, c DESC, id ASC LIMIT 1
), rest{r} AS (
  SELECT {src}.c, {src}.id FROM {src}
  WHERE {src}.id NOT IN (SELECT id FROM top{r})
), row{r} AS (
  SELECT CAST({r} AS BIGINT) AS round,
    CAST(id AS BIGINT) AS removed_id,
    {round_portable_duck("CAST(c AS DOUBLE) / 100.0", 6)}
      AS removed_value,
    {round_portable_duck(
        f"CASE WHEN {sd} > 0.0 THEN "
        f"(CAST(dev AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 "
        f"/ ({sd} / 100.0) END", 6)} AS z
  FROM top{r}
)"""


_ORACLE_GESD = f"""
WITH base AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
    o_orderkey AS id
  FROM orders WHERE o_totalprice IS NOT NULL
), {_gesd_round_sql('base', 1)},
{_gesd_round_sql('rest1', 2)},
{_gesd_round_sql('rest2', 3)}
SELECT * FROM row1
UNION ALL SELECT * FROM row2
UNION ALL SELECT * FROM row3
"""

_D_VAR = ("(CASE WHEN n >= 2 THEN (CAST(ss AS DOUBLE) "
          "- CAST(s AS DOUBLE) * CAST(s AS DOUBLE) "
          "/ CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) "
          "/ 10000.0 END)")

_ORACLE_HARTLEY = f"""
WITH g AS (
  SELECT event_type AS gg, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
    CAST(sum(CAST(round(value * 100) AS BIGINT)
      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ss
  FROM events WHERE value IS NOT NULL GROUP BY 1
), red AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
    CAST(max(n - 1) AS BIGINT) AS max_df,
    CAST(min(n) AS BIGINT) AS minn,
    max({_D_VAR}) AS vmax, min({_D_VAR}) AS vmin
  FROM g
)
SELECT k, max_df,
  {round_portable_duck(
      "CASE WHEN minn >= 2 AND vmin > 0.0 THEN vmax / vmin END",
      6)} AS fmax
FROM red
"""


QUERIES: dict = {
    "q_chow_sup_events": (_q_chow, _ORACLE_CHOW),
    "q_gesd_orders": (_q_gesd, _ORACLE_GESD),
    "q_hartley_fmax_events": (_q_hartley, _ORACLE_HARTLEY),
}

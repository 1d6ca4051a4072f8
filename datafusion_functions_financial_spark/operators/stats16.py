"""Ordered-alternative tests #16: Jonckheere-Terpstra and Page's
trend test — the ORDERED-hypothesis upgrades of the gated omnibus
tier (``q_kruskal_events`` and ``stats13`` Friedman detect ANY group
difference; these two are the right tests when the groups carry a
natural order and the question is monotone trend):

- ``jonckheere``: JT = sum over group pairs i < j of the
  Mann-Whitney count U_ij (ties at half weight). Computed on the
  (group x value-band) CELL GRID like the gated gamma/Somers' D
  (``stats11``) — cell-pair products, never row pairs. The
  normal approximation uses the no-ties moments
  E = (N^2 - sum n_i^2)/4 and
  Var = (N^2(2N+3) - sum n_i^2(2n_i+3))/72.
- ``page_trend``: L = sum_j j * R_j over the Friedman rank sums
  (complete blocks, ranks within block); the z-statistic against
  E[L] = n k(k+1)^2/4, Var[L] = n k^2 (k+1)(k^2-1)/144.

Engine-exactness: both are integer arithmetic (cell-count products,
rank sums) until one final division; banded values make the grid
bounded and the tie semantics identical on both engines.

Plan shape at 100 TB: one hash aggregate to the k x m grid
(jonckheere) or the bounded (block x treatment) grid (page);
everything after runs on tiny relations.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["jonckheere", "page_trend"]

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


def jonckheere(df: DataFrame, group_expr: str,
               value_band_expr: str) -> DataFrame:
    """One row (n, k, jt, e_jt, z_jt): the Jonckheere-Terpstra
    statistic for a monotone trend of ``value_band_expr`` across the
    ordered ``group_expr`` levels. 2*JT is kept integer (ties count
    twice, full pairs four times) until the final scalars."""
    cells = (
        df.selectExpr(f"CAST(({group_expr}) AS BIGINT) AS __g",
                      f"CAST(({value_band_expr}) AS BIGINT) AS __v")
        .filter("__g IS NOT NULL AND __v IS NOT NULL")
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    a = cells.selectExpr("__g AS g1", "__v AS v1", "__n AS n1")
    b = cells.selectExpr("__g AS g2", "__v AS v2", "__n AS n2")
    pairs = a.join(F.broadcast(b), F.col("g2") > F.col("g1"))
    # 4*U accumulates: 4 per (v2 > v1) pair, 2 per tie
    red = pairs.agg(
        F.sum(F.expr(
            "CASE WHEN v2 > v1 THEN 4 * n1 * n2 "
            "WHEN v2 = v1 THEN 2 * n1 * n2 ELSE 0 END"))
        .cast("bigint").alias("__jt4"),
    )
    sizes = cells.groupBy("__g").agg(
        F.sum("__n").cast("bigint").alias("__ni"))
    mom = sizes.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("__ni").cast("bigint").alias("n"),
        F.sum(F.expr("__ni * __ni")).cast("bigint").alias("__s2"),
        F.sum(F.expr("__ni * __ni * (2 * __ni + 3)")).cast("bigint")
        .alias("__s3"),
    )
    jt = "(CAST(__jt4 AS DOUBLE) / 4.0)"
    e = ("((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) "
         "- CAST(__s2 AS DOUBLE)) / 4.0)")
    v = ("((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) "
         "* (2.0 * CAST(n AS DOUBLE) + 3.0) "
         "- CAST(__s3 AS DOUBLE)) / 72.0)")
    return red.crossJoin(F.broadcast(mom)).select(
        "n", "k",
        round_portable(F.expr(jt), 6).alias("jt"),
        round_portable(F.expr(e), 6).alias("e_jt"),
        round_portable(F.expr(
            f"({jt} - {e}) / sqrt({v})"), 6).alias("z_jt"),
    )


def page_trend(df: DataFrame, block_expr: str, treatment_rank_expr:
               str, value_col: str) -> DataFrame:
    """One row (n_blocks, k, l_stat, z_page): Page's L over complete
    blocks; ``treatment_rank_expr`` must yield the HYPOTHESIZED order
    index 1..k of each treatment."""
    cells = (
        df.select(
            F.expr(block_expr).alias("__b"),
            F.expr(treatment_rank_expr).cast("bigint").alias("__j"),
            F.expr(f"CAST(round(({value_col}) * 100) AS BIGINT)")
            .alias("__c"),
        )
        .filter("__c IS NOT NULL AND __j IS NOT NULL")
        .groupBy("__b", "__j")
        .agg(F.sum("__c").alias("__sc"),
             F.count(F.lit(1)).cast("bigint").alias("__n"))
        .withColumn("__m", F.expr(
            "CAST(__sc AS DOUBLE) / 100.0 / CAST(__n AS DOUBLE)"))
    )
    k_rel = cells.agg(
        F.countDistinct("__j").cast("bigint").alias("__k"))
    complete = (
        cells.withColumn("__kb", F.count(F.lit(1)).over(
            Window.partitionBy("__b")).cast("bigint"))
        .crossJoin(F.broadcast(k_rel))
        .filter("__kb = __k")
    )
    ranked = complete.withColumn(
        "__r", F.row_number().over(
            Window.partitionBy("__b").orderBy("__m", "__j"))
        .cast("bigint"))
    per_j = ranked.groupBy("__j").agg(
        F.sum("__r").cast("bigint").alias("__rs"),
        F.count(F.lit(1)).cast("bigint").alias("__nb"),
        F.max("__k").cast("bigint").alias("__k"),
    )
    red = per_j.agg(
        F.max("__nb").cast("bigint").alias("n_blocks"),
        F.max("__k").cast("bigint").alias("k"),
        F.sum(F.expr("__j * __rs")).cast("bigint").alias("__l"),
    )
    n, k = "CAST(n_blocks AS DOUBLE)", "CAST(k AS DOUBLE)"
    e = f"({n} * {k} * ({k} + 1.0) * ({k} + 1.0) / 4.0)"
    v = (f"({n} * {k} * {k} * ({k} + 1.0) "
         f"* ({k} * {k} - 1.0) / 144.0)")
    return red.select(
        "n_blocks", "k",
        F.col("__l").alias("l_stat"),
        round_portable(F.expr(
            f"(CAST(__l AS DOUBLE) - {e}) / sqrt({v})"), 6)
        .alias("z_page"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events: hour-band trend and
# day-block x event-type page trend — the stats11/stats13 stagings)
# --------------------------------------------------------------------------

_SPARK_G = f"((ts DIV 1000) DIV {US_PER_HOUR}) % 24 DIV 6"
_DUCK_G = f"((epoch_us(ts) // {US_PER_HOUR}) % 24) // 6"
_BAND = "least(9, CAST(floor(value / 50.0) AS BIGINT))"
_SPARK_DAY = f"(ts DIV 1000) DIV {US_PER_DAY}"
_DUCK_DAY = f"epoch_us(ts) // {US_PER_DAY}"
# hypothesized order of event types (alphabetical rank literal)
_SPARK_J = ("CASE event_type WHEN 'click' THEN 1 WHEN 'purchase' "
            "THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END")


def _q_jt(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jonckheere(load(spark, sf_dir, "events"), _SPARK_G, _BAND)


def _q_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    return page_trend(load(spark, sf_dir, "events"), _SPARK_DAY,
                      _SPARK_J, "value")


_JT = "(CAST(jt4 AS DOUBLE) / 4.0)"
_JT_E = ("((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) "
         "- CAST(s2 AS DOUBLE)) / 4.0)")
_JT_V = ("((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) "
         "* (2.0 * CAST(n AS DOUBLE) + 3.0) "
         "- CAST(s3 AS DOUBLE)) / 72.0)")

_ORACLE_JT = f"""
WITH cells AS (
  SELECT CAST({_DUCK_G} AS BIGINT) AS g,
    CAST({_BAND} AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), red AS (
  SELECT CAST(sum(CASE WHEN b.v > a.v THEN 4 * a.n * b.n
    WHEN b.v = a.v THEN 2 * a.n * b.n ELSE 0 END) AS BIGINT) AS jt4
  FROM cells a JOIN cells b ON b.g > a.g
), sizes AS (
  SELECT g, CAST(sum(n) AS BIGINT) AS ni FROM cells GROUP BY 1
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ni) AS BIGINT) AS n,
    CAST(sum(ni * ni) AS BIGINT) AS s2,
    CAST(sum(ni * ni * (2 * ni + 3)) AS BIGINT) AS s3
  FROM sizes
)
SELECT mom.n, mom.k,
  {round_portable_duck(_JT, 6)} AS jt,
  {round_portable_duck(_JT_E, 6)} AS e_jt,
  {round_portable_duck(
      f"({_JT} - {_JT_E}) / sqrt({_JT_V})", 6)} AS z_jt
FROM red, mom
"""

_P_N, _P_K = "CAST(n_blocks AS DOUBLE)", "CAST(k AS DOUBLE)"
_P_E = f"({_P_N} * {_P_K} * ({_P_K} + 1.0) * ({_P_K} + 1.0) / 4.0)"
_P_V = (f"({_P_N} * {_P_K} * {_P_K} * ({_P_K} + 1.0) "
        f"* ({_P_K} * {_P_K} - 1.0) / 144.0)")
_DUCK_J = ("CASE event_type WHEN 'click' THEN 1 WHEN 'purchase' "
           "THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END")

_ORACLE_PAGE = f"""
WITH cells AS (
  SELECT {_DUCK_DAY} AS b, CAST({_DUCK_J} AS BIGINT) AS j,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
      / 100.0 / CAST(count(*) AS DOUBLE) AS m
  FROM events
  WHERE value IS NOT NULL AND ({_DUCK_J}) IS NOT NULL
  GROUP BY 1, 2
), krel AS (SELECT CAST(count(DISTINCT j) AS BIGINT) AS k
  FROM cells),
complete AS (
  SELECT c.b, c.j, c.m, krel.k
  FROM cells c,
    (SELECT b AS bb, CAST(count(*) AS BIGINT) AS kb FROM cells
     GROUP BY 1) f, krel
  WHERE c.b = f.bb AND f.kb = krel.k
), ranked AS (
  SELECT b, j, k,
    CAST(row_number() OVER (PARTITION BY b ORDER BY m, j)
      AS BIGINT) AS r
  FROM complete
), per_j AS (
  SELECT j, CAST(sum(r) AS BIGINT) AS rs,
    CAST(count(*) AS BIGINT) AS nb, CAST(max(k) AS BIGINT) AS k
  FROM ranked GROUP BY 1
), red AS (
  SELECT CAST(max(nb) AS BIGINT) AS n_blocks,
    CAST(max(k) AS BIGINT) AS k,
    CAST(sum(j * rs) AS BIGINT) AS l
  FROM per_j
)
SELECT n_blocks, k, l AS l_stat,
  {round_portable_duck(
      f"(CAST(l AS DOUBLE) - {_P_E}) / sqrt({_P_V})", 6)} AS z_page
FROM red
"""


QUERIES: dict = {
    "q_jonckheere_events": (_q_jt, _ORACLE_JT),
    "q_page_trend_events": (_q_page, _ORACLE_PAGE),
}

"""Repeated-measures tests #13: Cochran's Q (k matched binary
treatments) and the Friedman test with Kendall's W (k treatments
ranked within blocks) — the k-sample generalizations of the gated
pairwise tier (``stats12`` McNemar is Cochran's Q at k = 2;
``q_kruskal_events`` is Friedman's independent-samples cousin).

- ``cochran_q``: Q = k(k-1) * sum_j (G_j - T/k)^2
  / (k*T - sum_i L_i^2), where G_j = per-treatment success totals,
  L_i = per-item success count, T = sum L_i. Every term is an exact
  BIGINT aggregate computed in ONE pass (L_i and L_i^2 are per-ROW
  expressions over the k treatment columns — no per-item grouping).
- ``friedman_w``: blocks rank the k treatment VALUES (mean value per
  (block, treatment), ranked within the block); the chi-square
  statistic chi2_F = 12n/(k(k+1)) * sum_j (Rbar_j - (k+1)/2)^2 and
  Kendall's W = chi2_F / (n(k-1)).

Engine-exactness: Cochran's Q is integer arithmetic until one final
division; Friedman's block ranks are integer row_numbers over exact
cent means (ties broken by treatment id — both engines rank the
same doubles in the same order), rank sums stay BIGINT, and the
closed forms combine scalars.

Plan shape at 100 TB: Cochran is one map-side-combinable aggregate.
Friedman aggregates to the (block x treatment) grid first — bounded
by calendar x cardinality, not row count — then ranks inside
k-row partitions.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["cochran_q", "friedman_w"]

US_PER_DAY = 86_400_000_000


def cochran_q(df: DataFrame, treatment_exprs: list[str]) -> DataFrame:
    """One row (n_items, k, q_stat): Cochran's Q over the k binary
    treatment expressions evaluated per row (each row is a matched
    item)."""
    k = len(treatment_exprs)
    # coalesce(.., 0): a NULL predicate (e.g. value > x on a NULL
    # value) counts as a miss, not a dropped item — mirrors the
    # oracle's coalesce(.., false)
    cols = [F.expr(f"coalesce(CAST(({e}) AS INT), 0)")
            .alias(f"__t{j}")
            for j, e in enumerate(treatment_exprs)]
    rows = df.select(*cols)
    li = " + ".join(f"__t{j}" for j in range(k))
    red = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.expr(f"({li})")).cast("bigint").alias("__t"),
        F.sum(F.expr(f"({li}) * ({li})")).cast("bigint").alias("__l2"),
        *[F.sum(f"__t{j}").cast("bigint").alias(f"__g{j}")
          for j in range(k)],
    )
    # sum_j (G_j - T/k)^2 = sum G_j^2 - T^2/k; computed in DOUBLE
    # one factor at a time (G_j^2 sums would pass int64 at ~1e10 rows)
    g2 = " + ".join(
        f"CAST(__g{j} AS DOUBLE) * CAST(__g{j} AS DOUBLE)"
        for j in range(k))
    num = (f"{float(k * (k - 1))!r} * (({g2}) "
           f"- CAST(__t AS DOUBLE) * CAST(__t AS DOUBLE) "
           f"/ {float(k)!r})")
    den = (f"({float(k)!r} * CAST(__t AS DOUBLE) "
           f"- CAST(__l2 AS DOUBLE))")
    return red.select(
        "n_items", F.lit(k).cast("bigint").alias("k"),
        round_portable(F.expr(
            f"CASE WHEN {den} > 0.0 THEN ({num}) / ({den}) "
            f"ELSE 0.0 END"), 6).alias("q_stat"),
    )


def friedman_w(df: DataFrame, block_expr: str, treatment_expr: str,
               value_col: str) -> DataFrame:
    """One row (n_blocks, k, chi2_friedman, kendall_w): the Friedman
    rank test over complete blocks (blocks missing any treatment are
    dropped) with Kendall's coefficient of concordance."""
    cells = (
        df.select(
            F.expr(block_expr).alias("__b"),
            F.expr(treatment_expr).alias("__tr"),
            F.expr(f"CAST(round(({value_col}) * 100) AS BIGINT)")
            .alias("__c"),
        )
        .filter("__c IS NOT NULL AND __tr IS NOT NULL")
        .groupBy("__b", "__tr")
        .agg(F.sum("__c").alias("__sc"),
             F.count(F.lit(1)).cast("bigint").alias("__n"))
        .withColumn("__m", F.expr(
            "CAST(__sc AS DOUBLE) / 100.0 / CAST(__n AS DOUBLE)"))
    )
    k_rel = cells.agg(
        F.countDistinct("__tr").cast("bigint").alias("__k"))
    complete = (
        cells.withColumn("__kb", F.count(F.lit(1)).over(
            Window.partitionBy("__b")).cast("bigint"))
        .crossJoin(F.broadcast(k_rel))
        .filter("__kb = __k")
    )
    ranked = complete.withColumn(
        "__r", F.row_number().over(
            Window.partitionBy("__b").orderBy("__m", "__tr"))
        .cast("bigint"))
    per_tr = ranked.groupBy("__tr").agg(
        F.sum("__r").cast("bigint").alias("__rs"),
        F.count(F.lit(1)).cast("bigint").alias("__nb"),
        F.max("__k").cast("bigint").alias("__k"),
    )
    # chi2_F = 12/(n k (k+1)) * sum R_j^2 - 3 n (k+1), the rank-sum
    # form; exact BIGINT rank sums, scalar combination in DOUBLE
    red = per_tr.agg(
        F.max("__nb").cast("bigint").alias("n_blocks"),
        F.max("__k").cast("bigint").alias("k"),
        F.sum(F.expr(
            "CAST(__rs AS DOUBLE) * CAST(__rs AS DOUBLE)"))
        .alias("__sr2"),
    )
    chi2 = ("(12.0 * __sr2 / (CAST(n_blocks AS DOUBLE) "
            "* CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE)) "
            "- 3.0 * CAST(n_blocks AS DOUBLE) "
            "* CAST(k + 1 AS DOUBLE))")
    return red.select(
        "n_blocks", "k",
        round_portable(F.expr(chi2), 6).alias("chi2_friedman"),
        round_portable(F.expr(
            f"CASE WHEN n_blocks > 0 AND k > 1 THEN {chi2} "
            f"/ (CAST(n_blocks AS DOUBLE) * CAST(k - 1 AS DOUBLE)) "
            f"ELSE 0.0 END"), 6).alias("kendall_w"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events; ts is ns-BIGINT on Spark,
# us-TIMESTAMP in DuckDB)
# --------------------------------------------------------------------------

_T1 = "value > 100.0"
_T2 = "event_type IN ('purchase', 'click')"
_T3 = "value > 50.0 AND event_type <> 'view'"
_SPARK_DAY = f"(ts DIV 1000) DIV {US_PER_DAY}"
_DUCK_DAY = f"epoch_us(ts) // {US_PER_DAY}"


def _q_cochran(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cochran_q(load(spark, sf_dir, "events"), [_T1, _T2, _T3])


def _q_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    return friedman_w(load(spark, sf_dir, "events"), _SPARK_DAY,
                      "event_type", "value")


def _duck_bool(e: str) -> str:
    return f"CAST(coalesce(({e}), false) AS INT)"


_D_LI = " + ".join(_duck_bool(e) for e in (_T1, _T2, _T3))
_D_G2 = " + ".join(
    f"CAST(g{j} AS DOUBLE) * CAST(g{j} AS DOUBLE)" for j in range(3))
_D_NUM = (f"{float(3 * 2)!r} * (({_D_G2}) "
          f"- CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / {3.0!r})")
_D_DEN = f"({3.0!r} * CAST(t AS DOUBLE) - CAST(l2 AS DOUBLE))"

_ORACLE_COCHRAN = f"""
WITH red AS (
  SELECT CAST(count(*) AS BIGINT) AS n_items,
    CAST(sum({_D_LI}) AS BIGINT) AS t,
    CAST(sum(({_D_LI}) * ({_D_LI})) AS BIGINT) AS l2,
    CAST(sum({_duck_bool(_T1)}) AS BIGINT) AS g0,
    CAST(sum({_duck_bool(_T2)}) AS BIGINT) AS g1,
    CAST(sum({_duck_bool(_T3)}) AS BIGINT) AS g2
  FROM events
)
SELECT n_items, CAST(3 AS BIGINT) AS k,
  {round_portable_duck(
      f"CASE WHEN {_D_DEN} > 0.0 THEN ({_D_NUM}) / ({_D_DEN}) "
      f"ELSE 0.0 END", 6)} AS q_stat
FROM red
"""

_F_CHI2 = ("(12.0 * sr2 / (CAST(n_blocks AS DOUBLE) "
           "* CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE)) "
           "- 3.0 * CAST(n_blocks AS DOUBLE) "
           "* CAST(k + 1 AS DOUBLE))")

_ORACLE_FRIEDMAN = f"""
WITH cells AS (
  SELECT {_DUCK_DAY} AS b, event_type AS tr,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
      / 100.0 / CAST(count(*) AS DOUBLE) AS m
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), krel AS (SELECT CAST(count(DISTINCT tr) AS BIGINT) AS k
  FROM cells),
complete AS (
  SELECT c.b, c.tr, c.m, krel.k
  FROM cells c,
    (SELECT b AS bb, CAST(count(*) AS BIGINT) AS kb FROM cells
     GROUP BY 1) f, krel
  WHERE c.b = f.bb AND f.kb = krel.k
), ranked AS (
  SELECT b, tr, k,
    CAST(row_number() OVER (PARTITION BY b ORDER BY m, tr)
      AS BIGINT) AS r
  FROM complete
), per_tr AS (
  SELECT tr, CAST(sum(r) AS BIGINT) AS rs,
    CAST(count(*) AS BIGINT) AS nb, CAST(max(k) AS BIGINT) AS k
  FROM ranked GROUP BY 1
), red AS (
  SELECT CAST(max(nb) AS BIGINT) AS n_blocks,
    CAST(max(k) AS BIGINT) AS k,
    sum(CAST(rs AS DOUBLE) * CAST(rs AS DOUBLE)) AS sr2
  FROM per_tr
)
SELECT n_blocks, k,
  {round_portable_duck(_F_CHI2, 6)} AS chi2_friedman,
  {round_portable_duck(
      f"CASE WHEN n_blocks > 0 AND k > 1 THEN {_F_CHI2} "
      f"/ (CAST(n_blocks AS DOUBLE) * CAST(k - 1 AS DOUBLE)) "
      f"ELSE 0.0 END", 6)} AS kendall_w
FROM red
"""


QUERIES: dict = {
    "q_cochran_q_events": (_q_cochran, _ORACLE_COCHRAN),
    "q_friedman_w_events": (_q_friedman, _ORACLE_FRIEDMAN),
}

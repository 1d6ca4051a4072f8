"""Ordinal association #11: Goodman-Kruskal gamma and Somers' D over
an ordinal x ordinal contingency table — the rank-association
companions to Kendall's tau (gated ``q_kendall_tau_events``) when
both variables are BANDED: tau on raw values pays a pair join; on a
k x m table the concordant/discordant counts collapse to one
self-join of the TINY cell grid.

  C  = sum over cell pairs (x2 > x1, y2 > y1) of n1*n2
  D  = sum over cell pairs (x2 > x1, y2 < y1) of n1*n2
  TY = sum over cell pairs (x2 > x1, y2 = y1) of n1*n2
  gamma = (C - D) / (C + D)          (ties dropped)
  somers_d (y|x) = (C - D) / (C + D + TY)

Engine-exactness: integer products of BIGINT cell counts end to end;
one final double division each.

Plan shape at 100 TB: ONE hash aggregate builds the grid (k*m <= a
few dozen rows); the pair enumeration is a broadcast self-join of
that grid — the data is touched once, no pair join over rows.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (statistics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["ordinal_association"]

US_PER_HOUR = 3_600_000_000


def ordinal_association(df: DataFrame, x_expr: str,
                        y_expr: str) -> DataFrame:
    """One row (n, c_pairs, d_pairs, ty_pairs, gamma, somers_d):
    concordance statistics of the (x, y) ordinal pair."""
    cells = (
        df.selectExpr(f"CAST({x_expr} AS BIGINT) AS __x",
                      f"CAST({y_expr} AS BIGINT) AS __y")
        .filter("__x IS NOT NULL AND __y IS NOT NULL")
        .groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    a = cells.selectExpr("__x AS x1", "__y AS y1", "__n AS n1")
    b = cells.selectExpr("__x AS x2", "__y AS y2", "__n AS n2")
    pairs = a.join(F.broadcast(b), F.col("x2") > F.col("x1"))
    red = pairs.agg(
        F.sum(F.expr(
            "CASE WHEN y2 > y1 THEN n1 * n2 ELSE 0 END"))
        .cast("bigint").alias("c_pairs"),
        F.sum(F.expr(
            "CASE WHEN y2 < y1 THEN n1 * n2 ELSE 0 END"))
        .cast("bigint").alias("d_pairs"),
        F.sum(F.expr(
            "CASE WHEN y2 = y1 THEN n1 * n2 ELSE 0 END"))
        .cast("bigint").alias("ty_pairs"),
    )
    tot = cells.agg(F.sum("__n").cast("bigint").alias("n"))
    return red.crossJoin(F.broadcast(tot)).select(
        "n", "c_pairs", "d_pairs", "ty_pairs",
        round_portable(F.expr(
            "CAST(c_pairs - d_pairs AS DOUBLE) "
            "/ CAST(c_pairs + d_pairs AS DOUBLE)"), 6).alias("gamma"),
        round_portable(F.expr(
            "CAST(c_pairs - d_pairs AS DOUBLE) "
            "/ CAST(c_pairs + d_pairs + ty_pairs AS DOUBLE)"), 6)
        .alias("somers_d"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (hour band x value band over events;
# ts is ns-BIGINT on Spark, us-TIMESTAMP in DuckDB)
# --------------------------------------------------------------------------

_SPARK_X = f"((ts DIV 1000) DIV {US_PER_HOUR}) % 24 DIV 6"
_DUCK_X = f"((epoch_us(ts) // {US_PER_HOUR}) % 24) // 6"
_Y = "least(9, CAST(floor(value / 50.0) AS BIGINT))"


def _q_ordassoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ordinal_association(load(spark, sf_dir, "events"),
                               _SPARK_X, _Y)


_ORACLE_ORDASSOC = f"""
WITH cells AS (
  SELECT CAST({_DUCK_X} AS BIGINT) AS x,
    CAST({_Y} AS BIGINT) AS y, CAST(count(*) AS BIGINT) AS n
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
), red AS (
  SELECT
    CAST(sum(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END)
      AS BIGINT) AS c_pairs,
    CAST(sum(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END)
      AS BIGINT) AS d_pairs,
    CAST(sum(CASE WHEN b.y = a.y THEN a.n * b.n ELSE 0 END)
      AS BIGINT) AS ty_pairs
  FROM cells a JOIN cells b ON b.x > a.x
), tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM cells)
SELECT tot.n, red.c_pairs, red.d_pairs, red.ty_pairs,
  {round_portable_duck(
      "CAST(red.c_pairs - red.d_pairs AS DOUBLE) "
      "/ CAST(red.c_pairs + red.d_pairs AS DOUBLE)", 6)} AS gamma,
  {round_portable_duck(
      "CAST(red.c_pairs - red.d_pairs AS DOUBLE) "
      "/ CAST(red.c_pairs + red.d_pairs + red.ty_pairs AS DOUBLE)",
      6)} AS somers_d
FROM red, tot
"""


QUERIES: dict = {
    "q_ordinal_assoc_events": (_q_ordassoc, _ORACLE_ORDASSOC),
}

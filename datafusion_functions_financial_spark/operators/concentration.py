"""Concentration / inequality statistics: Gini coefficient, Lorenz
deciles, and the Herfindahl-Hirschman index (HHI) — the standard
"how skewed is this distribution" reports a data platform runs over
revenue, token counts, or traffic (skew here is ALSO the operational
signal: a high-Gini key column is the one that needs salting).

Engine-exact by construction:
- money accumulates as integer cents (``CAST(round(x * 100) AS
  BIGINT)`` — the repo-wide idiom), so every cross-row sum is exact
  BIGINT arithmetic, order-independent on both engines;
- the Gini closed form ``(2*Σ(i*x_i)) / (n*Σx) - (n+1)/n`` (x sorted
  ascending, i = 1-based rank with a unique tiebreak) is evaluated as
  ONE double expression from three exact integers;
- HHI squares per-entity shares in double but quantizes each squared
  term to BIGINT (1e12 scale) before the cross-row sum — the
  float-determinism rule (SCALING.md).

Plan shape at scale: Gini/Lorenz sort within the group key via one
window (hash shuffle on the key; rank products collapse map-side in
the final agg); HHI is two hash aggregations and a broadcast of the
small per-group totals. Σ(i·x) fits BIGINT up to ~10^9 rows of 10^9
cents per group; past that, pre-aggregate duplicate values first.

Beyond-reference scope (SURVEY.md extension: training-data pipeline
health metrics); no counterpart in the reference's Rust surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["gini", "lorenz_deciles", "hhi"]

_HHI_SCALE = 1e12


def gini(df: DataFrame, value_cents: str, keys: Sequence[str],
         tiebreaks: Sequence[str]) -> DataFrame:
    """(keys..., n, gini): Gini coefficient per key group over an
    integer (cents) value column. 0 = perfectly equal, →1 = one row
    holds everything. ``tiebreaks`` must make the sort unique."""
    order = [F.col(value_cents).asc()] + [F.col(c).asc()
                                          for c in tiebreaks]
    w = Window.partitionBy(*keys).orderBy(*order)
    ranked = df.withColumn("__i", F.row_number().over(w))
    g = (
        "(2.0 * CAST(__wsum AS DOUBLE)) "
        "/ (CAST(__n AS DOUBLE) * CAST(__s AS DOUBLE)) "
        "- (CAST(__n AS DOUBLE) + 1.0) / CAST(__n AS DOUBLE)"
    )
    return (
        ranked.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col(value_cents)).alias("__s"),
            F.sum(F.col("__i") * F.col(value_cents)).alias("__wsum"),
        )
        .select(
            *keys,
            F.col("__n").alias("n"),
            round_portable(F.expr(g)).alias("gini"),
        )
    )


def lorenz_deciles(df: DataFrame, value_cents: str,
                   tiebreaks: Sequence[str]) -> DataFrame:
    """(decile, n, decile_share, cum_share): the Lorenz curve at
    decile resolution — rows ranked ascending by value, cumulative
    share of the total per decile. Integer cents end to end; shares
    are two final double divisions."""
    w = Window.orderBy(F.col(value_cents).asc(),
                       *[F.col(c).asc() for c in tiebreaks])
    tiled = df.withColumn("__d", F.ntile(10).over(w))
    per = tiled.groupBy("__d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_cents).alias("__dc"),
    )
    wc = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    return (
        per.withColumn("__cum", F.sum("__dc").over(wc))
        .withColumn("__tot", F.sum("__dc").over(wt))
        .select(
            F.col("__d").alias("decile"),
            "n",
            round_portable(F.expr(
                "CAST(__dc AS DOUBLE) / CAST(__tot AS DOUBLE)"
            )).alias("decile_share"),
            round_portable(F.expr(
                "CAST(__cum AS DOUBLE) / CAST(__tot AS DOUBLE)"
            )).alias("cum_share"),
        )
    )


def hhi(df: DataFrame, value_cents: str, entity: str,
        keys: Sequence[str]) -> DataFrame:
    """(keys..., n_entities, hhi): Herfindahl index per key group —
    Σ share_e² over entities, share from exact cents. Each squared
    share quantizes to BIGINT(1e12) before the cross-entity sum, so
    aggregation order cannot flip a bit. HHI ∈ (0, 1]; 1/n floor."""
    per = df.groupBy(*keys, entity).agg(
        F.sum(value_cents).alias("__e"))
    wt = Window.partitionBy(*keys)
    term = (
        "CAST(round((CAST(__e AS DOUBLE) / CAST(__t AS DOUBLE)) "
        f"* (CAST(__e AS DOUBLE) / CAST(__t AS DOUBLE)) * {_HHI_SCALE!r}"
        ") AS BIGINT)"
    )
    return (
        per.withColumn("__t", F.sum("__e").over(wt))
        .withColumn("__q", F.expr(term))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            round_portable(
                F.expr(f"CAST(sum(__q) AS DOUBLE) / {_HHI_SCALE!r}")
            ).alias("hhi"),
        )
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


def _q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn(
        "__cents", F.expr(_CENTS))
    return gini(o, "__cents", ["o_orderpriority"], ["o_orderkey"])


_ORACLE_GINI = f"""
WITH ranked AS (
  SELECT o_orderpriority, {_CENTS} AS cents,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY {_CENTS} ASC, o_orderkey ASC) AS i
  FROM orders
), agg AS (
  SELECT o_orderpriority,
         count(*) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         CAST(sum(i * cents) AS BIGINT) AS wsum
  FROM ranked GROUP BY 1
)
SELECT o_orderpriority, n,
  {round_portable_duck(
      "(2.0 * CAST(wsum AS DOUBLE)) / (CAST(n AS DOUBLE) "
      "* CAST(s AS DOUBLE)) - (CAST(n AS DOUBLE) + 1.0) "
      "/ CAST(n AS DOUBLE)")} AS gini
FROM agg
"""


def _q_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn(
        "__cents", F.expr(_CENTS))
    return lorenz_deciles(o, "__cents", ["o_orderkey"])


_ORACLE_LORENZ = f"""
WITH tiled AS (
  SELECT {_CENTS} AS cents,
         ntile(10) OVER (ORDER BY {_CENTS} ASC, o_orderkey ASC) AS d
  FROM orders
), per AS (
  SELECT d, count(*) AS n, CAST(sum(cents) AS BIGINT) AS dc
  FROM tiled GROUP BY 1
), cum AS (
  SELECT *, CAST(sum(dc) OVER (ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS c,
         CAST(sum(dc) OVER () AS BIGINT) AS t
  FROM per
)
SELECT d AS decile, n,
  {round_portable_duck("CAST(dc AS DOUBLE) / CAST(t AS DOUBLE)")}
    AS decile_share,
  {round_portable_duck("CAST(c AS DOUBLE) / CAST(t AS DOUBLE)")}
    AS cum_share
FROM cum
"""


def _q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn(
        "__cents", F.expr(_CENTS))
    c = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey", "c_nationkey")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return hhi(j, "__cents", "o_custkey", ["c_nationkey"])


_ORACLE_HHI = f"""
WITH per AS (
  SELECT c.c_nationkey, o.o_custkey,
         CAST(sum({_CENTS}) AS BIGINT) AS e
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), tot AS (
  SELECT *, CAST(sum(e) OVER (PARTITION BY c_nationkey) AS BIGINT) AS t
  FROM per
), q AS (
  SELECT c_nationkey,
         CAST(round((CAST(e AS DOUBLE) / CAST(t AS DOUBLE))
           * (CAST(e AS DOUBLE) / CAST(t AS DOUBLE)) * {_HHI_SCALE!r})
           AS BIGINT) AS qq
  FROM tot
)
SELECT c_nationkey, count(*) AS n_entities,
  {round_portable_duck(
      f"CAST(sum(qq) AS DOUBLE) / {_HHI_SCALE!r}")} AS hhi
FROM q GROUP BY 1
"""


QUERIES: dict = {
    "q_gini_orders": (_q_gini, _ORACLE_GINI),
    "q_lorenz_deciles_orders": (_q_lorenz, _ORACLE_LORENZ),
    "q_hhi_nation_orders": (_q_hhi, _ORACLE_HHI),
}

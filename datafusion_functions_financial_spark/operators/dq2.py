"""Data-quality profiling, part 2: per-column null/distinct profile
and population-stability (PSI) drift between two time halves — the
"did the feed change shape" checks that run before any modeling
query (complements ``dq.py``'s Benford and uniqueness audits).

Engine-exact: the profile is pure integer counting; PSI shares come
from exact integer counts, each category's PSI term is one double
expression, and the cross-category total quantizes terms to BIGINT
at 1e8 before summing (the float-determinism rule — categories are
few, but the rule is unconditional). The time split point is integer
microsecond arithmetic (midpoint of min/max epoch), not a quantile.

Plan shape at scale: the profile is ONE pass (every per-column count
is a conditional aggregate in the same groupBy-less agg;
count(DISTINCT a, b, c...) multi-aggregates expand via Spark's
native rewrite); PSI is one hash aggregation on (category, half)
plus a broadcast-size reshape.

Beyond-reference scope (SURVEY.md extension).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["null_profile", "psi_drift"]

PSI_SCALE = 10 ** 8


def null_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, n_rows, n_nulls, null_rate, n_distinct): one profile
    row per requested column, computed in a single scan."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(
            F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in cols
    )
    return one.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack}) AS (column, n_nulls, n_distinct)",
    ).selectExpr(
        "column",
        "CAST(__n AS BIGINT) AS n_rows",
        "CAST(n_nulls AS BIGINT) AS n_nulls",
        f"round(CAST(n_nulls AS DOUBLE) / CAST(__n AS DOUBLE) * 1e4)"
        f" / 1e4 + 0.0 AS null_rate",
        "CAST(n_distinct AS BIGINT) AS n_distinct",
    )


def psi_drift(df: DataFrame, cat_col: str, us_col: str) -> DataFrame:
    """(category, n_early, n_late, share_early, share_late, psi_term)
    plus the drift test statistic folded in per row: categorical
    population-stability between the first and second time halves
    (split at the integer midpoint of the observed epoch range).
    PSI term: (p_e − p_l) · ln(p_e / p_l); total PSI > 0.2 is the
    conventional "investigate" threshold — sum the column."""
    # Integer floor division on BOTH sides: DuckDB CAST(double AS
    # BIGINT) rounds while Spark truncates, so a float midpoint
    # would split odd ranges differently.
    mid = df.agg(F.expr(
        f"(min({us_col}) + max({us_col})) DIV 2").alias("m"))
    halves = (
        df.crossJoin(F.broadcast(mid))
        .select(
            F.col(cat_col).alias("category"),
            F.when(F.col(us_col) <= F.col("m"), 1).otherwise(0)
            .alias("__early"),
        )
        .groupBy("category")
        .agg(
            F.sum("__early").cast("bigint").alias("n_early"),
            F.sum(F.expr("1 - __early")).cast("bigint").alias("n_late"),
        )
    )
    tot = (
        halves.agg(F.sum("n_early").alias("te"),
                   F.sum("n_late").alias("tl"))
    )
    pe = "CAST(n_early AS DOUBLE) / CAST(te AS DOUBLE)"
    pl = "CAST(n_late AS DOUBLE) / CAST(tl AS DOUBLE)"
    term = (
        f"CASE WHEN n_early > 0 AND n_late > 0 THEN "
        f"(({pe}) - ({pl})) * ln(({pe}) / ({pl})) END"
    )
    return (
        halves.crossJoin(F.broadcast(tot))
        .select(
            "category", "n_early", "n_late",
            round_portable(F.expr(pe)).alias("share_early"),
            round_portable(F.expr(pl)).alias("share_late"),
            round_portable(F.expr(term)).alias("psi_term"),
        )
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------

_ORDER_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderpriority"]


def _q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return null_profile(load(spark, sf_dir, "orders"), _ORDER_COLS)


_ORACLE_NULL_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column",
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_nulls,
  round(CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) * 1e4) / 1e4 + 0.0 AS null_rate,
  CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders"""
    for c in _ORDER_COLS
)


def _q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return psi_drift(ev, "event_type", "__us")


_ORACLE_PSI = f"""
WITH mid AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
  FROM events
), halves AS (
  SELECT event_type AS category,
         CAST(sum(CASE WHEN epoch_us(ts) <= mid.m THEN 1 ELSE 0 END)
           AS BIGINT) AS n_early,
         CAST(sum(CASE WHEN epoch_us(ts) <= mid.m THEN 0 ELSE 1 END)
           AS BIGINT) AS n_late
  FROM events, mid GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_early) AS BIGINT) AS te,
         CAST(sum(n_late) AS BIGINT) AS tl
  FROM halves
)
SELECT category, n_early, n_late,
  {round_portable_duck(
      "CAST(n_early AS DOUBLE) / CAST(te AS DOUBLE)")} AS share_early,
  {round_portable_duck(
      "CAST(n_late AS DOUBLE) / CAST(tl AS DOUBLE)")} AS share_late,
  {round_portable_duck(
      "CASE WHEN n_early > 0 AND n_late > 0 THEN "
      "((CAST(n_early AS DOUBLE) / CAST(te AS DOUBLE)) "
      "- (CAST(n_late AS DOUBLE) / CAST(tl AS DOUBLE))) "
      "* ln((CAST(n_early AS DOUBLE) / CAST(te AS DOUBLE)) "
      "/ (CAST(n_late AS DOUBLE) / CAST(tl AS DOUBLE))) END")}
    AS psi_term
FROM halves, tot
"""


QUERIES: dict = {
    "dq_null_profile_orders": (_q_null_profile, _ORACLE_NULL_PROFILE),
    "dq_psi_drift_events": (_q_psi, _ORACLE_PSI),
}


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distance (exact integer arithmetic)
# --------------------------------------------------------------------------


def ks_two_sample(df: DataFrame, value_col: str, group_col: str,
                  group_a: str, group_b: str) -> DataFrame:
    """(n_a, n_b, ks_d): the exact two-sample KS statistic
    D = max |F_a(x) − F_b(x)| between two groups' value
    distributions. Tie-correct (RANGE frames include all equal
    values, so no tiebreak column is needed — the cumulative counts
    at x are order-free) and INTEGER-exact: the maximized quantity is
    |cum_a·n_b − cum_b·n_a| over integer counts — the only float op
    is the final division."""
    from pyspark.sql import Window

    tagged = df.filter(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(value_col).alias("__v"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("__a"),
    )
    wr = (Window.orderBy("__v")
          .rangeBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy()
    staged = (
        tagged
        .withColumn("__ca", F.sum("__a").over(wr))
        .withColumn("__cb", F.sum(F.expr("1 - __a")).over(wr))
        .withColumn("__na", F.sum("__a").over(wt))
        .withColumn("__nb", F.sum(F.expr("1 - __a")).over(wt))
        .withColumn("__d", F.abs(
            F.col("__ca") * F.col("__nb") - F.col("__cb") * F.col("__na")
        ))
    )
    return staged.agg(
        F.max("__na").cast("bigint").alias("n_a"),
        F.max("__nb").cast("bigint").alias("n_b"),
        round_portable(F.expr(
            "CAST(max(__d) AS DOUBLE) "
            "/ (CAST(max(__na) AS DOUBLE) * CAST(max(__nb) AS DOUBLE))"
        )).alias("ks_d"),
    )


def _q_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do 'view' and 'purchase' events draw values from the same
    distribution? The classic segment-drift question, answered with
    the exact KS distance."""
    return ks_two_sample(load(spark, sf_dir, "events"), "value",
                         "event_type", "view", "purchase")


_ORACLE_KS = f"""
WITH tagged AS (
  SELECT value AS v,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a
  FROM events WHERE event_type IN ('view', 'purchase')
), staged AS (
  SELECT
    CAST(sum(a) OVER (ORDER BY v
      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS ca,
    CAST(sum(1 - a) OVER (ORDER BY v
      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cb,
    CAST(sum(a) OVER () AS BIGINT) AS na,
    CAST(sum(1 - a) OVER () AS BIGINT) AS nb
  FROM tagged
)
SELECT CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b,
  {round_portable_duck(
      "CAST(max(abs(ca * nb - cb * na)) AS DOUBLE) "
      "/ (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE))")}
    AS ks_d
FROM staged
"""


QUERIES["dq_ks_two_sample_events"] = (_q_ks, _ORACLE_KS)

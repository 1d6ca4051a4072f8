"""Data-quality #4: value-pattern profiling (the classic "shape of
the strings in this column" audit) and the daily completeness /
freshness profile.

Extends the dq family (Benford, key uniqueness, null profile, PSI
drift, KS distance, FD violations, cardinality profile, key skew)
with the two remaining staples of an ingest health dashboard:
pattern histograms catch format regressions (a new `9-AAA` variant
appearing in an enum-ish column) and the per-day profile catches
partial loads and silent null inflation before they poison
downstream aggregates.

Determinism: patterns are pure ``regexp_replace`` character-class
rewrites (digits→9, upper→A, lower→a) — Spark replaces all matches
by default, DuckDB with the 'g' flag, verified identical; counts are
exact integers; top-k ranking rounds nothing (integer keys with a
pattern-string tiebreak).

Plan shapes at scale: the pattern profile is one hash aggregate per
column on (column, pattern) — pattern cardinality is format-bounded,
far below row count — followed by a per-column rank over that small
relation. The daily profile is a single map-side-combinable hash
aggregate on the day bucket (conditional counts + one distinct via
two-level aggregate). No Python, no sorts over data-sized relations.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["value_pattern_profile", "daily_completeness"]

US_PER_DAY = 86_400_000_000
PATTERN_TOPK = 5


def _pattern_expr(col: str) -> str:
    return (f"regexp_replace(regexp_replace(regexp_replace("
            f"{col}, '[0-9]', '9'), '[A-Z]', 'A'), '[a-z]', 'a')")


def value_pattern_profile(df: DataFrame, cols: Sequence[str],
                          top_k: int = PATTERN_TOPK) -> DataFrame:
    """(column, pattern, n, share): the ``top_k`` value patterns per
    column (digits→9, upper→A, lower→a; punctuation and spaces kept
    verbatim; NULLs reported as the '<null>' pattern). Ties rank by
    pattern string."""
    parts = []
    for c in cols:
        parts.append(df.select(
            F.lit(c).alias("column"),
            F.expr(
                f"coalesce({_pattern_expr(c)}, '<null>')"
            ).alias("pattern"),
        ))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    counts = u.groupBy("column", "pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = counts.groupBy("column").agg(
        F.sum("n").cast("bigint").alias("__tot"))
    ranked = counts.withColumn("__rk", F.expr(
        "row_number() OVER (PARTITION BY column "
        "ORDER BY n DESC, pattern ASC)"))
    return (
        ranked.filter(F.col("__rk") <= top_k)
        .join(F.broadcast(tot), "column")
        .select(
            "column", "pattern", "n",
            round_portable(F.expr(
                "CAST(n AS DOUBLE) / CAST(__tot AS DOUBLE)"), 6
            ).alias("share"),
        )
    )


def daily_completeness(df: DataFrame, us_col: str, key_col: str,
                       check_cols: Sequence[str]) -> DataFrame:
    """(day, n_rows, n_keys, n_null_<col>...): per-day row count,
    distinct-key count, and null count of every ``check_cols``
    column — the partial-load / null-inflation screen."""
    day = F.expr(f"({us_col}) DIV {US_PER_DAY}").alias("day")
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct(key_col).cast("bigint").alias("n_keys"),
    ]
    for c in check_cols:
        aggs.append(F.sum(F.expr(
            f"CASE WHEN {c} IS NULL THEN 1 ELSE 0 END"
        )).cast("bigint").alias(f"n_null_{c}"))
    return (
        df.groupBy(day).agg(*aggs)
        .withColumn("day", F.col("day").cast("bigint"))
    )


def _q_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_pattern_profile(
        load(spark, sf_dir, "orders"),
        ["o_orderstatus", "o_orderpriority"])


def _q_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return daily_completeness(ev, "__us", "user_id",
                              ["value", "props"])


def _pattern_duck(col: str) -> str:
    return (f"regexp_replace(regexp_replace(regexp_replace("
            f"{col}, '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'), "
            f"'[a-z]', 'a', 'g')")


_ORACLE_PATTERNS = f"""
WITH u AS (
  SELECT 'o_orderstatus' AS "column",
         coalesce({_pattern_duck('o_orderstatus')}, '<null>')
           AS pattern
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority' AS "column",
         coalesce({_pattern_duck('o_orderpriority')}, '<null>')
           AS pattern
  FROM orders
), counts AS (
  SELECT "column", pattern, CAST(count(*) AS BIGINT) AS n
  FROM u GROUP BY 1, 2
), tot AS (
  SELECT "column", CAST(sum(n) AS BIGINT) AS t
  FROM counts GROUP BY 1
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY "column"
    ORDER BY n DESC, pattern ASC) AS rk
  FROM counts
)
SELECT r."column", r.pattern, r.n,
  {round_portable_duck(
      "CAST(r.n AS DOUBLE) / CAST(tot.t AS DOUBLE)", 6)} AS share
FROM ranked r JOIN tot ON r."column" = tot."column"
WHERE r.rk <= {PATTERN_TOPK}
"""

_ORACLE_COMPLETENESS = f"""
SELECT CAST(epoch_us(ts) // {US_PER_DAY} AS BIGINT) AS day,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_null_value,
  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_null_props
FROM events GROUP BY 1
"""


QUERIES: dict = {
    "dq_value_patterns_orders": (_q_patterns, _ORACLE_PATTERNS),
    "dq_completeness_daily_events": (_q_completeness,
                                     _ORACLE_COMPLETENESS),
}

"""Data-quality checks: Benford first-digit conformance and key
uniqueness.

Complements the structural validators (``plans/validate.py`` gap/value
checks, ``operators/diff.py`` snapshot diff + FK orphans) with two
statistical-integrity checks a pipeline runs on every ingest:

- **Benford's law**: naturally-occurring multi-magnitude amounts
  (prices, populations, transaction totals) have first significant
  digit d with probability log10(1 + 1/d); fabricated or truncated
  data deviates hard. The report gives per-group digit counts and the
  chi-square statistic against Benford expectations — a screening
  number, not a hypothesis test.
- **Key uniqueness**: duplicate-key multiplicity profile for a column
  that should be unique (primary keys after a merge, doc ids after a
  union).

Scale shape: both are one map-side-combinable groupBy each. Benford's
digit counts pivot into NINE fixed integer columns per group
(conditional aggregation), so the chi-square is a fixed 9-term
expression tree over exact BIGINT counts — no float aggregation
anywhere, per the SCALING.md partial-agg-order rule. First digits are
extracted from the INTEGER string form (cents), never via log10 of a
double (10^k boundaries misclassify under float log).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["benford_report", "unique_key_report", "BENFORD_P"]

# log10(1 + 1/d) for d = 1..9 — embedded as repr'd literals so both
# engines fold the identical double.
BENFORD_P = tuple(math.log10(1.0 + 1.0 / d) for d in range(1, 10))


def _first_digit_expr(int_expr: str) -> str:
    """First significant digit of a positive BIGINT expression: the
    first character of its decimal string. Integer/string only — exact
    on both engines (integer-to-string formatting is identical,
    unlike ``log10`` of a double at 10^k boundaries)."""
    return f"CAST(substr(CAST({int_expr} AS STRING), 1, 1) AS BIGINT)"


def _first_digit_duck(int_expr: str) -> str:
    return f"CAST(substr(CAST({int_expr} AS VARCHAR), 1, 1) AS BIGINT)"


def benford_report(df: DataFrame, amount_col: str,
                   group_cols: Sequence[str] = (),
                   scale: int = 100) -> DataFrame:
    """Per-group Benford conformance: (group..., n_values, n1..n9,
    chi2). Amounts are fixed-point scaled (default cents) and rounded
    to BIGINT first; non-positive amounts are excluded (no first
    significant digit)."""
    gc = list(group_cols)
    cents = f"CAST(round({amount_col} * {scale}) AS BIGINT)"
    d = _first_digit_expr(cents)
    rows = (
        df.filter(F.expr(f"{cents} > 0"))
        .selectExpr(*gc, f"{d} AS __fd")
    )
    aggs = [F.count(F.lit(1)).alias("n_values")] + [
        F.sum(F.when(F.col("__fd") == dd, 1).otherwise(0))
        .cast("bigint").alias(f"n{dd}")
        for dd in range(1, 10)
    ]
    counts = rows.groupBy(*gc).agg(*aggs)
    terms = " + ".join(
        f"pow(CAST(n{dd} AS DOUBLE) / CAST(n_values AS DOUBLE) "
        f"- {BENFORD_P[dd - 1]!r}, 2) / {BENFORD_P[dd - 1]!r}"
        for dd in range(1, 10)
    )
    chi2 = f"CAST(n_values AS DOUBLE) * ({terms})"
    return counts.withColumn("chi2", round_portable(F.expr(chi2)))


def benford_oracle_sql(table: str, amount_col: str,
                       group_cols: Sequence[str] = (),
                       scale: int = 100) -> str:
    """DuckDB SQL computing exactly ``benford_report``'s output."""
    gc = list(group_cols)
    sel_g = (", ".join(gc) + "," if gc else "")
    grp = f"GROUP BY {', '.join(gc)}" if gc else ""
    cents = f"CAST(round({amount_col} * {scale}) AS BIGINT)"
    d = _first_digit_duck("cents")
    count_cols = ", ".join(
        f"CAST(sum(CASE WHEN fd = {dd} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n{dd}"
        for dd in range(1, 10)
    )
    terms = " + ".join(
        f"pow(CAST(n{dd} AS DOUBLE) / CAST(n_values AS DOUBLE) "
        f"- {BENFORD_P[dd - 1]!r}, 2) / {BENFORD_P[dd - 1]!r}"
        for dd in range(1, 10)
    )
    return f"""
WITH c AS (
  SELECT {sel_g} {cents} AS cents FROM {table}
  WHERE {cents} > 0
), fd AS (
  SELECT {sel_g} {d} AS fd FROM c
), counts AS (
  SELECT {sel_g} CAST(count(*) AS BIGINT) AS n_values, {count_cols}
  FROM fd {grp}
)
SELECT *,
  {round_portable_duck(f"CAST(n_values AS DOUBLE) * ({terms})")} AS chi2
FROM counts
"""


def unique_key_report(df: DataFrame,
                      key_cols: Sequence[str]) -> DataFrame:
    """One-row uniqueness profile for a should-be-unique key:
    (n_rows, n_keys, n_dup_keys, n_dup_rows, max_multiplicity).
    Two map-side-combinable aggregations over narrow key columns."""
    per_key = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("__m"))
    return per_key.agg(
        F.sum("__m").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.when(F.col("__m") > 1, 1).otherwise(0)).cast("bigint")
        .alias("n_dup_keys"),
        F.sum(F.when(F.col("__m") > 1, F.col("__m")).otherwise(0))
        .cast("bigint").alias("n_dup_rows"),
        F.max("__m").cast("bigint").alias("max_multiplicity"),
    )


# ---------------------------------------------------------------------------
# Gate queries (R05 queue)
# ---------------------------------------------------------------------------


def _q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benford_report(load(spark, sf_dir, "orders"), "o_totalprice",
                          ["o_orderpriority"])


_ORACLE_BENFORD = benford_oracle_sql("orders", "o_totalprice",
                                     ["o_orderpriority"])


def _q_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lineitem keyed by (l_orderkey, l_linenumber) IS unique; keyed by
    # l_orderkey alone it is not — profile the latter so every output
    # column is exercised.
    return unique_key_report(load(spark, sf_dir, "lineitem"),
                             ["l_orderkey"])


_ORACLE_UNIQUE = """
WITH per_key AS (
  SELECT l_orderkey, count(*) AS m FROM lineitem GROUP BY 1
)
SELECT CAST(sum(m) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_keys,
       CAST(sum(CASE WHEN m > 1 THEN m ELSE 0 END) AS BIGINT)
         AS n_dup_rows,
       CAST(max(m) AS BIGINT) AS max_multiplicity
FROM per_key
"""


QUERIES: dict = {
    "dq_benford_orders": (_q_benford, _ORACLE_BENFORD),
    "dq_unique_keys_lineitem": (_q_unique, _ORACLE_UNIQUE),
}

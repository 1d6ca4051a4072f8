"""Data-quality #5: referential-integrity orphan audit, categorical
entropy profile, and the second-digit Benford screen — schema-level
DQ next to the gated Benford first-digit, digest-diff, and key-skew
tiers.

- ``orphan_audit``: per declared FK relationship, how many child
  rows reference a missing parent (left-anti join counts) — the
  first thing a 100 TB ingest audit checks.
- ``entropy_profile``: per categorical column, distinct count, null
  rate, and Shannon entropy (nats) of the value distribution —
  near-zero entropy flags degenerate columns, ln(distinct) - entropy
  gaps flag skew.
- ``benford_second_digit``: observed second-significant-digit shares
  vs Benford's second-digit law P(d) = sum_k log10(1 + 1/(10k+d)),
  with the chi-square distance — the forensic screen that catches
  fabrications the first-digit test misses.

Engine-exactness: counts are exact BIGINT; entropy p*ln(p) terms and
chi-square cell terms are quantized to BIGINT at 1e8 before their
folds; Benford expectations are compile-time Python constants (both
engines compare against the identical literal).

Plan shape at 100 TB: orphans are broadcast-or-shuffle anti-joins
(Catalyst picks; the parent key relation is the smaller side after
distinct); entropy is one hash aggregate per column unioned as a
bounded relation; Benford is one pass with a 10-row aggregate.

Reference anchor: extends the reference's validation surface
(``src/validation.rs`` checks monotonic/positive/gap semantics on
one table) to cross-table integrity per SURVEY.md extension scope.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["orphan_audit", "entropy_profile", "benford_second_digit"]

Q = 10 ** 8
QF = float(Q)

# Benford second-digit expectations, identical literals both engines.
_BENFORD2 = {
    d: round(sum(math.log10(1.0 + 1.0 / (10 * k + d))
                 for k in range(1, 10)), 10)
    for d in range(10)
}


def orphan_audit(pairs: list[tuple[str, DataFrame, str, DataFrame,
                                   str]]) -> DataFrame:
    """(relationship, n_child, n_orphans, orphan_rate) for each
    (name, child_df, child_key, parent_df, parent_key) tuple."""
    outs = []
    for name, child, ck, parent, pk in pairs:
        c = child.select(F.col(ck).alias("__k"))
        p = parent.select(F.col(pk).alias("__k")).distinct()
        tot = c.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_child"))
        orph = c.join(p, "__k", "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        outs.append(
            tot.crossJoin(orph).select(
                F.lit(name).alias("relationship"), "n_child",
                "n_orphans",
                round_portable(F.expr(
                    "CAST(n_orphans AS DOUBLE) "
                    "/ CAST(n_child AS DOUBLE)"), 6)
                .alias("orphan_rate"),
            ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("relationship")


def entropy_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """(column_name, n, n_distinct, null_rate, entropy) per listed
    categorical column."""
    outs = []
    for c in columns:
        vals = df.select(F.col(c).cast("string").alias("__v"))
        counts = (
            vals.filter("__v IS NOT NULL").groupBy("__v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        )
        tot = vals.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr(
                "CASE WHEN __v IS NULL THEN 1 ELSE 0 END"))
            .cast("bigint").alias("__nulls"),
        )
        p = "(CAST(__c AS DOUBLE) / CAST(__nn AS DOUBLE))"
        red = (
            counts.crossJoin(F.broadcast(
                counts.agg(F.sum("__c").cast("bigint")
                           .alias("__nn"))))
            .agg(
                F.countDistinct("__v").cast("bigint")
                .alias("n_distinct"),
                F.sum(F.expr(
                    f"CAST(round(-({p}) * ln({p}) * {Q}) AS BIGINT)"
                )).alias("__hq"),
            )
        )
        outs.append(
            tot.crossJoin(red).select(
                F.lit(c).alias("column_name"), "n", "n_distinct",
                round_portable(F.expr(
                    "CAST(__nulls AS DOUBLE) / CAST(n AS DOUBLE)"), 6
                ).alias("null_rate"),
                round_portable(F.expr(
                    f"CAST(__hq AS DOUBLE) / {QF!r}"), 6)
                .alias("entropy"),
            ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("column_name")


def benford_second_digit(df: DataFrame, value_expr: str) -> DataFrame:
    """(digit, n, observed, expected, chi2_term): second significant
    digit distribution of ``value_expr`` vs Benford's second-digit
    law. Values < 10 (no second digit) are excluded."""
    # second significant digit of |v|: first two digits of the string
    # of floor(|v| / 10^(floor(log10(|v|)) - 1)), second one
    two = ("CAST(floor(abs(__v) / power(10.0, "
           "floor(log10(abs(__v))) - 1.0)) AS BIGINT)")
    rows = (
        df.select(F.expr(f"CAST(({value_expr}) AS DOUBLE)")
                  .alias("__v"))
        .filter("__v IS NOT NULL AND abs(__v) >= 10.0")
        .select(F.expr(f"{two} % 10").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = rows.agg(F.sum("n").cast("bigint").alias("__t"))
    exp_case = " ".join(
        f"WHEN digit = {d} THEN CAST({_BENFORD2[d]!r} AS DOUBLE)"
        for d in range(10))
    obs = "(CAST(n AS DOUBLE) / CAST(__t AS DOUBLE))"
    exp = f"(CASE {exp_case} END)"
    return (
        rows.crossJoin(F.broadcast(tot))
        .select(
            "digit", "n",
            round_portable(F.expr(obs), 6).alias("observed"),
            round_portable(F.expr(exp), 6).alias("expected"),
            round_portable(F.expr(
                f"({obs} - {exp}) * ({obs} - {exp}) / {exp} "
                f"* CAST(__t AS DOUBLE)"), 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles
# --------------------------------------------------------------------------


def _q_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part")
    n = load(spark, sf_dir, "nation")
    return orphan_audit([
        ("lineitem.orderkey->orders", li, "l_orderkey", o,
         "o_orderkey"),
        ("lineitem.partkey->part", li, "l_partkey", p, "p_partkey"),
        ("lineitem.suppkey->supplier", li, "l_suppkey", s,
         "s_suppkey"),
        ("orders.custkey->customer", o, "o_custkey", c, "c_custkey"),
        ("customer.nationkey->nation", c, "c_nationkey", n,
         "n_nationkey"),
        ("supplier.nationkey->nation", s, "s_nationkey", n,
         "n_nationkey"),
    ])


def _q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entropy_profile(load(spark, sf_dir, "orders"),
                           ["o_orderstatus", "o_orderpriority"])


def _q_benford2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benford_second_digit(load(spark, sf_dir, "orders"),
                                "o_totalprice")


def _duck_orphan(name: str, child: str, ck: str, parent: str,
                 pk: str) -> str:
    return f"""
SELECT '{name}' AS relationship,
  (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child,
  (SELECT CAST(count(*) AS BIGINT) FROM {child}
   WHERE {ck} NOT IN (SELECT DISTINCT {pk} FROM {parent}
                      WHERE {pk} IS NOT NULL)) AS n_orphans,
  {round_portable_duck(
      f"(SELECT CAST(count(*) AS DOUBLE) FROM {child} "
      f" WHERE {ck} NOT IN (SELECT DISTINCT {pk} FROM {parent} "
      f"                    WHERE {pk} IS NOT NULL)) "
      f"/ (SELECT CAST(count(*) AS DOUBLE) FROM {child})", 6)}
    AS orphan_rate"""


_ORACLE_ORPHANS = " UNION ALL ".join([
    _duck_orphan("lineitem.orderkey->orders", "lineitem",
                 "l_orderkey", "orders", "o_orderkey"),
    _duck_orphan("lineitem.partkey->part", "lineitem", "l_partkey",
                 "part", "p_partkey"),
    _duck_orphan("lineitem.suppkey->supplier", "lineitem",
                 "l_suppkey", "supplier", "s_suppkey"),
    _duck_orphan("orders.custkey->customer", "orders", "o_custkey",
                 "customer", "c_custkey"),
    _duck_orphan("customer.nationkey->nation", "customer",
                 "c_nationkey", "nation", "n_nationkey"),
    _duck_orphan("supplier.nationkey->nation", "supplier",
                 "s_nationkey", "nation", "n_nationkey"),
]) + " ORDER BY relationship"


def _duck_entropy(table: str, col: str) -> str:
    p = "(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))"
    return f"""
SELECT '{col}' AS column_name,
  (SELECT CAST(count(*) AS BIGINT) FROM {table}) AS n,
  (SELECT CAST(count(DISTINCT {col}) AS BIGINT) FROM {table}
   WHERE {col} IS NOT NULL) AS n_distinct,
  {round_portable_duck(
      f"(SELECT CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) "
      f"AS DOUBLE) FROM {table}) "
      f"/ (SELECT CAST(count(*) AS DOUBLE) FROM {table})", 6)}
    AS null_rate,
  {round_portable_duck(
      f"(SELECT CAST(sum(CAST(round(-({p}) * ln({p}) * {Q}) "
      f"AS BIGINT)) AS DOUBLE) / {QF!r} FROM ("
      f"  SELECT CAST(count(*) AS BIGINT) AS c FROM {table} "
      f"  WHERE {col} IS NOT NULL GROUP BY CAST({col} AS VARCHAR)"
      f") counts, ("
      f"  SELECT CAST(count(*) AS BIGINT) AS nn FROM {table} "
      f"  WHERE {col} IS NOT NULL) tot)", 6)} AS entropy"""


_ORACLE_ENTROPY = (
    _duck_entropy("orders", "o_orderstatus")
    + " UNION ALL "
    + _duck_entropy("orders", "o_orderpriority")
    + " ORDER BY column_name"
)

_B_EXP_CASE = " ".join(
    f"WHEN digit = {d} THEN CAST({_BENFORD2[d]!r} AS DOUBLE)"
    for d in range(10))
_B_OBS = "(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))"
_B_EXP = f"(CASE {_B_EXP_CASE} END)"

_ORACLE_BENFORD2 = f"""
WITH rows_l AS (
  SELECT CAST(floor(abs(v) / power(10.0,
    floor(log10(abs(v))) - 1.0)) AS BIGINT) % 10 AS digit
  FROM (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders)
  WHERE v IS NOT NULL AND abs(v) >= 10.0
), d AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM rows_l GROUP BY 1
), tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM d)
SELECT digit, n,
  {round_portable_duck(_B_OBS, 6)} AS observed,
  {round_portable_duck(_B_EXP, 6)} AS expected,
  {round_portable_duck(
      f"({_B_OBS} - {_B_EXP}) * ({_B_OBS} - {_B_EXP}) / {_B_EXP} "
      f"* CAST(t AS DOUBLE)", 6)} AS chi2_term
FROM d, tot
ORDER BY digit
"""


QUERIES: dict = {
    "dq_orphans_lineitem": (_q_orphans, _ORACLE_ORPHANS),
    "dq_entropy_profile_orders": (_q_entropy, _ORACLE_ENTROPY),
    "dq_benford2_orders": (_q_benford2, _ORACLE_BENFORD2),
}

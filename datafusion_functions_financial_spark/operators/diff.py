"""Snapshot diff: row-level added/removed/changed report between two
versions of a keyed table — the regression gate a data pipeline runs
after every rebuild ("what did this code change do to the corpus?").

Plan shape at scale: each side collapses to (key, fingerprint) — the
fingerprint is an md5 over the compared columns, computed scan-side so
the full-width rows never shuffle; the diff is ONE full-outer equi-join
on the key (two hash shuffles of narrow key+hash rows, or zero extra
if both snapshots are bucketed by key on disk). Output is filtered to
non-identical rows before any collection, so an unchanged 100 TB table
diffs into ~nothing.

Referential integrity (``fk_orphans``) is the companion check: child
keys with no parent — a LEFT ANTI join, with the parent side reduced
to its distinct key column first.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["snapshot_diff", "fk_orphans"]

_SEP = "\x1f"


def _fingerprint(df: DataFrame, key_cols: Sequence[str],
                 compare_cols: Sequence[str], tag: str) -> DataFrame:
    fp = F.md5(F.concat_ws(
        _SEP, *[F.col(c).cast("string") for c in compare_cols]))
    return df.select(*key_cols, fp.alias(tag))


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_cols: Sequence[str],
                  compare_cols: Sequence[str]) -> DataFrame:
    """(keys..., status): one row per key that was ``added``,
    ``removed``, or ``changed`` between the two snapshots (identical
    rows are dropped before any downstream work). NULL-safe: a NULL
    in a compared column fingerprints as the empty string, so
    NULL→'x' transitions report as changed."""
    a = _fingerprint(old, key_cols, compare_cols, "__h_old")
    b = _fingerprint(new, key_cols, compare_cols, "__h_new")
    joined = a.join(b, list(key_cols), "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )


def fk_orphans(child: DataFrame, parent: DataFrame,
               child_key: str, parent_key: str) -> DataFrame:
    """Child rows whose foreign key has no parent — LEFT ANTI against
    the parent's distinct key (vocabulary-sized relation; broadcast
    when it fits)."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(keys, child_key, "left_anti")


# --------------------------------------------------------------------------
# Gate queries (R05 queue: the r04 window is full). Both snapshots are
# deterministic derivations of the same table, so the oracle can
# reconstruct them exactly.
# --------------------------------------------------------------------------


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Prices fingerprint as integer CENTS: double->string formatting
    # differs between engines (scientific-notation thresholds), while
    # BIGINT formatting is identical everywhere.
    orders = load(spark, sf_dir, "orders").withColumn(
        "__cents", F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
    # "New build": drops every 7th order, re-prices every 11th.
    new = orders.filter(F.expr("o_orderkey % 7 != 0")).withColumn(
        "__cents",
        F.when(F.expr("o_orderkey % 11 = 0"),
               F.expr("CAST(round(__cents * 1.1) AS BIGINT)"))
        .otherwise(F.col("__cents")),
    )
    old = orders.filter(F.expr("o_orderkey % 5 != 0"))  # old build missed some
    return snapshot_diff(old, new, ["o_orderkey"],
                         ["o_custkey", "o_orderstatus", "__cents"])


_ORACLE_SNAPSHOT_DIFF = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), old AS (
  SELECT o_orderkey,
         md5(concat_ws(chr(31), CAST(o_custkey AS VARCHAR),
             o_orderstatus, CAST(cents AS VARCHAR))) AS h_old
  FROM base WHERE o_orderkey % 5 != 0
), new AS (
  SELECT o_orderkey,
         md5(concat_ws(chr(31), CAST(o_custkey AS VARCHAR),
             o_orderstatus,
             CAST(CASE WHEN o_orderkey % 11 = 0
                       THEN CAST(round(cents * 1.1) AS BIGINT)
                       ELSE cents END AS VARCHAR))) AS h_new
  FROM base WHERE o_orderkey % 7 != 0
)
SELECT o_orderkey,
       CASE WHEN h_old IS NULL THEN 'added'
            WHEN h_new IS NULL THEN 'removed'
            WHEN h_old != h_new THEN 'changed' END AS status
FROM old FULL OUTER JOIN new USING (o_orderkey)
WHERE (CASE WHEN h_old IS NULL THEN 'added'
            WHEN h_new IS NULL THEN 'removed'
            WHEN h_old != h_new THEN 'changed' END) IS NOT NULL
"""


def _q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Synthetic orphans: restrict the parent to even custkeys, then
    # find orders pointing at the now-missing customers.
    orders = load(spark, sf_dir, "orders")
    parents = load(spark, sf_dir, "customer").filter(
        F.expr("c_custkey % 2 = 0"))
    out = fk_orphans(orders, parents, "o_custkey", "c_custkey")
    return out.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orphan_orders"))


_ORACLE_FK_ORPHANS = """
SELECT o_custkey, count(*) AS n_orphan_orders
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_custkey % 2 = 0 AND c.c_custkey = o.o_custkey
)
GROUP BY 1
"""


QUERIES: dict = {
    "diff_snapshots_orders": (_q_snapshot_diff, _ORACLE_SNAPSHOT_DIFF),
    "validate_fk_orphans_orders": (_q_fk_orphans, _ORACLE_FK_ORPHANS),
}

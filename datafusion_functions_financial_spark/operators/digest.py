"""Merkle-bucket table digests: order-independent per-bucket content
signatures that compare two snapshots of a 100 TB table WITHOUT
shuffling a single data row.

``snapshot_diff`` (operators/diff.py) answers "which rows changed" at
the cost of one narrow full-outer shuffle per comparison. This module
answers the cheaper question first — "did anything change, and in
which key ranges?" — with a pure map-side-combinable aggregate:

1. every row folds its (quantized) column values through an LCG
   polynomial into a 31-bit signature — plain integer arithmetic, so
   Spark and the SQL oracle produce bit-identical values;
2. rows land in ``n_buckets`` deterministic key buckets (the Merkle
   leaves) and each bucket SUMs its signatures (plus a sum of squared
   signatures mod P as a second independent check) — summation is
   commutative, so the digest is invariant to row order, partitioning,
   and partial-aggregation schedule;
3. comparing two snapshots is an equi-join of two ``n_buckets``-row
   relations; only mismatched buckets (localized corruption) are
   emitted, and only those buckets ever need the row-level diff.

At 100 TB the whole comparison is two scans + a 256-row join — no
shuffle grows with the data; raise ``n_buckets`` so the follow-up
row-level diff of one dirty bucket stays small (2^20 buckets ≈ 100 MB
of digest rows, still trivially broadcastable). Signature sums stay in
int64 up to ~4e9 rows per bucket (rows * P < 2^63); the bucket count
is the lever if a table outgrows that.

String columns here enter the fold via (first-codepoint, length) —
enough to catch the synthetic corruption the gate exercises; swap in
the vectorized polynomial hash (operators/fasthash.py) for
full-string sensitivity at production scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["bucket_digests", "digest_compare"]

P = 2_147_483_647
A = 1_103_515_245
C = 12_345
N_BUCKETS = 256


def _fold_expr(sig_exprs: Sequence[str]) -> str:
    """LCG polynomial fold of the signature expressions: h_{i+1} =
    (h_i * A + pmod(e_i, P)) % P. Engine-neutral SQL arithmetic —
    the same text evaluates identically on Spark and DuckDB."""
    h = "CAST(0 AS BIGINT)"
    for e in sig_exprs:
        term = f"((CAST(({e}) AS BIGINT) % {P}) + {P}) % {P}"
        h = f"((({h}) * {A} + ({term})) % {P})"
    return h


def _bucket_expr(key_expr: str, n_buckets: int) -> str:
    return (f"((((CAST(({key_expr}) AS BIGINT) + 1) * {A} + {C}) "
            f"% {P}) % {n_buckets})")


def bucket_digests(df: DataFrame, key_expr: str,
                   sig_exprs: Sequence[str],
                   n_buckets: int = N_BUCKETS) -> DataFrame:
    """(bucket, n_rows, digest, digest2): the Merkle-leaf relation.
    One scan, one fixed-size hash aggregate — nothing else."""
    h = _fold_expr(sig_exprs)
    return (
        df.selectExpr(
            f"{_bucket_expr(key_expr, n_buckets)} AS bucket",
            f"{h} AS __h")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
             F.sum("__h").cast("bigint").alias("digest"),
             F.sum(F.expr(f"(__h * __h) % {P}")).cast("bigint")
             .alias("digest2"))
    )


def digest_compare(a: DataFrame, b: DataFrame) -> DataFrame:
    """(bucket, n_a, n_b, digest_a, digest_b): ONLY the buckets where
    the two snapshots disagree — identical tables compare to zero
    rows. Full outer on the bounded bucket relation, so a missing
    bucket (all rows of a key range dropped) still surfaces."""
    an = a.select(F.col("bucket"), F.col("n_rows").alias("n_a"),
                  F.col("digest").alias("digest_a"),
                  F.col("digest2").alias("__d2a"))
    bn = b.select(F.col("bucket"), F.col("n_rows").alias("n_b"),
                  F.col("digest").alias("digest_b"),
                  F.col("digest2").alias("__d2b"))
    return (
        an.join(bn, "bucket", "full_outer")
        .filter(
            (~(F.col("n_a").eqNullSafe(F.col("n_b"))))
            | (~(F.col("digest_a").eqNullSafe(F.col("digest_b"))))
            | (~(F.col("__d2a").eqNullSafe(F.col("__d2b")))))
        .select("bucket", "n_a", "n_b", "digest_a", "digest_b")
    )


# --------------------------------------------------------------------------
# Gate queries over orders: digest relation + localized-corruption diff
# --------------------------------------------------------------------------

# Signature columns: every orders column quantized to BIGINT. The date
# folds as an epoch-day; strings as (first codepoint, length).
_SIG_SPARK = (
    "o_orderkey",
    "o_custkey",
    "CAST(round(o_totalprice * 100) AS BIGINT)",
    "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000",
    "ascii(o_orderstatus) * 100 + length(o_orderstatus)",
    "ascii(substring(o_orderpriority, 1, 1)) * 100 "
    "+ length(o_orderpriority)",
)
_SIG_DUCK = (
    "o_orderkey",
    "o_custkey",
    "CAST(round(o_totalprice * 100) AS BIGINT)",
    "epoch_us(o_orderdate) // 86400000000",
    "ascii(o_orderstatus) * 100 + length(o_orderstatus)",
    "ascii(substring(o_orderpriority, 1, 1)) * 100 "
    "+ length(o_orderpriority)",
)

# Deterministic synthetic corruption for the diff gate: one cent added
# to every 97th order key. Both engines derive the "corrupt" snapshot
# from the same expression, so the mismatch set is defined exactly.
_CORRUPT_PRICE = ("o_totalprice + CASE WHEN o_orderkey % 97 = 0 "
                  "THEN 0.01 ELSE 0.0 END")


def _q_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bucket_digests(load(spark, sf_dir, "orders"), "o_orderkey",
                          _SIG_SPARK)


def _duck_digest_select(source: str) -> str:
    h = _fold_expr(_SIG_DUCK)
    b = _bucket_expr("o_orderkey", N_BUCKETS)
    return f"""
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(h) AS BIGINT) AS digest,
         CAST(sum((h * h) % {P}) AS BIGINT) AS digest2
  FROM (SELECT {b} AS bucket, {h} AS h FROM {source}) t
  GROUP BY 1
"""


_ORACLE_TABLE_DIGEST = f"""
WITH d AS ({_duck_digest_select("orders")})
SELECT bucket, n_rows, digest, digest2 FROM d
"""


def _q_digest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    corrupt = orders.withColumn(
        "o_totalprice", F.expr(_CORRUPT_PRICE))
    return digest_compare(
        bucket_digests(orders, "o_orderkey", _SIG_SPARK),
        bucket_digests(corrupt, "o_orderkey", _SIG_SPARK))


_ORACLE_DIGEST_DIFF = f"""
WITH corrupt AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         {_CORRUPT_PRICE} AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders
), da AS ({_duck_digest_select("orders")}),
db AS ({_duck_digest_select("corrupt")})
SELECT coalesce(da.bucket, db.bucket) AS bucket,
       da.n_rows AS n_a, db.n_rows AS n_b,
       da.digest AS digest_a, db.digest AS digest_b
FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
WHERE da.n_rows IS DISTINCT FROM db.n_rows
   OR da.digest IS DISTINCT FROM db.digest
   OR da.digest2 IS DISTINCT FROM db.digest2
"""


QUERIES: dict = {
    "dq_table_digest_orders": (_q_table_digest, _ORACLE_TABLE_DIGEST),
    "dq_digest_diff_orders": (_q_digest_diff, _ORACLE_DIGEST_DIFF),
}

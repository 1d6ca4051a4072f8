"""Deterministic Count-Min sketch and Bloom filter, pure SQL.

Companions to the HLL sketch (``operators/sketch.py``): the other two
classic mergeable summaries a 100 TB curation pipeline keeps per
shard. Like the HLL, every step is expressible in BOTH Spark SQL and
DuckDB SQL with integer arithmetic only, so sketch CELLS — not just
estimates — replay bit-for-bit across engines and across runs:

- **Count-Min** (Cormode & Muthukrishnan 2005): d=4 rows x w=512
  columns of BIGINT counters; point estimate = min over rows of the
  probed cell. Counters are SUMS, so cells are order-independent and
  sketches merge by cell-wise addition. The build collapses the input
  to its distinct-value relation first (weight = occurrence count) —
  the sketch is built from a vocabulary-sized aggregate, not from raw
  occurrences.
- **Bloom filter**: m bits stored as m/32 packed 32-bit words in
  BIGINT (positive — no sign-bit portability trap), k=5 probe
  positions per value via double hashing (Kirsch & Mitzenmacher
  2006: ``pos_i = (h1 + i*h2) mod m``). Words merge by OR; the word
  table for m=2^17 is 4096 rows — always broadcastable, which makes
  corpus-side membership a scan + broadcast join with ZERO shuffle
  of the corpus: the 100 TB decontamination / semi-join pre-filter
  fast path.

Hashing is the repo-standard affine + quadratic-mix construction of
``sketch.py`` (all intermediates < 2^62), with per-row / per-probe
constants.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .text import poly_hash_duck, poly_hash_spark

__all__ = [
    "cms_build", "cms_estimate", "cms_merge",
    "bloom_build", "bloom_membership",
]

PRIME = 2_147_483_647
_HA, _HB = 1_103_515_245, 12_345

# Per-structure additive constants for the quadratic mixing round
# (sketch.py uses 7919; each CMS row and each Bloom probe gets its own
# so the hash families are independent).
_CMS_C = (104_729, 224_737, 350_377, 479_909)
_BLOOM_C1, _BLOOM_C2 = 611_953, 746_773

CMS_D = 4
CMS_W = 512

BLOOM_M_BITS = 1 << 17  # 131072 bits = 4096 32-bit words
BLOOM_K = 5


def _mix(value_expr: str, c: int, spark: bool) -> str:
    """Affine + quadratic mixing of a BIGINT expr onto [0, PRIME),
    identical construction to ``sketch._hash_expr`` but with a chosen
    additive constant ``c`` selecting the family member. The input is
    pre-reduced mod PRIME so ``_HA * x`` can never overflow BIGINT for
    ANY input (without it, |x| >= ~8.4e9 would wrap); values already
    in [0, PRIME) — every current caller — hash identically."""
    suf = "L" if spark else ""
    x0 = (f"((({value_expr}) % {PRIME}{suf}) + {PRIME}{suf}) "
          f"% {PRIME}{suf}")
    h1 = (f"(({_HA}{suf} * ({x0}) + {_HB}{suf}) % {PRIME}{suf} "
          f"+ {PRIME}{suf}) % {PRIME}{suf}")
    return (f"((({h1}) * ({h1}) % {PRIME}{suf}) * {_HA}{suf} "
            f"+ ({h1}) * {_HB}{suf} + {c}{suf}) % {PRIME}{suf}")


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def _cms_col(value_expr: str, j: int, spark: bool) -> str:
    return f"({_mix(value_expr, _CMS_C[j], spark)}) % {CMS_W}"


def cms_build(df: DataFrame, value_expr: str,
              weight_expr: str = "1L",
              group_cols: Sequence[str] = ()) -> DataFrame:
    """Cell table (group..., row_j, col, c) from (value, weight) rows.

    ``value_expr`` must be BIGINT (hash strings through
    ``text.poly_hash_spark`` first). At most d*w rows per group
    survive the (map-side partial) sum — a 100 TB column folds to a
    2048-cell relation.
    """
    gc = list(group_cols)
    pairs = ", ".join(
        f"{j}, {_cms_col(value_expr, j, True)}" for j in range(CMS_D)
    )
    rows = df.selectExpr(
        *gc,
        f"stack({CMS_D}, {pairs}) AS (row_j, col)",
        f"CAST({weight_expr} AS BIGINT) AS w",
    )
    return rows.groupBy(*gc, "row_j", "col").agg(
        F.sum("w").alias("c"))


def cms_merge(*cell_tables: DataFrame) -> DataFrame:
    """Union shard sketches: cell-wise sum (counters are additive)."""
    out = cell_tables[0]
    for t in cell_tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c != "c"]
    return out.groupBy(*keys).agg(F.sum("c").alias("c"))


def cms_estimate(cms: DataFrame, probes: DataFrame,
                 value_expr: str) -> DataFrame:
    """Append ``cms_n`` (the Count-Min upper-bound count) to each probe
    row. The d probe cells join against the broadcast cell table —
    the probe side never shuffles."""
    pairs = ", ".join(
        f"{j}, {_cms_col(value_expr, j, True)}" for j in range(CMS_D)
    )
    keyed = probes.selectExpr(
        "*", f"stack({CMS_D}, {pairs}) AS (row_j, col)")
    joined = keyed.join(F.broadcast(cms), ["row_j", "col"], "left")
    carry = [c for c in probes.columns]
    return (
        joined.groupBy(*carry)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_n"))
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _bloom_positions(value_expr: str, m_bits: int, k: int,
                     spark: bool) -> list[str]:
    h1 = f"({_mix(value_expr, _BLOOM_C1, spark)}) % {m_bits}"
    h2 = f"1 + ({_mix(value_expr, _BLOOM_C2, spark)}) % {m_bits - 1}"
    return [f"(({h1}) + {i} * ({h2})) % {m_bits}" for i in range(k)]


def _bloom_word_rows(df: DataFrame, value_expr: str, m_bits: int,
                     k: int) -> DataFrame:
    """Expand each input row into k (word_idx, mask) rows. The two
    double-hash bases are STAGED as columns first — inlining them into
    every position expression re-evaluates the quadratic mix ~4k times
    per row (it dominated the probe-side runtime before staging); the
    staged form computes each mix once and derives the k positions
    with two integer ops each. Identical integers either way."""
    base = df.selectExpr(
        "*",
        f"({_mix(value_expr, _BLOOM_C1, True)}) % {m_bits} AS __h1",
        f"1 + ({_mix(value_expr, _BLOOM_C2, True)}) % {m_bits - 1}"
        f" AS __h2",
    )
    pairs = ", ".join(
        f"CAST(((__h1 + {i} * __h2) % {m_bits}) DIV 32 AS BIGINT), "
        f"CAST(shiftleft(1L, CAST((__h1 + {i} * __h2) % {m_bits} % 32 "
        f"AS INT)) AS BIGINT)"
        for i in range(k)
    )
    return base.selectExpr(
        "*", f"stack({k}, {pairs}) AS (word_idx, mask)")


def bloom_build(df: DataFrame, value_expr: str,
                m_bits: int = BLOOM_M_BITS,
                k: int = BLOOM_K) -> DataFrame:
    """Packed word table (word_idx, bits) — m_bits/32 rows max, OR-merged
    map-side. bits holds a 32-bit word in a BIGINT, so every value is
    positive on both engines (no BIGINT sign-bit shift at position 63).
    """
    words = _bloom_word_rows(df, value_expr, m_bits, k)
    return words.groupBy("word_idx").agg(
        F.expr("bit_or(mask)").alias("bits"))


def bloom_membership(bloom: DataFrame, probes: DataFrame,
                     value_expr: str, m_bits: int = BLOOM_M_BITS,
                     k: int = BLOOM_K) -> DataFrame:
    """Append ``in_bloom`` to each probe row: true iff all k probe bits
    are set. The word table broadcasts; the probe side never shuffles
    (the k-way expansion collapses back with a groupBy on the probe's
    own columns — map-side combinable)."""
    keyed = _bloom_word_rows(probes, value_expr, m_bits, k).drop(
        "__h1", "__h2")
    joined = keyed.join(F.broadcast(bloom), ["word_idx"], "left")
    hit = F.when(
        (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")))
        != 0, 1).otherwise(0)
    carry = [c for c in probes.columns]
    return (
        joined.groupBy(*carry)
        .agg((F.sum(hit) == F.lit(k)).alias("in_bloom"))
    )


# ---------------------------------------------------------------------------
# Gate queries (R05 queue)
# ---------------------------------------------------------------------------


def _q_cms_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS of corpus token counts, audited on the exact top-20 tokens:
    (token, exact_n, cms_n, overcount). CMS never undercounts, so
    overcount >= 0 — the report shows the sketch's collision bias at
    this width."""
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.selectExpr(
            "explode(split(trim(lower(text)), '\\\\s+')) AS token")
        .filter("token != ''")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    hashed = vocab.selectExpr(
        "token", "exact_n", f"{poly_hash_spark('token')} AS x")
    cms = cms_build(hashed, "x", "exact_n")
    top = (
        hashed.orderBy(F.col("exact_n").desc(), F.col("token"))
        .limit(20)
    )
    est = cms_estimate(cms, top, "x")
    return est.selectExpr(
        "token", "exact_n", "cms_n",
        "cms_n - exact_n AS overcount",
    )


def _duck_cms_cols(x: str, j: int) -> str:
    return f"({_mix(x, _CMS_C[j], False)}) % {CMS_W}"


_ORACLE_CMS = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents
), tk AS (
  SELECT token FROM toks WHERE token != ''
), vocab AS (
  SELECT token, count(*) AS exact_n FROM tk GROUP BY token
), hashed AS (
  SELECT token, exact_n, {poly_hash_duck('token')} AS x FROM vocab
), cells AS (
  SELECT row_j, col, sum(w) AS c FROM (
    {" UNION ALL ".join(
        f"SELECT {j} AS row_j, {_duck_cms_cols('x', j)} AS col, "
        f"exact_n AS w FROM hashed"
        for j in range(CMS_D))}
  ) GROUP BY row_j, col
), top AS (
  SELECT token, exact_n, x FROM hashed
  ORDER BY exact_n DESC, token LIMIT 20
), probe AS (
  {" UNION ALL ".join(
      f"SELECT token, exact_n, {j} AS row_j, "
      f"{_duck_cms_cols('x', j)} AS col FROM top"
      for j in range(CMS_D))}
)
SELECT p.token, CAST(p.exact_n AS BIGINT) AS exact_n,
       CAST(min(coalesce(c.c, 0)) AS BIGINT) AS cms_n,
       CAST(min(coalesce(c.c, 0)) - p.exact_n AS BIGINT) AS overcount
FROM probe p LEFT JOIN cells c USING (row_j, col)
GROUP BY p.token, p.exact_n
"""


def _q_bloom_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom of 'customers with at least one order', probed with every
    customer: (n_customers, n_members, n_bloom_hits, n_false_pos).
    The aggregate report keeps the gate output small while pinning
    every bit of the filter (a single flipped bit changes the
    counts)."""
    orders = load(spark, sf_dir, "orders")
    customers = load(spark, sf_dir, "customer")
    members = orders.select("o_custkey").distinct()
    bloom = bloom_build(members, "o_custkey")
    probed = bloom_membership(
        bloom, customers.select("c_custkey"), "c_custkey")
    truth = probed.join(
        members.withColumnRenamed("o_custkey", "c_custkey")
        .withColumn("is_member", F.lit(True)),
        ["c_custkey"], "left")
    truth = truth.withColumn(
        "is_member", F.coalesce(F.col("is_member"), F.lit(False)))
    return truth.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("is_member").cast("bigint")).alias("n_members"),
        F.sum(F.col("in_bloom").cast("bigint")).alias("n_bloom_hits"),
        F.sum((F.col("in_bloom") & ~F.col("is_member")).cast("bigint"))
        .alias("n_false_pos"),
    )


def _duck_bloom_pos(x: str) -> list[str]:
    return _bloom_positions(x, BLOOM_M_BITS, BLOOM_K, spark=False)


_ORACLE_BLOOM = f"""
WITH members AS (
  SELECT DISTINCT o_custkey FROM orders
), words AS (
  SELECT word_idx, bit_or(mask) AS bits FROM (
    {" UNION ALL ".join(
        f"SELECT ({p}) // 32 AS word_idx, "
        f"(1::BIGINT << CAST(({p}) % 32 AS INT)) AS mask FROM members"
        for p in _duck_bloom_pos("o_custkey"))}
  ) GROUP BY word_idx
), probe AS (
  {" UNION ALL ".join(
      f"SELECT c_custkey, ({p}) // 32 AS word_idx, "
      f"(1::BIGINT << CAST(({p}) % 32 AS INT)) AS mask FROM customer"
      for p in _duck_bloom_pos("c_custkey"))}
), hits AS (
  SELECT p.c_custkey,
         sum(CASE WHEN (coalesce(w.bits, 0) & p.mask) != 0
             THEN 1 ELSE 0 END) = {BLOOM_K} AS in_bloom
  FROM probe p LEFT JOIN words w USING (word_idx)
  GROUP BY p.c_custkey
), t AS (
  SELECT h.c_custkey, h.in_bloom,
         (m.o_custkey IS NOT NULL) AS is_member
  FROM hits h LEFT JOIN members m ON h.c_custkey = m.o_custkey
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_members,
       CAST(sum(CASE WHEN in_bloom THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_hits,
       CAST(sum(CASE WHEN in_bloom AND NOT is_member THEN 1 ELSE 0 END)
         AS BIGINT) AS n_false_pos
FROM t
"""


QUERIES: dict = {
    "cms_token_counts_documents": (_q_cms_tokens, _ORACLE_CMS),
    "bloom_membership_customers": (_q_bloom_customers, _ORACLE_BLOOM),
}

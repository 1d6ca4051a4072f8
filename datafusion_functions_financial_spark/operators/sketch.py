"""Deterministic HyperLogLog distinct-count sketch, pure SQL.

Spark's built-in ``approx_count_distinct`` is an HLL, but its hash and
merge order are engine-internal — results are not reproducible across
engines (or even across Spark versions), which disqualifies it where
pipeline audits must replay exactly. This module implements HLL from
first principles (Flajolet et al. 2007) with every step expressible in
BOTH Spark SQL and DuckDB SQL, bit-for-bit:

- the value hash is the repo-standard affine hash mod 2^31-1 (integer
  arithmetic only — no engine-native hash functions);
- register updates are ``max(rho)`` — order-independent;
- the harmonic sum uses INTEGER arithmetic: ``sum(1 << (RMAX - M_j))``
  over registers (each term <= 2^22, so the per-group sum fits a
  BIGINT), avoiding float summation whose result depends on reduce
  order. One final double division + the standard small-range
  correction, rounded to ROUND_DP.

Scale story: the shuffle payload is the REGISTER TABLE — at most
``m = 2^p`` rows per group regardless of input size (map-side partial
``max`` folds each partition's stream into registers before the
exchange). Distinct-count of a 100 TB column moves kilobytes per
group. Mergeability falls out of max(): union shards by taking
register-wise max (``merge_registers``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from ..plans.series import ROUND_DP

__all__ = ["hll_estimate", "hll_registers", "merge_registers",
           "sliding_hll_distinct"]

PRIME = 2_147_483_647  # 2^31 - 1; hash values carry 31 bits
_HA, _HB = 1_103_515_245, 12_345  # classic LCG constants, public domain
_HC = 7_919  # additive constant for the quadratic mixing round

P = 9                  # 2^9 = 512 registers
M = 1 << P
W_BITS = 31 - P        # bits left for the rho scan
RMAX = W_BITS + 1      # max possible rho (all-zero remainder)
# alpha_512 per the HLL paper's alpha_m formula (both engines compute
# this literal identically).
ALPHA = 0.7213 / (1.0 + 1.079 / M)


def _hash_expr(value_expr: str) -> str:
    """Two-round hash of a BIGINT expression onto [0, PRIME): affine,
    then quadratic mixing. A purely affine map is a permutation whose
    bit patterns are NOT geometric (HLL over-estimates by ~50% on
    sequential ids); the quadratic round restores bit avalanche while
    every intermediate stays within BIGINT (h < 2^31, so h*h < 2^62
    and (h*h % p) * a < 2^62)."""
    h1 = (f"(({_HA}L * ({value_expr}) + {_HB}L) % {PRIME}L + {PRIME}L) "
          f"% {PRIME}L")
    return (f"((({h1}) * ({h1}) % {PRIME}L) * {_HA}L "
            f"+ ({h1}) * {_HB}L + {_HC}L) % {PRIME}L")


def _hash_duck(value_expr: str) -> str:
    h1 = (f"((({_HA} * ({value_expr}) + {_HB}) % {PRIME}) + {PRIME}) "
          f"% {PRIME}")
    return (f"((({h1}) * ({h1}) % {PRIME}) * {_HA} "
            f"+ ({h1}) * {_HB} + {_HC}) % {PRIME}")


def _rho_exprs(h: str, spark: bool) -> tuple[str, str]:
    """(bucket, rho) SQL from a hash expression.

    rho = position of the highest set bit counted from the top of the
    (31-p)-bit remainder, via the length of its minimal binary string
    (``bin``/``bin`` in both engines; no floats).
    """
    bucket = f"({h}) % {M}"
    w = f"({h}) DIV {M}" if spark else f"({h}) // {M}"
    blen = f"CASE WHEN {w} = 0 THEN 0 ELSE length(bin({w})) END"
    return bucket, f"{RMAX} - ({blen})"


def hll_registers(df: DataFrame, value_expr: str,
                  group_cols: tuple = ()) -> DataFrame:
    """Per-group register table: (group..., bucket, r) with
    r = max rho over the group's values. At most M rows per group
    survive the (map-side partial) max aggregation."""
    h = _hash_expr(value_expr)
    bucket, rho = _rho_exprs(h, spark=True)
    gc = list(group_cols)
    return (
        df.selectExpr(*gc, f"{bucket} AS bucket", f"{rho} AS rho")
        .groupBy(*gc, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def merge_registers(*reg_tables: DataFrame) -> DataFrame:
    """Union sketches of disjoint (or overlapping) shards: register-wise
    max. HLL's estimate of the union is exact w.r.t. a single pass over
    the concatenated data — sketches are mergeable by construction."""
    out = reg_tables[0]
    for t in reg_tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c not in ("r",)]
    return out.groupBy(*keys).agg(F.max("r").alias("r"))


def _estimate_from_registers(reg: DataFrame,
                             group_cols: tuple) -> DataFrame:
    gc = list(group_cols)
    agg = reg.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr(f"CAST(shiftleft(1L, {RMAX} - r) AS BIGINT)"))
        .alias("s_present"),
    )
    # Absent registers hold rho=0 and contribute 2^RMAX each.
    return agg.selectExpr(
        *gc,
        f"""round(
          CASE WHEN {ALPHA!r} * {M} * {M} * CAST(shiftleft(1L, {RMAX}) AS DOUBLE)
                 / (s_present + ({M} - n_present) * CAST(shiftleft(1L, {RMAX}) AS DOUBLE))
                 <= 2.5 * {M}
               AND {M} - n_present > 0
          THEN {M} * ln(CAST({M} AS DOUBLE) / ({M} - n_present))
          ELSE {ALPHA!r} * {M} * {M} * CAST(shiftleft(1L, {RMAX}) AS DOUBLE)
                 / (s_present + ({M} - n_present) * CAST(shiftleft(1L, {RMAX}) AS DOUBLE))
          END, {ROUND_DP}) AS approx_distinct""",
    )


def hll_estimate(df: DataFrame, value_expr: str,
                 group_cols: tuple = ()) -> DataFrame:
    """(group..., approx_distinct): deterministic HLL estimate of
    count-distinct of ``value_expr`` (a BIGINT SQL expression; hash
    strings first, e.g. with ``text.poly_hash_spark``)."""
    return _estimate_from_registers(
        hll_registers(df, value_expr, group_cols), group_cols
    )


# --------------------------------------------------------------------------
# DuckDB oracle (identical algorithm, identical arithmetic)
# --------------------------------------------------------------------------


def duck_hll_sql(src: str, value_expr: str, group_cols: tuple) -> str:
    h = _hash_duck(value_expr)
    bucket, rho = _rho_exprs(h, spark=False)
    gc = ", ".join(group_cols)
    gc_pre = f"{gc}, " if gc else ""
    # CAST: DuckDB types the bare float literal DECIMAL(18,..) and the
    # * M * M chain overflows decimal multiplication.
    e_raw = (f"CAST({ALPHA!r} AS DOUBLE) * {M} * {M} "
             f"* CAST((1 << {RMAX}) AS DOUBLE) "
             f"/ (s_present + ({M} - n_present) "
             f"* CAST((1 << {RMAX}) AS DOUBLE))")
    return f"""
WITH regs AS (
  SELECT {gc_pre}{bucket} AS bucket, max({rho}) AS r
  FROM {src}
  GROUP BY {gc_pre}bucket
), folded AS (
  SELECT {gc_pre}count(*) AS n_present,
         sum(CAST((1 << ({RMAX} - r)) AS BIGINT)) AS s_present
  FROM regs
  {'GROUP BY ' + gc if gc else ''}
)
SELECT {gc_pre}round(
  CASE WHEN {e_raw} <= 2.5 * {M} AND {M} - n_present > 0
  THEN {M} * ln(CAST({M} AS DOUBLE) / ({M} - n_present))
  ELSE {e_raw} END, {ROUND_DP}) AS approx_distinct
FROM folded
"""


# --------------------------------------------------------------------------
# Gate queries: distinct users per event type (plus exact, so accuracy
# is visible in the gate output), and global distinct parts bought.
# --------------------------------------------------------------------------


def _q_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    approx = hll_estimate(ev, "user_id", ("event_type",))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"))
    return approx.join(exact, "event_type")


def _q_hll_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return hll_estimate(li, "l_partkey")


_ORACLE_HLL_USERS = f"""
WITH approx AS ({duck_hll_sql('events', 'user_id', ('event_type',))}),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT a.event_type, a.approx_distinct, e.exact_distinct
FROM approx a JOIN exact e USING (event_type)
"""

_ORACLE_HLL_PARTS = duck_hll_sql("lineitem", "l_partkey", ())

def sliding_hll_distinct(df: DataFrame, value_expr: str,
                         day_expr: str,
                         window_days: int = 7) -> DataFrame:
    """Trailing-``window_days`` distinct count per day via MERGED HLL
    registers — the scale answer to sliding COUNT DISTINCT (which
    Spark's windows cannot express and an explode-based exact count
    pays users x days x window rows for).

    Each day's register table (<= M rows) is exploded to the
    ``window_days`` target days it covers; merging is register-wise
    max per (day, bucket). Cost at 100 TB: the daily register build is
    the only pass over the data — the sliding merge touches
    days x M x window rows, i.e. kilobytes. Output
    (day, wau_hll) for every day present in the input.
    """
    base = df.withColumn("__day", F.expr(day_expr))
    regs = hll_registers(base, value_expr, ("__day",))
    expanded = regs.selectExpr(
        f"explode(sequence(__day, __day + {window_days - 1})) AS day",
        "bucket", "r",
    )
    merged = expanded.groupBy("day", "bucket").agg(
        F.max("r").alias("r"))
    est = _estimate_from_registers(merged, ("day",))
    days = base.select(F.col("__day").alias("day")).distinct()
    return (
        est.join(days, "day")
        .withColumnRenamed("approx_distinct", "wau_hll")
    )


_DAY_NS = 86_400 * 1_000_000_000
_WAU_W = 7


def _q_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: exact DAU, exact trailing-7d WAU, and the HLL WAU —
    the approximate path's error is visible in the gate output (both
    engines compute identical values for all three)."""
    ev = load(spark, sf_dir, "events")
    day = f"ts DIV {_DAY_NS}"
    hll = sliding_hll_distinct(ev, "user_id", day, _WAU_W)
    base = ev.selectExpr(f"{day} AS day", "user_id").distinct()
    dau = base.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau_exact"))
    wau_exact = (
        base.selectExpr(
            f"explode(sequence(day, day + {_WAU_W - 1})) AS wday",
            "user_id")
        .distinct()
        .groupBy("wday")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wau_exact"))
        .withColumnRenamed("wday", "day")
    )
    return (
        dau.join(wau_exact, "day").join(hll, "day")
        .select("day", "dau_exact", "wau_exact", "wau_hll")
    )


_ORACLE_WAU = f"""
WITH ev AS (
  SELECT (epoch_us(ts) * 1000) // {_DAY_NS} AS day, user_id
  FROM events
), pairs AS (
  SELECT DISTINCT day, user_id FROM ev
), dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau_exact
  FROM pairs GROUP BY day
), cover AS (
  SELECT DISTINCT p.day + u.i AS wday, p.user_id
  FROM pairs p, UNNEST(range(0, {_WAU_W})) AS u(i)
), wexact AS (
  SELECT wday AS day, CAST(count(*) AS BIGINT) AS wau_exact
  FROM cover GROUP BY wday
), hllsrc AS (
  SELECT day + u.i AS wday, user_id
  FROM ev, UNNEST(range(0, {_WAU_W})) AS u(i)
), hll AS (
  SELECT wday AS day, approx_distinct AS wau_hll FROM (
    {duck_hll_sql("hllsrc", "user_id", ("wday",))}
  )
)
SELECT d.day, d.dau_exact, w.wau_exact, h.wau_hll
FROM dau d JOIN wexact w ON d.day = w.day
JOIN hll h ON d.day = h.day
"""


QUERIES: dict = {
    "sketch_hll_users_events": (_q_hll_users, _ORACLE_HLL_USERS),
    "sketch_hll_parts_lineitem": (_q_hll_parts, _ORACLE_HLL_PARTS),
    "q_wau_hll_events": (_q_wau, _ORACLE_WAU),
}

"""Deterministic sampling #3: systematic (every k-th in order,
per stratum) and Neyman-allocated stratified sampling (budget split
across strata proportional to N_h * S_h — the variance-minimizing
allocation) — the survey-sampling designs missing from the hash
split / weighted / k-per-group family in sampling.py, sampling2.py.

Determinism: the systematic selector is a pure rank-modulus rule on
an explicit (order, id) key; Neyman weights come from exact
quantized-BIGINT sums with one double tree, rounded to counts via
``floor(x + 0.5)`` (identical on both engines); the within-stratum
draw ranks by the package LCG hash, ties by id — reproducible under
any partitioning, re-run, or engine.

Plan shapes at scale: each design is one per-stratum window rank
(the shuffle systematic sampling inherently needs — at 100 TB,
pre-filter with an over-admitting hash threshold so the per-stratum
sort touches ~budget rows, the k_per_group trick) plus a broadcast
of the per-stratum allocation (strata counts are tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .sampling import PRIME, _A, _C

__all__ = ["systematic_sample", "neyman_allocation"]

Q_LIN = 10 ** 4   # o_totalprice is cents-exact at 1e4
SYS_K = 20
SYS_OFFSET = 7
NEYMAN_BUDGET = 1000
SALT = 42


def systematic_sample(df: DataFrame, stratum_col: str,
                      order_cols: list[str], k: int = SYS_K,
                      offset: int = SYS_OFFSET) -> DataFrame:
    """Rows whose 1-based rank within their stratum (ordered by
    ``order_cols``) is congruent to ``offset`` mod ``k`` — the
    evenly-spaced-in-order design (e.g. every 20th order by date:
    uniform coverage of the time axis, unlike a hash sample)."""
    oorder = ", ".join(order_cols)
    return (
        df.withColumn("__rn", F.expr(
            f"row_number() OVER (PARTITION BY {stratum_col} "
            f"ORDER BY {oorder})"))
        .filter(F.expr(f"__rn % {k} = {offset}"))
    )


def _q_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    sampled = systematic_sample(o, "o_orderpriority",
                                ["o_orderdate", "o_orderkey"])
    totals = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"))
    per = sampled.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum(F.expr(
            f"CAST(round(o_totalprice * {Q_LIN}) AS BIGINT)"
        )).alias("__s"),
    )
    return (
        totals.join(per, "o_orderpriority")
        .select(
            "o_orderpriority", "n_total", "n_sampled",
            round_portable(F.expr(
                f"CAST(__s AS DOUBLE) / (CAST(n_sampled AS DOUBLE) "
                f"* {float(Q_LIN)!r})"), 6).alias("mean_sampled"),
        )
    )


_ORACLE_SYSTEMATIC = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
    row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
), sampled AS (
  SELECT * FROM ranked WHERE rn % {SYS_K} = {SYS_OFFSET}
), totals AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_total
  FROM orders GROUP BY 1
), per AS (
  SELECT o_orderpriority,
    CAST(count(*) AS BIGINT) AS n_sampled,
    CAST(sum(CAST(round(o_totalprice * {Q_LIN}) AS BIGINT))
      AS BIGINT) AS s
  FROM sampled GROUP BY 1
)
SELECT t.o_orderpriority, t.n_total, p.n_sampled,
  {round_portable_duck(
      f"CAST(p.s AS DOUBLE) / (CAST(p.n_sampled AS DOUBLE) "
      f"* {float(Q_LIN)!r})", 6)} AS mean_sampled
FROM totals t JOIN per p ON t.o_orderpriority = p.o_orderpriority
"""


def neyman_allocation(df: DataFrame, stratum_col: str,
                      value_col: str, id_col: str,
                      budget: int = NEYMAN_BUDGET,
                      q_lin: int = Q_LIN, salt: int = SALT
                      ) -> DataFrame:
    """(stratum, n_total, n_alloc, n_sampled, mean_sampled): split
    ``budget`` rows across strata proportional to ``N_h * S_h``
    (sample stddev of ``value_col``), minimum 1 per stratum, then
    draw each stratum's quota by LCG-hash rank (ties by id)."""
    sums = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr(
            f"CAST(round({value_col} * {q_lin}) AS BIGINT)"
        )).alias("__s"),
        F.sum(F.expr(
            f"CAST(round({value_col} * {value_col}) AS BIGINT)"
        )).alias("__ss"),
    )
    mean = (f"(CAST(__s AS DOUBLE) / (CAST(__n AS DOUBLE) "
            f"* {float(q_lin)!r}))")
    var = (f"((CAST(__ss AS DOUBLE) "
           f"- CAST(__n AS DOUBLE) * {mean} * {mean}) "
           f"/ CAST(__n - 1 AS DOUBLE))")
    wexpr = f"(CAST(__n AS DOUBLE) * sqrt({var}))"
    weights = sums.withColumn("__w", F.expr(wexpr))
    tot = weights.agg(F.sum(F.expr(
        f"CAST(round(__w * {10**6}) AS BIGINT)")).alias("__twq"))
    alloc = (
        weights.crossJoin(F.broadcast(tot))
        .withColumn("__alloc", F.expr(
            f"greatest(CAST(1 AS BIGINT), CAST(floor("
            f"{budget} * __w / (CAST(__twq AS DOUBLE) / {10**6}.0)"
            f" + 0.5) AS BIGINT))"))
        .select(stratum_col, "__n", "__alloc")
    )
    h = f"((({id_col} + 1) * {_A} + {_C} + {salt}) % {PRIME})"
    drawn = (
        df.join(F.broadcast(alloc), stratum_col)
        .withColumn("__rn", F.expr(
            f"row_number() OVER (PARTITION BY {stratum_col} "
            f"ORDER BY {h}, {id_col})"))
        .filter(F.col("__rn") <= F.col("__alloc"))
    )
    per = drawn.groupBy(stratum_col).agg(
        F.max("__n").alias("n_total"),
        F.max("__alloc").alias("n_alloc"),
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum(F.expr(
            f"CAST(round({value_col} * {q_lin}) AS BIGINT)"
        )).alias("__sv"),
    )
    return per.select(
        stratum_col, "n_total", "n_alloc", "n_sampled",
        round_portable(F.expr(
            f"CAST(__sv AS DOUBLE) / (CAST(n_sampled AS DOUBLE) "
            f"* {float(q_lin)!r})"), 6).alias("mean_sampled"),
    )


def _q_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neyman_allocation(load(spark, sf_dir, "orders"),
                             "o_orderpriority", "o_totalprice",
                             "o_orderkey")


_N_MEAN = (f"(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) "
           f"* {float(Q_LIN)!r}))")
_N_VAR = (f"((CAST(ss AS DOUBLE) "
          f"- CAST(n AS DOUBLE) * {_N_MEAN} * {_N_MEAN}) "
          f"/ CAST(n - 1 AS DOUBLE))")

_ORACLE_NEYMAN = f"""
WITH sums AS (
  SELECT o_orderpriority,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(o_totalprice * {Q_LIN}) AS BIGINT))
      AS BIGINT) AS s,
    CAST(sum(CAST(round(o_totalprice * o_totalprice) AS BIGINT))
      AS BIGINT) AS ss
  FROM orders GROUP BY 1
), weights AS (
  SELECT o_orderpriority, n,
    (CAST(n AS DOUBLE) * sqrt({_N_VAR})) AS w
  FROM sums
), tot AS (
  SELECT CAST(sum(CAST(round(w * {10**6}) AS BIGINT)) AS BIGINT)
    AS twq
  FROM weights
), alloc AS (
  SELECT o_orderpriority, n,
    greatest(CAST(1 AS BIGINT), CAST(floor(
      {NEYMAN_BUDGET} * w / (CAST(twq AS DOUBLE) / {10**6}.0)
      + 0.5) AS BIGINT)) AS a
  FROM weights, tot
), drawn AS (
  SELECT o.o_orderpriority, o.o_totalprice, al.n, al.a,
    row_number() OVER (PARTITION BY o.o_orderpriority
      ORDER BY (((o.o_orderkey + 1) * {_A} + {_C} + {SALT})
                % {PRIME}), o.o_orderkey) AS rn
  FROM orders o JOIN alloc al
    ON o.o_orderpriority = al.o_orderpriority
)
SELECT o_orderpriority,
  CAST(max(n) AS BIGINT) AS n_total,
  CAST(max(a) AS BIGINT) AS n_alloc,
  CAST(count(*) AS BIGINT) AS n_sampled,
  {round_portable_duck(
      f"CAST(CAST(sum(CAST(round(o_totalprice * {Q_LIN}) AS BIGINT))"
      f" AS BIGINT) AS DOUBLE) / (CAST(count(*) AS DOUBLE) "
      f"* {float(Q_LIN)!r})", 6)} AS mean_sampled
FROM drawn WHERE rn <= a GROUP BY 1
"""


QUERIES: dict = {
    "sample_systematic_orders": (_q_systematic, _ORACLE_SYSTEMATIC),
    "sample_neyman_orders": (_q_neyman, _ORACLE_NEYMAN),
}


# --------------------------------------------------------------------------
# Effective sample size of a weighted mixture (Kish ESS)
# --------------------------------------------------------------------------


def effective_sample_size(df: DataFrame, weight_expr: str,
                          group_col: str) -> DataFrame:
    """(group, n, ess, ess_ratio): Kish's effective sample size
    ``(sum w)^2 / sum w^2`` per group — how many EQUAL-weight
    samples a weighted mixture is actually worth. ess_ratio near 1
    means weights are flat; near 1/n means one row dominates. The
    sanity gauge to run after any importance-weighted mixing step
    (sampling.mix_proportions, temperature sampling). Exact BIGINT
    weight sums; one map-combinable aggregate."""
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(f"CAST(({weight_expr}) AS BIGINT)"))
        .alias("__sw"),
        F.sum(F.expr(
            f"CAST(({weight_expr}) AS BIGINT) "
            f"* CAST(({weight_expr}) AS BIGINT)")).alias("__sw2"),
    )
    ess = ("(CAST(__sw AS DOUBLE) * CAST(__sw AS DOUBLE) "
           "/ CAST(__sw2 AS DOUBLE))")
    return agg.select(
        "grp", "n",
        round_portable(F.expr(ess), 6).alias("ess"),
        round_portable(F.expr(
            f"{ess} / CAST(n AS DOUBLE)"), 6).alias("ess_ratio"),
    )


def _q_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    return effective_sample_size(load(spark, sf_dir, "documents"),
                                 "n_chars", "source")


_ESS = ("(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) "
        "/ CAST(sw2 AS DOUBLE))")

_ORACLE_ESS = f"""
WITH agg AS (
  SELECT source AS grp, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sw,
    CAST(sum(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
      AS BIGINT) AS sw2
  FROM documents GROUP BY 1
)
SELECT grp, n,
  {round_portable_duck(_ESS, 6)} AS ess,
  {round_portable_duck(f"{_ESS} / CAST(n AS DOUBLE)", 6)}
    AS ess_ratio
FROM agg
"""


QUERIES["sample_ess_documents"] = (_q_ess, _ORACLE_ESS)

"""Poisson bootstrap confidence intervals — THE bootstrap that works
on data too big to index: instead of drawing n rows with replacement
(which needs a global row count and random access), each row enters
each of the B resamples with an independent Poisson(1) multiplicity
(Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
Google 2012). One scan, map-side combinable, no shuffle bigger than
B rows.

Determinism: the multiplicity comes from the package LCG over
(row id, replicate) through an exact Poisson(1) inverse-CDF ladder —
identical integer arithmetic in both engines; per-resample sums are
quantized BIGINTs; the CI is the exact percentile of the B resample
means (``percentile`` <-> ``quantile_cont`` parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["poisson_bootstrap_ci"]

PRIME = 2_147_483_647
_A, _C = 1103515245, 12345
B_DEFAULT = 50
Q_LIN = 10 ** 4  # o_totalprice is cents-exact at 1e4
# Poisson(1) CDF ladder scaled to the LCG's [0, PRIME) range:
# P(0)=e^-1, P(<=1)=2e^-1, P(<=2)=2.5e^-1... exact doubles below.
_CDF = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238462, 0.9963401531726563, 0.9994058151824183)
_THRESH = tuple(int(p * PRIME) for p in _CDF)


def _mult_expr(id_col: str, b_col: str, salt: int) -> str:
    """Deterministic Poisson(1) multiplicity for (row, replicate)."""
    idx = f"(({id_col} + 1) * {B_DEFAULT + 7} + {b_col} + {salt})"
    # Pre-mod before the multiply so the product stays inside BIGINT
    # for arbitrarily large ids (ANSI overflow is a crash, not a wrap).
    u = f"(((({idx}) % {PRIME}) * {_A} + {_C}) % {PRIME})"
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_THRESH))
    return f"(CASE {cases} ELSE {len(_THRESH)} END)"


def poisson_bootstrap_ci(df: DataFrame, value_col: str, id_col: str,
                         n_resamples: int = B_DEFAULT,
                         lo_p: float = 0.025, hi_p: float = 0.975,
                         q_lin: int = Q_LIN,
                         salt: int = 42) -> DataFrame:
    """One row (n, mean, b, ci_lo, ci_hi): the full-sample mean of
    ``value_col`` with a percentile-bootstrap CI from ``n_resamples``
    Poisson replicates. Cost: one B-way explode fused into a hash
    aggregate — the shuffle carries B rows."""
    full = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr(
            f"CAST(round({value_col} * {q_lin}) AS BIGINT)"
        )).alias("__s"),
    )
    mult = _mult_expr("__id", "__b", salt)
    reps = (
        df.selectExpr(
            f"{id_col} AS __id", f"{value_col} AS __v",
            f"explode(sequence(0, {n_resamples - 1})) AS __b")
        .selectExpr("__b", f"{mult} AS __w", "__v")
        .groupBy("__b")
        .agg(
            F.sum("__w").cast("bigint").alias("__wn"),
            F.sum(F.expr(
                f"__w * CAST(round(__v * {q_lin}) AS BIGINT)"
            )).alias("__ws"),
        )
        .filter(F.col("__wn") > 0)
        .selectExpr(
            f"CAST(__ws AS DOUBLE) / (CAST(__wn AS DOUBLE) "
            f"* {float(q_lin)!r}) AS __m")
    )
    cis = reps.agg(
        F.count(F.lit(1)).cast("bigint").alias("b"),
        round_portable(F.expr(
            f"percentile(__m, CAST({lo_p!r} AS DOUBLE))"), 6
        ).alias("ci_lo"),
        round_portable(F.expr(
            f"percentile(__m, CAST({hi_p!r} AS DOUBLE))"), 6
        ).alias("ci_hi"),
    )
    return (
        full.crossJoin(F.broadcast(cis))
        .select(
            F.col("__n").alias("n"),
            round_portable(F.expr(
                f"CAST(__s AS DOUBLE) / (CAST(__n AS DOUBLE) "
                f"* {float(q_lin)!r})"), 6).alias("mean"),
            "b", "ci_lo", "ci_hi",
        )
    )


def _q_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return poisson_bootstrap_ci(load(spark, sf_dir, "orders"),
                                "o_totalprice", "o_orderkey")


def _oracle() -> str:
    mult = _mult_expr("o.o_orderkey", "b.b", 42)
    return f"""
WITH b AS (
  SELECT CAST(range AS BIGINT) AS b FROM range({B_DEFAULT})
), reps AS (
  SELECT b.b,
    CAST(sum({mult}) AS BIGINT) AS wn,
    CAST(sum({mult}
      * CAST(round(o.o_totalprice * {Q_LIN}) AS BIGINT)) AS BIGINT)
      AS ws
  FROM orders o CROSS JOIN b
  GROUP BY 1
), means AS (
  SELECT CAST(ws AS DOUBLE) / (CAST(wn AS DOUBLE)
    * {float(Q_LIN)!r}) AS m
  FROM reps WHERE wn > 0
), cis AS (
  SELECT CAST(count(*) AS BIGINT) AS b,
    {round_portable_duck(
        "quantile_cont(m, CAST(0.025 AS DOUBLE))", 6)} AS ci_lo,
    {round_portable_duck(
        "quantile_cont(m, CAST(0.975 AS DOUBLE))", 6)} AS ci_hi
  FROM means
), full_s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(o_totalprice * {Q_LIN}) AS BIGINT))
      AS BIGINT) AS s
  FROM orders
)
SELECT f.n,
  {round_portable_duck(
      f"CAST(f.s AS DOUBLE) / (CAST(f.n AS DOUBLE) "
      f"* {float(Q_LIN)!r})", 6)} AS mean,
  c.b, c.ci_lo, c.ci_hi
FROM full_s f, cis c
"""


QUERIES: dict = {
    "q_bootstrap_ci_orders": (_q_bootstrap, _oracle()),
}

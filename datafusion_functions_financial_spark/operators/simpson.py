"""Simpson's-paradox audit: the association between two columns
computed overall AND within each stratum, flagging strata whose
association sign disagrees with the pooled sign — the classic
aggregation trap a data-quality pass should surface before anyone
trusts a pooled correlation.

Also: partial correlation ``r_xy.z`` — the pooled association with a
third variable's linear effect removed, the standard follow-up when
the audit fires.

Both reduce to one map-combinable aggregate of quantized BIGINT
moment sums (per stratum + the `__all__` pooled row via a grouping-
sets-free union of the same sums), with the Pearson / partial closed
forms as one shared expression tree per engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["simpson_audit", "partial_correlation"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 4
Q2F = float(Q2)

_ALL = "__all__"


def _corr_form(p: str = "") -> str:
    mx = f"(CAST({p}sx AS DOUBLE) / (CAST({p}n AS DOUBLE) * {QF!r}))"
    my = f"(CAST({p}sy AS DOUBLE) / (CAST({p}n AS DOUBLE) * {QF!r}))"
    sxx = (f"(CAST({p}sxx AS DOUBLE) / {Q2F!r} "
           f"- CAST({p}n AS DOUBLE) * {mx} * {mx})")
    syy = (f"(CAST({p}syy AS DOUBLE) / {Q2F!r} "
           f"- CAST({p}n AS DOUBLE) * {my} * {my})")
    sxy = (f"(CAST({p}sxy AS DOUBLE) / {Q2F!r} "
           f"- CAST({p}n AS DOUBLE) * {mx} * {my})")
    return f"(({sxy}) / sqrt(({sxx}) * ({syy})))"


def _sums(df: DataFrame, x: str, y: str, key) -> DataFrame:
    return df.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(f"CAST(round(({x}) * {Q}) AS BIGINT)"))
        .alias("sx"),
        F.sum(F.expr(f"CAST(round(({y}) * {Q}) AS BIGINT)"))
        .alias("sy"),
        F.sum(F.expr(
            f"CAST(round(({x}) * ({x}) * {Q2}) AS BIGINT)"))
        .alias("sxx"),
        F.sum(F.expr(
            f"CAST(round(({x}) * ({y}) * {Q2}) AS BIGINT)"))
        .alias("sxy"),
        F.sum(F.expr(
            f"CAST(round(({y}) * ({y}) * {Q2}) AS BIGINT)"))
        .alias("syy"),
    )


def simpson_audit(df: DataFrame, x_expr: str, y_expr: str,
                  stratum_col: str) -> DataFrame:
    """(stratum, n, pearson, pooled_pearson, sign_flip): per-stratum
    Pearson next to the pooled value, flip = 1 when the rounded signs
    disagree (both nonzero). The pooled row itself appears as
    stratum '__all__' with flip 0."""
    strata = _sums(df, x_expr, y_expr,
                   F.col(stratum_col).alias("stratum"))
    pooled = _sums(df, x_expr, y_expr,
                   F.lit(_ALL).alias("stratum"))
    both = strata.unionByName(pooled)
    scored = both.select(
        "stratum", "n",
        round_portable(F.expr(_corr_form()), 6).alias("pearson"))
    pooled_val = scored.filter(F.col("stratum") == _ALL).select(
        F.col("pearson").alias("pooled_pearson"))
    return (
        scored.crossJoin(F.broadcast(pooled_val))
        .select(
            "stratum", "n", "pearson", "pooled_pearson",
            F.expr(
                "CAST(CASE WHEN stratum != '__all__' "
                "AND sign(pearson) * sign(pooled_pearson) < 0 "
                "THEN 1 ELSE 0 END AS BIGINT)").alias("sign_flip"),
        )
    )


def partial_correlation(df: DataFrame, x: str, y: str,
                        z: str) -> DataFrame:
    """One row (n, r_xy, r_xz, r_yz, r_xy_given_z): the pooled
    Pearson of (x, y) with z's linear effect partialled out."""
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(F.expr(
            f"CAST(round({e} * {q}) AS BIGINT)")).alias(a)
          for e, q, a in (
              (f"({x})", Q, "sx"), (f"({y})", Q, "sy"),
              (f"({z})", Q, "sz"),
              (f"({x}) * ({x})", Q2, "sxx"),
              (f"({y}) * ({y})", Q2, "syy"),
              (f"({z}) * ({z})", Q2, "szz"),
              (f"({x}) * ({y})", Q2, "sxy"),
              (f"({x}) * ({z})", Q2, "sxz"),
              (f"({y}) * ({z})", Q2, "syz"))],
    )

    def r(a: str, b: str, ab: str) -> str:
        ma = f"(CAST(s{a} AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
        mb = f"(CAST(s{b} AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
        saa = (f"(CAST(s{a}{a} AS DOUBLE) / {Q2F!r} "
               f"- CAST(n AS DOUBLE) * {ma} * {ma})")
        sbb = (f"(CAST(s{b}{b} AS DOUBLE) / {Q2F!r} "
               f"- CAST(n AS DOUBLE) * {mb} * {mb})")
        sab = (f"(CAST(s{ab} AS DOUBLE) / {Q2F!r} "
               f"- CAST(n AS DOUBLE) * {ma} * {mb})")
        return f"(({sab}) / sqrt(({saa}) * ({sbb})))"

    rxy, rxz, ryz = r("x", "y", "xy"), r("x", "z", "xz"), \
        r("y", "z", "yz")
    part = (f"(({rxy} - {rxz} * {ryz}) "
            f"/ sqrt((1.0 - {rxz} * {rxz}) "
            f"* (1.0 - {ryz} * {ryz})))")
    return agg.select(
        "n",
        round_portable(F.expr(rxy), 6).alias("r_xy"),
        round_portable(F.expr(rxz), 6).alias("r_xz"),
        round_portable(F.expr(ryz), 6).alias("r_yz"),
        round_portable(F.expr(part), 6).alias("r_xy_given_z"),
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return simpson_audit(li, "l_quantity", "l_discount * 100.0",
                         "l_returnflag")


def _simpson_oracle() -> str:
    corr = _corr_form()
    sums = f"""
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round((l_quantity) * {Q}) AS BIGINT)) AS BIGINT)
      AS sx,
    CAST(sum(CAST(round((l_discount * 100.0) * {Q}) AS BIGINT))
      AS BIGINT) AS sy,
    CAST(sum(CAST(round((l_quantity) * (l_quantity) * {Q2})
      AS BIGINT)) AS BIGINT) AS sxx,
    CAST(sum(CAST(round((l_quantity) * (l_discount * 100.0) * {Q2})
      AS BIGINT)) AS BIGINT) AS sxy,
    CAST(sum(CAST(round((l_discount * 100.0) * (l_discount * 100.0)
      * {Q2}) AS BIGINT)) AS BIGINT) AS syy"""
    return f"""
WITH strata AS (
  SELECT l_returnflag AS stratum, {sums} FROM lineitem GROUP BY 1
  UNION ALL
  SELECT '{_ALL}' AS stratum, {sums} FROM lineitem
), scored AS (
  SELECT stratum, n, {round_portable_duck(corr, 6)} AS pearson
  FROM strata
), pooled AS (
  SELECT pearson AS pooled_pearson FROM scored
  WHERE stratum = '{_ALL}'
)
SELECT s.stratum, s.n, s.pearson, p.pooled_pearson,
  CAST(CASE WHEN s.stratum != '{_ALL}'
    AND sign(s.pearson) * sign(p.pooled_pearson) < 0
    THEN 1 ELSE 0 END AS BIGINT) AS sign_flip
FROM scored s CROSS JOIN pooled p
"""


def _q_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return partial_correlation(
        li, "l_quantity", "l_extendedprice / 10000.0",
        "l_discount * 100.0")


def _partial_oracle() -> str:
    x, y, z = "l_quantity", "l_extendedprice / 10000.0", \
        "l_discount * 100.0"
    cells = ["CAST(count(*) AS BIGINT) AS n"]
    for e, q, a in ((f"({x})", Q, "sx"), (f"({y})", Q, "sy"),
                    (f"({z})", Q, "sz"),
                    (f"({x}) * ({x})", Q2, "sxx"),
                    (f"({y}) * ({y})", Q2, "syy"),
                    (f"({z}) * ({z})", Q2, "szz"),
                    (f"({x}) * ({y})", Q2, "sxy"),
                    (f"({x}) * ({z})", Q2, "sxz"),
                    (f"({y}) * ({z})", Q2, "syz")):
        cells.append(
            f"CAST(sum(CAST(round({e} * {q}) AS BIGINT)) AS BIGINT)"
            f" AS {a}")

    def r(a: str, b: str, ab: str) -> str:
        ma = f"(CAST(s{a} AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
        mb = f"(CAST(s{b} AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
        saa = (f"(CAST(s{a}{a} AS DOUBLE) / {Q2F!r} "
               f"- CAST(n AS DOUBLE) * {ma} * {ma})")
        sbb = (f"(CAST(s{b}{b} AS DOUBLE) / {Q2F!r} "
               f"- CAST(n AS DOUBLE) * {mb} * {mb})")
        sab = (f"(CAST(s{ab} AS DOUBLE) / {Q2F!r} "
               f"- CAST(n AS DOUBLE) * {ma} * {mb})")
        return f"(({sab}) / sqrt(({saa}) * ({sbb})))"

    rxy, rxz, ryz = r("x", "y", "xy"), r("x", "z", "xz"), \
        r("y", "z", "yz")
    part = (f"(({rxy} - {rxz} * {ryz}) "
            f"/ sqrt((1.0 - {rxz} * {rxz}) "
            f"* (1.0 - {ryz} * {ryz})))")
    return f"""
WITH agg AS (
  SELECT {', '.join(cells)} FROM lineitem
)
SELECT n,
  {round_portable_duck(rxy, 6)} AS r_xy,
  {round_portable_duck(rxz, 6)} AS r_xz,
  {round_portable_duck(ryz, 6)} AS r_yz,
  {round_portable_duck(part, 6)} AS r_xy_given_z
FROM agg
"""


QUERIES: dict = {
    "dq_simpson_lineitem": (_q_simpson, _simpson_oracle()),
    "q_partial_corr_lineitem": (_q_partial, _partial_oracle()),
}

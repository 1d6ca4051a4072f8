"""Effect sizes and proportion intervals #8: the practical-significance
companions to the stats2 hypothesis tests — a Wilson score interval
for per-group event rates (the right small-n binomial CI; never
escapes [0, 1] like the Wald interval), and a two-group effect-size
panel: Cohen's d, Hedges' g (small-sample-corrected), and Cliff's
delta (the rank-based effect size, computed exactly from the same
average-rank relation as the AUC: delta = 2*AUC - 1).

Everything is closed forms over exact BIGINT counts / quantized sums;
Cliff's delta reuses the mlmetrics bucketed prefix-sum rank, so no
single-partition window touches the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .mlmetrics import _bucketed

__all__ = ["wilson_rate_ci", "effect_sizes"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)
Z95 = 1.959963984540054


def wilson_rate_ci(df: DataFrame, group_col: str, hit_expr: str,
                   z: float = Z95) -> DataFrame:
    """(group, n, hits, rate, ci_lo, ci_hi): per-group hit rate with
    the Wilson score interval — exact integer counts, one closed
    form."""
    agg = df.groupBy(F.expr(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(f"CASE WHEN {hit_expr} THEN 1 ELSE 0 END"))
        .cast("bigint").alias("hits"),
    )
    p = "(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE))"
    nn = "CAST(n AS DOUBLE)"
    z2 = f"({z!r} * {z!r})"
    denom = f"(1.0 + {z2} / {nn})"
    center = f"(({p} + {z2} / (2.0 * {nn})) / {denom})"
    half = (f"(({z!r} * sqrt(({p} * (1.0 - {p}) + {z2} "
            f"/ (4.0 * {nn})) / {nn})) / {denom})")
    return agg.select(
        "grp", "n", "hits",
        round_portable(F.expr(p), 6).alias("rate"),
        round_portable(F.expr(f"greatest(0.0, {center} - {half})"), 6)
        .alias("ci_lo"),
        round_portable(F.expr(f"least(1.0, {center} + {half})"), 6)
        .alias("ci_hi"),
    )


def effect_sizes(df: DataFrame, value_col: str, group_expr: str,
                 group_a: str, group_b: str) -> DataFrame:
    """One row (n_a, n_b, cohen_d, hedges_g, cliff_delta): the
    two-group effect-size panel over ``value_col``. d and g from
    quantized moment sums; Cliff's delta exactly via the tie-aware
    rank identity delta = 2*AUC - 1 (group_a is the 'positive')."""
    rows = (
        df.select(F.expr(group_expr).alias("__g"),
                  F.col(value_col).alias("__v"))
        .filter(F.col("__v").isNotNull()
                & F.col("__g").isin([group_a, group_b]))
        .withColumn("__y", (F.col("__g") == F.lit(group_a))
                    .cast("int"))
    )
    moments = rows.groupBy("__y").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr(f"CAST(round(__v * {Q}) AS BIGINT)"))
        .alias("__s"),
        F.sum(F.expr(
            f"CAST(round(__v * __v * {Q2}) AS BIGINT)")).alias("__ss"),
    )
    a = moments.filter("__y = 1").select(
        F.col("__n").alias("__na"), F.col("__s").alias("__sa"),
        F.col("__ss").alias("__ssa"))
    b = moments.filter("__y = 0").select(
        F.col("__n").alias("__nb"), F.col("__s").alias("__sb"),
        F.col("__ss").alias("__ssb"))
    per_v = rows.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
        F.sum("__y").cast("bigint").alias("__cp"))
    ranked = _bucketed(per_v, "__c")
    r2 = ranked.agg(F.sum(
        F.col("__cp") * (2 * F.col("__start") + F.col("__c") - 1)
    ).cast("bigint").alias("__r2"))
    j = a.crossJoin(b).crossJoin(r2)
    ma = f"(CAST(__sa AS DOUBLE) / (CAST(__na AS DOUBLE) * {QF!r}))"
    mb = f"(CAST(__sb AS DOUBLE) / (CAST(__nb AS DOUBLE) * {QF!r}))"
    va = (f"((CAST(__ssa AS DOUBLE) / {Q2F!r} "
          f"- CAST(__na AS DOUBLE) * {ma} * {ma}) "
          f"/ CAST(__na - 1 AS DOUBLE))")
    vb = (f"((CAST(__ssb AS DOUBLE) / {Q2F!r} "
          f"- CAST(__nb AS DOUBLE) * {mb} * {mb}) "
          f"/ CAST(__nb - 1 AS DOUBLE))")
    sp = (f"sqrt((CAST(__na - 1 AS DOUBLE) * {va} "
          f"+ CAST(__nb - 1 AS DOUBLE) * {vb}) "
          f"/ CAST(__na + __nb - 2 AS DOUBLE))")
    d = f"(({ma} - {mb}) / {sp})"
    corr = ("(1.0 - 3.0 / (4.0 * CAST(__na + __nb AS DOUBLE) "
            "- 9.0))")
    auc = ("(CAST(__r2 - __na * (__na + 1) AS DOUBLE) "
           "/ (2.0 * CAST(__na AS DOUBLE) * CAST(__nb AS DOUBLE)))")
    return j.select(
        F.col("__na").alias("n_a"), F.col("__nb").alias("n_b"),
        round_portable(F.expr(d), 6).alias("cohen_d"),
        round_portable(F.expr(f"{d} * {corr}"), 6).alias("hedges_g"),
        round_portable(F.expr(f"2.0 * {auc} - 1.0"), 6)
        .alias("cliff_delta"),
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wilson_rate_ci(load(spark, sf_dir, "events"), "event_type",
                          "value > 100.0")


_W_P = "(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE))"
_W_N = "CAST(n AS DOUBLE)"
_W_Z2 = f"({Z95!r} * {Z95!r})"
_W_DEN = f"(1.0 + {_W_Z2} / {_W_N})"
_W_CTR = f"(({_W_P} + {_W_Z2} / (2.0 * {_W_N})) / {_W_DEN})"
_W_HALF = (f"(({Z95!r} * sqrt(({_W_P} * (1.0 - {_W_P}) + {_W_Z2} "
           f"/ (4.0 * {_W_N})) / {_W_N})) / {_W_DEN})")

_ORACLE_WILSON = f"""
WITH agg AS (
  SELECT event_type AS grp, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT)
      AS hits
  FROM events GROUP BY 1
)
SELECT grp, n, hits,
  {round_portable_duck(_W_P, 6)} AS rate,
  {round_portable_duck(f"greatest(0.0, {_W_CTR} - {_W_HALF})", 6)}
    AS ci_lo,
  {round_portable_duck(f"least(1.0, {_W_CTR} + {_W_HALF})", 6)}
    AS ci_hi
FROM agg
"""


def _q_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    return effect_sizes(load(spark, sf_dir, "events"), "value",
                        "event_type", "purchase", "click")


_E_MA = f"(CAST(sa AS DOUBLE) / (CAST(na AS DOUBLE) * {QF!r}))"
_E_MB = f"(CAST(sb AS DOUBLE) / (CAST(nb AS DOUBLE) * {QF!r}))"
_E_VA = (f"((CAST(ssa AS DOUBLE) / {Q2F!r} "
         f"- CAST(na AS DOUBLE) * {_E_MA} * {_E_MA}) "
         f"/ CAST(na - 1 AS DOUBLE))")
_E_VB = (f"((CAST(ssb AS DOUBLE) / {Q2F!r} "
         f"- CAST(nb AS DOUBLE) * {_E_MB} * {_E_MB}) "
         f"/ CAST(nb - 1 AS DOUBLE))")
_E_SP = (f"sqrt((CAST(na - 1 AS DOUBLE) * {_E_VA} "
         f"+ CAST(nb - 1 AS DOUBLE) * {_E_VB}) "
         f"/ CAST(na + nb - 2 AS DOUBLE))")
_E_D = f"(({_E_MA} - {_E_MB}) / {_E_SP})"
_E_CORR = "(1.0 - 3.0 / (4.0 * CAST(na + nb AS DOUBLE) - 9.0))"
_E_AUC = ("(CAST(r2 - na * (na + 1) AS DOUBLE) "
          "/ (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))")

_ORACLE_EFFECTS = f"""
WITH rows_l AS (
  SELECT value AS v,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
), moments AS (
  SELECT y, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(v * {Q}) AS BIGINT)) AS BIGINT) AS s,
    CAST(sum(CAST(round(v * v * {Q2}) AS BIGINT)) AS BIGINT) AS ss
  FROM rows_l GROUP BY 1
), pv AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT)
    AS cp
  FROM rows_l GROUP BY 1
), r AS (
  SELECT c, cp,
    sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) - c + 1 AS start
  FROM pv
), ranks AS (
  SELECT CAST(sum(cp * (2 * start + c - 1)) AS BIGINT) AS r2 FROM r
), j AS (
  SELECT a.n AS na, a.s AS sa, a.ss AS ssa,
         b.n AS nb, b.s AS sb, b.ss AS ssb, ranks.r2
  FROM moments a, moments b, ranks
  WHERE a.y = 1 AND b.y = 0
)
SELECT na AS n_a, nb AS n_b,
  {round_portable_duck(_E_D, 6)} AS cohen_d,
  {round_portable_duck(f"{_E_D} * {_E_CORR}", 6)} AS hedges_g,
  {round_portable_duck(f"2.0 * {_E_AUC} - 1.0", 6)} AS cliff_delta
FROM j
"""


QUERIES: dict = {
    "dq_wilson_ci_events": (_q_wilson, _ORACLE_WILSON),
    "q_effect_sizes_events": (_q_effects, _ORACLE_EFFECTS),
}

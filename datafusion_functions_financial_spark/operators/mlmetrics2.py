"""Model-eval metrics #2: precision-recall AUC (average precision)
and the Murphy decomposition of the Brier score — the companions to
``mlmetrics``'s ROC AUC / calibration / gains queries for
class-imbalanced evaluation (PR curves) and probabilistic-forecast
audits (reliability vs resolution).

Tie handling is explicit and engine-exact: the PR curve is defined
over DISTINCT score blocks (every tied row enters the ranking
together), and each block contributes ``pos_in_block x
precision_through_block`` to the AP sum — the "pessimistic"
interpolation, deterministic under ties where row-level AP is not.

Engine-exactness: block precisions are single double divisions of
exact BIGINT prefix counts, quantized to BIGINT *before* the
cross-block sum (the SCALING.md integer-quantized contribution
rule); the Brier terms quantize per row, and the per-bin
reliability/resolution contributions quantize per bin (10 rows)
before their sums.

Plan shape at 100 TB: the PR prefix sums reuse ``mlmetrics``'s
bucketed two-level prefix-sum (no global-sort single-partition
window); Brier bins are one hash aggregate plus a 1-row broadcast.

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (training-data/model-eval tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .mlmetrics import N_BUCKETS, _labeled

__all__ = ["pr_auc", "brier_decomposition"]

Q = 10 ** 8
QF = float(Q)
N_BINS = 10


def _bucketed2(rel: DataFrame) -> DataFrame:
    """Adds ``__start`` (1-based ascending rank of the block's first
    row) and ``__pstart`` (1-based ascending prefix-start of the
    block's positives) to a relation of distinct ``__v`` rows
    carrying ``__c`` (rows) and ``__cp`` (positives) — the
    ``mlmetrics._bucketed`` two-level prefix sum, extended to carry
    BOTH running counts in the same pass."""
    rng = rel.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    b = (
        rel.crossJoin(F.broadcast(rng))
        .withColumn("__b", F.expr(
            f"CASE WHEN __hi <= __lo THEN CAST(0 AS BIGINT) ELSE "
            f"CAST(least(CAST({N_BUCKETS - 1} AS BIGINT), "
            f"CAST(floor((CAST(__v AS DOUBLE) - CAST(__lo AS DOUBLE)) "
            f"* {N_BUCKETS} / (CAST(__hi AS DOUBLE) "
            f"- CAST(__lo AS DOUBLE))) AS BIGINT)) AS BIGINT) END"))
        .drop("__lo", "__hi")
    )
    btot = b.groupBy("__b").agg(F.sum("__c").alias("__bc"),
                                F.sum("__cp").alias("__bp"))
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    boff = (
        btot.withColumn("__off", F.sum("__bc").over(w) - F.col("__bc"))
        .withColumn("__poff", F.sum("__bp").over(w) - F.col("__bp"))
        .drop("__bc", "__bp")
    )
    intra = Window.partitionBy("__b").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0)
    return (
        b.join(F.broadcast(boff), "__b")
        .withColumn("__start", F.col("__off")
                    + F.sum("__c").over(intra) - F.col("__c") + 1)
        .withColumn("__pstart", F.col("__poff")
                    + F.sum("__cp").over(intra) - F.col("__cp") + 1)
        .drop("__off", "__poff")
    )


def pr_auc(df: DataFrame, score_col: str, label_expr: str) -> DataFrame:
    """One row (n_pos, n_neg, pr_auc): tie-aware average precision.

    Blocks of tied scores enter in descending-score order; a block
    with ``p`` positives among ``c`` rows contributes
    ``p * (cum_pos / cum_rows)`` evaluated AFTER the whole block —
    so AP = sum(contrib) / n_pos is deterministic under ties."""
    per_v = (
        _labeled(df, score_col, label_expr)
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"),
             F.sum("__y").cast("bigint").alias("__cp"))
    )
    ranked = _bucketed2(per_v)
    tot = per_v.agg(F.sum("__c").cast("bigint").alias("__nt"),
                    F.sum("__cp").cast("bigint").alias("__pt"))
    # descending-inclusive counts from ascending prefix starts:
    # rows with score >= v:  N - start + 1
    # positives with score >= v: P - pstart + 1
    contrib = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.col("__cp") > 0)
        .select(F.expr(
            f"CAST(round(CAST(__cp * (__pt - __pstart + 1) AS DOUBLE) "
            f"/ CAST(__nt - __start + 1 AS DOUBLE) * {Q}) AS BIGINT)"
        ).alias("__q"))
    )
    s = contrib.agg(
        F.coalesce(F.sum("__q"), F.lit(0)).alias("__ap_q"))
    return s.crossJoin(F.broadcast(tot)).select(
        F.col("__pt").alias("n_pos"),
        (F.col("__nt") - F.col("__pt")).cast("bigint").alias("n_neg"),
        round_portable(F.expr(
            f"CAST(__ap_q AS DOUBLE) / ({QF!r} * CAST(__pt AS DOUBLE))"
        ), 6).alias("pr_auc"),
    )


def brier_decomposition(df: DataFrame, prob_expr: str,
                        label_expr: str,
                        n_bins: int = N_BINS) -> DataFrame:
    """One row (n, brier, reliability, resolution, uncertainty):
    the Murphy decomposition over ``n_bins`` equal-width probability
    bins (brier ~ reliability - resolution + uncertainty, up to
    within-bin variance). ``prob_expr`` must evaluate in [0, 1)."""
    rows = (
        df.select(F.expr(prob_expr).cast("double").alias("__p"),
                  F.expr(label_expr).cast("int").alias("__y"))
        .filter(F.col("__p").isNotNull())
        .withColumn("__bin", F.expr(
            f"CAST(least({n_bins - 1}, "
            f"CAST(floor(__p * {n_bins}) AS INT)) AS INT)"))
    )
    bins = rows.groupBy("__bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.expr(f"CAST(round(__p * {Q}) AS BIGINT)")).alias("__sp"),
        F.sum("__y").cast("bigint").alias("__sy"),
        F.sum(F.expr(
            f"CAST(round((__p - CAST(__y AS DOUBLE)) "
            f"* (__p - CAST(__y AS DOUBLE)) * {Q}) AS BIGINT)"
        )).alias("__sq"),
    )
    tot = bins.agg(F.sum("__n").cast("bigint").alias("__nt"),
                   F.sum("__sy").cast("bigint").alias("__yt"),
                   F.sum("__sq").alias("__bq"))
    ybar = "(CAST(__yt AS DOUBLE) / CAST(__nt AS DOUBLE))"
    pk = f"(CAST(__sp AS DOUBLE) / ({QF!r} * CAST(__n AS DOUBLE)))"
    yk = "(CAST(__sy AS DOUBLE) / CAST(__n AS DOUBLE))"
    per_bin = (
        bins.crossJoin(F.broadcast(tot))
        .select(
            F.expr(f"CAST(round(CAST(__n AS DOUBLE) * ({pk} - {yk}) "
                   f"* ({pk} - {yk}) * {Q}) AS BIGINT)").alias("__rel"),
            F.expr(f"CAST(round(CAST(__n AS DOUBLE) * ({yk} - {ybar}) "
                   f"* ({yk} - {ybar}) * {Q}) AS BIGINT)").alias("__res"),
        )
        .agg(F.sum("__rel").alias("__relq"),
             F.sum("__res").alias("__resq"))
    )
    return per_bin.crossJoin(F.broadcast(tot)).select(
        F.col("__nt").alias("n"),
        round_portable(F.expr(
            f"CAST(__bq AS DOUBLE) / ({QF!r} * CAST(__nt AS DOUBLE))"
        ), 6).alias("brier"),
        round_portable(F.expr(
            f"CAST(__relq AS DOUBLE) / ({QF!r} * CAST(__nt AS DOUBLE))"
        ), 6).alias("reliability"),
        round_portable(F.expr(
            f"CAST(__resq AS DOUBLE) / ({QF!r} * CAST(__nt AS DOUBLE))"
        ), 6).alias("resolution"),
        round_portable(F.expr(
            f"{ybar} * (1.0 - {ybar})"), 6).alias("uncertainty"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles
# --------------------------------------------------------------------------

_LABEL = "event_type = 'purchase'"
# monotone rational squashing of value into (0, 1): pure arithmetic
# (no exp/expit — transcendental bit-compat not required)
_PROB = "value / (value + 100.0)"


def _q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pr_auc(load(spark, sf_dir, "events"), "value", _LABEL)


_ORACLE_PR_AUC = f"""
WITH rows_l AS (
  SELECT value AS v,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
), per_v AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c,
    CAST(sum(y) AS BIGINT) AS cp
  FROM rows_l GROUP BY 1
), r AS (
  SELECT c, cp,
    sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) - c + 1 AS start,
    sum(cp) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) - cp + 1 AS pstart
  FROM per_v
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS nt, CAST(sum(cp) AS BIGINT) AS pt
  FROM per_v
), s AS (
  SELECT CAST(coalesce(sum(CAST(round(
    CAST(r.cp * (tot.pt - r.pstart + 1) AS DOUBLE)
    / CAST(tot.nt - r.start + 1 AS DOUBLE) * {Q}) AS BIGINT)), 0)
    AS BIGINT) AS ap_q
  FROM r, tot WHERE r.cp > 0
)
SELECT tot.pt AS n_pos, CAST(tot.nt - tot.pt AS BIGINT) AS n_neg,
  {round_portable_duck(
      f"CAST(s.ap_q AS DOUBLE) / ({QF!r} * CAST(tot.pt AS DOUBLE))",
      6)} AS pr_auc
FROM s, tot
"""


def _q_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return brier_decomposition(load(spark, sf_dir, "events"), _PROB,
                               _LABEL)


_D_PK = f"(CAST(sp AS DOUBLE) / ({QF!r} * CAST(n AS DOUBLE)))"
_D_YK = "(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
_D_YBAR = "(CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))"

_ORACLE_BRIER = f"""
WITH rows_l AS (
  SELECT CAST({_PROB} AS DOUBLE) AS p,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
), binned AS (
  SELECT least({N_BINS - 1}, CAST(floor(p * {N_BINS}) AS INT)) AS bin,
    p, y
  FROM rows_l
), bins AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(p * {Q}) AS BIGINT)) AS BIGINT) AS sp,
    CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(CAST(round((p - CAST(y AS DOUBLE))
      * (p - CAST(y AS DOUBLE)) * {Q}) AS BIGINT)) AS BIGINT) AS sq
  FROM binned GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(sy) AS BIGINT) AS yt,
    CAST(sum(sq) AS BIGINT) AS bq
  FROM bins
), per_bin AS (
  SELECT
    CAST(sum(CAST(round(CAST(n AS DOUBLE) * ({_D_PK} - {_D_YK})
      * ({_D_PK} - {_D_YK}) * {Q}) AS BIGINT)) AS BIGINT) AS relq,
    CAST(sum(CAST(round(CAST(n AS DOUBLE) * ({_D_YK} - {_D_YBAR})
      * ({_D_YK} - {_D_YBAR}) * {Q}) AS BIGINT)) AS BIGINT) AS resq
  FROM bins, tot
)
SELECT tot.nt AS n,
  {round_portable_duck(
      f"CAST(tot.bq AS DOUBLE) / ({QF!r} * CAST(tot.nt AS DOUBLE))",
      6)} AS brier,
  {round_portable_duck(
      f"CAST(per_bin.relq AS DOUBLE) / ({QF!r} "
      f"* CAST(tot.nt AS DOUBLE))", 6)} AS reliability,
  {round_portable_duck(
      f"CAST(per_bin.resq AS DOUBLE) / ({QF!r} "
      f"* CAST(tot.nt AS DOUBLE))", 6)} AS resolution,
  {round_portable_duck(
      f"{_D_YBAR} * (1.0 - {_D_YBAR})", 6)} AS uncertainty
FROM per_bin, tot
"""


QUERIES: dict = {
    "q_pr_auc_events": (_q_pr_auc, _ORACLE_PR_AUC),
    "q_brier_decomp_events": (_q_brier, _ORACLE_BRIER),
}

"""Model-eval metrics #3: the KS separation statistic (max TPR-FPR
gap over all thresholds — the classic credit-scoring discrimination
measure, and the ROC-space twin of the gated two-sample KS) and the
expected calibration error (ECE — the single-number summary of the
gated calibration-decile table; the quantity LLM-eval papers report
for verbalized-confidence calibration).

Both reduce over the SAME relations the gated metrics use: KS over
``mlmetrics2._bucketed2``'s distinct-score prefix sums (no
global-sort window), ECE over the Brier decomposition's probability
bins. Engine-exactness: per-row/per-bin terms quantize to BIGINT
before max/sum (max of quantized BIGINTs is deterministic under ties
by construction).

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (model-eval tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .mlmetrics import _labeled
from .mlmetrics2 import N_BINS, _bucketed2

__all__ = ["ks_separation", "expected_calibration_error"]

Q = 10 ** 8
QF = float(Q)


def ks_separation(df: DataFrame, score_col: str,
                  label_expr: str) -> DataFrame:
    """One row (n_pos, n_neg, ks): max over thresholds of
    TPR - FPR, where a row is predicted positive when its score is
    >= the threshold (tied scores enter together)."""
    per_v = (
        _labeled(df, score_col, label_expr)
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"),
             F.sum("__y").cast("bigint").alias("__cp"))
    )
    ranked = _bucketed2(per_v)
    tot = per_v.agg(F.sum("__c").cast("bigint").alias("__nt"),
                    F.sum("__cp").cast("bigint").alias("__pt"))
    # descending-inclusive counts from the ascending prefix starts
    tp = "CAST(__pt - __pstart + 1 AS DOUBLE)"
    fp = ("CAST((__nt - __start + 1) - (__pt - __pstart + 1) "
          "AS DOUBLE)")
    diff = (f"({tp} / CAST(__pt AS DOUBLE) "
            f"- ({fp}) / CAST(__nt - __pt AS DOUBLE))")
    red = (
        ranked.crossJoin(F.broadcast(tot))
        .select(F.expr(
            f"CAST(round(({diff}) * {Q}) AS BIGINT)").alias("__dq"))
        .agg(F.max("__dq").alias("__ks_q"))
    )
    return red.crossJoin(F.broadcast(tot)).select(
        F.col("__pt").alias("n_pos"),
        (F.col("__nt") - F.col("__pt")).cast("bigint").alias("n_neg"),
        round_portable(F.expr(
            f"CAST(__ks_q AS DOUBLE) / {QF!r}"), 6).alias("ks"),
    )


def expected_calibration_error(df: DataFrame, prob_expr: str,
                               label_expr: str,
                               n_bins: int = N_BINS) -> DataFrame:
    """One row (n, ece, max_ce): expected (bin-weighted mean) and
    maximum absolute calibration gap |mean prob - hit rate| over
    ``n_bins`` equal-width probability bins."""
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
    )
    gap = (f"abs(CAST(__sp AS DOUBLE) / ({QF!r} * CAST(__n AS DOUBLE))"
           f" - CAST(__sy AS DOUBLE) / CAST(__n AS DOUBLE))")
    red = bins.agg(
        F.sum("__n").cast("bigint").alias("n"),
        F.sum(F.expr(
            f"CAST(round(CAST(__n AS DOUBLE) * ({gap}) * {Q}) "
            f"AS BIGINT)")).alias("__wq"),
        F.max(F.expr(
            f"CAST(round(({gap}) * {Q}) AS BIGINT)")).alias("__mq"),
    )
    return red.select(
        "n",
        round_portable(F.expr(
            f"CAST(__wq AS DOUBLE) / ({QF!r} * CAST(n AS DOUBLE))"),
            6).alias("ece"),
        round_portable(F.expr(
            f"CAST(__mq AS DOUBLE) / {QF!r}"), 6).alias("max_ce"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (the mlmetrics2 label/prob
# conventions, so the metric families compare like for like)
# --------------------------------------------------------------------------

_LABEL = "event_type = 'purchase'"
_PROB = "value / (value + 100.0)"


def _q_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ks_separation(load(spark, sf_dir, "events"), "value",
                         _LABEL)


_ORACLE_KS = f"""
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
), red AS (
  SELECT CAST(max(CAST(round((
    CAST(tot.pt - r.pstart + 1 AS DOUBLE) / CAST(tot.pt AS DOUBLE)
    - CAST((tot.nt - r.start + 1) - (tot.pt - r.pstart + 1)
        AS DOUBLE) / CAST(tot.nt - tot.pt AS DOUBLE)) * {Q})
    AS BIGINT)) AS BIGINT) AS ks_q
  FROM r, tot
)
SELECT tot.pt AS n_pos, CAST(tot.nt - tot.pt AS BIGINT) AS n_neg,
  {round_portable_duck(f"CAST(red.ks_q AS DOUBLE) / {QF!r}", 6)} AS ks
FROM red, tot
"""


def _q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    return expected_calibration_error(load(spark, sf_dir, "events"),
                                      _PROB, _LABEL)


_D_GAP = (f"abs(CAST(sp AS DOUBLE) / ({QF!r} * CAST(n AS DOUBLE)) "
          f"- CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))")

_ORACLE_ECE = f"""
WITH rows_l AS (
  SELECT CAST({_PROB} AS DOUBLE) AS p,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
), bins AS (
  SELECT least({N_BINS - 1}, CAST(floor(p * {N_BINS}) AS INT)) AS bin,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(p * {Q}) AS BIGINT)) AS BIGINT) AS sp,
    CAST(sum(y) AS BIGINT) AS sy
  FROM rows_l GROUP BY 1
), red AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt,
    CAST(sum(CAST(round(CAST(n AS DOUBLE) * ({_D_GAP}) * {Q})
      AS BIGINT)) AS BIGINT) AS wq,
    CAST(max(CAST(round(({_D_GAP}) * {Q}) AS BIGINT)) AS BIGINT)
      AS mq
  FROM bins
)
SELECT nt AS n,
  {round_portable_duck(
      f"CAST(wq AS DOUBLE) / ({QF!r} * CAST(nt AS DOUBLE))", 6)}
    AS ece,
  {round_portable_duck(f"CAST(mq AS DOUBLE) / {QF!r}", 6)} AS max_ce
FROM red
"""


QUERIES: dict = {
    "q_ks_separation_events": (_q_ks, _ORACLE_KS),
    "q_ece_events": (_q_ece, _ORACLE_ECE),
}

"""Model-eval metrics #4: MCC / Youden-J threshold sweep and
log-loss — completing the confusion-matrix tier next to the gated
precision/recall/F1 sweep (``mlmetrics.threshold_metrics``), KS
separation and ECE (``mlmetrics3``).

- ``mcc_youden_sweep``: Matthews correlation coefficient and Youden's
  J (sensitivity + specificity - 1) at the nine decile thresholds —
  the balanced figures of merit the F1 sweep lacks on skewed classes.
- ``log_loss``: mean cross-entropy of a probability column against
  the binary label, probabilities clipped to [eps, 1-eps] (the
  sklearn convention) so a hard 0/1 miss stays finite.

Engine-exactness: confusion counts are exact BIGINT conditional
aggregates (one pass, map-side combinable); MCC's denominator
sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn)) multiplies in DOUBLE one factor
at a time (the BIGINT quadruple product wraps at ~10^5 rows per
cell); log-loss terms are quantized to BIGINT at 1e8 before the fold
(order-independent sums on both engines).

Plan shape at 100 TB: the decile thresholds are one ``percentile``
aggregate broadcast as a 9-row relation; the sweep is ONE pass over
the data with map-side partial aggregation per (threshold) key;
log-loss is a single hash-free reduction. No windows, no joins on
scale-growing keys.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (model-evaluation tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["mcc_youden_sweep", "log_loss"]

Q = 10 ** 8
QF = float(Q)
EPS = 1e-15


def mcc_youden_sweep(df: DataFrame, score_col: str,
                     label_expr: str) -> DataFrame:
    """(i, thr, tp, fp, fn, tn, mcc, youden_j) at the nine decile
    thresholds of the score distribution (thresholds portably rounded
    before the comparison, the threshold_metrics convention)."""
    rows = df.select(
        F.col(score_col).cast("double").alias("__v"),
        F.expr(label_expr).cast("int").alias("__y"),
    ).filter("__v IS NOT NULL")
    ps = [i / 10 for i in range(1, 10)]
    thr = (
        rows.agg(F.expr(
            f"percentile(__v, array({', '.join(map(repr, ps))}))"
        ).alias("__qs"))
        .select(F.posexplode("__qs").alias("__p", "__q"))
        .select((F.col("__p") + 1).cast("bigint").alias("i"),
                round_portable(F.col("__q"), 6).alias("thr"))
    )
    m = (
        rows.crossJoin(F.broadcast(thr))
        .groupBy("i", "thr")
        .agg(
            F.sum(F.expr(
                "CASE WHEN __y = 1 AND __v >= thr THEN 1 ELSE 0 END"
            )).cast("bigint").alias("tp"),
            F.sum(F.expr(
                "CASE WHEN __y = 0 AND __v >= thr THEN 1 ELSE 0 END"
            )).cast("bigint").alias("fp"),
            F.sum(F.expr(
                "CASE WHEN __y = 1 AND __v < thr THEN 1 ELSE 0 END"
            )).cast("bigint").alias("fn"),
            F.sum(F.expr(
                "CASE WHEN __y = 0 AND __v < thr THEN 1 ELSE 0 END"
            )).cast("bigint").alias("tn"),
        )
    )
    num = ("(CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) "
           "- CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))")
    den = ("sqrt(CAST(tp + fp AS DOUBLE)) "
           "* sqrt(CAST(tp + fn AS DOUBLE)) "
           "* sqrt(CAST(tn + fp AS DOUBLE)) "
           "* sqrt(CAST(tn + fn AS DOUBLE))")
    sens = "(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))"
    spec = "(CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE))"
    return m.select(
        "i", "thr", "tp", "fp", "fn", "tn",
        round_portable(F.expr(
            f"CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) "
            f"* (tn + fn) > 0 THEN {num} / ({den}) ELSE 0.0 END"), 6
        ).alias("mcc"),
        round_portable(F.expr(
            f"CASE WHEN tp + fn > 0 AND tn + fp > 0 "
            f"THEN {sens} + {spec} - 1.0 ELSE 0.0 END"), 6
        ).alias("youden_j"),
    )


def log_loss(df: DataFrame, prob_expr: str,
             label_expr: str, eps: float = EPS) -> DataFrame:
    """One row (n, n_pos, logloss): mean clipped cross-entropy of the
    probability expression against the binary label."""
    p = (f"least(CAST(1.0 - {eps!r} AS DOUBLE), "
         f"greatest(CAST({eps!r} AS DOUBLE), "
         f"CAST(({prob_expr}) AS DOUBLE)))")
    term = (f"CASE WHEN __y = 1 THEN -ln({p}) "
            f"ELSE -ln(1.0 - {p}) END")
    rows = df.select(
        F.expr(label_expr).cast("int").alias("__y"),
        F.expr(f"CAST(round(({term}) * {Q}) AS BIGINT)").alias("__t"),
    ).filter("__y IS NOT NULL AND __t IS NOT NULL")
    red = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__y").cast("bigint").alias("n_pos"),
        F.sum("__t").alias("__s"),
    )
    return red.select(
        "n", "n_pos",
        round_portable(F.expr(
            f"CAST(__s AS DOUBLE) / {QF!r} / CAST(n AS DOUBLE)"), 6)
        .alias("logloss"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles — label: purchase vs click, score:
# value (the mlmetrics conventions); the log-loss probability is a
# fixed logistic transform of the score so p is in (0, 1).
# --------------------------------------------------------------------------

_POS, _NEG = "purchase", "click"
_LABEL = f"CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END"
_PROB = "1.0 / (1.0 + exp(-(value - 100.0) / 50.0))"


def _two_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").filter(
        F.col("event_type").isin([_POS, _NEG]))


def _q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mcc_youden_sweep(_two_class(spark, sf_dir), "value",
                            _LABEL)


def _q_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    return log_loss(_two_class(spark, sf_dir), _PROB, _LABEL)


_DUCK_V = f"""
v AS (
  SELECT value AS v,
         CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('{_POS}', '{_NEG}') AND value IS NOT NULL
)"""

_M_NUM = ("(CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) "
          "- CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))")
_M_DEN = ("sqrt(CAST(tp + fp AS DOUBLE)) "
          "* sqrt(CAST(tp + fn AS DOUBLE)) "
          "* sqrt(CAST(tn + fp AS DOUBLE)) "
          "* sqrt(CAST(tn + fn AS DOUBLE))")
_M_SENS = "(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))"
_M_SPEC = "(CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE))"

_THR_ROWS = "\n  UNION ALL ".join(
    f"SELECT CAST({i} AS BIGINT) AS i, "
    f"{round_portable_duck(f'quantile_cont(v, {i / 10!r})', 6)}"
    f" AS thr FROM v"
    for i in range(1, 10))

_ORACLE_MCC = f"""
WITH {_DUCK_V}, thr AS (
  {_THR_ROWS}
), m AS (
  SELECT t.i, t.thr,
    CAST(sum(CASE WHEN y = 1 AND v >= t.thr THEN 1 ELSE 0 END)
      AS BIGINT) AS tp,
    CAST(sum(CASE WHEN y = 0 AND v >= t.thr THEN 1 ELSE 0 END)
      AS BIGINT) AS fp,
    CAST(sum(CASE WHEN y = 1 AND v < t.thr THEN 1 ELSE 0 END)
      AS BIGINT) AS fn,
    CAST(sum(CASE WHEN y = 0 AND v < t.thr THEN 1 ELSE 0 END)
      AS BIGINT) AS tn
  FROM v CROSS JOIN thr t
  GROUP BY 1, 2
)
SELECT i, thr, tp, fp, fn, tn,
  {round_portable_duck(
      f"CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) > 0 "
      f"THEN {_M_NUM} / ({_M_DEN}) ELSE 0.0 END", 6)} AS mcc,
  {round_portable_duck(
      f"CASE WHEN tp + fn > 0 AND tn + fp > 0 "
      f"THEN {_M_SENS} + {_M_SPEC} - 1.0 ELSE 0.0 END", 6)}
    AS youden_j
FROM m
"""

_D_P = (f"least(CAST(1.0 - {EPS!r} AS DOUBLE), "
        f"greatest(CAST({EPS!r} AS DOUBLE), "
        f"CAST(({_PROB}) AS DOUBLE)))")
_D_TERM = (f"CASE WHEN y = 1 THEN -ln({_D_P}) "
           f"ELSE -ln(1.0 - {_D_P}) END")

_ORACLE_LOGLOSS = f"""
WITH v AS (
  SELECT value,
         CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('{_POS}', '{_NEG}') AND value IS NOT NULL
), t AS (
  SELECT y, CAST(round(({_D_TERM}) * {Q}) AS BIGINT) AS tq
  FROM v
), red AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS n_pos, sum(tq) AS s
  FROM t WHERE tq IS NOT NULL
)
SELECT n, n_pos,
  {round_portable_duck(
      f"CAST(s AS DOUBLE) / {QF!r} / CAST(n AS DOUBLE)", 6)}
    AS logloss
FROM red
"""


QUERIES: dict = {
    "q_mcc_youden_events": (_q_mcc, _ORACLE_MCC),
    "q_logloss_events": (_q_logloss, _ORACLE_LOGLOSS),
}

"""Uplift evaluation: the Qini curve — "does targeting by this score
CAUSE more conversions than not targeting?" — the treatment-aware
upgrade of the gated gains/lift table: gains ranks by predicted
response, which rewards models that find sure things; Qini ranks by
predicted UPLIFT and credits only the treated-minus-control response
gap at each depth, the standard acceptance curve for
incremental-targeting models.

Units are rows, the arm is the deterministic ``user_id % 2`` split
(the gated abtest convention), and depth deciles are VALUE-BANDED:
decile boundaries come from the descending distinct-score cumulative
relation (ties share a decile; boundary targets ceil(b*N/10)), so no
global row sort exists anywhere in the plan.

qini(b) = R_t(b) - R_c(b) * N_t(b)/N_c(b), cumulated over deciles
(uplift in absolute responders, the Radcliffe definition with the
treated/control imbalance correction).

Engine-exactness: all counts are exact integers; the only doubles
are the final per-decile corrections (quantization-free — single
division per output row).

Plan shape at 100 TB: one distinct-score hash aggregate, a 10-row
boundary broadcast joined back (inequality join against a 10-row
relation), one (decile, arm) hash aggregate, windows over the 10-row
relation.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (experimentation tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["qini_curve"]

N_DECILES = 10


def qini_curve(df: DataFrame, score_col: str, arm_expr: str,
               response_expr: str,
               n_deciles: int = N_DECILES) -> DataFrame:
    """(decile, n_t, n_c, resp_t, resp_c, qini): cumulative
    treated/control counts and responders through each score decile
    (decile 1 = highest scores) and the Qini uplift at that depth
    (NULL while the control side is empty)."""
    base = df.selectExpr(
        f"{score_col} AS __s",
        f"CAST(({arm_expr}) AS INT) AS __arm",
        f"CAST(({response_expr}) AS INT) AS __resp").filter(
        "__s IS NOT NULL AND __arm IS NOT NULL")
    vals = base.groupBy("__s").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    wd = (Window.partitionBy().orderBy(F.desc("__s"))
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = vals.withColumn("__cum", F.sum("__cnt").over(wd))
    nt = base.agg(F.count(F.lit(1)).cast("bigint").alias("__nt"))
    targets = (
        base.sparkSession.range(1, n_deciles + 1)
        .selectExpr("id AS __b")
        .crossJoin(F.broadcast(nt))
        .withColumn("__target", F.expr(
            f"(__b * __nt + {n_deciles} - 1) DIV {n_deciles}"))
    )
    # boundary = LOWEST score still inside decile b (descending cum)
    bounds = (
        F.broadcast(targets)
        .join(cum, F.col("__cum") >= F.col("__target"))
        .groupBy("__b")
        .agg(F.max("__s").alias("__lo"))
    )
    wb = Window.partitionBy().orderBy("__b")
    banded = bounds.withColumn(
        "__hi", F.lag("__lo").over(wb))
    rowdec = base.join(
        F.broadcast(banded),
        (F.col("__s") >= F.col("__lo"))
        & (F.col("__hi").isNull() | (F.col("__s") < F.col("__hi"))))
    per = rowdec.groupBy("__b").agg(
        F.sum(F.expr("CASE WHEN __arm = 1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("__dt"),
        F.sum(F.expr("CASE WHEN __arm = 0 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("__dc"),
        F.sum(F.expr("CASE WHEN __arm = 1 AND __resp = 1 THEN 1 "
                     "ELSE 0 END")).cast("bigint").alias("__rt"),
        F.sum(F.expr("CASE WHEN __arm = 0 AND __resp = 1 THEN 1 "
                     "ELSE 0 END")).cast("bigint").alias("__rc"),
    )
    wcum = (Window.partitionBy().orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, 0))
    cumd = (per
            .withColumn("n_t", F.sum("__dt").over(wcum))
            .withColumn("n_c", F.sum("__dc").over(wcum))
            .withColumn("resp_t", F.sum("__rt").over(wcum))
            .withColumn("resp_c", F.sum("__rc").over(wcum)))
    return cumd.select(
        F.col("__b").cast("bigint").alias("decile"),
        F.col("n_t").cast("bigint").alias("n_t"),
        F.col("n_c").cast("bigint").alias("n_c"),
        F.col("resp_t").cast("bigint").alias("resp_t"),
        F.col("resp_c").cast("bigint").alias("resp_c"),
        round_portable(F.expr(
            "CASE WHEN n_c > 0 THEN CAST(resp_t AS DOUBLE) "
            "- CAST(resp_c AS DOUBLE) * CAST(n_t AS DOUBLE) "
            "/ CAST(n_c AS DOUBLE) END"), 6).alias("qini"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (events: value score, user-parity
# arm, purchase response)
# --------------------------------------------------------------------------

_ARM = "user_id % 2"
_RESP = "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"


def _q_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qini_curve(load(spark, sf_dir, "events"), "value", _ARM,
                      _RESP)


_ORACLE_QINI = f"""
WITH base AS (
  SELECT value AS s, CAST({_ARM} AS INT) AS arm,
    CAST(({_RESP}) AS INT) AS resp
  FROM events WHERE value IS NOT NULL
), vals AS (
  SELECT s, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1
), cum AS (
  SELECT s, CAST(sum(cnt) OVER (ORDER BY s DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum
  FROM vals
), nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM base),
targets AS (
  SELECT CAST(r.range AS BIGINT) AS b,
    (CAST(r.range AS BIGINT) * nt.nt + {N_DECILES} - 1)
      // {N_DECILES} AS target
  FROM range(1, {N_DECILES} + 1) r, nt
), bounds AS (
  SELECT t.b, max(cum.s) AS lo
  FROM targets t JOIN cum ON cum.cum >= t.target
  GROUP BY 1
), banded AS (
  SELECT b, lo, lag(lo) OVER (ORDER BY b) AS hi FROM bounds
), rowdec AS (
  SELECT banded.b, base.arm, base.resp
  FROM base JOIN banded
    ON base.s >= banded.lo
   AND (banded.hi IS NULL OR base.s < banded.hi)
), per AS (
  SELECT b,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dt,
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dc,
    CAST(sum(CASE WHEN arm = 1 AND resp = 1 THEN 1 ELSE 0 END)
      AS BIGINT) AS rt,
    CAST(sum(CASE WHEN arm = 0 AND resp = 1 THEN 1 ELSE 0 END)
      AS BIGINT) AS rc
  FROM rowdec GROUP BY 1
), cumd AS (
  SELECT b,
    CAST(sum(dt) OVER w AS BIGINT) AS n_t,
    CAST(sum(dc) OVER w AS BIGINT) AS n_c,
    CAST(sum(rt) OVER w AS BIGINT) AS resp_t,
    CAST(sum(rc) OVER w AS BIGINT) AS resp_c
  FROM per
  WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
    AND CURRENT ROW)
)
SELECT CAST(b AS BIGINT) AS decile, n_t, n_c, resp_t, resp_c,
  {round_portable_duck(
      "CASE WHEN n_c > 0 THEN CAST(resp_t AS DOUBLE) "
      "- CAST(resp_c AS DOUBLE) * CAST(n_t AS DOUBLE) "
      "/ CAST(n_c AS DOUBLE) END", 6)} AS qini
FROM cumd
"""


QUERIES: dict = {
    "q_qini_events": (_q_qini, _ORACLE_QINI),
}

"""Anomaly detection #3: the Hampel filter — rolling-median /
rolling-MAD outlier scores, the robust sliding-window cousin of the
global MAD screen (``analytics3.q_anomaly_mad``) and the EWMA control
chart (``anomaly2``): immune to level shifts because the reference
is local, immune to the outliers themselves because it is
median-based.

Window spec (documented deviation from the textbook filter, chosen
for one-pass execution): each row's deviation is taken against its
OWN trailing-window median, and the scale is the trailing median of
those deviations — two stacked ``percentile`` windows instead of a
per-window re-centering (which would need O(n^2) work or a
second pass per window). Deterministic and engine-portable: the
``percentile() OVER`` <-> ``quantile_cont() OVER`` parity is the one
certified by ``roll_median_events``.

Plan shape at scale: two windows and one aggregate, all partitioned
by the series key — a single shuffle; the window buffers n rows per
task, never the group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["hampel_scores", "hampel_summary"]

HAMPEL_N = 15        # odd trailing window: exact element median
HAMPEL_K = 3.0       # flag threshold in robust sigmas
MAD_SIGMA = 1.4826   # Gaussian consistency constant


def hampel_scores(df: DataFrame, value_col: str, keys: list[str],
                  order: list[str], n: int = HAMPEL_N,
                  k: float = HAMPEL_K) -> DataFrame:
    """Adds ``roll_med``, ``hampel_score``, ``is_outlier`` per row.
    ``score = |v - roll_med| / (1.4826 * roll_mad)``; NULL score
    (zero local MAD — a locally constant series) never flags."""
    okeys = ", ".join(keys)
    oorder = ", ".join(order)
    over = (f"PARTITION BY {okeys} ORDER BY {oorder} "
            f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW")
    half = "CAST(1 AS DOUBLE) / 2"
    staged = (
        df.withColumn("__med", F.expr(
            f"percentile({value_col}, {half}) OVER ({over})"))
        .withColumn("__dev", F.expr(f"abs({value_col} - __med)"))
        .withColumn("__mad", F.expr(
            f"percentile(__dev, {half}) OVER ({over})"))
    )
    score = f"(__dev / ({MAD_SIGMA!r} * __mad))"
    return (
        staged.withColumn("hampel_score", F.expr(
            f"CASE WHEN __mad > 0.0 THEN {score} END"))
        .withColumn("is_outlier", F.expr(
            f"CASE WHEN __mad > 0.0 THEN {score} > {float(k)!r} "
            f"ELSE FALSE END"))
        .withColumn("roll_med", F.col("__med"))
        .drop("__med", "__dev", "__mad")
    )


def hampel_summary(df: DataFrame, value_col: str, keys: list[str],
                   order: list[str], n: int = HAMPEL_N,
                   k: float = HAMPEL_K) -> DataFrame:
    """(keys..., n_rows, n_flagged, flag_rate, max_score)."""
    scored = hampel_scores(df, value_col, keys, order, n, k)
    return scored.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.expr(
            "CASE WHEN is_outlier THEN 1 ELSE 0 END"
        )).cast("bigint").alias("n_flagged"),
        round_portable(F.expr(
            "CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) "
            "AS DOUBLE) / CAST(count(*) AS DOUBLE)"), 6
        ).alias("flag_rate"),
        round_portable(F.max("hampel_score"), 6).alias("max_score"),
    )


def _q_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hampel_summary(load(spark, sf_dir, "events"), "value",
                          ["event_type"], ["ts", "event_id"])


_OVER = (f"PARTITION BY event_type ORDER BY ts, event_id "
         f"ROWS BETWEEN {HAMPEL_N - 1} PRECEDING AND CURRENT ROW")
_SCORE_D = f"(dev / ({MAD_SIGMA!r} * mad))"

_ORACLE_HAMPEL = f"""
WITH medd AS (
  SELECT event_type, ts, event_id, value,
    quantile_cont(value, CAST(1 AS DOUBLE) / 2) OVER ({_OVER}) AS med
  FROM events
), devd AS (
  SELECT event_type, ts, event_id, abs(value - med) AS dev
  FROM medd
), madd AS (
  SELECT event_type,
    dev,
    quantile_cont(dev, CAST(1 AS DOUBLE) / 2) OVER ({_OVER}) AS mad
  FROM devd
), scored AS (
  SELECT event_type,
    CASE WHEN mad > 0.0 THEN {_SCORE_D} END AS score,
    CASE WHEN mad > 0.0 THEN {_SCORE_D} > {HAMPEL_K!r}
         ELSE FALSE END AS flagged
  FROM madd
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT)
    AS n_flagged,
  {round_portable_duck(
      "CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS DOUBLE) "
      "/ CAST(count(*) AS DOUBLE)", 6)} AS flag_rate,
  {round_portable_duck("max(score)", 6)} AS max_score
FROM scored GROUP BY 1
"""


QUERIES: dict = {
    "q_hampel_outliers_events": (_q_hampel, _ORACLE_HAMPEL),
}

"""Time-grid resampling with forward fill (gap-filled regular series).

Irregular event streams (ticks, telemetry) become regular per-key
series: one row per (key, bucket) from the key's first observation to
its last, carrying the last observed value forward through empty
buckets. The standard prerequisite for lag-based features, plotting,
and joining series observed at different cadences.

Plan shape at scale:

1. last-observation-per-bucket: rank window on (key, bucket) — one
   hash shuffle;
2. per-key extents + grid: ``sequence(min_bucket, max_bucket)``
   exploded per key — grid rows never exceed (time span / width) per
   key, so pick ``width_s`` for the cadence you serve, not the raw
   tick rate;
3. the forward-fill is one ``last(ignorenulls)`` running window per
   key. Steps 2-3 share the per-key hash partitioning.

All bucket arithmetic is integer epoch math (``ts DIV 1000`` then
DIV width-us), matching the repo-wide convention (DuckDB reads the
nanos parquet column at us precision), so both engines bucket
identically at any scale. The carried value is copied, never
recomputed — no float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["resample_ffill", "resample_interp"]


def resample_ffill(df: DataFrame, width_s: int, key_col: str = "user_id",
                   ts_ns_col: str = "ts", value_col: str = "value",
                   tiebreak_col: str = "event_id") -> DataFrame:
    """(key, bucket_start, value_ff, n_obs): regular gap-filled series.

    ``bucket_start`` is epoch seconds of the bucket; ``value_ff`` is
    the value of the latest observation at or before the bucket's end
    (ties within a bucket break on ``tiebreak_col``, which must make
    (ts, tiebreak) unique per key); ``n_obs`` is 0 for filled gaps.
    The grid spans each key's own [first, last] observed bucket, so no
    leading NULLs exist.
    """
    width_us = width_s * 1_000_000
    bucket = F.expr(f"({ts_ns_col} DIV 1000) DIV {width_us}")
    events = df.select(
        F.col(key_col), bucket.alias("__bucket"),
        F.col(ts_ns_col), F.col(tiebreak_col), F.col(value_col),
    )
    w_last = Window.partitionBy(key_col, "__bucket").orderBy(
        F.col(ts_ns_col).desc(), F.col(tiebreak_col).desc()
    )
    observed = (
        events.withColumn("__rn", F.row_number().over(w_last))
        .groupBy(key_col, "__bucket")
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col(value_col)))
            .alias("__last_value"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    grid = (
        events.groupBy(key_col)
        .agg(F.min("__bucket").alias("__b0"), F.max("__bucket").alias("__b1"))
        .select(key_col,
                F.explode(F.expr("sequence(__b0, __b1)")).alias("__bucket"))
    )
    w_ff = (
        Window.partitionBy(key_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(observed, [key_col, "__bucket"], "left")
        .select(
            key_col,
            (F.col("__bucket") * F.lit(width_s)).alias("bucket_start"),
            F.last("__last_value", ignorenulls=True).over(w_ff)
            .alias("value_ff"),
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
        )
    )


def resample_interp(df: DataFrame, width_s: int, key_col: str = "user_id",
                    ts_ns_col: str = "ts", value_col: str = "value",
                    tiebreak_col: str = "event_id") -> DataFrame:
    """(key, bucket_start, value_interp, n_obs): regular series with
    LINEAR interpolation through empty buckets (the smooth-series
    variant of ``resample_ffill`` — for slowly-varying telemetry where
    a step function misrepresents the gap).

    Observed buckets keep their last-observation value; gaps get
    ``v_prev + (v_next − v_prev) · (b − b_prev)/(b_next − b_prev)``;
    the tail after the final observation forward-fills. Same plan
    shape as ``resample_ffill`` plus ONE backward-looking window pair
    (last/first ignore-nulls over the shared per-key partitioning —
    no extra shuffle). The interpolation expression tree is identical
    in the oracle, so doubles match before rounding."""
    width_us = width_s * 1_000_000
    bucket = F.expr(f"({ts_ns_col} DIV 1000) DIV {width_us}")
    events = df.select(
        F.col(key_col), bucket.alias("__bucket"),
        F.col(ts_ns_col), F.col(tiebreak_col), F.col(value_col),
    )
    w_last = Window.partitionBy(key_col, "__bucket").orderBy(
        F.col(ts_ns_col).desc(), F.col(tiebreak_col).desc()
    )
    observed = (
        events.withColumn("__rn", F.row_number().over(w_last))
        .groupBy(key_col, "__bucket")
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col(value_col)))
            .alias("__obs"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    grid = (
        events.groupBy(key_col)
        .agg(F.min("__bucket").alias("__b0"), F.max("__bucket").alias("__b1"))
        .select(key_col,
                F.explode(F.expr("sequence(__b0, __b1)")).alias("__bucket"))
    )
    w_prev = (
        Window.partitionBy(key_col).orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(key_col).orderBy("__bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_b = F.when(F.col("__obs").isNotNull(), F.col("__bucket"))
    joined = (
        grid.join(observed, [key_col, "__bucket"], "left")
        .withColumn("__pv", F.last("__obs", ignorenulls=True).over(w_prev))
        .withColumn("__pb", F.last(obs_b, ignorenulls=True).over(w_prev))
        .withColumn("__nv", F.first("__obs", ignorenulls=True).over(w_next))
        .withColumn("__nb", F.first(obs_b, ignorenulls=True).over(w_next))
    )
    interp = F.when(
        F.col("__obs").isNotNull(), F.col("__obs")
    ).when(
        F.col("__nb").isNull(), F.col("__pv")  # tail: forward fill
    ).otherwise(
        F.col("__pv")
        + (F.col("__nv") - F.col("__pv"))
        * ((F.col("__bucket") - F.col("__pb")).cast("double")
           / (F.col("__nb") - F.col("__pb")).cast("double"))
    )
    return joined.select(
        key_col,
        (F.col("__bucket") * F.lit(width_s)).alias("bucket_start"),
        round_portable(interp).alias("value_interp"),
        F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
    )


# --------------------------------------------------------------------------
# Gate query
# --------------------------------------------------------------------------

_WIDTH_S = 14_400  # 4-hour buckets


def _q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample_ffill(load(spark, sf_dir, "events"), width_s=_WIDTH_S)


_ORACLE_RESAMPLE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_WIDTH_S * 1_000_000} AS bucket,
         ts, event_id, value
  FROM events
), obs AS (
  SELECT user_id, bucket, value AS last_value, n_obs FROM (
    SELECT user_id, bucket, value,
           row_number() OVER (PARTITION BY user_id, bucket
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id, bucket) AS n_obs
    FROM ev
  ) WHERE rn = 1
), extents AS (
  SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM ev GROUP BY 1
), grid AS (
  SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM extents
)
SELECT g.user_id,
       g.bucket * {_WIDTH_S} AS bucket_start,
       last_value(o.last_value IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS value_ff,
       CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs
FROM grid g LEFT JOIN obs o USING (user_id, bucket)
"""

def _q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample_interp(load(spark, sf_dir, "events"), width_s=_WIDTH_S)


_ORACLE_INTERP = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_WIDTH_S * 1_000_000} AS bucket,
         ts, event_id, value
  FROM events
), obs AS (
  SELECT user_id, bucket, value AS obs, n_obs FROM (
    SELECT user_id, bucket, value,
           row_number() OVER (PARTITION BY user_id, bucket
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id, bucket) AS n_obs
    FROM ev
  ) WHERE rn = 1
), extents AS (
  SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM ev GROUP BY 1
), grid AS (
  SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM extents
), ctx AS (
  SELECT g.user_id, g.bucket, o.obs, o.n_obs,
         last_value(o.obs IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN o.obs IS NOT NULL THEN g.bucket END
                    IGNORE NULLS) OVER wp AS pb,
         first_value(o.obs IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN o.obs IS NOT NULL THEN g.bucket END
                     IGNORE NULLS) OVER wn AS nb
  FROM grid g LEFT JOIN obs o USING (user_id, bucket)
  WINDOW
    wp AS (PARTITION BY g.user_id ORDER BY g.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wn AS (PARTITION BY g.user_id ORDER BY g.bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bucket * {_WIDTH_S} AS bucket_start,
  {round_portable_duck(
      "CASE WHEN obs IS NOT NULL THEN obs "
      "WHEN nb IS NULL THEN pv "
      "ELSE pv + (nv - pv) * (CAST(bucket - pb AS DOUBLE) "
      "/ CAST(nb - pb AS DOUBLE)) END")} AS value_interp,
  CAST(coalesce(n_obs, 0) AS BIGINT) AS n_obs
FROM ctx
"""


QUERIES: dict = {
    "resample_ffill_events": (_q_resample, _ORACLE_RESAMPLE),
    "resample_interp_events": (_q_resample_interp, _ORACLE_INTERP),
}

"""Robust anomaly statistics over event streams: MAD outlier
screening, CUSUM change detection, and arrival burstiness — the
monitoring layer a data platform runs over ingest volume and metric
columns (the batch counterparts of ``streaming/anomaly.py``'s
z-score detector, with robust/integer math instead of running
moments).

Engine-exact by construction (no interpolated quantiles anywhere —
Spark's ``percentile`` and DuckDB's ``quantile_cont`` interpolate
with DIFFERENT fp op orders, so bitwise parity would be luck):

- values quantize to BIGINT at 1e8 (the repo-wide float-determinism
  rule) and the median is the ORDER-STATISTIC lower median (row
  ``ceil(n/2)`` of the sorted group) — pure integer selection,
  identical everywhere. MAD is the same selection over integer
  absolute deviations; the outlier test ``|q - med| > 3 * mad`` is
  BIGINT arithmetic.
- CUSUM multiplies through by ``n_days`` so the drift term needs no
  division: ``cusum_scaled_d = n_days * Σ_{i<=d} q_i - d * Σ q`` is
  exact BIGINT; only the final report divides.
- Burstiness (Fano factor of hourly counts) is one double expression
  over three exact integer sums.

Plan shape at scale: every query is groupBy + window over the group
key — one hash shuffle each; the median selection is a filter on
row_number (no second sort); CUSUM aggregates to one row per day
BEFORE any window, so window state is O(days), not O(events).

Beyond-reference scope (SURVEY.md extension: pipeline health /
drift detection); no counterpart in the reference's Rust surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["mad_outliers", "cusum_daily", "arrival_burstiness"]

Q = 10 ** 8          # value quantizer (BIGINT at 1e8)
MAD_K = 3            # |x - med| > K * mad flags an outlier
US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def _lower_median(df: DataFrame, key: str, qcol: str,
                  tiebreak: str) -> DataFrame:
    """(key, __med): order-statistic lower median of an integer
    column per key — the sorted group's row ceil(n/2)."""
    w = Window.partitionBy(key).orderBy(F.col(qcol).asc(),
                                        F.col(tiebreak).asc())
    n = Window.partitionBy(key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(n))
        .filter(F.col("__rn") * 2 >= F.col("__n"))
        .filter((F.col("__rn") - 1) * 2 < F.col("__n"))
        .select(F.col(key), F.col(qcol).alias("__med"))
    )


def mad_outliers(df: DataFrame, value_col: str, key: str,
                 tiebreak: str, k: int = MAD_K) -> DataFrame:
    """(key, n, median, mad, n_outliers, outlier_rate): robust
    outlier screen per key. All selection/compare in BIGINT."""
    qd = df.select(
        F.col(key), F.col(tiebreak),
        F.expr(f"CAST(round({value_col} * {Q}) AS BIGINT)").alias("__q"),
    )
    med = _lower_median(qd, key, "__q", tiebreak)
    dev = (
        qd.join(F.broadcast(med), key)
        .withColumn("__ad", F.expr("abs(__q - __med)"))
    )
    mad = _lower_median(
        dev.select(key, tiebreak, "__ad"), key, "__ad", tiebreak
    ).withColumnRenamed("__med", "__mad")
    flagged = (
        dev.join(F.broadcast(mad), key)
        .withColumn(
            "__out",
            F.when(F.col("__ad") > F.lit(k) * F.col("__mad"), 1)
            .otherwise(0),
        )
    )
    return flagged.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        round_portable(
            F.expr(f"CAST(max(__med) AS DOUBLE) / {float(Q)!r}")
        ).alias("median"),
        round_portable(
            F.expr(f"CAST(max(__mad) AS DOUBLE) / {float(Q)!r}")
        ).alias("mad"),
        F.sum("__out").cast("bigint").alias("n_outliers"),
        round_portable(
            F.expr("CAST(sum(__out) AS DOUBLE) / CAST(count(*) AS DOUBLE)")
        ).alias("outlier_rate"),
    )


def cusum_daily(df: DataFrame, value_col: str, us_col: str) -> DataFrame:
    """(day, daily_value, cusum, is_peak): CUSUM drift of daily value
    sums against the period mean. ``cusum_d = Σ_{i<=d}(x_i - mean)``
    evaluated exactly as ``(n_days * cumΣq - d * Σq) / (n_days * Q)``
    — BIGINT until the final division. ``is_peak`` marks the max
    |cusum| day(s): the most likely change point."""
    daily = (
        df.select(
            F.expr(f"{us_col} DIV {US_PER_DAY}").alias("day"),
            F.expr(f"CAST(round({value_col} * {Q}) AS BIGINT)")
            .alias("__q"),
        )
        .groupBy("day").agg(F.sum("__q").alias("__dq"))
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wi = Window.orderBy("day")
    wt = Window.partitionBy()
    staged = (
        daily.withColumn("__cum", F.sum("__dq").over(wc))
        .withColumn("__d", F.row_number().over(wi))
        .withColumn("__tot", F.sum("__dq").over(wt))
        .withColumn("__nd", F.count(F.lit(1)).over(wt))
        .withColumn(
            "__cs",
            F.col("__nd") * F.col("__cum") - F.col("__d") * F.col("__tot"),
        )
        .withColumn("__mx", F.max(F.abs(F.col("__cs"))).over(wt))
    )
    denom = f"(CAST(__nd AS DOUBLE) * {float(Q)!r})"
    return staged.select(
        "day",
        round_portable(
            F.expr(f"CAST(__dq AS DOUBLE) / {float(Q)!r}")
        ).alias("daily_value"),
        round_portable(F.expr(f"CAST(__cs AS DOUBLE) / {denom}"))
        .alias("cusum"),
        F.expr("CAST(abs(__cs) = __mx AS INT)").alias("is_peak"),
    )


def arrival_burstiness(df: DataFrame, key: str, us_col: str) -> DataFrame:
    """(key, n_events, n_hours, fano): Fano factor (variance/mean) of
    hourly event counts per key — 1 ~ Poisson, >1 bursty. One double
    expression over exact integer count sums."""
    hourly = (
        df.select(F.col(key),
                  F.expr(f"{us_col} DIV {US_PER_HOUR}").alias("__h"))
        .groupBy(key, "__h").agg(F.count(F.lit(1)).alias("__c"))
    )
    fano = (
        "(CAST(__s2 AS DOUBLE) / CAST(__nh AS DOUBLE) "
        "- (CAST(__s1 AS DOUBLE) / CAST(__nh AS DOUBLE)) "
        "* (CAST(__s1 AS DOUBLE) / CAST(__nh AS DOUBLE))) "
        "/ (CAST(__s1 AS DOUBLE) / CAST(__nh AS DOUBLE))"
    )
    return (
        hourly.groupBy(key)
        .agg(
            F.sum("__c").alias("__s1"),
            F.sum(F.col("__c") * F.col("__c")).alias("__s2"),
            F.count(F.lit(1)).alias("__nh"),
        )
        .select(
            F.col(key),
            F.col("__s1").cast("bigint").alias("n_events"),
            F.col("__nh").alias("n_hours"),
            round_portable(F.expr(fano)).alias("fano"),
        )
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mad_outliers(load(spark, sf_dir, "events"), "value",
                        "event_type", "event_id")


_DUCK_MED = """
  SELECT {key}, q AS med
  FROM (
    SELECT {key}, q,
           row_number() OVER (PARTITION BY {key}
                              ORDER BY q ASC, {tb} ASC) AS rn,
           count(*) OVER (PARTITION BY {key}) AS n
    FROM {src}
  ) WHERE rn * 2 >= n AND (rn - 1) * 2 < n
"""

_ORACLE_MAD = f"""
WITH qd AS (
  SELECT event_type, event_id,
         CAST(round(value * {Q}) AS BIGINT) AS q
  FROM events
), med AS ({_DUCK_MED.format(key="event_type", tb="event_id",
                             src="qd")}),
dev AS (
  SELECT qd.event_type, qd.event_id, abs(qd.q - med.med) AS q
  FROM qd JOIN med USING (event_type)
), mad AS ({_DUCK_MED.format(key="event_type", tb="event_id",
                             src="dev")}),
flagged AS (
  SELECT d.event_type,
         CASE WHEN d.q > {MAD_K} * mad.med THEN 1 ELSE 0 END AS o
  FROM dev d JOIN mad USING (event_type)
)
SELECT f.event_type, count(*) AS n,
  {round_portable_duck(f"CAST(max(med.med) AS DOUBLE) / {float(Q)!r}")}
    AS median,
  {round_portable_duck(f"CAST(max(mad.med) AS DOUBLE) / {float(Q)!r}")}
    AS mad,
  CAST(sum(o) AS BIGINT) AS n_outliers,
  {round_portable_duck(
      "CAST(sum(o) AS DOUBLE) / CAST(count(*) AS DOUBLE)")}
    AS outlier_rate
FROM flagged f
JOIN med ON f.event_type = med.event_type
JOIN mad ON f.event_type = mad.event_type
GROUP BY 1
"""


def _q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return cusum_daily(ev, "value", "__us")


_ORACLE_CUSUM = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {US_PER_DAY} AS day,
         CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS BIGINT) AS dq
  FROM events GROUP BY 1
), staged AS (
  SELECT day, dq,
         CAST(sum(dq) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS d,
         CAST(sum(dq) OVER () AS BIGINT) AS tot,
         CAST(count(*) OVER () AS BIGINT) AS nd
  FROM daily
), cs AS (
  SELECT *, nd * cum - d * tot AS c FROM staged
), mx AS (
  SELECT *, CAST(max(abs(c)) OVER () AS BIGINT) AS m FROM cs
)
SELECT day,
  {round_portable_duck(f"CAST(dq AS DOUBLE) / {float(Q)!r}")}
    AS daily_value,
  {round_portable_duck(
      f"CAST(c AS DOUBLE) / (CAST(nd AS DOUBLE) * {float(Q)!r})")}
    AS cusum,
  CAST(abs(c) = m AS INT) AS is_peak
FROM mx
"""


def _q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return arrival_burstiness(ev, "event_type", "__us")


_ORACLE_BURSTINESS = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {US_PER_HOUR} AS h,
         count(*) AS c
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2,
         count(*) AS nh
  FROM hourly GROUP BY 1
)
SELECT event_type, s1 AS n_events, nh AS n_hours,
  {round_portable_duck(
      "(CAST(s2 AS DOUBLE) / CAST(nh AS DOUBLE) "
      "- (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)) "
      "* (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE))) "
      "/ (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE))")} AS fano
FROM agg
"""


QUERIES: dict = {
    "q_anomaly_mad_events": (_q_mad, _ORACLE_MAD),
    "q_changepoint_cusum_events": (_q_cusum, _ORACLE_CUSUM),
    "q_arrival_burstiness_events": (_q_burstiness, _ORACLE_BURSTINESS),
}

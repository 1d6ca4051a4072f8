"""Fixed-width histograms: the one-shuffle distribution profile used to
pick quality-filter thresholds, length buckets, and skew diagnoses
before running a 100 TB pipeline.

Scale shape: integer bin assignment in the scan projection, then ONE
map-side-combined groupBy on the (small, bounded) bin key. Bin count is
``range / width`` regardless of row count, so the shuffle payload is
constant at any scale. Sums use the exact-cents BIGINT trick
(``plans/analytics._q_events_hourly``) so partial-aggregation order can
never flip a low bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["fixed_width_histogram"]


def fixed_width_histogram(df: DataFrame, value_col: str,
                          width: float) -> DataFrame:
    """(bin, bin_lo, n_rows, sum_cents) — ``bin = floor(value/width)``.

    ``sum_cents`` is the exact integer sum of ``round(value * 100)``
    per bin (2-decimal data lands exactly on the cent lattice), kept in
    BIGINT on both engines.
    """
    bin_col = F.expr(
        f"CAST(floor({value_col} / {width!r}) AS BIGINT)"
    ).alias("bin")
    return (
        df.select(
            bin_col,
            F.col(value_col).alias("__v"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr("CAST(round(__v * 100) AS BIGINT)"))
            .alias("sum_cents"),
        )
        .withColumn("bin_lo", F.col("bin") * F.lit(width))
        .select("bin", "bin_lo", "n_rows", "sum_cents")
    )


def int_histogram(df: DataFrame, value_col: str, width: int) -> DataFrame:
    """(bin, n_rows, min_v, max_v) over an integer column with integer
    bin width — exact arithmetic end-to-end (``DIV``)."""
    return (
        df.select(F.expr(f"{value_col} DIV {width}").alias("bin"),
                  F.col(value_col).alias("__v"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__v").alias("min_v"),
            F.max("__v").alias("max_v"),
        )
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------

_VALUE_WIDTH = 25.0
_DOCLEN_WIDTH = 50


def _q_hist_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fixed_width_histogram(load(spark, sf_dir, "events"), "value",
                                 _VALUE_WIDTH)


_ORACLE_HIST_EVENTS = f"""
SELECT CAST(floor(value / {_VALUE_WIDTH!r}) AS BIGINT) AS bin,
       -- CAST: a float-looking literal is a DECIMAL in DuckDB, and
       -- BIGINT * DECIMAL stays DECIMAL (no double in the expression
       -- to contaminate it) — the driver's pandas path coerces it to
       -- float64 so values matched, but the dtype drift is a hash
       -- hazard; make the oracle emit DOUBLE like the Spark side.
       CAST(CAST(floor(value / {_VALUE_WIDTH!r}) AS BIGINT)
            * {_VALUE_WIDTH!r} AS DOUBLE) AS bin_lo,
       count(*) AS n_rows,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events
GROUP BY 1, 2
"""


def _q_hist_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return int_histogram(load(spark, sf_dir, "documents"), "n_chars",
                         _DOCLEN_WIDTH)


_ORACLE_HIST_DOCLEN = f"""
SELECT n_chars // {_DOCLEN_WIDTH} AS bin,
       count(*) AS n_rows,
       min(n_chars) AS min_v,
       max(n_chars) AS max_v
FROM documents
GROUP BY 1
"""

def histogram_cdf(hist: DataFrame) -> DataFrame:
    """Attach the empirical CDF to a histogram: cumulative row share up
    to and including each bin. The window is global BUT runs over the
    already-aggregated bin relation — bounded by ``range/width`` bins
    (dozens), not data size, so the single-partition sort is trivially
    safe at any scale (same argument as the <=20-row rank window in
    ``q_top_customers``)."""
    total = hist.agg(F.sum("n_rows").alias("__total"))
    cum = F.expr(
        "sum(n_rows) OVER (ORDER BY bin "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return (
        hist.crossJoin(F.broadcast(total))
        .withColumn("cum_rows", cum.cast("bigint"))
        .selectExpr(
            "bin", "n_rows", "cum_rows",
            "round(CAST(cum_rows AS DOUBLE) / __total * 10000.0) "
            "/ 10000.0 AS cdf",
        )
    )


def _q_hist_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = fixed_width_histogram(load(spark, sf_dir, "events"), "value",
                              _VALUE_WIDTH).select("bin", "n_rows")
    return histogram_cdf(h)


_ORACLE_HIST_CDF = f"""
WITH h AS (
  SELECT CAST(floor(value / {_VALUE_WIDTH!r}) AS BIGINT) AS bin,
         count(*) AS n_rows
  FROM events GROUP BY 1
), c AS (
  SELECT bin, n_rows,
         sum(n_rows) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rows,
         sum(n_rows) OVER () AS total
  FROM h
)
SELECT bin, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(cum_rows AS BIGINT) AS cum_rows,
       round(CAST(cum_rows AS DOUBLE) / total * 10000.0) / 10000.0 AS cdf
FROM c
"""

QUERIES: dict = {
    "hist_value_events": (_q_hist_events, _ORACLE_HIST_EVENTS),
    "hist_doclen_documents": (_q_hist_doclen, _ORACLE_HIST_DOCLEN),
    "hist_value_cdf_events": (_q_hist_cdf, _ORACLE_HIST_CDF),
}

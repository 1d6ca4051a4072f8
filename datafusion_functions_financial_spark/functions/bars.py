"""OHLCV bar resampling — ticks/events to time bars.

The reference consumes Polygon's pre-built minute/day aggregates
(SURVEY §1.4); an engine replacing it must also BUILD those bars from
raw ticks. Pure Catalyst: time-bucket integer arithmetic + min_by /
max_by ordered selection + min/max/sum — one shuffle on
(key, bucket), map-side partial aggregation applies.

``min_by(value, ts)`` / ``max_by(value, ts)`` give open/close without
a sort: the open is the value at the minimum timestamp. Timestamps
must be unique per (key, bucket) — true for real tick feeds at ns
resolution and for the testdata at us resolution.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ohlcv_bars"]


def ohlcv_bars(
    df: DataFrame,
    ts_col: str,
    price_col: str,
    keys: Sequence[str],
    bar_seconds: int,
    volume_col: str | None = None,
    ts_unit: str = "us",
) -> DataFrame:
    """Aggregate rows into OHLCV bars of ``bar_seconds`` per key.

    ``ts_col`` must be an integer epoch column in ``ts_unit``
    ('us' or 'ns'); output ``bar_start`` is epoch seconds.
    """
    per_sec = {"us": 1_000_000, "ns": 1_000_000_000}[ts_unit]
    bucket = (
        F.expr(f"{ts_col} DIV {per_sec * bar_seconds}") * F.lit(bar_seconds)
    ).alias("bar_start")
    aggs = [
        F.expr(f"min_by({price_col}, {ts_col})").alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.expr(f"max_by({price_col}, {ts_col})").alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ]
    if volume_col is not None:
        aggs.append(F.sum(volume_col).alias("volume"))
    return df.groupBy(*keys, bucket).agg(*aggs)

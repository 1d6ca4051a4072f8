"""Streaming OHLC candle bars: watermarked event-time tumbling windows
over a tick stream, with open/close picked by ``min_by``/``max_by``
over (timestamp, seq) — the streaming twin of ``functions/candles.py``
(same aggregation expressions, so a replayed stream reproduces the
batch bars exactly; ``tests/test_streaming_bars.py`` asserts the
equality).

Scale shape: per-(symbol, window) state is ONE partial-aggregation
struct (open/high/low/close/count), merged incrementally per
micro-batch and evicted once the watermark passes the window end —
state is O(active symbols × active windows), never O(ticks). Late
ticks within the watermark revise the bar; later ones are dropped
(standard completeness/latency trade)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_ohlc_bars", "batch_ohlc_bars"]


def _bar_aggs(ts_col: str, seq_col: str, price_col: str):
    ordk = F.struct(F.col(ts_col), F.col(seq_col))
    return [
        F.min_by(price_col, ordk).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, ordk).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ]


def streaming_ohlc_bars(ticks: DataFrame, width: str = "1 minute",
                        watermark: str = "2 minutes",
                        key_col: str = "symbol",
                        ts_col: str = "timestamp",
                        seq_col: str = "seq",
                        price_col: str = "price") -> DataFrame:
    """Watermarked tumbling OHLC bars from a streaming tick source.

    Append-output capable: a (key, window) bar finalizes when the
    watermark passes the window end."""
    return (
        ticks.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width), F.col(key_col))
        .agg(*_bar_aggs(ts_col, seq_col, price_col))
    )


def batch_ohlc_bars(ticks: DataFrame, width: str = "1 minute",
                    key_col: str = "symbol", ts_col: str = "timestamp",
                    seq_col: str = "seq",
                    price_col: str = "price") -> DataFrame:
    """The batch oracle: identical expressions minus the watermark."""
    return (
        ticks.groupBy(F.window(ts_col, width), F.col(key_col))
        .agg(*_bar_aggs(ts_col, seq_col, price_col))
    )

"""Explicit schemas for Polygon flat-file datasets.

The reference infers CSV schemas (``src/polygon/client.rs:106-108``);
for 100 TB-safety we declare them (inference double-reads data and can
drift per file). Column names match the reference's SQL surface so its
queries run verbatim:

- day aggs: examples/local_demo.rs:99-105 + sample_data CSV header
- minute aggs: validator SQL (validator.rs:88-157), signals SQL
  (signals.rs:38-45); ``window_start`` is epoch-nanosecond int64 (the
  reference downcasts TimestampNanosecondArray, signals.rs:62) — we
  model it as LongType nanos end-to-end
- trades/quotes: Polygon flat-file public docs column sets
- ticks: streaming MarketTick struct (streaming.rs:15-22)
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _schema(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


DAY_AGGS = _schema(
    ("ticker", StringType()),
    ("date", DateType()),
    ("open", DoubleType()),
    ("high", DoubleType()),
    ("low", DoubleType()),
    ("close", DoubleType()),
    ("volume", LongType()),
    ("vwap", DoubleType()),
    ("transactions", LongType()),
)

MINUTE_AGGS = _schema(
    ("ticker", StringType()),
    ("window_start", LongType()),  # epoch nanoseconds
    ("open", DoubleType()),
    ("high", DoubleType()),
    ("low", DoubleType()),
    ("close", DoubleType()),
    ("volume", LongType()),
)

TRADES = _schema(
    ("ticker", StringType()),
    ("sip_timestamp", LongType()),  # epoch nanoseconds
    ("price", DoubleType()),
    ("size", LongType()),
    ("exchange", LongType()),
    ("conditions", StringType()),
)

QUOTES = _schema(
    ("ticker", StringType()),
    ("sip_timestamp", LongType()),
    ("bid_price", DoubleType()),
    ("bid_size", LongType()),
    ("ask_price", DoubleType()),
    ("ask_size", LongType()),
)

GROUPED_DAILY = DAY_AGGS

TICKS = _schema(
    ("symbol", StringType()),
    ("timestamp", TimestampType()),
    ("price", DoubleType()),
    ("volume", LongType()),
    ("bid", DoubleType()),
    ("ask", DoubleType()),
)

BY_DATA_TYPE = {
    "day_aggs_v1": DAY_AGGS,
    "minute_aggs_v1": MINUTE_AGGS,
    "trades_v1": TRADES,
    "quotes_v1": QUOTES,
    "grouped_daily_v1": GROUPED_DAILY,
}

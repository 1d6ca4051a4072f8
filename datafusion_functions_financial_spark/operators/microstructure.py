"""Market-microstructure operators over trades/quotes (the tick-level
data types the Polygon loader serves, sources/schemas.py TRADES/QUOTES).

Beyond the reference's surface (it only loads these files), these are
the standard first-stage analytics a replacement engine needs. All
pure Catalyst — window functions and aggregations, no UDFs:

- quote spread statistics (absolute/relative spread, midpoint)
- tick-rule trade signing (Lee-Ready style): sign(price change),
  carrying the last nonzero sign through zero-ticks via
  ``last(..., ignorenulls=True)`` — a carry-forward scan expressed as
  a window function, no per-row Python
- VWAP per (symbol, bucket)

Scale: everything shuffles once on the symbol (or symbol+bucket) key;
window scans are per-symbol ordered passes, the same partitioning
strategy as the indicator pipeline.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quote_spread_stats", "sign_trades", "vwap"]


def quote_spread_stats(
    quotes: DataFrame,
    keys: Sequence[str] = ("ticker",),
) -> DataFrame:
    """Per-key quote spread statistics (NBBO-style)."""
    spread = F.col("ask_price") - F.col("bid_price")
    mid = (F.col("ask_price") + F.col("bid_price")) / 2
    enriched = quotes.withColumn("spread", spread).withColumn(
        "rel_spread_bps",
        F.when(mid > 0, (F.col("spread") / mid) * 10_000.0),
    )
    return enriched.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_quotes"),
        F.round(F.avg("spread"), 6).alias("avg_spread"),
        F.round(F.expr("percentile(spread, 0.5)"), 6).alias("median_spread"),
        F.round(F.avg("rel_spread_bps"), 4).alias("avg_rel_spread_bps"),
        F.round(F.min("bid_price"), 6).alias("min_bid"),
        F.round(F.max("ask_price"), 6).alias("max_ask"),
        F.count(F.when(F.col("spread") < 0, 1)).alias("crossed_quotes"),
    )


def sign_trades(
    trades: DataFrame,
    keys: Sequence[str] = ("ticker",),
    ts_col: str = "sip_timestamp",
    price_col: str = "price",
    tiebreak_cols: Sequence[str] = ("sequence_number",),
) -> DataFrame:
    """Tick-rule trade signing: +1 uptick, -1 downtick; zero-ticks carry
    the previous nonzero sign (NULL until the first price change).

    ``tiebreak_cols`` must make the ordering unique within a key —
    exchange feeds routinely stamp multiple trades with the same
    timestamp, and lag()/last() over a non-unique order are
    nondeterministic across runs. Columns absent from the frame are
    skipped (with the default, frames without ``sequence_number`` fall
    back to timestamp-only ordering as before).
    """
    order = [ts_col] + [c for c in tiebreak_cols if c in trades.columns]
    w = Window.partitionBy(*keys).orderBy(*order)
    chg = F.col(price_col) - F.lag(price_col).over(w)
    raw = F.when(chg > 0, 1).when(chg < 0, -1)  # NULL on zero-tick/first
    cum = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return trades.withColumn(
        "trade_sign", F.last(raw, ignorenulls=True).over(cum)
    )


def vwap(
    trades: DataFrame,
    keys: Sequence[str] = ("ticker",),
    ts_col: str = "sip_timestamp",
    price_col: str = "price",
    size_col: str = "size",
    bucket_seconds: int | None = None,
    ts_unit: str = "ns",
) -> DataFrame:
    """Volume-weighted average price per key (optionally per bucket)."""
    group = list(keys)
    df = trades
    if bucket_seconds is not None:
        per_sec = {"us": 1_000_000, "ns": 1_000_000_000}[ts_unit]
        df = df.withColumn(
            "bucket_start",
            F.expr(f"{ts_col} DIV {per_sec * bucket_seconds}")
            * F.lit(bucket_seconds),
        )
        group.append("bucket_start")
    notional = F.sum(F.col(price_col) * F.col(size_col))
    volume = F.sum(size_col)
    return df.groupBy(*group).agg(
        F.round(notional / volume, 6).alias("vwap"),
        volume.alias("volume"),
        F.count(F.lit(1)).alias("n_trades"),
    )

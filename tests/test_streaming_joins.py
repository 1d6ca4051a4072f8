"""Stream-stream interval join must reproduce the batch join exactly
on a replayed stream, and respect the look-back bound."""

from datetime import datetime, timedelta

import pytest

from datafusion_functions_financial_spark.streaming.joins import (
    interval_join_batch,
    interval_join_stream,
)

_TRADES = "symbol string, t_ts timestamp, trade_id long, size long"
_QUOTES = "symbol string, q_ts timestamp, quote_seq long, bid double"

_BASE = datetime(2024, 1, 1, 10, 0, 0)


def _mk(spark, schema, rows):
    return spark.createDataFrame(
        [tuple(_BASE + timedelta(seconds=r[1]) if i == 1 else v
               for i, v in enumerate(r)) for r in rows], schema)


def _pairs(df):
    return {(r["trade_id"], r["quote_seq"]) for r in df.collect()}


@pytest.mark.slow
def test_interval_join_stream_equals_batch(spark, tmp_path):
    trades = _mk(spark, _TRADES, [
        ("A", 30, 1, 100), ("A", 100, 2, 50), ("B", 45, 3, 10),
    ])
    quotes = _mk(spark, _QUOTES, [
        ("A", 10, 10, 9.9),   # 20s before trade 1: in window
        ("A", 30, 11, 10.0),  # same instant: in window (<=)
        ("A", 95, 12, 10.1),  # 5s before trade 2
        ("A", 60, 13, 9.8),   # 40s before trade 2: outside 30s window
        ("B", 44, 14, 5.0),   # in window for trade 3
        ("B", 46, 15, 5.1),   # after trade 3: excluded
    ])
    t_src, q_src = tmp_path / "trades", tmp_path / "quotes"
    trades.write.parquet(str(t_src))
    quotes.write.parquet(str(q_src))

    want = _pairs(interval_join_batch(
        trades, quotes, "symbol", "t_ts", "q_ts",
        ["t_ts", "trade_id", "size"], ["q_ts", "quote_seq", "bid"]))
    assert want == {(1, 10), (1, 11), (2, 12), (3, 14)}

    ts = spark.readStream.schema(_TRADES).parquet(str(t_src))
    qs = spark.readStream.schema(_QUOTES).parquet(str(q_src))
    out = interval_join_stream(
        ts, qs, "symbol", "t_ts", "q_ts",
        ["t_ts", "trade_id", "size"], ["q_ts", "quote_seq", "bid"])
    q = (out.writeStream.format("memory").queryName("ij_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = _pairs(spark.sql("SELECT * FROM ij_stream"))
    assert got == want


@pytest.mark.slow
def test_interval_join_carries_both_sides_columns(spark, tmp_path):
    trades = _mk(spark, _TRADES, [("A", 10, 1, 7)])
    quotes = _mk(spark, _QUOTES, [("A", 5, 20, 3.5)])
    out = interval_join_batch(
        trades, quotes, "symbol", "t_ts", "q_ts",
        ["t_ts", "trade_id", "size"], ["q_ts", "quote_seq", "bid"])
    r = out.collect()[0]
    assert (r["symbol"], r["trade_id"], r["size"],
            r["quote_seq"], r["bid"]) == ("A", 1, 7, 20, 3.5)
    assert r["q_ts"] < r["t_ts"]

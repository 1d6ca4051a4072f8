"""Streaming OHLC candle bars: watermarked tumbling windows must
reproduce the batch bar builder exactly on a replayed stream
(the batch-equality bar the streaming surface is held to)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.streaming.bars import (
    batch_ohlc_bars,
    streaming_ohlc_bars,
)

_SCHEMA = ("symbol string, timestamp timestamp, seq long, price double")


def _ticks(spark, rows):
    base = datetime(2024, 1, 1, 10, 0, 0)
    data = [(sym, base + timedelta(seconds=s), i, float(p))
            for i, (sym, s, p) in enumerate(rows)]
    return spark.createDataFrame(data, _SCHEMA)


@pytest.mark.slow
def test_streaming_bars_equal_batch(spark, tmp_path):
    rows = [
        ("A", 0, 10.0), ("A", 20, 13.0), ("A", 50, 11.0),   # 10:00 bar
        ("A", 70, 20.0), ("A", 95, 18.0),                   # 10:01 bar
        ("B", 5, 100.0), ("B", 40, 90.0),                   # B's 10:00 bar
    ]
    df = _ticks(spark, rows)
    src = tmp_path / "bar_ticks"
    df.write.parquet(str(src))

    stream = spark.readStream.schema(_SCHEMA).parquet(str(src))
    q = (
        streaming_ohlc_bars(stream).writeStream.format("memory")
        .queryName("bars_stream").outputMode("complete")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["symbol"], r["window"]["start"]):
            (r["open"], r["high"], r["low"], r["close"], r["n_ticks"])
        for r in spark.sql("SELECT * FROM bars_stream").collect()
    }
    want = {
        (r["symbol"], r["window"]["start"]):
            (r["open"], r["high"], r["low"], r["close"], r["n_ticks"])
        for r in batch_ohlc_bars(df).collect()
    }
    assert got == want and len(want) == 3
    # Spot-check the known first bar of A: open=first tick, close=last.
    a0 = want[("A", datetime(2024, 1, 1, 10, 0, 0))]
    assert a0 == (10.0, 13.0, 10.0, 11.0, 3)


@pytest.mark.slow
def test_streaming_bars_open_close_use_seq_tiebreak(spark, tmp_path):
    # Two ticks at the SAME timestamp: seq must break the tie for both
    # open and close deterministically.
    rows = [("A", 0, 5.0), ("A", 0, 7.0), ("A", 10, 6.0)]
    df = _ticks(spark, rows)
    src = tmp_path / "tie_ticks"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(_SCHEMA).parquet(str(src))
    q = (
        streaming_ohlc_bars(stream).writeStream.format("memory")
        .queryName("bars_tie").outputMode("complete")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    r = spark.sql("SELECT * FROM bars_tie").collect()[0]
    assert r["open"] == 5.0      # seq 0 wins the open
    assert r["close"] == 6.0     # latest (ts, seq) wins the close
    assert (r["high"], r["low"], r["n_ticks"]) == (7.0, 5.0, 3)

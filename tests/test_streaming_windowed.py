"""Event-time tumbling windows with watermark over a tick stream —
the beyond-reference late-data path (the reference is arrival-order
only; SURVEY §2.C / §7 hard part 5)."""

from datetime import datetime

import pandas as pd
import pytest

from datafusion_functions_financial_spark.streaming.spark import TICK_SCHEMA


@pytest.mark.slow
def test_windowed_agg_with_watermark(spark, tmp_path):
    from pyspark.sql import functions as F

    rows = []
    base = datetime(2024, 1, 1, 10, 0, 0)
    # Two 1-minute windows of ticks for one symbol + a late arrival.
    for sec, price in [(0, 10.0), (20, 12.0), (50, 14.0),   # window 10:00
                       (70, 20.0), (90, 22.0),              # window 10:01
                       (30, 99.0)]:                         # late into 10:00
        rows.append(dict(symbol="S", timestamp=base.replace(
            minute=sec // 60, second=sec % 60), price=price, volume=1,
            bid=None, ask=None))
    pdf = pd.DataFrame(rows)
    src = tmp_path / "wm_ticks"
    spark.createDataFrame(pdf, schema=TICK_SCHEMA).write.parquet(str(src))

    stream = spark.readStream.schema(TICK_SCHEMA).parquet(str(src))
    agg = (
        stream.withWatermark("timestamp", "10 minutes")
        .groupBy(F.window("timestamp", "1 minute"), F.col("symbol"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("price").alias("avg_price"),
            F.max("price").alias("max_price"),
        )
    )
    q = (
        agg.writeStream.format("memory").queryName("wm_agg")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = {
        r["window"]["start"].minute: r
        for r in spark.sql("SELECT * FROM wm_agg").collect()
    }
    assert set(out) == {0, 1}
    # The "late" 10:00:30 row lands in the 10:00 window (within watermark).
    assert out[0]["n"] == 4 and out[0]["max_price"] == 99.0
    assert out[1]["n"] == 2
    assert out[1]["avg_price"] == pytest.approx(21.0)


@pytest.mark.slow
def test_session_window_stream(spark, tmp_path):
    """Native session windows (gap-based) on the tick stream — the
    streaming counterpart of q_events_sessionize."""
    from pyspark.sql import functions as F

    base = datetime(2024, 1, 1, 9, 0, 0)
    rows = []
    # Two bursts separated by > 5 minutes -> two sessions.
    for sec in (0, 10, 20, 1000, 1010):
        rows.append(dict(
            symbol="S",
            timestamp=base.replace(minute=sec // 60, second=sec % 60),
            price=1.0, volume=1, bid=None, ask=None,
        ))
    pdf = pd.DataFrame(rows)
    src = tmp_path / "sess_ticks"
    spark.createDataFrame(pdf, schema=TICK_SCHEMA).write.parquet(str(src))

    stream = spark.readStream.schema(TICK_SCHEMA).parquet(str(src))
    agg = (
        stream.withWatermark("timestamp", "30 minutes")
        .groupBy(F.session_window("timestamp", "5 minutes"), F.col("symbol"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory").queryName("sess_win")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = sorted(
        (r["session_window"]["start"], r["n"])
        for r in spark.sql("SELECT * FROM sess_win").collect()
    )
    assert [n for _, n in out] == [3, 2]


@pytest.mark.slow
def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup: dropDuplicatesWithinWatermark on a
    replayed tick id — state-bounded by the watermark."""
    base = datetime(2024, 1, 1, 9, 0, 0)
    rows = []
    for i, sec in enumerate((0, 10, 10, 20, 20, 20)):  # dup timestamps
        rows.append(dict(
            symbol="S",
            timestamp=base.replace(second=sec),
            price=float(i), volume=1, bid=None, ask=None,
        ))
    pdf = pd.DataFrame(rows)
    src = tmp_path / "dup_ticks"
    spark.createDataFrame(pdf, schema=TICK_SCHEMA).write.parquet(str(src))

    stream = spark.readStream.schema(TICK_SCHEMA).parquet(str(src))
    deduped = (
        stream.withWatermark("timestamp", "10 minutes")
        .dropDuplicatesWithinWatermark(["symbol", "timestamp"])
    )
    q = (
        deduped.writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_stream").collect()
    assert len(out) == 3  # one row per distinct (symbol, timestamp)

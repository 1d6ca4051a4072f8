"""Stream ≡ batch on REAL data (VERDICT r04 item 6): replay
/root/testdata/sf0.01/events.parquet as a multi-micro-batch file
stream and require the streaming operators to reproduce the batch
operators' output exactly.

- Sessionizer: every session the batch window-sessionizer closes
  BEFORE a user's tail must come out of the stream bit-identically
  (start/end/count); only per-user tail sessions may differ (open in
  state vs closed by the event-time timeout).
- HLL cardinality: the streaming register state after replay must
  equal the batch sketch over the same parquet — same registers, same
  estimates, per event_type group.
"""

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import sketch
from datafusion_functions_financial_spark.sources.tables import load
from datafusion_functions_financial_spark.streaming import cardinality
from datafusion_functions_financial_spark.streaming.sessions import (
    sessionize_stream,
)

SF001 = "/root/testdata/sf0.01"
GAP_S = 1800  # match the batch operator's 30-minute session gap
N_REPLAY_FILES = 4


def _events_ticks(spark):
    """sf0.01 events mapped to the sessionizer's input shape:
    (symbol string, timestamp timestamp) — integer-µs conversion of
    the nanos ts, user_id as the session key."""
    ev = load(spark, SF001, "events")
    return ev.selectExpr(
        "CAST(user_id AS STRING) AS symbol",
        "timestamp_micros(ts DIV 1000) AS timestamp",
    )


def _batch_sessions(ticks):
    """Batch sessionizer (the registered q_events_sessionize shape:
    lag-gap flag + running sum), emitting absolute bounds so stream
    rows can be compared tuple-for-tuple."""
    w = Window.partitionBy("symbol").orderBy("timestamp")
    us = F.expr("unix_micros(timestamp)")
    new_s = F.when(
        (us - F.lag(us).over(w)) > GAP_S * 1_000_000, 1
    ).otherwise(0)
    sess = ticks.withColumn("__new", new_s).withColumn(
        "sid",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("symbol", "sid")
        .agg(
            F.min("timestamp").alias("session_start"),
            F.max("timestamp").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@pytest.mark.slow
def test_sessionizer_replays_sf001_equal_to_batch(spark, tmp_path):
    ticks = _events_ticks(spark)
    # Time-ordered replay files -> deterministic micro-batch sequence
    # (each slice written sequentially so modification times order the
    # file stream; maxFilesPerTrigger=1 gives one batch per slice).
    pdf = ticks.toPandas().sort_values("timestamp").reset_index(drop=True)
    src = tmp_path / "sf001_sess"
    src.mkdir()
    n = len(pdf)
    for i in range(N_REPLAY_FILES):
        sl = pdf.iloc[i * n // N_REPLAY_FILES:(i + 1) * n // N_REPLAY_FILES]
        spark.createDataFrame(
            sl, schema="symbol string, timestamp timestamp"
        ).coalesce(1).write.parquet(str(src / f"f={i}"))

    stream = (
        spark.readStream
        .schema("symbol string, timestamp timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/f=*")
    )
    q = (
        sessionize_stream(stream, gap_seconds=GAP_S, watermark="1 minute")
        .writeStream.format("memory").queryName("sf001_sess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)

    got = {
        (r.symbol, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sf001_sess").collect()
    }
    batch = _batch_sessions(ticks).collect()
    allsess = {
        (r.symbol, r.session_start, r.session_end, r.n_events)
        for r in batch
    }
    tails = {
        (r.symbol, r.session_start, r.session_end, r.n_events)
        for r in pd.DataFrame(
            [(r.symbol, r.session_start, r.session_end, r.n_events)
             for r in batch],
            columns=["symbol", "session_start", "session_end", "n_events"],
        ).sort_values("session_end").groupby("symbol").tail(1).itertuples()
    }
    assert len(allsess) > 150  # real corpus: many sessions

    # Nothing fabricated: every streamed session is a batch session.
    assert got <= allsess
    # Complete: every non-tail session was closed and emitted exactly.
    assert (allsess - tails) <= got
    # Tails only close via timeout; at most one open session per user.
    missing = allsess - got
    assert missing <= tails


@pytest.mark.slow
def test_hll_stream_replays_sf001_equal_to_batch(spark, tmp_path):
    ev = load(spark, SF001, "events").select("user_id", "event_type")
    src = str(tmp_path / "sf001_hll")
    ev.repartition(N_REPLAY_FILES).write.parquet(src)

    stream = (
        spark.readStream
        .schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        cardinality.hll_register_stream(stream, "user_id", ("event_type",))
        .writeStream.format("memory").queryName("sf001_hll")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)

    got = cardinality.estimate_from_registers(
        spark.table("sf001_hll"), ("event_type",)
    ).collect()
    batch = sketch.hll_estimate(ev, "user_id", ("event_type",)).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in batch}
    assert len(got) > 1

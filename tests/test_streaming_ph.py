"""Streaming Page-Hinkley: the windowed mean registers a replayed
sf0.01 event stream accumulates must equal the batch twin
bit-for-bit, and the PH scan scored from the stream's sink contents
must equal the scan scored from the batch relation (the drift-family
"streaming state IS the batch relation" idiom)."""

import pandas as pd

import pytest

from datafusion_functions_financial_spark.operators import drift2
from datafusion_functions_financial_spark.sources.tables import load

SF001 = "/root/testdata/sf0.01"
N_REPLAY_FILES = 4


def _ticks(spark):
    ev = load(spark, SF001, "events")
    return ev.selectExpr(
        "timestamp_micros(ts DIV 1000) AS timestamp",
        "value",
    )


@pytest.mark.slow
def test_ph_stream_replay_sf001_equals_batch(spark, tmp_path):
    ticks = _ticks(spark)
    pdf = ticks.toPandas().sort_values("timestamp").reset_index(
        drop=True)
    src = tmp_path / "sf001_ph"
    src.mkdir()
    n = len(pdf)
    for i in range(N_REPLAY_FILES):
        sl = pdf.iloc[i * n // N_REPLAY_FILES:
                      (i + 1) * n // N_REPLAY_FILES]
        spark.createDataFrame(
            sl, schema="timestamp timestamp, value double"
        ).coalesce(1).write.parquet(str(src / f"f={i}"))

    stream = (
        spark.readStream.schema("timestamp timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    means_stream = drift2.window_means_stream(
        stream, "timestamp", "value",
        window="1 hour", watermark="1 hour")
    q = (
        means_stream.writeStream.format("memory")
        .queryName("ph_means").outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(240)

    got = spark.table("ph_means")
    want = drift2.window_means_batch(
        ticks, "timestamp", "value", window="1 hour")

    def norm(df):
        return sorted(
            (r.window.start, r.window.end, r.c, r.n)
            for r in df.collect()
        )

    assert norm(got) == norm(want)

    ph_stream = drift2.ph_from_window_means(got).toPandas()
    ph_batch = drift2.ph_from_window_means(want).toPandas()
    pd.testing.assert_frame_equal(ph_stream, ph_batch)
    row = ph_batch.iloc[0]
    assert row["t"] == len(norm(want))
    assert row["max_ph"] >= 0.0


def test_ph_window_means_match_gate_series(spark):
    # the window-register path and the gate query's bucket staging
    # are the same series: PH from the batch twin == the gated
    # q_page_hinkley_events result.
    means = drift2.window_means_batch(
        _ticks(spark), "timestamp", "value", window="1 hour")
    via_windows = drift2.ph_from_window_means(means).collect()[0]
    gated = drift2._q_ph(spark, SF001).collect()[0]
    assert via_windows["t"] == gated["t"]
    assert via_windows["max_ph"] == gated["max_ph"]
    assert (via_windows["n_alarm_buckets"]
            == gated["n_alarm_buckets"])
    assert (via_windows["first_alarm_t"]
            == gated["first_alarm_t"])

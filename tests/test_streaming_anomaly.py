"""Streaming z-score anomaly detector: replayed stream must reproduce
the batch alert set exactly, including across micro-batch splits."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from datafusion_functions_financial_spark.streaming.anomaly import (
    batch_zscore_alerts, welford_alerts, zscore_alert_stream,
)

_SCHEMA = "symbol string, timestamp timestamp, seq long, price double"
_BASE = datetime(2024, 1, 1, 9, 30)


def _ticks(spark, rows):
    data = [(sym, _BASE + timedelta(seconds=s), i, float(p))
            for i, (sym, s, p) in enumerate(rows)]
    return spark.createDataFrame(data, _SCHEMA)


def test_welford_prior_window_scoring():
    # 20 quiet points then a spike: one alert, scored vs priors only
    vals = np.array([10.0, 10.1] * 10 + [50.0, 10.0])
    idx, zs, (n, mean, m2) = welford_alerts(vals, 4.0, (0, 0.0, 0.0))
    assert idx == [20]
    assert zs[0] > 100
    assert n == 22
    # spike inflates the running moments for later points
    assert mean > 10.1


def test_welford_no_alert_before_min_obs():
    vals = np.array([1.0, 100.0, 1.0, 100.0])
    idx, _, _ = welford_alerts(vals, 1.0, (0, 0.0, 0.0), min_obs=10)
    assert idx == []


def test_welford_state_split_equals_single_pass():
    rng = [float(v) for v in ([10, 11, 9, 10, 12, 8, 10, 11, 9, 10]
                              * 3 + [99, 10, -80])]
    vals = np.array(rng)
    i1, z1, st1 = welford_alerts(vals, 3.0, (0, 0.0, 0.0))
    # same series split at an arbitrary boundary
    a, b = vals[:17], vals[17:]
    ia, za, st_mid = welford_alerts(a, 3.0, (0, 0.0, 0.0))
    ib, zb, st2 = welford_alerts(b, 3.0, st_mid)
    assert i1 == ia + [17 + i for i in ib]
    assert z1 == za + zb
    assert st1 == st2


@pytest.mark.slow
def test_streaming_alerts_equal_batch(spark, tmp_path):
    quiet = [("A", s, 10.0 + (s % 3) * 0.1) for s in range(0, 120, 5)]
    rows = quiet + [("A", 125, 55.0), ("A", 130, 10.0),
                    ("B", 0, 1.0)]  # B never reaches min_obs
    df = _ticks(spark, rows)
    src = tmp_path / "anomaly_ticks"
    # two files -> at least two micro-batches with availableNow
    df.filter("seq < 12").coalesce(1).write.parquet(str(src))
    df.filter("seq >= 12").coalesce(1).write.mode("append") \
        .parquet(str(src))

    want = {(r["symbol"], r["seq"], round(r["zscore"], 10))
            for r in batch_zscore_alerts(df, threshold=4.0).collect()}
    assert len(want) == 1 and list(want)[0][1] == 24  # the 55.0 spike

    stream = spark.readStream.schema(_SCHEMA).parquet(str(src))
    q = (zscore_alert_stream(stream, threshold=4.0)
         .writeStream.format("memory").queryName("alerts")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["symbol"], r["seq"], round(r["zscore"], 10))
           for r in spark.sql("SELECT * FROM alerts").collect()}
    assert got == want

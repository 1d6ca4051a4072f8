"""Streaming VPIN: emitted completed buckets must equal the batch
``vpin_buckets`` table minus each key's trailing bucket — on
synthetic tapes, across micro-batch splits, and on an sf0.01 events
replay (slow)."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import micro3
from datafusion_functions_financial_spark.sources.tables import load
from datafusion_functions_financial_spark.streaming.vpin import (
    vpin_bucket_stream, vpin_fold,
)

SCHEMA = "key string, ts long, seq long, v double"
BV = 100.0


def _batch_completed(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    b = micro3.vpin_buckets(df, "v", ["key"], ["ts", "seq"],
                            bucket_vol=BV)
    return sorted(
        (r["key"], r["__bkt"], r["__buy"], r["__sell"])
        for r in b.filter(F.col("__bkt") != F.col("__last")).collect())


def _stream_buckets(spark, tmp_path, writes, name):
    src = str(tmp_path / name)
    q = None
    try:
        for i, rows in enumerate(writes):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
                "append").parquet(src)
            if q is None:
                stream = spark.readStream.schema(SCHEMA).parquet(src)
                out = vpin_bucket_stream(stream, "key", "ts", "seq",
                                         "v", bucket_vol=BV)
                q = (out.writeStream.format("memory").queryName(name)
                     .outputMode("append").start())
            q.processAllAvailable()
        return sorted(tuple(r) for r in spark.table(name).collect())
    finally:
        if q is not None:
            q.stop()


def _tape(key, n, start=10.0):
    rows = []
    p = start
    for i in range(n):
        p = p + (1.0 if i % 3 else -2.0)
        rows.append((key, i, i, float(abs(p) + 1.0)))
    return rows


def test_fold_kernel_basic():
    import numpy as np
    prices = np.array([10.0, 11.0, 10.0, 10.0, 12.0])
    out, st = vpin_fold(prices, (0, 0.0, 0, 0, -1, 0, 0),
                        int(25 * micro3.QV))
    # moves: +1(buy,11), -1(sell,10), flat(sell,10), +2(buy,12)
    # cum volumes: 11, 21, 31, 43 -> buckets 0,0,1,1
    assert out == [(0, 11 * micro3.QV, 10 * micro3.QV)]
    n, last_p, last_sign, cum, cur, buy, sell = st
    assert (n, last_p, last_sign) == (5, 12.0, 1)
    assert cur == 1 and buy == 12 * micro3.QV and sell == 10 * micro3.QV


@pytest.mark.slow
def test_stream_equals_batch_single_batch(spark, tmp_path):
    rows = _tape("a", 120) + _tape("b", 77, start=50.0)
    got = _stream_buckets(spark, tmp_path, [rows], "vpin_s1")
    assert got == _batch_completed(spark, rows) and len(got) > 0


@pytest.mark.slow
def test_stream_equals_batch_across_microbatches(spark, tmp_path):
    rows = _tape("a", 150)
    # split mid-bucket: state must carry partial accumulations
    writes = [rows[:47], rows[47:101], rows[101:]]
    got = _stream_buckets(spark, tmp_path, writes, "vpin_s2")
    assert got == _batch_completed(spark, rows) and len(got) > 0


@pytest.mark.slow
def test_stream_equals_batch_sf001_replay(spark, tmp_path):
    ev = load(spark, "/root/testdata/sf0.01", "events")
    rows_df = ev.selectExpr("event_type AS key", "ts",
                            "event_id AS seq", "value AS v")
    src = str(tmp_path / "vpin_sf001")
    rows_df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = vpin_bucket_stream(stream, "key", "ts", "seq", "v",
                             bucket_vol=micro3.VPIN_BUCKET_VOL)
    q = (out.writeStream.format("memory").queryName("vpin_sf001")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.table("vpin_sf001").collect())
    finally:
        q.stop()
    b = micro3.vpin_buckets(ev, "value", ["event_type"],
                            ["ts", "event_id"])
    want = sorted(
        (r["event_type"], r["__bkt"], r["__buy"], r["__sell"])
        for r in b.filter(F.col("__bkt") != F.col("__last")).collect())
    assert got == want and len(got) > 50

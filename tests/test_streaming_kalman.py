"""Streaming Kalman local-level filter: rows emitted across an
in-order micro-batch replay must equal the batch
``stats3.kalman_level`` output bit for bit (same fold, O(1) state)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.stats3 import (
    kalman_level,
)
from datafusion_functions_financial_spark.sources.tables import load
from datafusion_functions_financial_spark.streaming import kalman

SF001 = "/root/testdata/sf0.001"
N_REPLAY_FILES = 4


def _ticks(spark, sf=SF001):
    return load(spark, sf, "events").selectExpr(
        "event_type AS key", "ts", "event_id AS seq",
        "value")


def _batch_levels(spark, sf=SF001):
    ev = load(spark, sf, "events")
    out = kalman_level(ev, "value", "event_type", ["ts", "event_id"])
    return {
        (r["event_type"], r["event_id"]): r["level"]
        for r in out.collect()
    }


@pytest.mark.slow
def test_single_batch_stream_equals_batch(spark, tmp_path):
    ticks = _ticks(spark)
    pdf = ticks.toPandas().sort_values(["ts", "seq"]).reset_index(
        drop=True)
    src = tmp_path / "kal_one"
    src.mkdir()
    spark.createDataFrame(
        pdf, schema="key string, ts long, seq long, value double"
    ).coalesce(1).write.parquet(str(src / "f=0"))
    stream = (
        spark.readStream
        .schema("key string, ts long, seq long, value double")
        .parquet(str(src))
    )
    q = (
        kalman.kalman_level_stream(stream, "key", "ts", "seq", "value")
        .writeStream.format("memory").queryName("kal_one")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    q.awaitTermination(240)
    got = {(r["key"], r["seq"]): r["level"]
           for r in spark.table("kal_one").collect()}
    assert got == _batch_levels(spark)


@pytest.mark.slow
def test_replay_across_microbatches_equals_batch(spark, tmp_path):
    ticks = _ticks(spark)
    pdf = ticks.toPandas().sort_values(["ts", "seq"]).reset_index(
        drop=True)
    src = tmp_path / "kal_many"
    src.mkdir()
    n = len(pdf)
    for i in range(N_REPLAY_FILES):
        sl = pdf.iloc[i * n // N_REPLAY_FILES:
                      (i + 1) * n // N_REPLAY_FILES]
        spark.createDataFrame(
            sl, schema="key string, ts long, seq long, value double"
        ).coalesce(1).write.parquet(str(src / f"f={i}"))
    stream = (
        spark.readStream
        .schema("key string, ts long, seq long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        kalman.kalman_level_stream(stream, "key", "ts", "seq", "value")
        .writeStream.format("memory").queryName("kal_many")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(240)
    got = {(r["key"], r["seq"]): r["level"]
           for r in spark.table("kal_many").collect()}
    assert got == _batch_levels(spark)

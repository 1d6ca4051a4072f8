"""Streaming HLL cardinality: the streaming register state must equal
the batch sketch over the same data — replay-exact, incrementally
maintained, bounded."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import sketch
from datafusion_functions_financial_spark.streaming import cardinality

SCHEMA = "user_id long, event_type string"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append").parquet(path)


@pytest.fixture()
def stream_dir(tmp_path):
    return str(tmp_path / "stream_src")


def _start(spark, src, name):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    reg = cardinality.hll_register_stream(stream, "user_id",
                                          ("event_type",))
    return (
        reg.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
    )


@pytest.mark.slow
def test_streaming_equals_batch_and_updates(spark, stream_dir):
    rows1 = [(i % 37, "view") for i in range(200)] + \
            [(i % 11, "click") for i in range(50)]
    _write_batch(spark, stream_dir, rows1)
    q = _start(spark, stream_dir, "hll_stream_t1")
    try:
        q.processAllAvailable()
        got1 = cardinality.estimate_from_registers(
            spark.table("hll_stream_t1"), ("event_type",)
        ).collect()
        batch1 = sketch.hll_estimate(
            spark.createDataFrame(rows1, SCHEMA), "user_id",
            ("event_type",)).collect()
        assert {tuple(r) for r in got1} == {tuple(r) for r in batch1}

        # Second micro-batch: state updates incrementally and still
        # matches a full batch recompute over ALL data.
        rows2 = [(1000 + i, "view") for i in range(100)]
        _write_batch(spark, stream_dir, rows2)
        q.processAllAvailable()
        got2 = cardinality.estimate_from_registers(
            spark.table("hll_stream_t1"), ("event_type",)
        ).collect()
        batch2 = sketch.hll_estimate(
            spark.createDataFrame(rows1 + rows2, SCHEMA), "user_id",
            ("event_type",)).collect()
        assert {tuple(r) for r in got2} == {tuple(r) for r in batch2}
    finally:
        q.stop()


@pytest.mark.slow
def test_state_is_bounded_by_register_count(spark, stream_dir):
    # 5000 distinct users -> register table still <= M rows per group.
    _write_batch(spark, stream_dir, [(i, "view") for i in range(5000)])
    q = _start(spark, stream_dir, "hll_stream_t2")
    try:
        q.processAllAvailable()
        n = spark.table("hll_stream_t2").count()
        assert n <= sketch.M
    finally:
        q.stop()


@pytest.mark.slow
def test_stream_sketch_merges_with_batch_shard(spark, stream_dir):
    live = [(i, "view") for i in range(300)]
    hist = [(i + 150, "view") for i in range(300)]  # overlapping shard
    _write_batch(spark, stream_dir, live)
    q = _start(spark, stream_dir, "hll_stream_t3")
    try:
        q.processAllAvailable()
        merged = cardinality.merge_registers(
            spark.table("hll_stream_t3"),
            sketch.hll_registers(
                spark.createDataFrame(hist, SCHEMA), "user_id",
                ("event_type",)),
        )
        est = cardinality.estimate_from_registers(
            merged, ("event_type",)).collect()
        full = sketch.hll_estimate(
            spark.createDataFrame(live + hist, SCHEMA), "user_id",
            ("event_type",)).collect()
        assert {tuple(r) for r in est} == {tuple(r) for r in full}
    finally:
        q.stop()


def test_batch_df_rejected(spark):
    df = spark.createDataFrame([(1, "view")], SCHEMA)
    with pytest.raises(ValueError):
        cardinality.hll_register_stream(df, "user_id")

"""Streaming Count-Min heavy hitters: the streaming cell state must
equal the batch sketch over the same data (replay-exact), update
incrementally across micro-batches, stay bounded, and merge with
batch shards — plus an sf0.01 real-data replay."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import sketch2
from datafusion_functions_financial_spark.sources.tables import load
from datafusion_functions_financial_spark.streaming import heavyhitters

SCHEMA = "user_id long, event_type string"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append").parquet(path)


def _start(spark, src, name):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    cells = heavyhitters.cms_cell_stream(stream, "user_id")
    return (
        cells.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
    )


def _cells(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_stream_equals_batch_and_updates(spark, tmp_path):
    src = str(tmp_path / "cms_src")
    rows1 = [(i % 13, "view") for i in range(300)]
    _write(spark, src, rows1)
    q = _start(spark, src, "cms_stream_t1")
    try:
        q.processAllAvailable()
        got1 = _cells(spark.table("cms_stream_t1"))
        batch1 = _cells(sketch2.cms_build(
            spark.createDataFrame(rows1, SCHEMA), "user_id"))
        assert got1 == batch1 and len(got1) > 0

        rows2 = [(7, "view")] * 50 + [(999, "view")] * 5
        _write(spark, src, rows2)
        q.processAllAvailable()
        got2 = _cells(spark.table("cms_stream_t1"))
        batch2 = _cells(sketch2.cms_build(
            spark.createDataFrame(rows1 + rows2, SCHEMA), "user_id"))
        assert got2 == batch2
    finally:
        q.stop()


@pytest.mark.slow
def test_state_bounded_by_cell_count(spark, tmp_path):
    src = str(tmp_path / "cms_bound")
    _write(spark, src, [(i, "view") for i in range(5000)])
    q = _start(spark, src, "cms_stream_bound")
    try:
        q.processAllAvailable()
        n = spark.table("cms_stream_bound").count()
        assert n <= sketch2.CMS_D * sketch2.CMS_W
    finally:
        q.stop()


@pytest.mark.slow
def test_stream_cells_merge_with_batch_shard(spark, tmp_path):
    src = str(tmp_path / "cms_merge")
    live = [(i % 7, "view") for i in range(100)]
    hist = [(i % 5, "view") for i in range(200)]
    _write(spark, src, live)
    q = _start(spark, src, "cms_stream_m")
    try:
        q.processAllAvailable()
        merged = sketch2.cms_merge(
            spark.table("cms_stream_m"),
            sketch2.cms_build(spark.createDataFrame(hist, SCHEMA),
                              "user_id"),
        )
        full = sketch2.cms_build(
            spark.createDataFrame(live + hist, SCHEMA), "user_id")
        assert _cells(merged) == _cells(full)
    finally:
        q.stop()


@pytest.mark.slow
def test_sf001_replay_estimates_match_batch(spark, tmp_path):
    """Real-data replay: streamed CMS estimates for every user equal
    the batch sketch's estimates on sf0.01 events."""
    ev = load(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", "event_type")
    src = str(tmp_path / "cms_sf001")
    ev.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (heavyhitters.cms_cell_stream(stream, "user_id")
         .writeStream.format("memory").queryName("cms_sf001")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(300)

    probes = ev.select("user_id").distinct()
    got = sketch2.cms_estimate(
        spark.table("cms_sf001"), probes, "user_id")
    batch = sketch2.cms_estimate(
        sketch2.cms_build(ev, "user_id"), probes, "user_id")
    assert (sorted(tuple(r) for r in got.collect())
            == sorted(tuple(r) for r in batch.collect()))


@pytest.mark.slow
def test_checkpoint_restart_preserves_cells(spark, tmp_path):
    """A restarted CMS stream resumes from its state store: cells after
    restart equal the batch sketch over ALL data, with no double count
    of the pre-restart batches."""
    src = str(tmp_path / "cms_ckpt_src")
    ckpt = str(tmp_path / "cms_ckpt")
    out_name = "cms_ckpt_sink"
    rows1 = [(i % 11, "view") for i in range(150)]
    _write(spark, src, rows1)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        cells = heavyhitters.cms_cell_stream(stream, "user_id")
        return (
            cells.writeStream.format("memory").queryName(out_name)
            .option("checkpointLocation", ckpt)
            .outputMode("complete").trigger(availableNow=True).start()
        )

    q = run()
    q.awaitTermination(120)
    rows2 = [(7, "view")] * 40 + [(555, "view")] * 3
    _write(spark, src, rows2)
    q2 = run()  # restart from checkpoint
    q2.awaitTermination(120)

    got = _cells(spark.table(out_name))
    batch = _cells(sketch2.cms_build(
        spark.createDataFrame(rows1 + rows2, SCHEMA), "user_id"))
    assert got == batch

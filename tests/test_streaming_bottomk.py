"""Streaming bottom-k: the final per-key emission of a replayed
sf0.01 event stream must equal the batch KMV sketch aggregate
(n_kept, kth_hash) exactly — the merge identity applied to
micro-batches — under an order-scrambled replay."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.sketch4 import (
    bottomk_sketch,
)
from datafusion_functions_financial_spark.sources.tables import load
from datafusion_functions_financial_spark.streaming.bottomk import (
    bottomk_stream,
)

SF001 = "/root/testdata/sf0.01"
N_REPLAY_FILES = 4
K = 64

_SCHEMA = "event_type string, user_id long"


def test_bottomk_stream_rejects_batch_frames(spark):
    df = load(spark, SF001, "events").select("event_type", "user_id")
    with pytest.raises(ValueError):
        bottomk_stream(df, "event_type", "user_id", k=K)


@pytest.mark.slow
def test_bottomk_stream_replay_equals_batch(spark, tmp_path):
    ev = load(spark, SF001, "events").select("event_type", "user_id")
    # scramble arrival order: sort by a hash of the row id
    pdf = ev.toPandas()
    pdf = pdf.sample(frac=1.0, random_state=13).reset_index(drop=True)
    src = tmp_path / "events_stream"
    src.mkdir()
    n = len(pdf)
    for i in range(N_REPLAY_FILES):
        sl = pdf.iloc[i * n // N_REPLAY_FILES:
                      (i + 1) * n // N_REPLAY_FILES]
        spark.createDataFrame(sl, schema=_SCHEMA).coalesce(1) \
            .write.parquet(str(src / f"f={i}"))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        bottomk_stream(stream, "event_type", "user_id", k=K)
        .writeStream.format("memory").queryName("bk_state")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(240)

    # latest emission per key (monotone n_kept; kth_hash only shrinks)
    sink = spark.table("bk_state").toPandas()
    last = sink.groupby("key").last()

    batch = (
        bottomk_sketch(ev, "event_type", "user_id", k=K)
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.max(F.expr(f"CASE WHEN __rk = {K} THEN __h END"))
             .alias("kth_hash"))
        .collect()
    )
    assert len(batch) > 0
    for r in batch:
        got = last.loc[r["__key"]]
        assert int(got["n_kept"]) == r["n_kept"], r["__key"]
        if r["kth_hash"] is not None:
            assert int(got["kth_hash"]) == r["kth_hash"], r["__key"]

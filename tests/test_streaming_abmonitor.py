"""Streaming SRM monitor: replayed sf0.01 events accumulate exactly
the batch arm counts, and the scored SRM equals the batch operator's
row bit-for-bit."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.abtest import (
    srm_check,
)
from datafusion_functions_financial_spark.sources.tables import load
from datafusion_functions_financial_spark.streaming.abmonitor import (
    arm_counts_stream, score_srm,
)

SF001 = "/root/testdata/sf0.01"
N_REPLAY_FILES = 4
_SCHEMA = "user_id long"


def test_abmonitor_rejects_batch_frames(spark):
    df = load(spark, SF001, "events").select("user_id")
    with pytest.raises(ValueError):
        arm_counts_stream(df, "user_id % 2")


@pytest.mark.slow
def test_abmonitor_replay_equals_batch(spark, tmp_path):
    ev = load(spark, SF001, "events").select("user_id")
    pdf = ev.toPandas().sample(frac=1.0, random_state=3).reset_index(
        drop=True)
    src = tmp_path / "arm_stream"
    src.mkdir()
    n = len(pdf)
    for i in range(N_REPLAY_FILES):
        sl = pdf.iloc[i * n // N_REPLAY_FILES:
                      (i + 1) * n // N_REPLAY_FILES]
        spark.createDataFrame(sl, schema=_SCHEMA).coalesce(1) \
            .write.parquet(str(src / f"f={i}"))
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = (
        arm_counts_stream(stream, "user_id % 2")
        .writeStream.format("memory").queryName("arm_counts")
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(240)
    got = score_srm(spark.table("arm_counts")).collect()[0]
    want = srm_check(
        load(spark, SF001, "events"), "user_id % 2").collect()[0]
    assert got.asDict() == want.asDict()

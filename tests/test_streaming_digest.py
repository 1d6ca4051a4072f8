"""Streaming Merkle digest: a replayed sf0.01 orders stream (split
into files, one per trigger) must accumulate EXACTLY the batch digest
relation — bitwise, and digest_compare between the stream's sink
contents and the batch relation must be empty."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.digest import (
    _SIG_SPARK, bucket_digests, digest_compare,
)
from datafusion_functions_financial_spark.sources.tables import load
from datafusion_functions_financial_spark.streaming.digest import (
    digest_stream,
)

SF001 = "/root/testdata/sf0.01"
N_REPLAY_FILES = 4

_SCHEMA = ("o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, "
           "o_orderpriority string")


def test_digest_stream_rejects_batch_frames(spark):
    df = load(spark, SF001, "orders")
    with pytest.raises(ValueError):
        digest_stream(df, "o_orderkey", _SIG_SPARK)


@pytest.mark.slow
def test_digest_stream_replay_equals_batch(spark, tmp_path):
    orders = load(spark, SF001, "orders")
    pdf = orders.toPandas().sort_values("o_orderkey").reset_index(
        drop=True)
    src = tmp_path / "orders_stream"
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
        digest_stream(stream, "o_orderkey", _SIG_SPARK)
        .writeStream.format("memory").queryName("digest_state")
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(240)

    got = spark.table("digest_state")
    want = bucket_digests(orders, "o_orderkey", _SIG_SPARK)

    def norm(df):
        return sorted((r.bucket, r.n_rows, r.digest, r.digest2)
                      for r in df.collect())

    assert norm(got) == norm(want)
    assert digest_compare(got, want).count() == 0

    # and a corrupted batch twin is detected from the sink contents
    corrupt = bucket_digests(
        orders.withColumn("o_totalprice",
                          F.expr("o_totalprice + 0.01")),
        "o_orderkey", _SIG_SPARK)
    assert digest_compare(got, corrupt).count() > 0

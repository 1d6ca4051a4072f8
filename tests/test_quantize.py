"""Int8 quantization: bounds, reconstruction, recall, plan shape."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.quantize import (
    QMAX,
    knn_quantized,
    quantize_int8,
)
from datafusion_functions_financial_spark.operators.similarity import (
    cosine_topk,
)
from datafusion_functions_financial_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_DIR, "embeddings")


def test_components_bounded(emb):
    over = quantize_int8(emb).selectExpr(
        "exists(qvec, x -> abs(x) > 127) AS bad"
    ).filter("bad").count()
    assert over == 0


def test_zero_vector_quantizes_to_zeros(spark):
    z = spark.createDataFrame(
        [(1, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    row = quantize_int8(z).collect()[0]
    assert row.scale == 0.0
    assert all(x == 0 for x in row.qvec)


def test_reconstruction_error_bounded(emb):
    # |v_i - q_i * scale| <= scale / 2 by symmetric rounding.
    bad = (
        quantize_int8(emb)
        .join(emb, "vec_id")
        .selectExpr(
            "exists(zip_with(embedding, qvec, (x, y) -> "
            "abs(CAST(x AS DOUBLE) - y * scale) > scale / 2 + 1e-12), "
            "b -> b) AS bad"
        )
        .filter("bad")
        .count()
    )
    assert bad == 0


def test_quantized_knn_recall_vs_float(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.n_id) for r in cosine_topk(emb, queries, k=10).collect()
    }
    quant = {
        (r.q_id, r.n_id)
        for r in knn_quantized(emb, queries, k=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, recall


def test_plan_broadcast_no_shuffle_of_corpus(emb):
    plan = knn_quantized(
        emb, emb.filter(F.col("vec_id") < 10)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

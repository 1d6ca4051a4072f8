"""The Arrow (vectorized numpy) LSH bucket path must be bit-identical
to the Catalyst higher-order-fold path: same LCG planes, same
per-dimension accumulation order, same '0'/'1' bucket strings —
``use_arrow=True`` is a pure physical-plan choice (the 100 TB scan
shape the ANN scale bench measures)."""

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.similarity import (
    N_QUERIES, cosine_topk_lsh, lsh_buckets,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_arrow_buckets_equal_catalyst(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cat = _rows(lsh_buckets(emb), ["vec_id", "bucket"])
    arw = _rows(lsh_buckets(emb, use_arrow=True), ["vec_id", "bucket"])
    assert arw == cat and len(cat) > 0


def test_arrow_topk_equal_catalyst(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    cols = ["q_id", "n_id", "rank", "cos_sim"]
    cat = _rows(cosine_topk_lsh(emb, qs), cols)
    arw = _rows(cosine_topk_lsh(emb, qs, use_arrow=True), cols)
    assert arw == cat and len(cat) > 0

"""Composed corpus-curation pipeline invariants (the oracle-parity
gate covers value correctness; these check structural contracts)."""

import pytest

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import dedup, pipeline
from datafusion_functions_financial_spark.sources.tables import load


@pytest.mark.slow
def test_survivors_are_filtered_and_exact_deduped(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = pipeline.clean_corpus(docs).cache()
    n = out.count()
    assert n > 0
    # Quality/tokens floors hold.
    assert out.filter(
        (F.col("n_tokens") < pipeline.MIN_TOKENS)
        | (F.col("quality_score") < pipeline.MIN_QUALITY)
    ).count() == 0
    # No two survivors share a normalized text (exact dedup ran).
    norm = dedup._NORM_SPARK.format(t="text")
    joined = out.join(docs, "doc_id").selectExpr(f"md5({norm}) AS h")
    assert joined.distinct().count() == n
    # Cluster labels are closed over the survivor set and canonical
    # docs are their own labels.
    kept = out.filter("is_kept")
    assert kept.filter(F.col("doc_id") != F.col("cluster_id")).count() == 0
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    labels = {r.cluster_id for r in out.select("cluster_id").collect()}
    assert labels <= ids


@pytest.mark.slow
def test_every_cluster_has_exactly_one_canonical(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = pipeline.clean_corpus(docs)
    per = (out.groupBy("cluster_id")
           .agg(F.sum(F.col("is_kept").cast("int")).alias("k")))
    assert per.filter(F.col("k") != 1).count() == 0

"""Behavioral tests for distributional scores (operators/divergence.py)."""

import math

import pytest

from datafusion_functions_financial_spark.operators.divergence import (
    kl_vs_corpus,
    token_entropy,
)


def _docs(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_entropy_degenerate_doc_is_zero(spark):
    out = token_entropy(_docs(spark, ["spam spam spam spam"]))
    assert out.collect()[0].entropy == 0.0


def test_entropy_uniform_doc(spark):
    out = token_entropy(_docs(spark, ["a b c d"]))
    assert out.collect()[0].entropy == pytest.approx(math.log(4), abs=1e-4)


def test_kl_identical_to_corpus_is_zero(spark):
    # both docs share the corpus distribution exactly -> KL = 0
    out = kl_vs_corpus(_docs(spark, ["a b", "a b"]))
    assert all(r.kl == 0.0 for r in out.collect())


def test_kl_outlier_doc_scores_higher(spark):
    texts = ["common words here"] * 9 + ["zebra quux xylophone"]
    out = {r.doc_id: r.kl for r in kl_vs_corpus(_docs(spark, texts)).collect()}
    assert out[9] > out[0]
    assert out[9] == pytest.approx(math.log(10), abs=1e-3)  # q=1/3, p=1/30


def test_corpus_join_is_broadcast(spark):
    plan = (
        kl_vs_corpus(_docs(spark, ["a b", "b c"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan

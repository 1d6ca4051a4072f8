"""Behavioral tests for BM25 retrieval (operators/bm25.py)."""

import math

import pytest

from datafusion_functions_financial_spark.operators.bm25 import (
    bm25_topk,
    doc_lengths,
)


def _corpus(spark):
    rows = [
        (1, "spark shuffle join window"),
        (2, "spark spark spark streaming"),
        (3, "completely unrelated words here"),
        (4, "join order and shuffle partitions"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, items):
    return spark.createDataFrame(items, "query_id long, query_text string")


def test_doc_lengths(spark):
    got = {r.doc_id: r.dl for r in doc_lengths(_corpus(spark)).collect()}
    assert got == {1: 4, 2: 4, 3: 4, 4: 5}


def test_unmatched_docs_never_scored(spark):
    out = bm25_topk(_corpus(spark), _queries(spark, [(10, "spark")]), k=10)
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 2}  # docs 3 and 4 share no term with the query


def test_tf_saturation_ranks_repeated_term_higher(spark):
    out = bm25_topk(_corpus(spark), _queries(spark, [(10, "spark")]), k=2)
    ranked = [r.doc_id for r in out.orderBy("rank").collect()]
    assert ranked == [2, 1]  # tf=3 beats tf=1 at equal dl


def test_multi_term_scores_sum(spark):
    out = bm25_topk(_corpus(spark),
                    _queries(spark, [(10, "shuffle join")]), k=10)
    rows = {r.doc_id: r.score for r in out.collect()}
    # docs 1 and 4 each contain both terms; both must be scored
    assert set(rows) == {1, 4}
    assert all(s > 0 for s in rows.values())


@pytest.mark.slow
def test_query_tf_clamped_to_one(spark):
    once = bm25_topk(_corpus(spark), _queries(spark, [(10, "spark")]), k=10)
    twice = bm25_topk(_corpus(spark),
                      _queries(spark, [(10, "spark spark")]), k=10)
    a = {(r.doc_id, r.score) for r in once.collect()}
    b = {(r.doc_id, r.score) for r in twice.collect()}
    assert a == b


def test_idf_formula(spark):
    # single-doc corpus: idf = ln(1 + (1 - 1 + .5)/(1 + .5)) = ln(4/3)
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    out = bm25_topk(docs, _queries(spark, [(10, "x")]), k=1,
                    k1=1.2, b=0.75).collect()
    # dl == avgdl so the length norm is 1; tf=1 -> (1*2.2)/(1+1.2)
    expected = math.log(4.0 / 3.0) * 2.2 / 2.2
    assert out[0].score == pytest.approx(expected, abs=1e-4)


def test_terms_join_is_broadcast(spark):
    plan = (
        bm25_topk(_corpus(spark), _queries(spark, [(10, "spark")]), k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan

"""TF-IDF / document-frequency semantics and plan shape."""

import math

import pytest

from datafusion_functions_financial_spark.operators.tfidf import (
    document_frequency,
    term_counts,
    tfidf_topk,
)
from datafusion_functions_financial_spark.plans.series import ROUND_DP


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry"),
            (3, "apple durian"),
            (4, ""),  # empty doc: no tokens at all
        ],
        "doc_id long, text string",
    )


def test_term_counts(corpus):
    got = {
        (r.doc_id, r.term): r.tf for r in term_counts(corpus).collect()
    }
    assert got[(1, "apple")] == 2
    assert got[(2, "cherry")] == 2
    assert (4, "") not in got  # empty docs contribute nothing


def test_document_frequency(corpus):
    got = dict(document_frequency(corpus).collect())
    assert got == {"apple": 2, "banana": 2, "cherry": 2, "durian": 1}


def test_tfidf_ranking_and_score(corpus):
    rows = tfidf_topk(corpus, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.score))
    # doc 3: durian df=1 (idf=ln 4), apple df=2 (idf=ln 2) -> durian first.
    assert [t for _, t, _ in sorted(by_doc[3])] == ["durian", "apple"]
    durian_score = sorted(by_doc[3])[0][2]
    assert durian_score == pytest.approx(round(math.log(4 / 1), ROUND_DP))
    # empty doc emits no rows
    assert 4 not in by_doc


def test_tfidf_tie_breaks_on_term(spark):
    df = spark.createDataFrame(
        [(1, "zebra yak zebra yak"), (2, "zebra"), (3, "yak")],
        "doc_id long, text string",
    )
    # In doc 1 both terms have tf=2, df=2 -> identical scores; term
    # ascending puts yak first.
    rows = sorted(
        (r.rank, r.term)
        for r in tfidf_topk(df, k=2).filter("doc_id = 1").collect()
    )
    assert rows == [(1, "yak"), (2, "zebra")]


def test_vocab_join_is_broadcast(corpus):
    plan = tfidf_topk(corpus)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

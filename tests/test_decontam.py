"""Benchmark n-gram decontamination: semantics + plan shape."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.decontam import (
    benchmark_ngrams,
    contamination_report,
    decontaminate,
    doc_ngrams,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick brown fox appears"),      # shares "quick brown fox"
            (3, "totally unrelated words here now"),
            (4, "short doc"),                      # < n tokens -> no grams
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, "we saw the quick brown fox yesterday")],
        "doc_id long, text string",
    )


def test_doc_ngrams_counts_and_short_doc(corpus):
    grams = doc_ngrams(corpus, n=3)
    per_doc = dict(
        grams.groupBy("doc_id").count().collect()
    )
    # len(tokens) - n + 1 grams per doc; doc 4 has 2 tokens -> none.
    assert per_doc == {1: 7, 2: 3, 3: 3}


def test_ngrams_lowercased(spark):
    df = spark.createDataFrame([(1, "The Quick BROWN fox")],
                               "doc_id long, text string")
    got = {r.gram for r in doc_ngrams(df, n=4).collect()}
    assert got == {"the quick brown fox"}


def test_contamination_report(corpus, bench):
    rows = {
        r.doc_id: (r.n_hit_grams, r.n_hits)
        for r in contamination_report(corpus, bench, n=3).collect()
    }
    # doc 1 contains "the quick brown", "quick brown fox";
    # doc 2 contains "quick brown fox"; docs 3/4 are clean.
    assert rows == {1: (2, 2), 2: (1, 1)}


def test_decontaminate_drops_hit_docs(corpus, bench):
    kept = sorted(
        r.doc_id for r in decontaminate(corpus, bench, n=3).collect()
    )
    assert kept == [3, 4]
    # Full rows survive (not just ids).
    assert decontaminate(corpus, bench, n=3).columns == ["doc_id", "text"]


def test_benchmark_ngrams_distinct(spark):
    b = spark.createDataFrame(
        [(1, "x y z x y z x y z")], "doc_id long, text string"
    )
    assert benchmark_ngrams(b, n=3).count() == 3  # xyz, yzx, zxy


def test_plan_broadcast_no_extra_shuffle(corpus, bench):
    # Membership join must be broadcast on both paths.
    report_plan = contamination_report(
        corpus, bench, n=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in report_plan
    clean_plan = decontaminate(
        corpus, bench, n=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in clean_plan
    assert "SortMergeJoin" not in clean_plan
    # Anti-join path: no shuffle of the corpus side at all — every
    # Exchange in the plan must feed a broadcast, not repartition docs.
    assert "ShuffledHashJoin" not in clean_plan

"""Incremental shard-vs-corpus dedup: semantics, consistency with the
batch path, and plan shape."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from datafusion_functions_financial_spark.operators.incremental import (
    build_minhash_index,
    content_hash_index,
    exact_dup_shard_docs,
    incremental_neardup_pairs,
    new_shard_docs,
)
from datafusion_functions_financial_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "completely different content entirely"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def shard(spark):
    return spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),   # verbatim of 1
            (11, "brand new never seen before document"),
            (12, "one two three four five six seven"),     # verbatim of 2
        ],
        "doc_id long, text string",
    )


def test_exact_dup_and_new_split(corpus, shard):
    idx = content_hash_index(corpus)
    dups = {
        r.shard_id: r.corpus_id
        for r in exact_dup_shard_docs(shard, idx).collect()
    }
    assert dups == {10: 1, 12: 2}
    fresh = [r.doc_id for r in new_shard_docs(shard, idx).collect()]
    assert fresh == [11]


def test_exact_dup_picks_min_corpus_id(spark, shard):
    # Two verbatim copies in the corpus -> deterministic min id.
    corpus2 = spark.createDataFrame(
        [(5, "alpha beta gamma delta epsilon zeta"),
         (4, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    dups = {
        r.shard_id: r.corpus_id
        for r in exact_dup_shard_docs(shard, content_hash_index(corpus2))
        .collect()
    }
    assert dups[10] == 4


@pytest.mark.slow
def test_incremental_matches_batch_decision(spark):
    """Screening a shard against the rest-of-corpus index must find
    exactly the cross-split pairs the batch LSH path finds."""
    docs = load(spark, SF_DIR, "documents")
    batch = minhash_lsh_pairs(docs)
    cross = [
        (r.id_a, r.id_b)
        for r in batch.collect()
        if (r.id_a % 5 == 0) != (r.id_b % 5 == 0)
    ]
    # Normalize batch pairs to (shard_id, corpus_id).
    expected = {(a, b) if a % 5 == 0 else (b, a) for (a, b) in cross}
    idx = build_minhash_index(docs.filter("doc_id % 5 != 0"))
    got = {
        (r.shard_id, r.corpus_id)
        for r in incremental_neardup_pairs(
            docs.filter("doc_id % 5 = 0"), idx
        ).collect()
    }
    assert got == expected


def test_index_schema_is_persistable(corpus, tmp_path):
    idx = build_minhash_index(corpus)
    path = str(tmp_path / "mh_index")
    idx.write.parquet(path)
    back = corpus.sparkSession.read.parquet(path)
    assert set(idx.columns) == set(back.columns)
    assert back.count() == 3


def test_no_cartesian_in_plan(corpus, shard):
    plan = incremental_neardup_pairs(
        shard, build_minhash_index(corpus)
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

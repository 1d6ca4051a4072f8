"""Deterministic splitting/sampling: stability, disjointness,
proportions, and subset-invariance (the properties random sampling
cannot give a reproducible pipeline)."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import sampling
from datafusion_functions_financial_spark.sources.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


def test_split_exhaustive_and_proportional(docs):
    out = sampling.hash_split(docs, {"train": 0.9, "val": 0.05,
                                     "test": 0.05})
    n = docs.count()
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == n          # exhaustive, disjoint
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] / n == pytest.approx(0.9, abs=0.05)


def test_split_is_stable_under_subsetting(docs):
    """A document's split must not depend on which other rows exist —
    the property that makes the assignment reproducible as the corpus
    grows."""
    full = dict(
        (r.doc_id, r.split)
        for r in sampling.hash_split(docs, {"a": 0.5, "b": 0.5})
        .select("doc_id", "split").collect()
    )
    sub = sampling.hash_split(docs.filter("doc_id % 3 = 0"),
                              {"a": 0.5, "b": 0.5})
    for r in sub.select("doc_id", "split").collect():
        assert full[r.doc_id] == r.split


def test_sample_is_monotone_in_fraction(docs):
    small = {r.doc_id for r in sampling.hash_sample(docs, 0.2)
             .select("doc_id").collect()}
    big = {r.doc_id for r in sampling.hash_sample(docs, 0.5)
           .select("doc_id").collect()}
    assert small <= big                      # nested samples
    n = docs.count()
    assert len(small) / n == pytest.approx(0.2, abs=0.07)


def test_split_fraction_validation(docs):
    with pytest.raises(ValueError):
        sampling.hash_split(docs, {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        sampling.hash_sample(docs, 1.5)


def test_no_shuffle_plan(docs):
    out = sampling.hash_split(docs, {"a": 0.5, "b": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan            # scan -> project only

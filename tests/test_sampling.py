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


def test_mix_to_proportions_hits_targets(docs):
    out = sampling.mix_to_proportions(
        docs, {"en": 0.5, "fr": 0.25, "de": 0.25}, strata_col="lang"
    )
    got = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    total = sum(got.values())
    # The binding stratum is kept whole; proportions approach targets
    # within hash-sampling noise on these small strata.
    assert set(got) == {"en", "fr", "de"}
    assert got["en"] / total == pytest.approx(0.5, abs=0.12)
    assert got["fr"] / total == pytest.approx(0.25, abs=0.12)


def test_mix_binding_stratum_kept_whole(docs):
    # With weight ~ count the scarcest-relative stratum keeps 100%.
    counts = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    out = sampling.mix_to_proportions(
        docs, {"en": 1000.0, "zh": 0.001}, strata_col="lang"
    )
    got = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    assert got["en"] == counts["en"]         # en is binding at this weight


def test_mix_validation(docs):
    with pytest.raises(ValueError):
        sampling.mix_to_proportions(docs, {"en": -1.0}, strata_col="lang")
    with pytest.raises(ValueError):
        sampling.mix_to_proportions(docs, {"en": 0.0}, strata_col="lang")
    with pytest.raises(ValueError):
        sampling.mix_to_proportions(
            docs, {"klingon": 1.0}, strata_col="lang")


def test_sample_k_per_group_exact_k_and_stable(docs):
    out = sampling.sample_k_per_group(docs, 5, group_col="lang")
    sizes = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    assert all(v == 5 for v in sizes.values())
    # Re-running (and repartitioning the input) returns the same rows.
    again = sampling.sample_k_per_group(
        docs.repartition(7), 5, group_col="lang"
    )
    assert {r.doc_id for r in out.collect()} == \
        {r.doc_id for r in again.collect()}

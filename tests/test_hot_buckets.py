"""Hot-bucket capping (LSH skew hardening).

A band bucket of m members emits m*(m-1)/2 candidate pairs; one
boilerplate bucket can dominate the whole candidate join at scale.
``max_bucket_size`` excludes over-cap buckets from candidate
generation in both MinHash LSH (dedup) and embedding near-dup
(similarity). Contract:

- cap >= largest bucket  -> output identical to the uncapped run;
- tiny cap              -> output is a SUBSET (never new pairs), and
  pairs whose every shared bucket is hot disappear while pairs living
  in small buckets survive.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import dedup, similarity


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def skew_docs(spark):
    """40 identical boilerplate docs (one giant bucket in every band)
    plus one near-dup pair of distinctive docs (small buckets)."""
    boiler = "terms of service apply to all users of this website " * 4
    a = ("the quick brown fox jumps over the lazy dog while the cat "
         "watches from the warm windowsill in the afternoon sun")
    b = ("the quick brown fox jumps over the lazy dog while the cat "
         "watches from the warm windowsill in the afternoon fog")
    rows = [(i, boiler) for i in range(40)] + [(100, a), (101, b)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


@pytest.mark.slow
def test_minhash_cap_noop_when_large(spark, skew_docs):
    base = _rows(dedup.minhash_lsh_pairs(skew_docs),
                 ["id_a", "id_b"])
    capped = _rows(dedup.minhash_lsh_pairs(skew_docs, max_bucket_size=1000),
                   ["id_a", "id_b"])
    assert capped == base and len(base) > 0


def test_minhash_cap_drops_hot_keeps_cold(spark, skew_docs):
    base = set(_rows(dedup.minhash_lsh_pairs(skew_docs),
                     ["id_a", "id_b"]))
    # boilerplate pairs present uncapped, plus the distinctive pair
    assert (0, 1) in base and (100, 101) in base
    capped = set(_rows(dedup.minhash_lsh_pairs(skew_docs,
                                               max_bucket_size=10),
                       ["id_a", "id_b"]))
    assert capped <= base
    assert (100, 101) in capped          # small-bucket pair survives
    assert not any(a < 40 and b < 40 for a, b in capped)  # hot dropped


@pytest.mark.slow
def test_neardup_cap_noop_when_large(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = _rows(similarity.embedding_neardup_pairs(emb),
                 ["id_a", "id_b"])
    capped = _rows(
        similarity.embedding_neardup_pairs(emb, max_bucket_size=10**6),
        ["id_a", "id_b"])
    assert capped == base and len(base) > 0


@pytest.mark.slow
def test_neardup_tiny_cap_is_subset(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = set(_rows(similarity.embedding_neardup_pairs(emb),
                     ["id_a", "id_b"]))
    capped = set(_rows(
        similarity.embedding_neardup_pairs(emb, max_bucket_size=25),
        ["id_a", "id_b"]))
    assert capped <= base and len(capped) < len(base)

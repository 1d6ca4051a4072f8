"""TF-IDF cosine near-dup join: hand-verifiable cosines, blocking
contract (rare terms in [2, df_cap] only), and plan guards."""

import math

import numpy as np
import pytest


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _naive_cosine(texts, a, b):
    from collections import Counter
    toks = [t.lower().split() for t in texts]
    n = len(texts)
    dfreq = Counter()
    for ts in toks:
        for term in set(ts):
            dfreq[term] += 1

    def vec(i):
        tf = Counter(toks[i])
        return {t: c * math.log(n / dfreq[t]) for t, c in tf.items()}

    va, vb = vec(a), vec(b)
    dot = sum(w * vb.get(t, 0.0) for t, w in va.items())
    na = math.sqrt(sum(w * w for w in va.values()))
    nb = math.sqrt(sum(w * w for w in vb.values()))
    return dot / (na * nb)


def test_cosine_pairs_finds_near_duplicates(spark):
    from datafusion_functions_financial_spark.operators.cosinedup import (
        tfidf_cosine_pairs,
    )
    texts = [
        "quick brown fox jumps over the lazy dog tonight",
        "quick brown fox jumps over the lazy cat tonight",
        "completely different words about spark partitions shuffle",
        "another unrelated sentence mentioning parquet files only",
        "quick brown fox jumps over the lazy dog tonight",  # dup of 0
    ]
    rows = {(r["id_a"], r["id_b"]): r["cosine"] for r in
            tfidf_cosine_pairs(_docs_df(spark, texts),
                               threshold=0.2).collect()}
    assert (0, 4) in rows
    assert rows[(0, 4)] == pytest.approx(1.0, abs=1e-5)
    assert (0, 1) in rows
    assert rows[(0, 1)] == pytest.approx(
        _naive_cosine(texts, 0, 1), abs=1e-4)
    # the unrelated docs never pair with the fox cluster
    assert not any({a, b} & {2, 3} and {a, b} & {0, 1, 4}
                   for a, b in rows)


def test_blocking_skips_ubiquitous_terms(spark):
    from datafusion_functions_financial_spark.operators.cosinedup import (
        tfidf_cosine_pairs,
    )
    # every doc shares 'common'; df('common') = 6 > df_cap=5 means it
    # cannot block, and no other term is shared => zero candidates.
    texts = [f"common unique{i} extra{i}" for i in range(6)]
    out = tfidf_cosine_pairs(_docs_df(spark, texts), threshold=0.0,
                             df_cap=5).collect()
    assert out == []


def test_blocking_df_one_terms_never_block(spark):
    from datafusion_functions_financial_spark.operators.cosinedup import (
        tfidf_cosine_pairs,
    )
    # all terms unique to their doc: nothing to join on
    texts = [f"alpha{i} beta{i} gamma{i}" for i in range(5)]
    assert tfidf_cosine_pairs(
        _docs_df(spark, texts), threshold=0.0).collect() == []


def test_cosine_gate_plan_no_cartesian(spark, sf_dir):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, "dedup_tfidf_cosine_documents")
    assert "CartesianProduct" not in plan, plan

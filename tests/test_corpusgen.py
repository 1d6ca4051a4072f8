"""operators/corpusgen.py + the dedup scale-audit helpers it feeds
(VERDICT r12 item 1: the dedup candidate-growth measurement).

The synthetic corpus must be deterministic (same text for a doc_id
regardless of partitioning), carry the documented near-dup and
boilerplate strata, and the audit helpers (lsh_band_stats,
simhash_candidates, ppjoin_candidate_count) must agree with the
operators they audit. Spark-session tests are in the slow tranche
per the r11 placement policy; the pure-python exponent fit is
default-tranche.
"""

import math

import pytest

import bench
from datafusion_functions_financial_spark.operators import dedup as dd
from datafusion_functions_financial_spark.operators.corpusgen import (
    BOILER_HEADER_TOKENS, zipf_corpus,
)
from datafusion_functions_financial_spark.operators.ppjoin import (
    ppjoin_candidate_count, ppjoin_candidate_stats,
)

N = 1200


@pytest.fixture(scope="module")
def corpus(spark):
    return zipf_corpus(spark, N, partitions=8).localCheckpoint()


@pytest.mark.slow
def test_corpus_deterministic_across_partitioning(spark, corpus):
    again = {r.doc_id: r.text
             for r in zipf_corpus(spark, N, partitions=3).collect()}
    base = {r.doc_id: r.text for r in corpus.collect()}
    assert base == again


@pytest.mark.slow
def test_corpus_strata(corpus):
    docs = {r.doc_id: r.text for r in corpus.collect()}
    assert len(docs) == N
    # near-dup stratum: (20k, 20k+1) differ in at most one token
    for k in (0, 20, 40, 700):
        a, b = docs[k].split(), docs[k + 1].split()
        assert len(a) == len(b)
        assert sum(x != y for x, y in zip(a, b)) <= 1
    # boilerplate stratum: identical header, distinct tails
    heads = {tuple(docs[i].split()[:BOILER_HEADER_TOKENS])
             for i in range(7, N, 20)}
    assert len(heads) == 1
    tails = {tuple(docs[i].split()[BOILER_HEADER_TOKENS:])
             for i in range(7, N, 20)}
    assert len(tails) > 1
    # unique stratum: doc length in [30, 80), zipf head tokens common
    lens = {len(docs[i].split()) for i in range(N) if i % 20 not in (1, 7)}
    assert min(lens) >= 30 and max(lens) < 80


@pytest.mark.slow
def test_lsh_band_stats_match_manual_bucket_census(corpus):
    sig = dd.minhash_signatures(corpus).localCheckpoint()
    cap = 10
    stats = dd.lsh_band_stats(corpus, max_bucket_size=cap,
                              sig=sig).collect()[0].asDict()
    sizes = [r["c"] for r in dd._band_rows(sig)
             .groupBy("band", "band_key")
             .agg(dd.F.count(dd.F.lit(1)).alias("c")).collect()]
    assert stats["n_band_rows"] == sum(sizes) == N * 4
    assert stats["n_buckets"] == len(sizes)
    assert stats["max_bucket"] == max(sizes)
    assert stats["n_hot_buckets"] == sum(1 for s in sizes if s > cap)
    assert stats["n_rows_excluded"] == sum(s for s in sizes if s > cap)
    # the boilerplate stratum must actually create hot buckets at this
    # cap — otherwise the audit corpus is not exercising the cap path
    assert stats["n_hot_buckets"] > 0


@pytest.mark.slow
def test_capped_candidates_subset_of_uncapped(corpus):
    sig = dd.minhash_signatures(corpus).localCheckpoint()
    capped = {(r.id_a, r.id_b) for r in dd.minhash_lsh_candidates(
        corpus, max_bucket_size=10, sig=sig).collect()}
    uncapped = {(r.id_a, r.id_b) for r in dd.minhash_lsh_candidates(
        corpus, max_bucket_size=None, sig=sig).collect()}
    assert capped <= uncapped
    assert len(uncapped) > len(capped)  # the cap dropped hot buckets


@pytest.mark.slow
def test_simhash_candidates_superset_of_verified_pairs(corpus):
    # blocking stage alone vs the full verified operator: every
    # verified pair must appear among the candidates (banding is
    # lossless by pigeonhole), and candidates must be a strict
    # superset (verification rejects far pairs).
    cand = {(r.id_a, r.id_b) for r in dd.simhash_candidates(
        corpus, max_hamming=3, bits=62).collect()}
    pairs = {(r.id_a, r.id_b) for r in dd.simhash_pairs(
        corpus, max_hamming=3, bits=62).collect()}
    assert pairs <= cand
    assert len(cand) > len(pairs)


@pytest.mark.slow
def test_simhash_candidates_rejects_degenerate_banding(corpus):
    with pytest.raises(ValueError):
        dd.simhash_candidates(corpus, max_hamming=4, bits=4)


@pytest.mark.slow
def test_ppjoin_candidate_count_matches_stats(spark, corpus):
    # count-only audit == the scored stats' candidate figure on the
    # same corpus (a 300-doc slice keeps the scored path cheap)
    small = corpus.filter("doc_id < 300")
    fast = ppjoin_candidate_count(small).collect()[0]["n_candidates"]
    scored = ppjoin_candidate_stats(small).collect()[0]["n_candidates"]
    assert fast == scored > 0


def test_loglog_slope_pure_python():
    # exact powers: y = x^2 -> slope 2; y = 3x -> slope 1
    assert bench.loglog_slope({10: 100, 100: 10_000}) == 2.0
    assert bench.loglog_slope({5: 15, 50: 150, 500: 1500}) == 1.0
    # insufficient/degenerate points
    assert bench.loglog_slope({10: 100}) is None
    assert bench.loglog_slope({}) is None
    assert bench.loglog_slope({10: 0, 100: 0}) is None
    # noisy linear data stays near 1
    pts = {n: 2.0 * n * math.exp(0.01 * ((n % 7) - 3)) for n in
           (1000, 10_000, 100_000)}
    s = bench.loglog_slope(pts)
    assert 0.9 < s < 1.1


def test_groundtruth_key_tracks_expression():
    from datafusion_functions_financial_spark.operators import similarity

    k = similarity.groundtruth_key(1000, 16)
    assert "n=1000" in k and "nq=16" in k and "k=5" in k
    # the tag is derived from the generator expression: a changed
    # expression must change the key (ADVICE r12 — no silent stale
    # cache on generator edits)
    orig = similarity.uniform_corpus_expr
    try:
        similarity.uniform_corpus_expr = lambda dim=64: "edited-expr"
        assert similarity.groundtruth_key(1000, 16) != k
    finally:
        similarity.uniform_corpus_expr = orig
    # legacy key stays stable for sidecar migration
    assert similarity.legacy_groundtruth_key(1000, 16) == (
        "xxhash64v1:n=1000:dim=64:nq=16:k=5")

"""Cross-corpus (R x S) prefix-filter threshold join (VERDICT r09
item 5): COMPLETENESS against the naive all-(R x S)-pairs ground
truth on both the adversarial gate corpus and a zipfian natural-text
corpus, boundary semantics, and pruning sanity."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import ppjoin2
from datafusion_functions_financial_spark.operators.dedup import (
    _shingles_spark,
)
from datafusion_functions_financial_spark.operators.ppjoin import (
    T_DEN, T_NUM,
)
from datafusion_functions_financial_spark.sources.tables import load


def _naive_rs_pairs(probe, corpus, t_num, t_den):
    """All (R x S) shingle-Jaccard >= t pairs via the unfiltered token
    equi-join — the ground truth the operator must equal."""
    tr = probe.selectExpr(
        "doc_id AS id_r", f"explode({_shingles_spark('text')}) AS w")
    ts = corpus.selectExpr(
        "doc_id AS id_s", f"explode({_shingles_spark('text')}) AS w")
    mr = tr.groupBy("id_r").agg(
        F.count(F.lit(1)).cast("bigint").alias("m_r"))
    ms = ts.groupBy("id_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("m_s"))
    inter = (
        tr.join(ts, "w").groupBy("id_r", "id_s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    j = (
        inter.join(mr, "id_r").join(ms, "id_s")
        .filter(F.expr(
            f"({t_den} + {t_num}) * inter >= {t_num} * (m_r + m_s)"))
    )
    return sorted((r["id_r"], r["id_s"], r["inter"])
                  for r in j.collect())


def _zipf_corpora(spark):
    """The zipfian corpus from test_ppjoin, split into disjoint probe
    (odd ids) and corpus (even ids) halves — twin pairs straddle the
    split by construction (twins get consecutive ids)."""
    import random

    def word(r):
        s = ""
        r += 1
        for _ in range(6):
            s += chr(97 + r % 26)
            r //= 26
        return s

    rng = random.Random(42)
    V = 5000
    rows, i = [], 0
    while len(rows) < 400:
        ws = [word(int(V ** rng.random())) for _ in range(8)]
        rows.append((i, " ".join(ws)))
        i += 1
        if i % 10 == 1:
            ws2 = ws[:-1] + [word(int(V ** rng.random()))]
            rows.append((i, " ".join(ws2)))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return (docs.filter("doc_id % 2 = 1"), docs.filter("doc_id % 2 = 0"))


@pytest.mark.slow
def test_rs_equals_naive_on_adversarial_corpus(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    probe = docs.filter("doc_id % 2 = 1")
    corpus = docs.filter("doc_id % 2 = 0")
    got = sorted(
        (r["id_r"], r["id_s"], r["inter"])
        for r in ppjoin2.ppjoin_rs_pairs(probe, corpus).collect())
    want = _naive_rs_pairs(probe, corpus, T_NUM, T_DEN)
    assert got == want
    assert len(got) > 0  # near-dups cross the split


@pytest.mark.slow
def test_rs_equals_naive_and_prunes_on_zipfian_corpus(spark):
    probe, corpus = _zipf_corpora(spark)
    got = sorted(
        (r["id_r"], r["id_s"], r["inter"])
        for r in ppjoin2.ppjoin_rs_pairs(probe, corpus).collect())
    want = _naive_rs_pairs(probe, corpus, T_NUM, T_DEN)
    assert got == want
    assert len(got) >= 15  # planted twins straddle the split
    stat = ppjoin2.ppjoin_rs_candidate_stats(probe, corpus).collect()[0]
    assert stat["candidate_share"] <= 0.2, stat.asDict()
    assert stat["n_pairs"] == len(got)
    assert stat["n_candidates"] < stat["n_probe"] * stat["n_corpus"]


@pytest.mark.slow
def test_rs_threshold_boundary_exact(spark):
    # r={x,y,z,p,q}, s={x,y,z,p,r}: inter=4, union=6, J=2/3.
    probe = spark.createDataFrame(
        [(1, "abcde fghij klmno pqrst uvwxy")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(2, "abcde fghij klmno pqrst zzzzz")],
        "doc_id long, text string")
    inc = ppjoin2.ppjoin_rs_pairs(probe, corpus, t_num=2,
                                  t_den=3).collect()
    assert [(r["id_r"], r["id_s"]) for r in inc] == [(1, 2)]
    exc = ppjoin2.ppjoin_rs_pairs(probe, corpus, t_num=7,
                                  t_den=10).collect()
    assert exc == []


@pytest.mark.slow
def test_rs_probe_only_tokens_sort_rarest(spark):
    # A probe doc whose rarest tokens never occur in the corpus: they
    # take df = 0 and fill its prefix; completeness must still hold
    # for a qualifying pair whose overlap is in corpus-common tokens.
    probe = spark.createDataFrame(
        [(1, "aaaaa bbbbb ccccc QQQQQ XXXXX")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(2, "aaaaa bbbbb ccccc ddddd eeeee"),
         (3, "aaaaa fffff ggggg hhhhh iiiii")],
        "doc_id long, text string")
    # J(1,2): shingles are char-5 shingles of the normalized text —
    # use the naive path as truth rather than hand-counting.
    got = sorted(
        (r["id_r"], r["id_s"], r["inter"])
        for r in ppjoin2.ppjoin_rs_pairs(probe, corpus, t_num=1,
                                         t_den=4).collect())
    want = _naive_rs_pairs(probe, corpus, 1, 4)
    assert got == want

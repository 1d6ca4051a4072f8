"""dedup_clusters strategy switch (VERDICT r07 item 5): the label-prop
and large-star/small-star branches must produce identical clusters,
and ``auto`` must pick by edge count."""

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.dedup import (
    dedup_clusters,
    minhash_lsh_pairs,
)
from datafusion_functions_financial_spark.sources.tables import load


def _collect(df):
    return sorted(
        (r["doc_id"], r["cluster_id"], r["is_kept"]) for r in df.collect()
    )


import pytest


@pytest.mark.slow
def test_dedup_clusters_strategies_agree(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    lp = dedup_clusters(docs, pairs, strategy="labelprop")
    cc = dedup_clusters(docs, pairs, strategy="cc")
    assert _collect(lp) == _collect(cc)


@pytest.mark.slow
def test_dedup_clusters_cc_deep_chain(spark):
    # A 12-node path graph: diameter 11 — the shape that makes
    # label-prop pay O(diameter) rounds and cc O(log^2 n). Both must
    # still agree.
    docs = spark.range(12).selectExpr("id AS doc_id")
    pairs = spark.range(11).selectExpr("id AS id_a", "id + 1 AS id_b")
    lp = dedup_clusters(docs, pairs, strategy="labelprop",
                        max_iterations=50)
    cc = dedup_clusters(docs, pairs, strategy="cc")
    got = _collect(cc)
    assert got == _collect(lp)
    # single component rooted at 0, plus is_kept only at the root
    assert all(c == 0 for _, c, _ in got)
    assert [k for _, _, k in got].count(True) == 1


@pytest.mark.slow
def test_dedup_clusters_auto_picks_by_edge_count(spark):
    docs = spark.range(10).selectExpr("id AS doc_id")
    pairs = spark.range(5).selectExpr("id AS id_a", "id + 5 AS id_b")
    small = dedup_clusters(docs, pairs, strategy="auto",
                           cc_edge_threshold=1_000_000)
    big = dedup_clusters(docs, pairs, strategy="auto",
                         cc_edge_threshold=0)
    assert _collect(small) == _collect(big)
    # every cluster roots at its min member (0..4) — no id >= 5 leaks
    assert sum(1 for _, c, _ in _collect(big) if c >= 5) == 0
    kept = [k for _, _, k in _collect(big)]
    assert kept.count(True) == 5

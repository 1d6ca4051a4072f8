"""IVF ANN: index invariants, recall floor, and plan shape."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import ivf, similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_index_partitions_corpus(spark, emb):
    n = emb.count()
    cents, cells = ivf.ivf_index(emb)
    assert cells.count() == n                      # every vector placed
    assert cells.select("vec_id").distinct().count() == n  # exactly once
    k = cents.count()
    assert 0 < k <= n // ivf.IVF_SEED_MOD + 1
    # centroids are full-dimension double arrays
    row = cents.first()
    assert len(row["centroid"]) == similarity.DIM


def test_recall_floor_vs_bruteforce(spark, emb):
    """Deterministic pipeline -> recall is a fixed number per dataset;
    assert a floor well under the measured 0.6 at sf0.01 with
    nprobe/cells = 4/16 on near-uniform synthetic vectors (the
    hardest case for ANN)."""
    q = emb.filter(F.col("vec_id") < ivf.N_QUERIES)
    iv = {(r.q_id, r.n_id)
          for r in ivf.cosine_topk_ivf(emb, q, k=5).collect()}
    ex = {(r.q_id, r.n_id)
          for r in similarity.cosine_topk(emb, q, k=5).collect()}
    assert len(iv & ex) / len(ex) >= 0.5


def test_probe_join_broadcasts_query_side(spark, emb):
    q = emb.filter(F.col("vec_id") < ivf.N_QUERIES)
    plan = (ivf.cosine_topk_ivf(emb, q)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", "")  # centroid broadcast NLJ is fine


def test_topk_rank_contract(spark, emb):
    q = emb.filter(F.col("vec_id") < 3)
    out = ivf.cosine_topk_ivf(emb, q, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        ordered = sorted(rows, key=lambda r: r.rank)
        cs = [r.cos_sim for r in ordered]
        assert cs == sorted(cs, reverse=True)
        assert all(r.n_id != q_id for r in rows)


@pytest.mark.slow
def test_matrix_nearest_equals_join_path(spark, emb):
    """The matrix-form nearest-centroid UDF must be bit-identical to
    the broadcast-crossJoin fold path: same cosines, same tie order,
    for both the assignment pass (keep=1) and the probe pass."""
    v = emb.selectExpr("vec_id", "embedding")
    cents, _ = ivf.ivf_index(emb)
    for keep in (1, ivf.IVF_NPROBE):
        a = sorted(
            (r.vec_id, r[1], r.cs, r.rn)
            for r in ivf._nearest(v, cents, "cell_id", "centroid", keep,
                                  method="matrix")
            .select("vec_id", "cell_id", "cs", "rn").collect()
        )
        b = sorted(
            (r.vec_id, r[1], r.cs, r.rn)
            for r in ivf._nearest(v, cents, "cell_id", "centroid", keep,
                                  method="join")
            .select("vec_id", "cell_id", "cs", "rn").collect()
        )
        assert a == b and len(a) > 0


def test_auto_method_switch_is_bounded():
    # pure arithmetic: the auto path must stay on the bounded matrix
    # collect for K <= MATRIX_METHOD_MAX_CELLS cells and go fully
    # distributed past it (K ~ sqrt(n) crosses 1e5 at n ~ 1e10).
    from datafusion_functions_financial_spark.operators.ivf import (
        MATRIX_METHOD_MAX_CELLS, ivf_params,
    )
    for n, want_join in ((100_000, False), (10_000_000_000, False),
                         (1_000_000_000_000, True)):
        seed_mod, _ = ivf_params(n)
        assert (n // seed_mod > MATRIX_METHOD_MAX_CELLS) == want_join, n

"""Farthest-first k-center selection: hand-checkable sequences,
nonincreasing covering radius, deterministic tie-breaking."""

import numpy as np
import pytest


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")


@pytest.mark.slow
def test_kcenter_picks_expected_sequence(spark):
    from datafusion_functions_financial_spark.operators.kcenter import (
        kcenter_select,
    )
    # seed = id 0 at origin; farthest is id 3 at (10,10); then (0,9);
    # then (5,0) — hand-traceable min-dist argmax chain.
    vecs = [[0, 0], [5, 0], [0, 9], [10, 10], [1, 1]]
    rows = sorted(kcenter_select(_emb_df(spark, vecs), k=4).collect(),
                  key=lambda r: r["rank"])
    assert [r["vec_id"] for r in rows] == [0, 3, 2, 1]
    assert rows[0]["sel_dist"] is None
    assert rows[1]["sel_dist"] == pytest.approx(200.0)  # (10,10)->0
    # (0,9): min(81 to origin, 101 to (10,10)) = 81
    assert rows[2]["sel_dist"] == pytest.approx(81.0)
    # (5,0): min(25, 125, 106) = 25; beats (1,1) min(2,...)=2
    assert rows[3]["sel_dist"] == pytest.approx(25.0)


@pytest.mark.slow
def test_kcenter_radius_nonincreasing(spark):
    from datafusion_functions_financial_spark.operators.kcenter import (
        kcenter_select,
    )
    rng = np.random.RandomState(17)
    vecs = rng.normal(size=(60, 4))
    rows = sorted(kcenter_select(_emb_df(spark, vecs), k=6).collect(),
                  key=lambda r: r["rank"])
    dists = [r["sel_dist"] for r in rows[1:]]
    assert all(a >= b - 1e-9 for a, b in zip(dists, dists[1:]))
    assert len({r["vec_id"] for r in rows}) == 6  # distinct picks


def test_kcenter_tie_breaks_lower_id(spark):
    from datafusion_functions_financial_spark.operators.kcenter import (
        kcenter_select,
    )
    # ids 1 and 2 equidistant from the seed: rank 2 must pick id 1
    vecs = [[0.0], [4.0], [-4.0]]
    rows = sorted(kcenter_select(_emb_df(spark, vecs), k=3).collect(),
                  key=lambda r: r["rank"])
    assert [r["vec_id"] for r in rows] == [0, 1, 2]


@pytest.mark.slow
def test_kcenter_gate_shape(spark, sf_dir):
    from datafusion_functions_financial_spark.plans.registry import (
        all_queries,
    )
    rows = all_queries()["emb_kcenter_embeddings"](
        spark, sf_dir).collect()
    assert len(rows) == 8
    assert len({r["vec_id"] for r in rows}) == 8


@pytest.mark.slow
def test_kcenter_methods_agree(spark):
    from datafusion_functions_financial_spark.operators.kcenter import (
        kcenter_select,
    )
    rng = np.random.RandomState(23)
    vecs = rng.normal(size=(40, 6))
    df = _emb_df(spark, vecs)
    lit = sorted(map(tuple, kcenter_select(df, k=5,
                                           method="literal").collect()))
    jn = sorted(map(tuple, kcenter_select(df, k=5,
                                          method="join").collect()))
    assert lit == jn


def test_kcenter_join_plan_has_no_literal_centers(spark):
    from datafusion_functions_financial_spark.operators.kcenter import (
        _min_dist,
    )
    rng = np.random.RandomState(5)
    df = _emb_df(spark, rng.normal(size=(20, 4)))
    emb = df.selectExpr("vec_id", "embedding")
    centers = [(i, list(rng.normal(size=4))) for i in range(3)]
    plan = _min_dist(emb, centers, "join")._jdf.queryExecution() \
        .analyzed().toString()
    # the join path must reference the centers RELATION, never inline
    # center components as literal doubles
    assert "cvec" in plan
    for _cid, vec in centers:
        assert repr(float(vec[0])) not in plan


@pytest.mark.slow
def test_kcenter_k256_expression_size(spark):
    """VERDICT r07 item 6: at coreset-scale k the literal fold hits
    Catalyst expression-tree limits; the auto path must switch to the
    broadcast join and complete k=256 rounds."""
    from datafusion_functions_financial_spark.operators.kcenter import (
        kcenter_select,
    )
    rng = np.random.RandomState(41)
    df = _emb_df(spark, rng.normal(size=(300, 8))).localCheckpoint()
    rows = kcenter_select(df, k=256).collect()
    assert len(rows) == 256
    assert len({r["vec_id"] for r in rows}) == 256
    dists = [r["sel_dist"] for r in sorted(rows, key=lambda r: r["rank"])
             ][1:]
    assert all(a >= b - 1e-9 for a, b in zip(dists, dists[1:]))

"""k-means tests: blob recovery, deterministic tie-breaking, size
conservation, and plan guards (broadcast centroids, no cartesian).
"""

import numpy as np
import pytest


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")


@pytest.mark.slow
def test_kmeans_recovers_separated_blobs(spark):
    from datafusion_functions_financial_spark.operators.kmeans import (
        kmeans,
    )
    rng = np.random.RandomState(1)
    blobs = []
    for c in ([0, 0], [10, 10], [-10, 10]):
        blobs.append(rng.normal(loc=c, scale=0.1, size=(30, 2)))
    vecs = np.vstack(blobs)
    out = kmeans(_emb_df(spark, vecs), k=3, iters=3).collect()
    sizes = sorted(r["n"] for r in out)
    assert sizes == [30, 30, 30]
    assert all(r["mean_dist"] < 0.1 for r in out)
    # centroid norms land near the blob centers' norms
    norms = sorted(round(r["c_norm"], 1) for r in out)
    assert norms[0] < 1.0                      # the origin blob
    assert norms[1] == pytest.approx(14.1, abs=0.2)
    assert norms[2] == pytest.approx(14.1, abs=0.2)


def test_kmeans_sizes_conserve_rows(spark):
    from datafusion_functions_financial_spark.operators.kmeans import (
        kmeans,
    )
    rng = np.random.RandomState(2)
    vecs = rng.normal(size=(100, 4))
    out = kmeans(_emb_df(spark, vecs), k=5, iters=2).collect()
    assert sum(r["n"] for r in out) == 100
    assert len(out) <= 5


def test_kmeans_argmin_tie_breaks_low_cid(spark):
    """A point exactly equidistant from two init centroids must join
    the lower cluster id on iteration 1 — witnessed by a layout where
    the tied point is the whole difference between the two sizes."""
    from datafusion_functions_financial_spark.operators.kmeans import (
        _assign, kmeans,
    )
    from pyspark.sql import functions as F
    # init = two lowest ids: [0] and [2]; the point [1] is equidistant
    df = _emb_df(spark, [[0.0], [2.0], [1.0]])
    init = spark.createDataFrame(
        [(0, [0.0]), (1, [2.0])], "__cid long, __carr array<double>")
    emb = df.select("vec_id", F.expr(
        "transform(embedding, x -> CAST(x AS DOUBLE))").alias(
        "embedding"))
    rows = {r["vec_id"]: r["__cid"] for r in
            _assign(emb, init).collect()}
    assert rows[2] == 0  # the tied midpoint goes to the lower cid


@pytest.mark.slow
def test_kmeans_iterations_do_not_increase_inertia(spark):
    from datafusion_functions_financial_spark.operators.kmeans import (
        kmeans,
    )
    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(120, 8))
    df = _emb_df(spark, vecs)

    def total_inertia(iters):
        rows = kmeans(df, k=4, iters=iters).collect()
        return sum(r["mean_dist"] * r["n"] for r in rows)

    assert total_inertia(3) <= total_inertia(1) + 1e-6


def test_kmeans_plan_broadcast_no_cartesian(spark, sf_dir):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, "emb_kmeans_embeddings")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" \
        in plan, plan

"""MMD tests: zero on identical distributions, positive under a mean
shift, naive-reference agreement, and deterministic subsampling."""

import numpy as np
import pytest


def _emb_df(spark, vecs, labels):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], int(l))
         for i, (v, l) in enumerate(zip(vecs, labels))],
        "vec_id long, embedding array<double>, label int")


def _naive_mmd2(xa, xb, sigma):
    def k(u, v):
        d2 = ((u[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        return np.exp(-d2 / (2 * sigma * sigma))

    return (k(xa, xa).mean() + k(xb, xb).mean()
            - 2 * k(xa, xb).mean())


@pytest.mark.slow
def test_mmd_shift_vs_identical(spark):
    from datafusion_functions_financial_spark.operators.mmd import (
        mmd_rbf,
    )
    rng = np.random.RandomState(23)
    base = rng.normal(size=(120, 4))
    same = _emb_df(spark, np.vstack([base[:60], base[:60]]),
                   [0] * 60 + [1] * 60)
    [r_same] = mmd_rbf(same, "embedding", "vec_id",
                       "label = 0", "label = 1", m=60,
                       sigma=2.0).collect()
    shifted = _emb_df(
        spark, np.vstack([base[:60], base[60:] + 3.0]),
        [0] * 60 + [1] * 60)
    [r_shift] = mmd_rbf(shifted, "embedding", "vec_id",
                        "label = 0", "label = 1", m=60,
                        sigma=2.0).collect()
    # identical populations: only the subsample-selection differs
    assert abs(r_same["mmd2"]) < 0.05
    assert r_shift["mmd2"] > 0.2
    assert r_shift["mmd2"] > r_same["mmd2"]


def test_mmd_matches_naive_when_unsampled(spark):
    from datafusion_functions_financial_spark.operators.mmd import (
        mmd_rbf,
    )
    rng = np.random.RandomState(29)
    xa = rng.normal(size=(30, 3))
    xb = rng.normal(loc=0.5, size=(25, 3))
    df = _emb_df(spark, np.vstack([xa, xb]), [0] * 30 + [1] * 25)
    [row] = mmd_rbf(df, "embedding", "vec_id", "label = 0",
                    "label = 1", m=100, sigma=3.0).collect()
    assert row["n_a"] == 30 and row["n_b"] == 25
    assert row["mmd2"] == pytest.approx(
        _naive_mmd2(xa, xb, 3.0), abs=1e-5)


@pytest.mark.slow
def test_mmd_subsample_is_deterministic(spark):
    from datafusion_functions_financial_spark.operators.mmd import (
        mmd_rbf,
    )
    rng = np.random.RandomState(31)
    vecs = rng.normal(size=(200, 4))
    labels = [i % 2 for i in range(200)]
    df = _emb_df(spark, vecs, labels)
    r1 = mmd_rbf(df, "embedding", "vec_id", "label = 0",
                 "label = 1", m=40).collect()[0]
    r2 = mmd_rbf(df, "embedding", "vec_id", "label = 0",
                 "label = 1", m=40).collect()[0]
    assert r1["mmd2"] == r2["mmd2"]
    assert r1["n_a"] == 40 and r1["n_b"] == 40

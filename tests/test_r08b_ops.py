"""Tests for the late-r07 fourth-window operators: WoE/IV, bottom-k
distinct sketch (incl. the exact merge identity), and the one-pass
correlation matrix."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# WoE / IV
# --------------------------------------------------------------------------


def _labeled_df(spark, scores, labels):
    return spark.createDataFrame(
        [(float(s), int(y), i) for i, (s, y) in
         enumerate(zip(scores, labels))],
        "v double, y int, id long")


@pytest.mark.slow
def test_woe_iv_informative_beats_noise(spark):
    from datafusion_functions_financial_spark.operators.mlmetrics import (
        woe_iv,
    )
    rng = np.random.RandomState(21)
    scores = rng.uniform(size=400)
    strong = (scores > 0.6).astype(int)
    noise = (rng.uniform(size=400) < 0.4).astype(int)
    iv_strong = woe_iv(_labeled_df(spark, scores, strong), "v",
                       "y = 1", "id").collect()[0]["iv_total"]
    iv_noise = woe_iv(_labeled_df(spark, scores, noise), "v",
                      "y = 1", "id").collect()[0]["iv_total"]
    assert iv_strong > 1.0          # separable score: strong IV
    assert iv_noise < 0.1           # independent label: near zero


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_woe_matches_hand_formula(spark):
    from datafusion_functions_financial_spark.operators.mlmetrics import (
        woe_iv,
    )
    # 100 rows, deciles of 10; positives exactly in the top 2 deciles
    scores = list(range(100))
    labels = [int(i >= 80) for i in range(100)]
    rows = {r["bin"]: r for r in woe_iv(
        _labeled_df(spark, scores, labels), "v", "y = 1",
        "id").collect()}
    tp, tn = 20, 80
    woe_top = np.log(((10 + 0.5) / tp) / ((0 + 0.5) / tn))
    woe_bot = np.log(((0 + 0.5) / tp) / ((10 + 0.5) / tn))
    assert rows[9]["woe"] == pytest.approx(woe_top, abs=1e-5)
    assert rows[0]["woe"] == pytest.approx(woe_bot, abs=1e-5)


# --------------------------------------------------------------------------
# bottom-k sketch
# --------------------------------------------------------------------------


def _events_df(spark, pairs):
    return spark.createDataFrame(
        [(k, int(u)) for k, u in pairs], "event_type string, user_id long")


def test_bottomk_exact_when_unsaturated(spark):
    from datafusion_functions_financial_spark.operators.sketch4 import (
        bottomk_estimate, bottomk_sketch,
    )
    df = _events_df(spark, [("a", u) for u in range(50)] * 3)
    [row] = bottomk_estimate(
        bottomk_sketch(df, "event_type", "user_id", k=256)).collect()
    assert row["n_kept"] == 50
    assert row["est_distinct"] == pytest.approx(50.0)


def test_bottomk_estimate_within_tolerance_when_saturated(spark):
    from datafusion_functions_financial_spark.operators.sketch4 import (
        bottomk_estimate, bottomk_sketch,
    )
    df = _events_df(spark, [("a", u) for u in range(10_000)])
    [row] = bottomk_estimate(
        bottomk_sketch(df, "event_type", "user_id", k=256)).collect()
    assert row["n_kept"] == 256
    # KMV error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(row["est_distinct"] - 10_000) / 10_000 < 0.25


def test_bottomk_merge_identity(spark):
    """bottom-k of the union of shard sketches == bottom-k of the
    whole — exactly, row for row."""
    from datafusion_functions_financial_spark.operators.sketch4 import (
        bottomk_merge, bottomk_sketch,
    )
    rng = np.random.RandomState(31)
    users = rng.randint(0, 5000, size=4000)
    pairs = [("a", u) for u in users]
    df = _events_df(spark, pairs)
    direct = bottomk_sketch(df, "event_type", "user_id", k=64)
    half = len(pairs) // 2
    s1 = bottomk_sketch(_events_df(spark, pairs[:half]),
                        "event_type", "user_id", k=64)
    s2 = bottomk_sketch(_events_df(spark, pairs[half:]),
                        "event_type", "user_id", k=64)
    merged = bottomk_merge(s1, s2, k=64)

    def norm(sk):
        return sorted((r["__key"], r["__rk"], r["__h"])
                      for r in sk.collect())

    assert norm(merged) == norm(direct)


# --------------------------------------------------------------------------
# correlation matrix
# --------------------------------------------------------------------------


def test_corr_matrix_matches_numpy(spark):
    from datafusion_functions_financial_spark.operators.corrmatrix import (
        correlation_matrix,
    )
    rng = np.random.RandomState(41)
    a = rng.normal(size=500)
    b = 0.7 * a + rng.normal(scale=0.5, size=500)
    c = rng.normal(size=500)
    df = spark.createDataFrame(
        [(float(x), float(y), float(z)) for x, y, z in zip(a, b, c)],
        "a double, b double, c double")
    rows = {(r["col_a"], r["col_b"]): r for r in correlation_matrix(
        df, {"a": 1.0, "b": 1.0, "c": 1.0}).collect()}
    assert len(rows) == 3
    want_ab = np.corrcoef(a, b)[0, 1]
    want_ac = np.corrcoef(a, c)[0, 1]
    assert rows[("a", "b")]["pearson"] == pytest.approx(want_ab,
                                                        abs=1e-4)
    assert rows[("a", "c")]["pearson"] == pytest.approx(want_ac,
                                                        abs=1e-4)
    assert all(abs(r["pearson"]) <= 1.0 for r in rows.values())
    assert all(r["n"] == 500 for r in rows.values())


def test_corr_matrix_null_rows_excluded_everywhere(spark):
    from datafusion_functions_financial_spark.operators.corrmatrix import (
        correlation_matrix,
    )
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (2.0, None, 4.0), (3.0, 4.0, 5.0),
         (4.0, 5.0, None), (5.0, 7.0, 9.0)],
        "a double, b double, c double")
    rows = correlation_matrix(
        df, {"a": 1.0, "b": 1.0, "c": 1.0}).collect()
    assert all(r["n"] == 3 for r in rows)  # one shared complete-case n


@pytest.mark.parametrize("name", [
    "q_woe_iv_events", "sketch_bottomk_users_events",
    "sketch_bottomk_merge_events", "dq_corr_matrix_lineitem",
    "emb_kmeans_embeddings",
])
def test_fourth_window_no_cartesian(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan

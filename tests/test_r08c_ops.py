"""Tests for the fifth-window operators: order-statistic median CI
and the decision-stump split scorer."""

import math

import numpy as np
import pytest


# --------------------------------------------------------------------------
# median CI
# --------------------------------------------------------------------------


def _grouped_df(spark, vals, g="g"):
    return spark.createDataFrame(
        [(g, float(v), i) for i, v in enumerate(vals)],
        "g string, x double, id long")


def test_median_ci_orders_and_brackets(spark):
    from datafusion_functions_financial_spark.operators.quantile3 import (
        median_ci,
    )
    rng = np.random.RandomState(3)
    vals = rng.normal(loc=50, scale=5, size=400)
    [row] = median_ci(_grouped_df(spark, vals), "x", "g",
                      "id").collect()
    assert row["n"] == 400
    assert row["ci_lo"] <= row["median"] <= row["ci_hi"]
    true_median = float(np.median(vals))
    assert row["ci_lo"] <= true_median <= row["ci_hi"]
    # rank-interval width ~ z*sqrt(n) order statistics: tight here
    assert row["ci_hi"] - row["ci_lo"] < 3.0


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_median_ci_exact_small_sample(spark):
    from datafusion_functions_financial_spark.operators.quantile3 import (
        median_ci,
    )
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    [row] = median_ci(_grouped_df(spark, vals), "x", "g",
                      "id").collect()
    assert row["median"] == pytest.approx(3.0)
    # n=5: l = max(1, floor((5 - 1.96*sqrt(5))/2)) = 1 -> x_(1) = 1
    assert row["ci_lo"] == pytest.approx(1.0)
    assert row["ci_hi"] == pytest.approx(5.0)


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_median_ci_even_n_averages_middles(spark):
    from datafusion_functions_financial_spark.operators.quantile3 import (
        median_ci,
    )
    vals = [1.0, 2.0, 3.0, 10.0]
    [row] = median_ci(_grouped_df(spark, vals), "x", "g",
                      "id").collect()
    assert row["median"] == pytest.approx(2.5)


# --------------------------------------------------------------------------
# stump split
# --------------------------------------------------------------------------


def _labeled_df(spark, scores, labels):
    return spark.createDataFrame(
        [(float(s), int(y), i) for i, (s, y) in
         enumerate(zip(scores, labels))],
        "v double, y int, id long")


def test_stump_finds_separating_threshold(spark):
    from datafusion_functions_financial_spark.operators.mlmetrics import (
        stump_split,
    )
    # label flips exactly at score 70 -> the 0.7-decile threshold
    scores = list(range(100))
    labels = [int(s >= 70) for s in scores]
    rows = sorted(stump_split(_labeled_df(spark, scores, labels),
                              "v", "y = 1").collect(),
                  key=lambda r: r["i"])
    best = [r for r in rows if r["is_best"] == 1]
    assert len(best) == 1
    assert best[0]["i"] == 7                    # the 70th percentile
    # perfect split: IG equals the parent entropy H(0.3)
    h_parent = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    assert best[0]["ig"] == pytest.approx(h_parent, abs=1e-5)


def test_stump_ig_matches_hand_computation(spark):
    from datafusion_functions_financial_spark.operators.mlmetrics import (
        stump_split,
    )
    rng = np.random.RandomState(9)
    scores = rng.uniform(size=200)
    labels = (rng.uniform(size=200) < scores).astype(int)
    rows = stump_split(_labeled_df(spark, scores, labels),
                       "v", "y = 1").collect()

    def entropy(p):
        return 0.0 if p <= 0 or p >= 1 else -(
            p * math.log(p) + (1 - p) * math.log(1 - p))

    for r in rows:
        thr = r["thr"]
        nl = sum(1 for s in scores if s < thr)
        pl = sum(1 for s, y in zip(scores, labels) if s < thr and y)
        nr = 200 - nl
        pr = int(labels.sum()) - pl
        hp = entropy(labels.sum() / 200)
        want = hp - (nl * entropy(pl / nl if nl else 0)
                     + nr * entropy(pr / nr if nr else 0)) / 200
        assert r["ig"] == pytest.approx(want, abs=1e-5), r["i"]
        assert r["n_left"] == nl


def test_stump_noise_has_negligible_gain(spark):
    from datafusion_functions_financial_spark.operators.mlmetrics import (
        stump_split,
    )
    rng = np.random.RandomState(13)
    scores = rng.uniform(size=500)
    labels = (rng.uniform(size=500) < 0.5).astype(int)
    rows = stump_split(_labeled_df(spark, scores, labels),
                       "v", "y = 1").collect()
    assert max(r["ig"] for r in rows) < 0.02


@pytest.mark.parametrize("name", [
    "q_median_ci_orders", "q_stump_split_events",
])
def test_fifth_window_no_cartesian(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan

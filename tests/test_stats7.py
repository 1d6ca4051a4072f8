"""stats7 tests: distance correlation vs a naive double-centering
reference (and its nonlinear-detection property), energy distance on
identical vs shifted samples."""

import numpy as np
import pytest


def _paired_df(spark, xs, ys):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in
         enumerate(zip(xs, ys))],
        "__h long, __x double, __y double")


def _naive_dcor(xs, ys):
    x = np.asarray(xs, dtype=float)
    y = np.asarray(ys, dtype=float)
    n = len(x)
    dx = np.abs(x[:, None] - x[None, :])
    dy = np.abs(y[:, None] - y[None, :])

    def center(d):
        return d - d.mean(0)[None, :] - d.mean(1)[:, None] + d.mean()

    ax, ay = center(dx), center(dy)
    dcov2 = (ax * ay).mean()
    dvx, dvy = (ax * ax).mean(), (ay * ay).mean()
    if dvx <= 0 or dvy <= 0 or dcov2 <= 0:
        return 0.0
    return float(np.sqrt(dcov2 / np.sqrt(dvx * dvy)))


@pytest.mark.slow
def test_dcor_matches_naive(spark):
    from datafusion_functions_financial_spark.operators.stats7 import (
        distance_correlation,
    )
    rng = np.random.RandomState(7)
    xs = rng.uniform(-1, 1, size=60)
    ys = 0.6 * xs + rng.normal(scale=0.2, size=60)
    [row] = distance_correlation(_paired_df(spark, xs, ys)).collect()
    assert row["n_hours"] == 60
    assert row["dcor"] == pytest.approx(_naive_dcor(xs, ys), abs=1e-4)


@pytest.mark.slow
def test_dcor_detects_nonlinear_dependence(spark):
    from datafusion_functions_financial_spark.operators.stats7 import (
        distance_correlation,
    )
    rng = np.random.RandomState(11)
    xs = rng.uniform(-1, 1, size=80)
    ys = xs ** 2  # Pearson ~ 0, but fully dependent
    assert abs(float(np.corrcoef(xs, ys)[0, 1])) < 0.25
    [row] = distance_correlation(_paired_df(spark, xs, ys)).collect()
    assert row["dcor"] > 0.4


@pytest.mark.slow
def test_dcor_near_zero_when_independent(spark):
    from datafusion_functions_financial_spark.operators.stats7 import (
        distance_correlation,
    )
    rng = np.random.RandomState(13)
    xs = rng.uniform(size=80)
    ys = rng.uniform(size=80)
    [row] = distance_correlation(_paired_df(spark, xs, ys)).collect()
    assert row["dcor"] < 0.25


def test_energy_distance_identical_is_zero(spark):
    from datafusion_functions_financial_spark.operators.stats7 import (
        energy_distance,
    )
    rng = np.random.RandomState(17)
    xs = rng.normal(size=70)
    [row] = energy_distance(_paired_df(spark, xs, xs)).collect()
    assert row["e_dist"] == pytest.approx(0.0, abs=1e-4)
    assert row["e_xx"] == pytest.approx(row["e_yy"], abs=1e-6)


def test_energy_distance_shift_detected(spark):
    from datafusion_functions_financial_spark.operators.stats7 import (
        energy_distance,
    )
    rng = np.random.RandomState(19)
    xs = rng.normal(size=70)
    ys = xs + 2.0
    [row] = energy_distance(_paired_df(spark, xs, ys)).collect()
    # E-dist for a pure shift of identical samples ~ 2*shift - 0 - 0
    assert row["e_dist"] > 1.0
    assert row["e_dist"] == pytest.approx(
        2 * np.abs(xs[:, None] - ys[None, :]).mean()
        - 2 * np.abs(xs[:, None] - xs[None, :]).mean(), abs=1e-4)


@pytest.mark.parametrize("name", [
    "q_distance_corr_events", "q_energy_distance_events",
])
def test_stats7_gate_runs(spark, sf_dir, name):
    from datafusion_functions_financial_spark.plans.registry import (
        all_queries,
    )
    [row] = all_queries()[name](spark, sf_dir).collect()
    assert row["n_hours"] > 0

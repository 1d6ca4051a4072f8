"""stats5 tests: Kendall tau-b vs a naive O(n^2) reference, tail
dependence on comonotone/anti-extreme constructions, and Lin's CCC
closed-form agreement properties.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _paired_df(spark, xs, ys):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in
         enumerate(zip(xs, ys))],
        "__h long, __x double, __y double")


def _naive_tau_b(xs, ys):
    n = len(xs)
    c = d = tx = ty = 0
    npairs = 0
    for i in range(n):
        for j in range(i + 1, n):
            npairs += 1
            sx = (xs[j] > xs[i]) - (xs[j] < xs[i])
            sy = (ys[j] > ys[i]) - (ys[j] < ys[i])
            if sx * sy > 0:
                c += 1
            elif sx * sy < 0:
                d += 1
            if sx == 0:
                tx += 1
            if sy == 0:
                ty += 1
    return (c - d) / np.sqrt((npairs - tx) * (npairs - ty))


def test_kendall_tau_matches_naive_with_ties(spark):
    from datafusion_functions_financial_spark.operators.stats5 import (
        kendall_tau,
    )
    rng = np.random.RandomState(3)
    xs = np.round(rng.normal(size=60), 1)   # coarse → ties
    ys = np.round(0.5 * xs + rng.normal(scale=0.5, size=60), 1)
    row = kendall_tau(_paired_df(spark, xs, ys)).collect()[0]
    assert row["n_pairs"] == 60 * 59 // 2
    assert row["tau_b"] == pytest.approx(
        _naive_tau_b(xs.tolist(), ys.tolist()), abs=1e-6)


@pytest.mark.slow
def test_kendall_tau_monotone_is_one(spark):
    from datafusion_functions_financial_spark.operators.stats5 import (
        kendall_tau,
    )
    xs = list(range(20))
    ys = [x * 3 + 1 for x in xs]
    assert kendall_tau(
        _paired_df(spark, xs, ys)).collect()[0]["tau_b"] == \
        pytest.approx(1.0)


@pytest.mark.slow
def test_kendall_tau_all_tied_is_null(spark):
    from datafusion_functions_financial_spark.operators.stats5 import (
        kendall_tau,
    )
    row = kendall_tau(
        _paired_df(spark, [1] * 10, list(range(10)))).collect()[0]
    assert row["tau_b"] is None


def test_tail_dependence_comonotone_near_one(spark):
    from datafusion_functions_financial_spark.operators.stats5 import (
        tail_dependence,
    )
    xs = [float(i) for i in range(100)]
    row = tail_dependence(_paired_df(spark, xs, xs)).collect()[0]
    assert row["n_hours"] == 100
    assert row["lambda_u"] >= 0.9  # identical tails co-occur


def test_tail_dependence_disjoint_extremes_zero(spark):
    from datafusion_functions_financial_spark.operators.stats5 import (
        tail_dependence,
    )
    # x's top decile sits where y is lowest and vice versa
    xs = [float(i) for i in range(100)]
    ys = [float(99 - i) for i in range(100)]
    row = tail_dependence(_paired_df(spark, xs, ys)).collect()[0]
    assert row["n_joint"] == 0
    assert row["lambda_u"] == pytest.approx(0.0)


@pytest.mark.slow
def test_lin_ccc_identity_and_shift(spark):
    from datafusion_functions_financial_spark.operators.stats5 import (
        lin_ccc,
    )
    rng = np.random.RandomState(5)
    xs = rng.uniform(1, 2, size=80)
    same = lin_ccc(_paired_df(spark, xs, xs)).collect()[0]["ccc"]
    assert same == pytest.approx(1.0, abs=1e-4)
    shifted = lin_ccc(
        _paired_df(spark, xs, xs + 1.0)).collect()[0]["ccc"]
    assert shifted < 0.5  # shift is penalized (unlike Pearson)


def test_lin_ccc_matches_closed_form(spark):
    from datafusion_functions_financial_spark.operators.stats5 import (
        lin_ccc,
    )
    rng = np.random.RandomState(9)
    xs = rng.uniform(size=100)
    ys = 0.8 * xs + rng.normal(scale=0.1, size=100)
    got = lin_ccc(_paired_df(spark, xs, ys)).collect()[0]["ccc"]
    mx, my = xs.mean(), ys.mean()
    sxx = ((xs - mx) ** 2).sum()
    syy = ((ys - my) ** 2).sum()
    sxy = ((xs - mx) * (ys - my)).sum()
    want = 2 * sxy / (sxx + syy + len(xs) * (mx - my) ** 2)
    assert got == pytest.approx(want, abs=1e-4)


@pytest.mark.parametrize("name", [
    "q_kendall_tau_events", "q_tail_dependence_events",
    "q_lin_ccc_events",
])
def test_stats5_no_cartesian(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan

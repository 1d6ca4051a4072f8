"""CUPED tests: the reduction equals the squared pre/post
correlation, correlated pre-periods reduce variance, independent
pre-periods don't."""

import numpy as np
import pytest


US_DAY = 86_400_000_000


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, us long, value double")


def _build(spark, pre, post):
    """One event per user per half: day 0 (pre) and day 30 (post)."""
    rows = []
    for u, (x, y) in enumerate(zip(pre, post)):
        rows.append((u, 0 * US_DAY + 1, float(x)))
        rows.append((u, 30 * US_DAY + 1, float(y)))
    return _events_df(spark, rows)


def test_cuped_reduction_equals_r_squared(spark):
    from datafusion_functions_financial_spark.operators.cuped import (
        cuped_reduction,
    )
    rng = np.random.RandomState(3)
    pre = rng.normal(size=300)
    post = 0.8 * pre + rng.normal(scale=0.5, size=300)
    [row] = cuped_reduction(_build(spark, pre, post), "value",
                            "user_id", "us").collect()
    assert row["n_users"] == 300
    r2 = float(np.corrcoef(pre, post)[0, 1] ** 2)
    assert row["reduction"] == pytest.approx(r2, abs=1e-4)
    theta = float(np.cov(pre, post)[0, 1] / np.var(pre, ddof=1))
    assert row["theta"] == pytest.approx(theta, abs=1e-4)
    assert row["var_adj"] < row["var_raw"]


def test_cuped_independent_pre_is_useless(spark):
    from datafusion_functions_financial_spark.operators.cuped import (
        cuped_reduction,
    )
    rng = np.random.RandomState(7)
    pre = rng.normal(size=400)
    post = rng.normal(size=400)
    [row] = cuped_reduction(_build(spark, pre, post), "value",
                            "user_id", "us").collect()
    assert abs(row["reduction"]) < 0.05


def test_cuped_users_missing_a_half_are_excluded(spark):
    from datafusion_functions_financial_spark.operators.cuped import (
        cuped_reduction,
    )
    rows = []
    rng = np.random.RandomState(9)
    for u in range(50):  # complete users
        rows.append((u, 1, float(rng.normal())))
        rows.append((u, 30 * US_DAY + 1, float(rng.normal())))
    for u in range(50, 70):  # pre-only users
        rows.append((u, 1, 99.0))
    [row] = cuped_reduction(_events_df(spark, rows), "value",
                            "user_id", "us").collect()
    assert row["n_users"] == 50

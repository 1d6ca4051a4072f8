"""stats6 tests: Mann-Kendall vs a naive pairwise reference, Huber
location robustness vs the mean, and Ljung-Box behavior on white vs
strongly autocorrelated series."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


US_DAY = 86_400_000_000


def _daily_events_df(spark, values, key="a"):
    """One event per day with the given value — daily mean == value."""
    return spark.createDataFrame(
        [(key, i * US_DAY + 1, float(v)) for i, v in enumerate(values)],
        "event_type string, us long, value double")


def _naive_mk(values):
    s = 0
    n = len(values)
    for i in range(n):
        for j in range(i + 1, n):
            s += int(values[j] > values[i]) - int(values[j] < values[i])
    # tie correction
    from collections import Counter
    tt = sum(t * (t - 1) * (2 * t + 5)
             for t in Counter(values).values())
    var = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
    if var <= 0:
        return s, var, None
    z = ((s - 1) / math.sqrt(var) if s > 0
         else (s + 1) / math.sqrt(var) if s < 0 else 0.0)
    return s, var, z


def test_mann_kendall_matches_naive(spark):
    from datafusion_functions_financial_spark.operators.stats6 import (
        mann_kendall,
    )
    rng = np.random.RandomState(5)
    values = np.round(rng.normal(size=40) + np.arange(40) * 0.05, 1)
    [row] = mann_kendall(
        _daily_events_df(spark, values), "value", "event_type",
        "us").collect()
    s, var, z = _naive_mk(list(values))
    assert row["s"] == s
    assert row["var_s"] == pytest.approx(var, abs=1e-6)
    assert row["z"] == pytest.approx(z, abs=1e-6)


def test_mann_kendall_monotone_trend_detected(spark):
    from datafusion_functions_financial_spark.operators.stats6 import (
        mann_kendall,
    )
    [row] = mann_kendall(
        _daily_events_df(spark, list(range(30))), "value",
        "event_type", "us").collect()
    assert row["s"] == 30 * 29 // 2  # every pair concordant
    assert row["z"] > 1.96


def test_huber_resists_outliers(spark):
    from datafusion_functions_financial_spark.operators.stats6 import (
        huber_location,
    )
    vals = [10.0] * 50 + [10.5] * 40 + [1000.0] * 10  # 10% gross errors
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v double")
    [row] = huber_location(df, "v", "g").collect()
    plain_mean = sum(vals) / len(vals)  # dragged to ~109
    assert plain_mean > 100
    assert row["huber_mean"] < 15      # stays with the bulk
    assert row["median"] == pytest.approx(10.25)  # interpolated mid
    assert row["n"] == 100


def test_huber_degenerate_group_returns_median(spark):
    from datafusion_functions_financial_spark.operators.stats6 import (
        huber_location,
    )
    df = spark.createDataFrame(
        [("g", 5.0)] * 20, "g string, v double")
    [row] = huber_location(df, "v", "g").collect()
    assert row["mad"] == 0.0
    assert row["huber_mean"] == pytest.approx(5.0)


def test_ljung_box_white_vs_autocorrelated(spark):
    from datafusion_functions_financial_spark.operators.stats6 import (
        ljung_box,
    )
    rng = np.random.RandomState(11)
    white = rng.normal(size=120)
    ar = [0.0]
    for _ in range(119):
        ar.append(0.9 * ar[-1] + rng.normal(scale=0.3))
    dfw = _daily_events_df(spark, white, key="w")
    dfa = _daily_events_df(spark, ar, key="a")
    [rw] = ljung_box(dfw, "value", "event_type", "us").collect()
    [ra] = ljung_box(dfa, "value", "event_type", "us").collect()
    assert rw["p_value"] > 0.01      # white noise: no rejection
    assert ra["p_value"] < 1e-6      # AR(0.9): overwhelming rejection
    assert ra["q_stat"] > rw["q_stat"]


def test_ljung_box_drops_short_series(spark):
    from datafusion_functions_financial_spark.operators.stats6 import (
        ljung_box,
    )
    df = _daily_events_df(spark, [1.0, 2.0, 3.0])
    assert ljung_box(df, "value", "event_type", "us").count() == 0


@pytest.mark.parametrize("name", [
    "q_mann_kendall_events", "q_huber_mean_orders",
    "q_ljung_box_events",
])
def test_stats6_no_cartesian(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan

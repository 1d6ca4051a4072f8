"""Best-changepoint tests: a constructed level shift is found at the
exact day; flat series explain nothing; SSE matches numpy."""

import numpy as np
import pytest


US_DAY = 86_400_000_000


def _daily_events_df(spark, values, key="a"):
    return spark.createDataFrame(
        [(key, i * US_DAY + 1, float(v)) for i, v in enumerate(values)],
        "event_type string, us long, value double")


def test_changepoint_finds_level_shift(spark):
    from datafusion_functions_financial_spark.operators.binseg import (
        best_changepoint,
    )
    values = [1.0] * 20 + [5.0] * 15
    [row] = best_changepoint(
        _daily_events_df(spark, values), "value", "event_type",
        "us").collect()
    assert row["cp_day"] == 19          # last day of the low regime
    assert row["sse_split"] == pytest.approx(0.0, abs=1e-6)
    assert row["var_explained"] == pytest.approx(1.0, abs=1e-6)


def test_changepoint_flat_series(spark):
    from datafusion_functions_financial_spark.operators.binseg import (
        best_changepoint,
    )
    [row] = best_changepoint(
        _daily_events_df(spark, [3.0] * 10), "value", "event_type",
        "us").collect()
    assert row["var_explained"] == pytest.approx(0.0)
    assert row["cp_day"] == 0           # tie -> earliest day


def test_changepoint_sse_matches_numpy(spark):
    from datafusion_functions_financial_spark.operators.binseg import (
        best_changepoint,
    )
    rng = np.random.RandomState(3)
    values = np.concatenate([
        rng.normal(0, 1, 25), rng.normal(2, 1, 25)])
    [row] = best_changepoint(
        _daily_events_df(spark, values), "value", "event_type",
        "us").collect()

    def sse(a):
        return float(((a - a.mean()) ** 2).sum()) if len(a) else 0.0

    best = min(
        (sse(values[:k]) + sse(values[k:]), k - 1)
        for k in range(1, 50))
    assert row["cp_day"] == best[1]
    assert row["sse_split"] == pytest.approx(best[0], abs=1e-3)
    assert row["sse_full"] == pytest.approx(sse(values), abs=1e-3)


def test_changepoint_gate_plan(spark, sf_dir):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, "q_best_changepoint_events")
    assert "CartesianProduct" not in plan, plan

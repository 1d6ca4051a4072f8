"""Known-value tests for functions/technical4.py (Ichimoku, pivot
points)."""

import pytest

from datafusion_functions_financial_spark.functions.technical4 import (
    ichimoku, pivot_points,
)


def _series(spark, prices):
    rows = [(1, i, float(p)) for i, p in enumerate(prices)]
    return spark.createDataFrame(rows, "k int, t int, p double")


def test_ichimoku_midpoints_and_shifts(spark):
    df = _series(spark, [1, 3, 2, 5, 4, 6, 8, 7])
    out = {r["t"]: r for r in
           ichimoku(df, "p", ["k"], ["t"], p=2, q=3, r=4)
           .orderBy("t").collect()}
    # tenkan at t=1: (max(1,3)+min(1,3))/2 = 2.0
    assert out[0]["tenkan"] is None
    assert out[1]["tenkan"] == 2.0
    assert out[3]["tenkan"] == pytest.approx((5 + 2) / 2)
    # kijun (q=3) at t=2: (3+1)/2 = 2.0
    assert out[2]["kijun"] == 2.0
    # senkou_a at t=5 = midpoint of (tenkan+kijun)/2 from t=2
    tk2, kj2 = out[2]["tenkan"], out[2]["kijun"]
    assert out[5]["senkou_a"] == pytest.approx((tk2 + kj2) / 2)
    # senkou_b at t=6 = spanB(r=4) computed at t=3: (5+1)/2 = 3
    assert out[6]["senkou_b"] == 3.0
    # chikou at t=0 = value at t=3
    assert out[0]["chikou"] == 5.0
    assert out[7]["chikou"] is None  # no future


def test_pivot_points_known_values(spark):
    bars = spark.createDataFrame(
        [(1, 0, 10.0, 20.0, 8.0, 15.0), (1, 1, 15.0, 16.0, 14.0, 15.5)],
        "user_id int, day int, open double, high double, low double, "
        "close double")
    out = {r["day"]: r for r in pivot_points(bars).collect()}
    assert out[0]["pivot"] is None  # no prior bar
    # prior bar H=20 L=8 C=15 -> P=43/3, R1=2P-8, S1=2P-20
    p = 43.0 / 3.0
    assert out[1]["pivot"] == pytest.approx(p, abs=1e-4)
    assert out[1]["r1"] == pytest.approx(2 * p - 8, abs=1e-4)
    assert out[1]["s1"] == pytest.approx(2 * p - 20, abs=1e-4)
    assert out[1]["r2"] == pytest.approx(p + 12, abs=1e-4)
    assert out[1]["s2"] == pytest.approx(p - 12, abs=1e-4)

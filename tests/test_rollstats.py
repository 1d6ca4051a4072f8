"""Behavioral tests for rolling statistics (functions/rollstats.py)."""

import math

import pytest

from datafusion_functions_financial_spark.functions.rollstats import (
    bollinger,
    drawdown,
    rolling_corr,
    rolling_volatility,
)


def _series(spark, values):
    rows = [("k", i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, seq long, x double")


def test_bollinger_warmup_and_values(spark):
    df = bollinger(_series(spark, [1, 2, 3, 4, 5]), "x", ["k"], ["seq"], n=3)
    rows = {r.seq: r for r in df.collect()}
    assert rows[0].boll_mid is None and rows[1].boll_mid is None
    assert rows[2].boll_mid == pytest.approx(2.0)
    assert rows[2].boll_upper == pytest.approx(2.0 + 2.0)  # sd([1,2,3]) = 1
    assert rows[2].boll_lower == pytest.approx(0.0)


def test_volatility_needs_n_returns(spark):
    df = rolling_volatility(_series(spark, [1, 2, 4, 8]), "x", ["k"],
                            ["seq"], n=2)
    rows = {r.seq: r for r in df.collect()}
    # returns start at seq=1; window of 2 returns fills at seq=2
    assert rows[0].volatility is None and rows[1].volatility is None
    assert rows[2].volatility == pytest.approx(0.0, abs=1e-9)  # ln2, ln2
    assert rows[3].volatility == pytest.approx(0.0, abs=1e-9)


def test_drawdown_from_running_peak(spark):
    df = drawdown(_series(spark, [10, 8, 12, 6]), "x", ["k"], ["seq"])
    out = [r.drawdown for r in df.orderBy("seq").collect()]
    assert out[0] == 0.0
    assert out[1] == pytest.approx(-0.2)
    assert out[2] == 0.0
    assert out[3] == pytest.approx(-0.5)


def test_rolling_corr_constant_frame_is_null(spark):
    rows = [("k", i, 1.0, float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, seq long, x double, y double")
    out = rolling_corr(df, "x", "y", ["k"], ["seq"], n=3)
    # x is constant: correlation undefined -> NULL, never a raise
    assert all(r.roll_corr is None for r in out.collect())


def test_rolling_corr_perfect_positive(spark):
    rows = [("k", i, float(i), 2.0 * i + 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, seq long, x double, y double")
    out = {r.seq: r for r in rolling_corr(df, "x", "y", ["k"],
                                          ["seq"], n=3).collect()}
    assert out[1].roll_corr is None
    for seq in (2, 3, 4):
        assert out[seq].roll_corr == pytest.approx(1.0)


def test_single_shuffle_plan(spark):
    df = bollinger(_series(spark, range(10)), "x", ["k"], ["seq"], n=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one hash partition by key

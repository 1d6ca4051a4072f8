"""Known-value unit tests for functions/technical3.py (TRIX, PPO,
ADX, Aroon) on tiny hand-computed series."""

import pytest

from datafusion_functions_financial_spark.functions.technical3 import (
    adx, aroon, ppo, trix,
)


def _series(spark, prices):
    rows = [(1, i, float(p)) for i, p in enumerate(prices)]
    return spark.createDataFrame(rows, "k int, t int, p double")


def _col(df, name):
    return [r[name] for r in df.orderBy("t").collect()]


def test_trix_constant_series_is_zero(spark):
    df = _series(spark, [50.0] * 6)
    vals = _col(trix(df, "p", ["k"], ["t"], n=4), "trix")
    assert vals[0] is None  # no previous triple-EMA
    assert vals[1:] == [0.0] * 5


def test_trix_known_two_rows(spark):
    # alpha=0.5 (n=3): e1=[100,105], e2=[100,102.5], e3=[100,101.25]
    # trix = 100*(101.25/100 - 1) = 1.25
    df = _series(spark, [100.0, 110.0])
    vals = _col(trix(df, "p", ["k"], ["t"], n=3), "trix")
    assert vals == [None, pytest.approx(1.25)]


def test_ppo_constant_is_zero_and_rising_positive(spark):
    flat = _series(spark, [42.0] * 5)
    assert _col(ppo(flat, "p", ["k"], ["t"]), "ppo") == [0.0] * 5
    rising = _series(spark, [100, 110, 121, 133.1, 146.41])
    vals = _col(ppo(rising, "p", ["k"], ["t"], fast=3, slow=5), "ppo")
    assert vals[0] == 0.0  # both EMAs seeded equal
    assert all(v > 0 for v in vals[1:])  # fast EMA leads on an uptrend


def test_adx_pure_uptrend(spark):
    # strictly rising: -DM always 0 -> DI-=0, DI+=100, DX=100, ADX=100
    df = _series(spark, [100 + i * 2.0 for i in range(8)])
    out = adx(df, "p", ["k"], ["t"], n=3)
    rows = out.orderBy("t").collect()
    assert len(rows) == 7  # first (lag-undefined) row dropped
    assert all(r["di_plus"] == 100.0 for r in rows)
    assert all(r["di_minus"] == 0.0 for r in rows)
    assert all(r["adx"] == 100.0 for r in rows)


def test_adx_flat_prefix_gives_null_di_zero_adx(spark):
    # two flat steps then movement: leading rows have ATR=0 -> DI NULL,
    # DX defined as 0 -> ADX starts at 0 and stays total
    df = _series(spark, [100.0, 100.0, 100.0, 105.0])
    out = adx(df, "p", ["k"], ["t"], n=2)
    rows = out.orderBy("t").collect()
    assert rows[0]["di_plus"] is None and rows[0]["di_minus"] is None
    assert rows[0]["adx"] == 0.0
    assert rows[2]["di_plus"] == 100.0  # all movement upward


def test_aroon_uptrend_and_tiebreak(spark):
    df = _series(spark, [1.0, 2.0, 3.0, 4.0])
    out = aroon(df, "p", ["k"], ["t"], n=4)
    rows = out.orderBy("t").collect()
    assert rows[2]["aroon_up"] is None  # frame short
    r = rows[3]
    # max at frame position 4 -> up=100; min at position 1 -> down=25
    assert (r["aroon_up"], r["aroon_down"], r["aroon_osc"]) == (
        100.0, 25.0, 75.0)
    # tie: two equal maxima -> EARLIEST position wins (documented)
    df2 = _series(spark, [5.0, 9.0, 9.0, 1.0])
    r2 = aroon(df2, "p", ["k"], ["t"], n=4).orderBy("t").collect()[3]
    assert r2["aroon_up"] == 50.0  # position 2 of 4, not 3
    assert r2["aroon_down"] == 100.0

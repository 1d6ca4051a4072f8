"""Known-value tests for functions/barvol.py (Parkinson / Garman-Klass
/ Rogers-Satchell range volatility)."""

import math

import pytest

from datafusion_functions_financial_spark.functions.barvol import (
    K_PARKINSON, bar_volatility,
)


def _bars(spark, rows):
    # rows: (day, open, high, low, close)
    data = [(1, d, float(o), float(h), float(lo), float(c))
            for d, o, h, lo, c in rows]
    return spark.createDataFrame(
        data, "user_id int, day int, open double, high double, "
              "low double, close double")


def _col(df, name):
    return [r[name] for r in df.orderBy("day").collect()]


def test_flat_bars_zero_vol(spark):
    df = _bars(spark, [(d, 10, 10, 10, 10) for d in range(5)])
    out = bar_volatility(df, ("user_id",), ("day",), n=3)
    for c in ("vol_parkinson", "vol_gk", "vol_rs"):
        vals = _col(out, c)
        assert vals[:2] == [None, None]  # frame short
        assert vals[2:] == [0.0, 0.0, 0.0]


def test_parkinson_known_value(spark):
    # every bar: H/L = e -> ln^2 = 1 -> vol = sqrt(K_P)
    e = math.e
    df = _bars(spark, [(d, 1.0, e, 1.0, e) for d in range(4)])
    out = bar_volatility(df, ("user_id",), ("day",), n=2)
    vals = _col(out, "vol_parkinson")
    assert vals[1] == pytest.approx(math.sqrt(K_PARKINSON), abs=1e-4)
    # RS term: ln(H/C)=0 and ln(L/O)=0 -> both products 0 -> vol 0
    assert _col(out, "vol_rs")[1] == 0.0
    # GK: 0.5*1 - K_GK*1 = 0.5 - (2ln2-1) ~ 0.1137 -> sqrt ~ 0.3372
    assert _col(out, "vol_gk")[1] == pytest.approx(
        math.sqrt(0.5 - (2 * math.log(2) - 1)), abs=1e-4)


def test_nonpositive_low_bars_dropped(spark):
    df = _bars(spark, [(0, 1, 2, 1, 2), (1, 1, 2, 0.0, 2),
                       (2, 1, 2, 1, 2)])
    out = bar_volatility(df, ("user_id",), ("day",), n=2)
    assert [r["day"] for r in out.orderBy("day").collect()] == [0, 2]


def test_gk_negative_mean_guarded_null(spark):
    # H=L (no range) but C != O: gk = -K_GK * ln(C/O)^2 < 0 -> NULL
    df = _bars(spark, [(d, 1.0, 2.0, 2.0, 2.0) for d in range(3)])
    out = bar_volatility(df, ("user_id",), ("day",), n=2)
    assert _col(out, "vol_gk")[1:] == [None, None]
    # Parkinson ignores open/close: range zero -> 0.0
    assert _col(out, "vol_parkinson")[1:] == [0.0, 0.0]

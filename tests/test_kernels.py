"""Golden tests for the indicator kernels (FIXTURES.md F1-F4, F8)."""

import math

import numpy as np
import pytest

from datafusion_functions_financial_spark.functions.kernels import (
    ema_kernel,
    macd_kernel,
    rsi_kernel,
    sma_kernel,
)

F1 = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]
F2 = [10.0, 12.0, 13.0, 12.0, 15.0, 11.0, 16.0, 14.0, 18.0, 20.0]
F3 = [44.34, 44.09, 44.15, 43.61, 44.33, 44.83, 45.85, 46.08, 45.89, 46.03,
      46.83, 47.69, 46.49, 46.26, 47.09, 46.66, 46.80, 46.23, 46.38, 46.33,
      46.51]
F4 = [100.0, 102.0, 98.0, 105.0, 107.0, 103.0, 110.0, 108.0, 112.0, 115.0,
      113.0, 118.0, 120.0, 116.0, 122.0, 119.0, 125.0, 123.0, 127.0, 130.0,
      128.0, 132.0, 135.0, 133.0, 138.0, 140.0, 136.0, 142.0, 145.0, 143.0]


def assert_seq(actual, expected, tol=1e-9):
    assert len(actual) == len(expected)
    for i, (a, e) in enumerate(zip(actual, expected)):
        if e is None:
            assert math.isnan(a), f"row {i}: expected NULL, got {a}"
        else:
            assert not math.isnan(a), f"row {i}: expected {e}, got NULL"
            assert a == pytest.approx(e, abs=tol), f"row {i}"


def test_sma_f1():
    out = sma_kernel(F1, 3)
    assert_seq(out, [None, None, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0])


def test_ema_f2():
    out = ema_kernel(F2, 3)
    assert_seq(out, [10.0, 11.0, 12.0, 12.0, 13.5, 12.25, 14.125, 14.0625,
                     16.03125, 18.015625])


def test_rsi_f3_wilder():
    out = rsi_kernel(F3, 14)
    for i in range(14):
        assert math.isnan(out[i])
    # Hand-computed: first 14 changes give avg_gain=5.16/14, avg_loss=2.41/14
    # -> RSI = 100 - 100/(1 + 5.16/2.41) = 68.1638... (FIXTURES.md's "~70.46"
    # is the classic Wilder figure for a *different* dataset).
    assert out[14] == pytest.approx(68.1638, abs=0.001)
    assert all(0.0 <= x <= 100.0 for x in out[14:])


def test_rsi_explicit_recurrence():
    # Independent explicit re-computation of the reference recurrence.
    n = 14
    vals = F3
    gains, losses = [], []
    expected = [None]
    ag = al = None
    for i in range(1, len(vals)):
        chg = vals[i] - vals[i - 1]
        gains.append(chg if chg > 0 else 0.0)
        losses.append(-chg if chg < 0 else 0.0)
        if len(gains) < n:
            expected.append(None)
            continue
        if len(gains) == n:
            ag = sum(gains) / n
            al = sum(losses) / n
        else:
            ag = ag * (1 - 1 / n) + gains[-1] * (1 / n)
            al = al * (1 - 1 / n) + losses[-1] * (1 / n)
        expected.append(100.0 if al == 0 else 100.0 - 100.0 / (1 + ag / al))
    assert_seq(rsi_kernel(vals, n), expected, tol=1e-12)


def test_macd_f4():
    out = macd_kernel(F4)
    assert out[0] == 0.0  # both EMAs seed at the first value
    # Independent recomputation.
    e12 = e26 = None
    expected = []
    for x in F4:
        e12 = x if e12 is None else (2.0 / 13.0) * x + (1 - 2.0 / 13.0) * e12
        e26 = x if e26 is None else (2.0 / 27.0) * x + (1 - 2.0 / 27.0) * e26
        expected.append(e12 - e26)
    assert_seq(out, expected, tol=1e-12)


def test_sma_constant_series_property():
    out = sma_kernel([5.0] * 50, 7)
    assert all(math.isnan(x) for x in out[:6])
    assert all(x == pytest.approx(5.0) for x in out[6:])


@pytest.mark.parametrize("kernel,args", [
    (sma_kernel, (3,)), (ema_kernel, (3,)), (rsi_kernel, (3,)),
    (macd_kernel, ()),
])
def test_null_skip_semantics(kernel, args):
    """NULL in -> NULL out, state unchanged (F8)."""
    base = F2
    with_nulls = []
    for i, x in enumerate(base):
        with_nulls.append(x)
        if i % 3 == 2:
            with_nulls.append(None)
    arr = np.array([np.nan if x is None else x for x in with_nulls])
    out_n = kernel(arr, *args)
    out_base = kernel(np.array(base), *args)
    # Null rows stay null.
    for i, x in enumerate(with_nulls):
        if x is None:
            assert math.isnan(out_n[i])
    # Non-null rows match the null-free series (state unchanged by nulls).
    got = [out_n[i] for i, x in enumerate(with_nulls) if x is not None]
    for a, b in zip(got, out_base):
        assert (math.isnan(a) and math.isnan(b)) or a == b


def test_empty_and_short_inputs():
    assert sma_kernel([], 3).shape == (0,)
    assert ema_kernel([], 3).shape == (0,)
    assert rsi_kernel([], 3).shape == (0,)
    assert macd_kernel([]).shape == (0,)
    assert all(math.isnan(x) for x in rsi_kernel([1.0, 2.0], 14))
    assert all(math.isnan(x) for x in sma_kernel([1.0, 2.0], 3))

"""Property-based kernel tests (hypothesis)."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_functions_financial_spark.functions.kernels import (
    ema_kernel,
    macd_kernel,
    rsi_kernel,
    sma_kernel,
)

prices = st.lists(
    st.floats(min_value=0.01, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    min_size=0, max_size=200,
)
windows = st.integers(min_value=1, max_value=30)


@settings(max_examples=60, deadline=None)
@given(prices, windows)
def test_sma_bounds_and_warmup(xs, w):
    out = sma_kernel(xs, w)
    for i, v in enumerate(out):
        if i < w - 1:
            assert math.isnan(v)
        else:
            lo = min(xs[i - w + 1:i + 1])
            hi = max(xs[i - w + 1:i + 1])
            assert lo - 1e-6 <= v <= hi + 1e-6


@settings(max_examples=60, deadline=None)
@given(prices, windows)
def test_ema_bounds_and_seed(xs, w):
    out = ema_kernel(xs, w)
    if xs:
        assert out[0] == xs[0]  # first-value seed
    for i, v in enumerate(out):
        # EMA is a convex combination of the prefix.
        assert min(xs[:i + 1]) - 1e-6 <= v <= max(xs[:i + 1]) + 1e-6


@settings(max_examples=60, deadline=None)
@given(prices, windows)
def test_rsi_in_range(xs, w):
    out = rsi_kernel(xs, w)
    for i, v in enumerate(out):
        if i <= w - 1 or i < w:
            assert math.isnan(v)
        else:
            assert 0.0 <= v <= 100.0


@settings(max_examples=60, deadline=None)
@given(prices)
def test_macd_shift_invariance(xs):
    # EMA is linear, so MACD(x + c) == MACD(x) up to fp error.
    if not xs:
        return
    base = macd_kernel(xs)
    shifted = macd_kernel([x + 1000.0 for x in xs])
    scale = max(abs(x) for x in xs) + 1000.0
    for a, b in zip(base, shifted):
        assert abs(a - b) <= 1e-7 * scale + 1e-7


@settings(max_examples=40, deadline=None)
@given(prices, windows)
def test_monotone_series_rsi_saturates(xs, w):
    xs = sorted(set(xs))
    if len(xs) < w + 1:
        return
    out = rsi_kernel(xs, w)  # strictly increasing -> all gains -> RSI 100
    assert all(v == 100.0 for v in out[w:])


@settings(max_examples=40, deadline=None)
@given(prices, windows)
def test_nulls_never_change_state(xs, w):
    if not xs:
        return
    with_nulls = []
    for i, x in enumerate(xs):
        with_nulls.append(x)
        if i % 2 == 0:
            with_nulls.append(None)
    arr = np.array([np.nan if x is None else x for x in with_nulls])
    for kernel in (
        lambda v: sma_kernel(v, w),
        lambda v: ema_kernel(v, w),
        lambda v: rsi_kernel(v, w),
        macd_kernel,
    ):
        base = kernel(np.asarray(xs, dtype=float))
        noisy = kernel(arr)
        got = [noisy[i] for i, x in enumerate(with_nulls) if x is not None]
        for a, b in zip(got, base):
            assert (math.isnan(a) and math.isnan(b)) or a == b

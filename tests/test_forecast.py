"""Holt double-exponential smoothing: kernel invariants + the
operator's agreement with a naive reference loop."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_functions_financial_spark.functions.forecast import (
    ALPHA, BETA, holt_kernel, holt_smooth,
)


def _naive(values, alpha=ALPHA, beta=BETA):
    lvl, trd = values[0], 0.0
    out = [(lvl, trd)]
    for x in values[1:]:
        lvl_new = alpha * x + (1.0 - alpha) * (lvl + trd)
        trd = beta * (lvl_new - lvl) + (1.0 - beta) * trd
        lvl = lvl_new
        out.append((lvl, trd))
    return out


def test_constant_series_is_fixed_point():
    lvl, trd = holt_kernel(np.full(50, 7.5))
    assert np.allclose(lvl, 7.5) and np.allclose(trd, 0.0)


def test_linear_series_trend_converges_to_slope():
    xs = 2.0 + 0.5 * np.arange(200, dtype=np.float64)
    lvl, trd = holt_kernel(xs)
    # Level tracks the line and the trend estimate approaches the slope.
    assert abs(trd[-1] - 0.5) < 0.05
    assert abs((lvl[-1] + trd[-1]) - xs[-1]) < 1.0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1,
                max_size=60))
def test_kernel_matches_naive_loop_bitwise(vals):
    lvl, trd = holt_kernel(np.asarray(vals, dtype=np.float64))
    ref = _naive(vals)
    for i, (rl, rt) in enumerate(ref):
        assert lvl[i] == rl and trd[i] == rt


def test_operator_matches_kernel_per_series(spark):
    pdf = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 3,
        "seq": [1, 2, 3, 4, 5, 1, 2, 3],
        "x": [1.0, 2.0, 1.5, 3.0, 2.5, 10.0, 9.0, 11.0],
    })
    out = holt_smooth(
        spark.createDataFrame(pdf, schema="k string, seq long, x double"),
        "x", ["k"], ["seq"],
    ).toPandas().sort_values(["k", "seq"])
    for k, g in pdf.groupby("k"):
        lvl, trd = holt_kernel(g["x"].to_numpy())
        got = out[out["k"] == k]
        assert np.array_equal(got["level"].to_numpy(), lvl)
        assert np.array_equal(got["trend"].to_numpy(), trd)
        assert np.array_equal(got["forecast_1"].to_numpy(), lvl + trd)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.one_of(st.floats(-1e6, 1e6),
                                   st.just(float("nan"))),
                         min_size=1, max_size=40),
                min_size=1, max_size=8))
def test_fold2d_matches_scalar_kernel_bitwise(series_list):
    # allow_nan=True: an IN-SERIES NaN must poison the fold exactly
    # like the scalar kernel (ADVICE r05 — pad slots used to be
    # indistinguishable from data NaNs, so fold2d held state through
    # them while the scalar kernel and the recursive-CTE oracle
    # propagated NaN).
    from datafusion_functions_financial_spark.functions.forecast import (
        holt_fold2d,
    )
    lens = np.array([len(s) for s in series_list], dtype=np.int64)
    maxlen = int(lens.max())
    M = np.full((len(series_list), maxlen), np.nan)
    for g, s in enumerate(series_list):
        M[g, :len(s)] = s
    L2, T2 = holt_fold2d(M, lengths=lens)
    for g, s in enumerate(series_list):
        lvl, trd = holt_kernel(np.asarray(s, dtype=np.float64))
        assert np.array_equal(L2[g, :len(s)], lvl, equal_nan=True)
        assert np.array_equal(T2[g, :len(s)], trd, equal_nan=True)


def test_fold2d_in_series_nan_poisons_like_scalar():
    """The concrete ADVICE repro: [1, NaN, 3] must give NaN at every
    position >= 1 (not 1.4 at position 3)."""
    from datafusion_functions_financial_spark.functions.forecast import (
        holt_fold2d,
    )
    M = np.array([[1.0, np.nan, 3.0]])
    L2, T2 = holt_fold2d(M, lengths=np.array([3]))
    assert L2[0, 0] == 1.0 and T2[0, 0] == 0.0
    assert np.isnan(L2[0, 1]) and np.isnan(L2[0, 2])
    assert np.isnan(T2[0, 1]) and np.isnan(T2[0, 2])
    lvl, trd = holt_kernel(np.array([1.0, np.nan, 3.0]))
    assert np.array_equal(L2[0], lvl, equal_nan=True)
    assert np.array_equal(T2[0], trd, equal_nan=True)

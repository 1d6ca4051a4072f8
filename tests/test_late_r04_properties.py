"""Property-based tests (hypothesis) for the late-r04 numerics:
the Welford anomaly fold and the tail-risk order statistics. These run
pure-Python/numpy — no Spark session — so hypothesis can afford many
examples."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_functions_financial_spark.functions.risk import tail_k
from datafusion_functions_financial_spark.streaming.anomaly import (
    welford_alerts,
)

values = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    min_size=0, max_size=300,
)


@settings(max_examples=100, deadline=None)
@given(values, st.integers(min_value=1, max_value=290))
def test_welford_split_invariance(xs, cut):
    """Folding a series in two chunks through the carried state must
    equal the single-pass fold — the micro-batch boundary contract."""
    arr = np.array(xs, dtype="float64")
    i1, z1, st1 = welford_alerts(arr, 3.0, (0, 0.0, 0.0))
    cut = min(cut, len(arr))
    ia, za, mid = welford_alerts(arr[:cut], 3.0, (0, 0.0, 0.0))
    ib, zb, st2 = welford_alerts(arr[cut:], 3.0, mid)
    assert i1 == ia + [cut + i for i in ib]
    assert z1 == za + zb
    assert st1[0] == st2[0]
    if not (math.isnan(st1[1]) or math.isnan(st2[1])):
        assert st1[1] == st2[1] and st1[2] == st2[2]


@settings(max_examples=100, deadline=None)
@given(values)
def test_welford_moments_match_numpy(xs):
    """The carried (n, mean, M2) must agree with numpy's mean/var
    (sequential Welford is numerically stable; allow float slack)."""
    arr = np.array(xs, dtype="float64")
    _, _, (n, mean, m2) = welford_alerts(arr, 1e18, (0, 0.0, 0.0))
    assert n == len(arr)
    if len(arr):
        np.testing.assert_allclose(mean, arr.mean(), rtol=1e-9,
                                   atol=1e-6)
    if len(arr) > 1:
        np.testing.assert_allclose(
            m2 / (len(arr) - 1), arr.var(ddof=1), rtol=1e-7, atol=1e-4)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=10_000),
       st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_tail_k_bounds(n, q):
    k = tail_k(n, q)
    assert 1 <= k <= n or (q > 0 and k == math.ceil(q * n))
    assert k >= 1
    # monotone in q
    assert tail_k(n, min(1.0, q + 0.1)) >= k

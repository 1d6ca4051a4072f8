"""Property-based tests (hypothesis) for the r04 numeric operators:
each checked against an independent numpy reference on random inputs,
so the Spark implementations are pinned to the math, not to the
oracle SQL they were co-written with."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

values = st.lists(
    st.floats(min_value=-1e5, max_value=1e5, allow_nan=False,
              allow_infinity=False),
    min_size=1, max_size=40,
)
pos_weights = st.lists(
    st.integers(min_value=1, max_value=50), min_size=1, max_size=40,
)


@pytest.fixture(scope="module")
def _spark():
    from conftest import SF_DIR  # noqa: F401  (reuse session config)
    from pyspark.sql import SparkSession
    return SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
    )


@pytest.mark.slow
@settings(max_examples=25, deadline=None)
@given(values, pos_weights)
def test_weighted_quantile_matches_numpy(_spark, xs, ws):
    from datafusion_functions_financial_spark.operators.wquantile import (
        weighted_quantile,
    )
    n = min(len(xs), len(ws))
    xs, ws = xs[:n], ws[:n]
    df = _spark.createDataFrame(
        [("k", i, float(x), float(w)) for i, (x, w) in enumerate(zip(xs, ws))],
        "k string, seq long, v double, w double")
    got = weighted_quantile(df, "v", "w", ["k"], ["seq"]).collect()[0]
    # Reference: first value (by (v, seq) order) whose cumulative
    # weight reaches half the total.
    order = sorted(range(n), key=lambda i: (xs[i], i))
    total = sum(ws)
    cum = 0
    for i in order:
        cum += ws[i]
        if 2 * cum >= total:
            expected = xs[i]
            break
    assert got["total_weight"] == total
    assert got["w_quantile"] == pytest.approx(expected, abs=1e-4)


@settings(max_examples=15, deadline=None)
@given(values)
@pytest.mark.slow
def test_rolling_moments_match_numpy(_spark, xs):
    from datafusion_functions_financial_spark.functions.rollstats2 import (
        rolling_moments,
    )
    n = 5
    df = _spark.createDataFrame(
        [("k", i, float(x)) for i, x in enumerate(xs)],
        "k string, seq long, v double")
    rows = rolling_moments(df, "v", ["k"], ["seq"], n=n) \
        .orderBy("seq").collect()
    for i, r in enumerate(rows):
        if i < n - 1:
            assert r["roll_skew"] is None and r["roll_kurt"] is None
            continue
        frame = np.array(xs[i - n + 1: i + 1])
        m = frame.mean()
        m2 = ((frame - m) ** 2).mean()
        if m2 == 0.0:
            assert r["roll_skew"] is None
            continue
        skew = ((frame - m) ** 3).mean() / m2 ** 1.5
        kurt = ((frame - m) ** 4).mean() / m2 ** 2 - 3.0
        if r["roll_skew"] is not None:
            assert r["roll_skew"] == pytest.approx(skew, abs=2e-4)
            assert r["roll_kurt"] == pytest.approx(kurt, abs=2e-4)


@pytest.mark.slow
@settings(max_examples=15, deadline=None)
@given(values)
def test_resample_interp_is_bounded_by_neighbors(_spark, xs):
    from datafusion_functions_financial_spark.functions.resample import (
        resample_interp,
    )
    s_ns = 10 ** 9
    # One observation every 25 s on a 10 s grid -> gaps to fill.
    rows = [(1, i * 25 * s_ns, i, float(x)) for i, x in enumerate(xs)]
    df = _spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, value double")
    out = resample_interp(df, width_s=10).orderBy("bucket_start").collect()
    lo, hi = min(xs), max(xs)
    for r in out:
        v = r["value_interp"]
        assert v is not None
        assert lo - 1e-4 <= v <= hi + 1e-4  # interp never overshoots
    # Observed buckets carry their own value exactly (modulo rounding).
    obs = [r for r in out if r["n_obs"] > 0]
    assert len(obs) == len(xs)


@pytest.mark.slow
@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.text("ab", min_size=1,
                                                      max_size=3)),
                min_size=0, max_size=30))
def test_snapshot_diff_self_is_empty_and_detects_edits(_spark, rows):
    from datafusion_functions_financial_spark.operators.diff import (
        snapshot_diff,
    )
    uniq = {k: v for k, v in rows}
    if not uniq:
        return
    df = _spark.createDataFrame(
        [(k, v) for k, v in uniq.items()], "id long, v string")
    assert snapshot_diff(df, df, ["id"], ["v"]).count() == 0
    # Mutate one key -> exactly one 'changed' row.
    some_key = next(iter(uniq))
    from pyspark.sql import functions as F
    mutated = df.withColumn(
        "v", F.when(F.col("id") == some_key,
                    F.concat(F.col("v"), F.lit("_X")))
        .otherwise(F.col("v")))
    out = snapshot_diff(df, mutated, ["id"], ["v"]).collect()
    assert [(r["id"], r["status"]) for r in out] == [(some_key, "changed")]

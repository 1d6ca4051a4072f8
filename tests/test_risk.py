"""Known-value unit tests for functions/risk.py (VaR/CVaR, Sortino,
Ulcer index) on tiny hand-computed series."""

import pytest

from datafusion_functions_financial_spark.functions.risk import (
    rolling_sortino, rolling_var_cvar, tail_k, ulcer_index,
)


def _series(spark, prices):
    rows = [(1, i, float(p)) for i, p in enumerate(prices)]
    return spark.createDataFrame(rows, "k int, t int, p double")


def _col(df, name):
    return [r[name] for r in df.orderBy("t").collect()]


def test_tail_k():
    assert tail_k(14, 0.05) == 1
    assert tail_k(20, 0.05) == 1
    assert tail_k(20, 0.10) == 2
    assert tail_k(3, 0.34) == 2
    assert tail_k(5, 0.0) == 1  # never empty


def test_var_cvar_k1_equals_worst_return(spark):
    # returns: +0.10, -0.10, +0.10, -0.10
    df = _series(spark, [100, 110, 99, 108.9, 98.01])
    out = rolling_var_cvar(df, "p", ["k"], ["t"], n=3, q=0.05)  # k=1
    vals = _col(out, "var")
    # first price row dropped (no return), then frame fills at 3 returns
    assert vals[:2] == [None, None]  # rows t=1,2 have short frames
    # t=3 frame returns [.1,-.1,.1] -> worst -0.1 -> VaR 0.1
    assert vals[2] == pytest.approx(0.1)
    assert vals[3] == pytest.approx(0.1)
    cv = _col(out, "cvar")
    assert cv[2:] == vals[2:]  # k=1: CVaR == VaR


def test_cvar_k2_means_two_worst(spark):
    df = _series(spark, [100, 110, 99, 108.9, 98.01])
    out = rolling_var_cvar(df, "p", ["k"], ["t"], n=3, q=0.34)  # k=2
    rows = out.orderBy("t").collect()
    # t=3 frame sorted [-0.1, 0.1, 0.1]: var=-sorted[2]=-0.1,
    # cvar=-(−0.1+0.1)/2 = 0.0 (signed-zero normalized to +0.0)
    assert rows[2]["var"] == pytest.approx(-0.1)
    assert rows[2]["cvar"] == 0.0
    assert str(rows[2]["cvar"]) == "0.0"  # not −0.0


def test_sortino_constant_downside(spark):
    # every return is exactly -0.1 -> mu=-0.1, dd=0.1 -> sortino=-1
    df = _series(spark, [100, 90, 81, 72.9])
    out = rolling_sortino(df, "p", ["k"], ["t"], n=2)
    vals = _col(out, "sortino")
    assert vals[0] is None  # one return only
    assert vals[1] == pytest.approx(-1.0)
    assert vals[2] == pytest.approx(-1.0)


def test_sortino_null_when_no_downside(spark):
    df = _series(spark, [100, 110, 121, 133.1])
    out = rolling_sortino(df, "p", ["k"], ["t"], n=2)
    assert _col(out, "sortino") == [None, None, None]


def test_ulcer_zero_on_rising_series(spark):
    df = _series(spark, list(range(100, 110)))
    out = ulcer_index(df, "p", ["k"], ["t"], n=3)
    vals = _col(out, "ulcer")
    assert vals[:4] == [None] * 4  # until row 2n-1 = 5 (1-based)
    assert all(v == 0.0 for v in vals[4:])


def test_ulcer_known_value(spark):
    # flat then one 50% drop: dd series 0,0,0,-50; n=2 frames
    df = _series(spark, [100, 100, 100, 50])
    out = ulcer_index(df, "p", ["k"], ["t"], n=2)
    vals = _col(out, "ulcer")
    # row t=2 (rn=3 >= 2n-1): frame dd [0,0] -> 0
    assert vals[2] == 0.0
    # t=3: dd=-50 (max of [100,50]=100), frame [0,-50]:
    # sqrt((0+2500)/2) = 35.3553
    assert vals[3] == pytest.approx(35.3553, abs=1e-4)


def test_zero_prev_value_rows_are_dropped(spark):
    # a zero price makes the next return undefined: dropped, not error
    df = _series(spark, [100, 0.0, 100, 110])
    out = rolling_var_cvar(df, "p", ["k"], ["t"], n=2, q=0.5)
    rows = out.collect()
    # returns defined: t=1 (0/100-1=-1), t=3 (0.1); t=2 dropped
    assert sorted(r["t"] for r in rows) == [1, 3]


def test_drawdown_episodes_islands(spark):
    from datafusion_functions_financial_spark.functions.risk import (
        drawdown_episodes,
    )
    # peaks at 100 (t0), dips, recovers to new high 110 (t3), dips twice
    df = _series(spark, [100, 90, 95, 110, 105, 99])
    out = drawdown_episodes(df, "p", ["k"], ["t"]).collect()
    eps = {r["episode"]: r for r in out}
    assert len(eps) == 2
    # episode after the first high: rows 90,95 under peak 100
    e1 = eps[1]
    assert (e1["peak_cents"], e1["trough_cents"], e1["duration"]) \
        == (10000, 9000, 2)
    assert e1["depth"] == pytest.approx(-0.1)
    # episode after the 110 high: rows 105,99
    e2 = eps[2]
    assert (e2["peak_cents"], e2["trough_cents"], e2["duration"]) \
        == (11000, 9900, 2)
    assert e2["depth"] == pytest.approx(-0.1)


def test_drawdown_episodes_none_on_monotonic_rise(spark):
    from datafusion_functions_financial_spark.functions.risk import (
        drawdown_episodes,
    )
    df = _series(spark, [1, 2, 3, 4])
    assert drawdown_episodes(df, "p", ["k"], ["t"]).count() == 0

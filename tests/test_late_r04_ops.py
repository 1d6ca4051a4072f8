"""Known-value unit tests for the late-r04 operator batch: CMO,
Stochastic RSI, Heikin-Ashi, sliding HLL WAU, cohort LTV, seasonality,
flow imbalance, Roll spread."""

import pytest

from pyspark.sql import functions as F


def _series(spark, prices):
    rows = [(1, i, float(p)) for i, p in enumerate(prices)]
    return spark.createDataFrame(rows, "k int, t int, p double")


def test_cmo_known_values(spark):
    from datafusion_functions_financial_spark.functions.technical4 import cmo
    # changes (cents): +100, +100, -100; frame n=3 fills at t=3
    df = _series(spark, [10.0, 11.0, 12.0, 11.0])
    out = {r["t"]: r["cmo"] for r in
           cmo(df, "p", ["k"], ["t"], n=3).collect()}
    assert out[0] is None and out[2] is None  # only 2 changes by t=2
    assert out[3] == pytest.approx(100.0 * (200 - 100) / 300, abs=1e-4)


def test_cmo_flat_frame_is_null(spark):
    from datafusion_functions_financial_spark.functions.technical4 import cmo
    df = _series(spark, [5.0] * 6)
    vals = [r["cmo"] for r in cmo(df, "p", ["k"], ["t"], n=2).collect()]
    assert all(v is None for v in vals)


def test_stoch_rsi_bounds_and_warmup(spark):
    from datafusion_functions_financial_spark.functions.technical4 import (
        stoch_rsi,
    )
    import random
    rng = random.Random(7)
    df = _series(spark, [100 + rng.uniform(-5, 5) for _ in range(60)])
    rows = stoch_rsi(df, "p", ["k"], ["t"], rsi_n=5, stoch_n=5) \
        .orderBy("t").collect()
    vals = [r["stoch_rsi"] for r in rows]
    # rsi defined from row 5; stoch needs 5 rsi values -> first non-null
    # at row 9 at the earliest
    assert all(v is None for v in vals[:9])
    non_null = [v for v in vals if v is not None]
    assert non_null and all(0.0 <= v <= 1.0 for v in non_null)


def test_heikin_ashi_recursion(spark):
    from datafusion_functions_financial_spark.functions.candles import (
        heikin_ashi,
    )
    bars = spark.createDataFrame(
        [(1, 0, 10.0, 12.0, 8.0, 11.0), (1, 1, 11.0, 13.0, 10.0, 12.0)],
        "user_id int, day int, open double, high double, low double, "
        "close double")
    out = {r["day"]: r for r in heikin_ashi(bars).collect()}
    hc0 = (10 + 12 + 8 + 11) / 4          # 10.25
    ho0 = (10 + 11) / 2                   # 10.5
    assert out[0]["ha_close"] == pytest.approx(hc0)
    assert out[0]["ha_open"] == pytest.approx(ho0)
    assert out[1]["ha_open"] == pytest.approx((ho0 + hc0) / 2)
    assert out[0]["ha_high"] == 12.0  # max(high, ho, hc)
    assert out[0]["ha_low"] == 8.0


def test_sliding_hll_matches_exact_on_small_sets(spark):
    from datafusion_functions_financial_spark.operators.sketch import (
        sliding_hll_distinct,
    )
    # days 0..3, 3 users each with churn; HLL is near-exact at n~10
    rows = [(d, u) for d in range(4) for u in (d, d + 1, d + 2)]
    df = spark.createDataFrame(rows, "day bigint, user_id bigint")
    out = {r["day"]: r["wau_hll"]
           for r in sliding_hll_distinct(df, "user_id", "day", 2)
           .collect()}
    # trailing-2-day exact: day0={0,1,2}=3; day1={0..3}=4; day2={1..4}=4
    assert out[0] == pytest.approx(3, abs=0.5)
    assert out[1] == pytest.approx(4, abs=0.6)
    assert set(out) == {0, 1, 2, 3}  # only observed days emitted


def test_cohort_ltv_accumulates(spark):
    from datafusion_functions_financial_spark.plans.analytics3 import (
        cohort_ltv,
    )
    import datetime
    rows = [
        (1, datetime.datetime(2024, 1, 5), 10.0),
        (1, datetime.datetime(2024, 2, 5), 20.0),
        (2, datetime.datetime(2024, 2, 1), 5.0),
    ]
    orders = spark.createDataFrame(
        rows, "o_custkey bigint, o_orderdate timestamp, "
              "o_totalprice double")
    out = {(r["cohort_month"], r["offset"]): r
           for r in cohort_ltv(orders).collect()}
    jan = 2024 * 12 + 0
    feb = jan + 1
    assert out[(jan, 0)]["cum_cents"] == 1000
    assert out[(jan, 1)]["cum_cents"] == 3000  # cumulative
    assert out[(feb, 0)]["cum_cents"] == 500


def test_flow_imbalance_counts(spark):
    from datafusion_functions_financial_spark.operators.microstructure \
        import flow_imbalance
    # prices: up, up, down -> signs +1 +1 -1 (first tick unsigned)
    rows = [("A", i * 1_000_000_000, i, p)
            for i, p in enumerate([100, 101, 102, 101])]
    df = spark.createDataFrame(
        rows, "ticker string, sip_timestamp long, sequence_number long,"
              " price long")
    out = flow_imbalance(df, ("ticker",), "sip_timestamp", "price",
                         ("sequence_number",),
                         bucket_seconds=3600).collect()
    r = out[0]
    assert (r["n_buys"], r["n_sells"]) == (2, 1)
    assert r["imbalance"] == pytest.approx(1 / 3, abs=1e-4)


def test_roll_spread_sign_requirement(spark):
    from datafusion_functions_financial_spark.operators.microstructure \
        import roll_spread
    # alternating bounce: +1,-1,+1,-1... -> negative serial cov -> value
    prices = [100 + (i % 2) for i in range(30)]
    rows = [("A", i * 10, i, p) for i, p in enumerate(prices)]
    df = spark.createDataFrame(
        rows, "ticker string, sip_timestamp long, sequence_number long,"
              " price long")
    r = roll_spread(df, ("ticker",), "sip_timestamp", "price",
                    ("sequence_number",)).collect()[0]
    assert r["roll_spread_cents"] is not None
    assert r["roll_spread_cents"] > 0
    # trending series: positive serial cov -> NULL
    rows2 = [("A", i * 10, i, 100 + i) for i in range(30)]
    df2 = spark.createDataFrame(
        rows2, "ticker string, sip_timestamp long, sequence_number long,"
               " price long")
    r2 = roll_spread(df2, ("ticker",), "sip_timestamp", "price",
                     ("sequence_number",)).collect()[0]
    assert r2["roll_spread_cents"] is None

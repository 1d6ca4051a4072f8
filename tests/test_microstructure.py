"""Microstructure operators on synthetic trades/quotes (TRADES/QUOTES
schemas from the Polygon loader)."""

import pytest

from datafusion_functions_financial_spark.operators.microstructure import (
    quote_spread_stats,
    sign_trades,
    vwap,
)
from datafusion_functions_financial_spark.sources.schemas import (
    QUOTES,
    TRADES,
)

NS = 1_000_000_000


@pytest.fixture()
def trades_df(spark):
    base = 1_700_000_000 * NS
    rows = [
        # ticker, sip_timestamp, price, size, exchange, conditions
        ("AAA", base + 0 * NS, 10.0, 100, 1, ""),
        ("AAA", base + 1 * NS, 10.5, 200, 1, ""),   # uptick +1
        ("AAA", base + 2 * NS, 10.5, 50, 1, ""),    # zero-tick carries +1
        ("AAA", base + 3 * NS, 10.0, 100, 1, ""),   # downtick -1
        ("AAA", base + 70 * NS, 11.0, 300, 1, ""),  # next minute bucket
        ("BBB", base + 0 * NS, 5.0, 10, 1, ""),
        ("BBB", base + 1 * NS, 5.0, 10, 1, ""),     # zero-tick, no prior sign
    ]
    return spark.createDataFrame(rows, TRADES)


@pytest.fixture()
def quotes_df(spark):
    base = 1_700_000_000 * NS
    rows = [
        ("AAA", base + 0, 9.9, 10, 10.1, 10),
        ("AAA", base + 1, 9.8, 10, 10.2, 20),
        ("AAA", base + 2, 10.2, 10, 10.0, 5),  # crossed quote
        ("BBB", base + 0, 5.0, 1, 5.1, 1),
    ]
    return spark.createDataFrame(rows, QUOTES)


def test_sign_trades_tick_rule(trades_df):
    rows = {
        (r["ticker"], r["sip_timestamp"]): r["trade_sign"]
        for r in sign_trades(trades_df).collect()
    }
    base = 1_700_000_000 * NS
    assert rows[("AAA", base + 0 * NS)] is None  # no prior change
    assert rows[("AAA", base + 1 * NS)] == 1
    assert rows[("AAA", base + 2 * NS)] == 1  # carried through zero-tick
    assert rows[("AAA", base + 3 * NS)] == -1
    assert rows[("AAA", base + 70 * NS)] == 1
    assert rows[("BBB", base + 1 * NS)] is None  # zero-tick, nothing to carry


def test_quote_spread_stats(quotes_df):
    out = {r["ticker"]: r for r in quote_spread_stats(quotes_df).collect()}
    a = out["AAA"]
    assert a["n_quotes"] == 3
    # spreads: 0.2, 0.4, -0.2 -> avg ~0.1333
    assert a["avg_spread"] == pytest.approx(0.133333, abs=1e-6)
    assert a["crossed_quotes"] == 1
    assert a["min_bid"] == pytest.approx(9.8)
    assert a["max_ask"] == pytest.approx(10.2)
    assert out["BBB"]["avg_spread"] == pytest.approx(0.1)


def test_vwap_bucketed(trades_df):
    out = {
        (r["ticker"], r["bucket_start"]): r
        for r in vwap(trades_df, bucket_seconds=60).collect()
    }
    base_s = 1_700_000_000
    bucket0 = (base_s // 60) * 60
    a0 = out[("AAA", bucket0)]
    # (10*100 + 10.5*200 + 10.5*50 + 10*100) / 450
    assert a0["vwap"] == pytest.approx(
        (10.0 * 100 + 10.5 * 200 + 10.5 * 50 + 10.0 * 100) / 450, abs=1e-6
    )
    assert a0["volume"] == 450
    bucket1 = ((base_s + 70) // 60) * 60
    assert out[("AAA", bucket1)]["vwap"] == pytest.approx(11.0)

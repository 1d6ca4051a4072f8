"""Segmented (parallel-in-time) indicators vs the serial kernels."""

import math

import numpy as np
import pandas as pd
import pytest

from datafusion_functions_financial_spark.functions import indicators as ind
from datafusion_functions_financial_spark.functions.kernels import (
    ema_kernel,
    macd_kernel,
    rsi_kernel,
    sma_kernel,
)
from datafusion_functions_financial_spark.functions.segmented import (
    with_indicators_segmented,
)

SPECS = [ind.sma(10), ind.ema(12), ind.rsi(14), ind.macd()]


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    for sym in ("AAA", "BBB"):
        # One long series per symbol, 40-row buckets (first > window=14).
        price = 100.0
        for i in range(400):
            price += float(rng.normal(0, 1))
            rows.append((sym, i, i // 40, price))
    pdf = pd.DataFrame(rows, columns=["symbol", "seq", "bucket", "price"])
    return spark.createDataFrame(pdf), pdf


def test_segmented_matches_serial(spark, series_df):
    sdf, pdf = series_df
    out = with_indicators_segmented(
        sdf, "price", ["seq"], ["symbol"], "bucket", SPECS
    ).toPandas().sort_values(["symbol", "seq"]).reset_index(drop=True)

    for sym in ("AAA", "BBB"):
        mask = out["symbol"] == sym
        prices = pdf[pdf["symbol"] == sym]["price"].to_numpy()
        expected = {
            "sma_10": sma_kernel(prices, 10),
            "ema_12": ema_kernel(prices, 12),
            "rsi_14": rsi_kernel(prices, 14),
            "macd": macd_kernel(prices),
        }
        for col, exp in expected.items():
            got = out[mask][col].to_numpy()
            assert len(got) == len(exp)
            for i, (g, e) in enumerate(zip(got, exp)):
                if math.isnan(e):
                    assert g is None or math.isnan(g), (sym, col, i)
                else:
                    assert g == pytest.approx(e, rel=1e-9, abs=1e-9), (
                        sym, col, i,
                    )


def test_segmented_rsi_requires_seed_in_first_bucket(spark):
    pdf = pd.DataFrame({
        "symbol": ["A"] * 20,
        "seq": range(20),
        "bucket": [i // 5 for i in range(20)],  # buckets of 5 < window
        "price": [float(100 + i) for i in range(20)],
    })
    with pytest.raises(Exception, match="first bucket"):
        with_indicators_segmented(
            spark.createDataFrame(pdf), "price", ["seq"], ["symbol"],
            "bucket", [ind.rsi(14)],
        )

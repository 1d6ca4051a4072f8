"""OHLCV bar builder vs a pandas resample oracle, plus sketch bounds."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.functions.bars import ohlcv_bars


@pytest.fixture(scope="module")
def tick_df(spark):
    rng = np.random.default_rng(3)
    rows = []
    base_us = 1_700_000_000_000_000
    for sym in ("AAA", "BBB"):
        t = base_us
        price = 100.0
        for _ in range(500):
            t += int(rng.integers(1_000_000, 30_000_000))  # 1-30s spacing
            price += float(rng.normal(0, 0.5))
            rows.append((sym, t, price, int(rng.integers(1, 100))))
    pdf = pd.DataFrame(rows, columns=["symbol", "us", "price", "size"])
    return spark.createDataFrame(pdf), pdf


def test_ohlcv_bars_match_pandas_resample(spark, tick_df):
    sdf, pdf = tick_df
    bars = ohlcv_bars(
        sdf, "us", "price", ["symbol"], bar_seconds=300,
        volume_col="size", ts_unit="us",
    ).toPandas()

    pdf = pdf.sort_values(["symbol", "us"])
    pdf["bar_start"] = (pdf["us"] // (300 * 1_000_000)) * 300
    exp = pdf.groupby(["symbol", "bar_start"]).agg(
        open=("price", "first"), high=("price", "max"),
        low=("price", "min"), close=("price", "last"),
        n_ticks=("price", "size"), volume=("size", "sum"),
    ).reset_index()

    got = bars.sort_values(["symbol", "bar_start"]).reset_index(drop=True)
    exp = exp.sort_values(["symbol", "bar_start"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for col in ("open", "high", "low", "close"):
        assert np.allclose(got[col], exp[col])
    assert (got["n_ticks"].to_numpy() == exp["n_ticks"].to_numpy()).all()
    assert (got["volume"].to_numpy() == exp["volume"].to_numpy()).all()


def test_approx_count_distinct_bounds(spark, sf_dir):
    """Sketch aggregation (HLL): error within the configured rsd."""
    from datafusion_functions_financial_spark.sources.tables import load

    ev = load(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    approx = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("a")
    ).collect()[0]["a"]
    assert abs(approx - exact) <= max(3, 0.08 * exact)

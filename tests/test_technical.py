"""Semantics tests for functions/technical.py on hand-built series."""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.functions import technical


def _series(spark, vals, key="a"):
    rows = [(key, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, seq long, v double")


def test_atr_close_to_close(spark):
    df = technical.atr(_series(spark, [10, 12, 11, 15, 15]), "v",
                       ["k"], ["seq"], n=2)
    got = {r["seq"]: r["atr"] for r in df.collect()}
    # true ranges: null, 2, 1, 4, 0 -> 2-row means from seq=2
    assert got[0] is None and got[1] is None
    assert got[2] == pytest.approx(1.5)
    assert got[3] == pytest.approx(2.5)
    assert got[4] == pytest.approx(2.0)


def test_stochastic_bounds_and_flat_frame(spark):
    df = technical.stochastic(_series(spark, [1, 2, 3, 3, 3, 3]), "v",
                              ["k"], ["seq"], n=3, d_n=2)
    rows = {r["seq"]: r for r in df.collect()}
    assert rows[0]["stoch_k"] is None  # warm-up
    assert rows[2]["stoch_k"] == pytest.approx(100.0)  # max of frame
    # frame [3,3,3] is flat -> NULL (nullif), not a division error
    assert rows[5]["stoch_k"] is None
    ks = [r["stoch_k"] for r in rows.values() if r["stoch_k"] is not None]
    assert all(0.0 <= k <= 100.0 for k in ks)


def test_obv_signs_and_first_row(spark):
    rows = [("a", 0, 10.0, 5), ("a", 1, 12.0, 3), ("a", 2, 11.0, 7),
            ("a", 3, 11.0, 2)]
    df = spark.createDataFrame(rows, "k string, seq long, p double, vol long")
    out = technical.obv(df, "p", "vol", ["k"], ["seq"])
    got = {r["seq"]: r["obv"] for r in out.collect()}
    assert got[0] == 0      # first row contributes 0
    assert got[1] == 3      # up: +3
    assert got[2] == -4     # down: -7
    assert got[3] == -4     # flat: +0


def test_log_returns_guard_nonpositive(spark):
    df = technical.log_returns(_series(spark, [4, 2, 0, 8]), "v",
                               ["k"], ["seq"])
    rows = {r["seq"]: r for r in df.collect()}
    assert rows[0]["log_ret"] is None
    assert rows[1]["log_ret"] == pytest.approx(math.log(0.5), abs=1e-4)
    assert rows[2]["log_ret"] is None   # price 0 -> guarded
    assert rows[3]["log_ret"] is None   # prev 0 -> guarded
    assert rows[1]["cum_ret"] == pytest.approx(-0.5)
    assert rows[2]["cum_ret"] is None


def test_keys_partition_independently(spark):
    rows = [("a", 0, 1.0), ("b", 0, 100.0), ("a", 1, 2.0), ("b", 1, 50.0)]
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    out = technical.log_returns(df, "v", ["k"], ["seq"])
    got = {(r["k"], r["seq"]): r["log_ret"] for r in out.collect()}
    assert got[("a", 1)] == pytest.approx(math.log(2.0), abs=1e-4)
    assert got[("b", 1)] == pytest.approx(math.log(0.5), abs=1e-4)


def test_roc_warmup_and_value(spark):
    df = technical.roc(_series(spark, [10, 10, 10, 10, 10, 12]), "v",
                       ["k"], ["seq"], n=5)
    got = {r["seq"]: r["roc"] for r in df.collect()}
    assert all(got[i] is None for i in range(5))  # warm-up: lag(5) null
    assert got[5] == pytest.approx(20.0)  # 12/10 - 1 = +20%


def test_donchian_channel_bounds(spark):
    df = technical.donchian(_series(spark, [3, 1, 4, 1, 5, 9]), "v",
                            ["k"], ["seq"], n=3)
    rows = {r["seq"]: r for r in df.collect()}
    assert rows[1]["don_hi"] is None  # frame short
    assert (rows[2]["don_hi"], rows[2]["don_lo"]) == (4.0, 1.0)
    assert rows[2]["don_mid"] == pytest.approx(2.5)
    assert (rows[5]["don_hi"], rows[5]["don_lo"]) == (9.0, 1.0)

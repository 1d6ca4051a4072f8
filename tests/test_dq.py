"""Data-quality operators (operators/dq.py): Benford digit report and
key-uniqueness profile."""

import math

import pytest

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.dq import (
    BENFORD_P, benford_report, unique_key_report,
)


def test_benford_probs_sum_to_one():
    assert sum(BENFORD_P) == pytest.approx(1.0)


def test_benford_digit_extraction_and_counts(spark):
    # cents first digits: 0.019->2c->2, 1234->123400->1, 9.99->999->9,
    # 0.05->5c->5, 3.0->300->3; negatives and zero excluded
    amounts = [0.019, 1234.0, 9.99, 0.05, 3.0, -4.0, 0.0]
    df = spark.createDataFrame([(float(a),) for a in amounts],
                               "amt double")
    out = benford_report(df, "amt").collect()[0]
    assert out["n_values"] == 5
    assert (out["n1"], out["n2"], out["n3"], out["n5"], out["n9"]) \
        == (1, 1, 1, 1, 1)
    assert out["n4"] == out["n6"] == out["n7"] == out["n8"] == 0
    assert out["chi2"] is not None and out["chi2"] >= 0.0


def test_benford_perfect_distribution_low_chi2(spark):
    # counts proportional to Benford probs -> chi2 near 0
    rows = []
    for d in range(1, 10):
        n = round(BENFORD_P[d - 1] * 10000)
        rows += [(float(d),)] * n
    df = spark.createDataFrame(rows, "amt double")
    out = benford_report(df, "amt", scale=1).collect()[0]
    uniform = spark.createDataFrame(
        [(float(d),) for d in range(1, 10)] * 100, "amt double")
    out_u = benford_report(uniform, "amt", scale=1).collect()[0]
    assert out["chi2"] < out_u["chi2"]
    assert out["chi2"] < 1.0


def test_benford_grouped(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 90.0)], "g string, amt double")
    rows = {r["g"]: r for r in benford_report(df, "amt", ["g"]).collect()}
    assert rows["a"]["n_values"] == 2 and rows["b"]["n9"] == 1


def test_unique_key_report(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k bigint")
    r = unique_key_report(df, ["k"]).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["n_dup_keys"],
            r["n_dup_rows"], r["max_multiplicity"]) == (5, 3, 1, 3, 3)


def test_unique_key_report_all_unique(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "k bigint")
    r = unique_key_report(df, ["k"]).collect()[0]
    assert (r["n_dup_keys"], r["n_dup_rows"], r["max_multiplicity"]) \
        == (0, 0, 1)

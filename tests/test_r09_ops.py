"""Hand-checkable semantics for the r09 operators (mlmetrics2,
stats9, inequality). Engine parity is covered by the oracle net and
the on-landing 3-SF driver-contract verification."""

import pytest

import math

from datafusion_functions_financial_spark.operators.inequality import (
    theil_atkinson,
)
from datafusion_functions_financial_spark.operators.mlmetrics2 import (
    brier_decomposition, pr_auc,
)
from datafusion_functions_financial_spark.operators.stats9 import (
    cohens_kappa, levene_test, trend_test,
)


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_pr_auc_hand_computed(spark):
    # scores 4>3>2>1, labels 1,0,1,0: block precisions 1/1 and 2/3 at
    # the positives -> AP = (1 + 2/3) / 2 = 0.833333
    df = spark.createDataFrame(
        [(4.0, "p"), (3.0, "n"), (2.0, "p"), (1.0, "n")],
        "score double, lab string")
    row = pr_auc(df, "score", "lab = 'p'").collect()[0]
    assert row["n_pos"] == 2 and row["n_neg"] == 2
    assert row["pr_auc"] == round(round((1.0 + 2.0 / 3.0) / 2 * 1e6)
                                  / 1e6, 6)


def test_pr_auc_ties_enter_as_one_block(spark):
    # all four scores tied: one block, precision = 2/4 after the
    # block, each positive contributes 0.5 -> AP = 0.5 (the
    # pessimistic tie definition; a row-level AP would be
    # order-dependent here).
    df = spark.createDataFrame(
        [(1.0, 1), (1.0, 0), (1.0, 1), (1.0, 0)],
        "score double, y int")
    row = pr_auc(df, "score", "y = 1").collect()[0]
    assert row["pr_auc"] == 0.5


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_brier_perfect_and_uniform(spark):
    # all-negative labels with p=0: every term 0.
    df = spark.createDataFrame([(0.0, 0)] * 4, "p double, y int")
    row = brier_decomposition(df, "p", "y = 1").collect()[0]
    assert row["brier"] == 0.0 and row["uncertainty"] == 0.0
    # constant p=0.5 on a 50/50 sample: brier 0.25, reliability 0
    # (pbar == ybar in the single bin), resolution 0, uncertainty 0.25
    df2 = spark.createDataFrame([(0.5, 1), (0.5, 0)] * 4,
                                "p double, y int")
    r2 = brier_decomposition(df2, "p", "y = 1").collect()[0]
    assert r2["brier"] == 0.25 and r2["uncertainty"] == 0.25
    assert r2["reliability"] == 0.0 and r2["resolution"] == 0.0


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_levene_symmetric_groups_give_zero(spark):
    # both groups have the SAME |x - mean| pattern (2, 0, 2) ->
    # identical z-means -> between-group numerator 0 -> W = 0
    # (within-group SS stays > 0, so the ratio is a clean zero).
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 2.0), ("a", 4.0),
         ("b", 10.0), ("b", 12.0), ("b", 14.0)],
        "g string, x double")
    row = levene_test(df, "x", "g").collect()[0]
    assert row["k"] == 2 and row["n"] == 6
    assert row["w_stat"] == 0.0


def test_trend_test_flat_rate_is_zero(spark):
    # identical positive rate at every ordinal level -> T = 0.
    rows = []
    for s in range(4):
        rows += [(s, 1), (s, 0)]
    df = spark.createDataFrame(rows, "s int, y int")
    row = trend_test(df, "s", "y = 1").collect()[0]
    assert row["z_trend"] == 0.0


def test_trend_test_monotone_rate_is_positive(spark):
    # rate rises with the level -> z > 0.
    rows = [(0, 0)] * 9 + [(0, 1)] + [(1, 0)] * 5 + [(1, 1)] * 5 \
        + [(2, 1)] * 9 + [(2, 0)]
    df = spark.createDataFrame(rows, "s int, y int")
    row = trend_test(df, "s", "y = 1").collect()[0]
    assert row["z_trend"] > 3.0


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_cohens_kappa_bounds(spark):
    # perfect agreement -> kappa = 1
    df = spark.createDataFrame([(1, 1)] * 3 + [(0, 0)] * 3,
                               "a int, b int")
    row = cohens_kappa(df, "a = 1", "b = 1").collect()[0]
    assert row["kappa"] == 1.0 and row["po"] == 1.0
    # agreement exactly at chance -> kappa = 0 (independent 50/50)
    df2 = spark.createDataFrame(
        [(1, 1), (1, 0), (0, 1), (0, 0)], "a int, b int")
    r2 = cohens_kappa(df2, "a = 1", "b = 1").collect()[0]
    assert r2["kappa"] == 0.0


def test_theil_atkinson_equal_values_zero(spark):
    df = spark.createDataFrame([(10.0,)] * 5, "x double")
    row = theil_atkinson(df, "x").collect()[0]
    assert row["theil_t"] == 0.0
    assert row["atkinson_05"] == 0.0
    assert row["mean"] == 10.0


def test_theil_two_point_hand_computed(spark):
    # x = [1, 3]: mu = 2; T = (1/2)[(1/2)ln(1/2) + (3/2)ln(3/2)]
    df = spark.createDataFrame([(1.0,), (3.0,)], "x double")
    row = theil_atkinson(df, "x").collect()[0]
    want = 0.5 * (0.5 * math.log(0.5) + 1.5 * math.log(1.5))
    assert abs(row["theil_t"] - want) < 1e-6

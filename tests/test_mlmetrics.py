"""mlmetrics operator tests: naive-reference math checks for the exact
rank-based AUC / calibration / gains / threshold sweep / BH-FDR, and
plan-shape guards asserting the data-sized rank window is PARTITIONED
(bucketed prefix sum) rather than a single-partition global sort.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.mlmetrics import (
    auc, bh_fdr_dow, calibration_bins, gains_lift, threshold_metrics,
)


def _labeled_df(spark, scores, labels):
    return spark.createDataFrame(
        [(float(s), int(y), i) for i, (s, y) in
         enumerate(zip(scores, labels))],
        "v double, y int, id long")


def _naive_auc(scores, labels):
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    num = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return num / (len(pos) * len(neg))


# --------------------------------------------------------------------------
# AUC
# --------------------------------------------------------------------------


def test_auc_perfect_separation(spark):
    df = _labeled_df(spark, [1, 2, 3, 4], [0, 0, 1, 1])
    row = auc(df, "v", "y = 1").collect()[0]
    assert row["n_pos"] == 2 and row["n_neg"] == 2
    assert row["auc"] == pytest.approx(1.0)


def test_auc_all_tied_is_half(spark):
    df = _labeled_df(spark, [5, 5, 5, 5], [0, 1, 0, 1])
    assert auc(df, "v", "y = 1").collect()[0]["auc"] == \
        pytest.approx(0.5)


def test_auc_matches_naive_pairwise_with_ties(spark):
    rng = np.random.RandomState(7)
    scores = np.round(rng.normal(size=300), 1)  # coarse: many ties
    labels = (rng.uniform(size=300) < 0.4).astype(int)
    labels[:3] = [1, 0, 1]  # both classes guaranteed
    df = _labeled_df(spark, scores, labels)
    got = auc(df, "v", "y = 1").collect()[0]["auc"]
    assert got == pytest.approx(
        _naive_auc(scores.tolist(), labels.tolist()), abs=1e-6)


def test_auc_rank_window_is_bucket_partitioned(spark, sf_dir):
    """The data-sized cumulative window must be keyed by the range
    bucket — a plain global ORDER BY window would collapse to one
    partition and die at scale."""
    from datafusion_functions_financial_spark.plans.registry import (
        all_queries,
    )
    df = all_queries()["q_auc_events"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(__b" in plan, plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# calibration / gains
# --------------------------------------------------------------------------


def test_calibration_bins_partition_and_rates(spark):
    rng = np.random.RandomState(11)
    scores = rng.uniform(size=200)
    labels = (scores + rng.normal(scale=0.2, size=200) > 0.5).astype(int)
    df = _labeled_df(spark, scores, labels)
    rows = calibration_bins(df, "v", "y = 1", "id").collect()
    assert sorted(r["bin"] for r in rows) == list(range(10))
    assert sum(r["n"] for r in rows) == 200
    assert all(r["n"] == 20 for r in rows)  # 200 divides evenly
    assert all(0.0 <= r["pos_rate"] <= 1.0 for r in rows)
    by_bin = {r["bin"]: r for r in rows}
    # informative score: top decile's positive rate beats the bottom's
    assert by_bin[9]["pos_rate"] > by_bin[0]["pos_rate"]
    # mean score is monotone in the bin by construction
    means = [by_bin[b]["mean_score"] for b in range(10)]
    assert means == sorted(means)


def test_gains_lift_monotone_and_complete(spark):
    rng = np.random.RandomState(13)
    scores = rng.uniform(size=200)
    labels = (rng.uniform(size=200) < scores).astype(int)
    labels[0] = 1
    df = _labeled_df(spark, scores, labels)
    rows = sorted(gains_lift(df, "v", "y = 1", "id").collect(),
                  key=lambda r: r["bin_rank"])
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains)              # nondecreasing
    assert gains[-1] == pytest.approx(1.0)     # all positives captured
    assert rows[-1]["cum_n"] == 200
    assert rows[-1]["lift"] == pytest.approx(1.0)  # full population
    # top decile concentrates positives: lift above 1
    assert rows[0]["lift"] > 1.0


# --------------------------------------------------------------------------
# threshold sweep
# --------------------------------------------------------------------------


def test_threshold_metrics_conservation_and_monotone(spark):
    rng = np.random.RandomState(17)
    scores = rng.normal(size=400)
    labels = (rng.uniform(size=400) < 0.3).astype(int)
    df = _labeled_df(spark, scores, labels)
    rows = sorted(threshold_metrics(df, "v", "y = 1").collect(),
                  key=lambda r: r["i"])
    assert [r["i"] for r in rows] == list(range(1, 10))
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 400
    # raising the threshold can only shrink the predicted-positive set
    preds = [r["tp"] + r["fp"] for r in rows]
    assert preds == sorted(preds, reverse=True)
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)


def test_threshold_metrics_f1_consistency(spark):
    df = _labeled_df(spark, list(range(100)),
                     [int(i >= 50) for i in range(100)])
    rows = threshold_metrics(df, "v", "y = 1").collect()
    for r in rows:
        if r["precision"] and r["recall"]:
            f1 = 2 * r["precision"] * r["recall"] / (
                r["precision"] + r["recall"])
            assert r["f1"] == pytest.approx(f1, abs=1e-5)


# --------------------------------------------------------------------------
# BH-FDR
# --------------------------------------------------------------------------


def test_bh_fdr_significant_set_is_rank_prefix(spark, sf_dir):
    from datafusion_functions_financial_spark.sources.tables import load
    ev = load(spark, sf_dir, "events")
    rows = bh_fdr_dow(ev, "ts DIV 1000", "user_id % 10").collect()
    assert all(0.0 <= r["p_value"] <= 1.0 for r in rows)
    sig = sorted(r["rnk"] for r in rows if r["significant"] == 1)
    assert sig == list(range(1, len(sig) + 1))  # prefix of the ranks
    # every significant hypothesis satisfies its own BH criterion's
    # defining property at the cutoff rank
    if sig:
        k = max(sig)
        at_k = [r for r in rows if r["rnk"] == k][0]
        assert at_k["p_value"] <= at_k["bh_crit"] + 1e-9


def test_bh_fdr_chi2_matches_naive(spark):
    """Hand-built skew: group 0 uniform across DOW, group 1 spiked on
    one day. chi2(group 1) must dominate and match 7*sum(c^2)/n - n."""
    day_us = 86_400_000_000
    rows = []
    eid = 0
    for d in range(7):          # group 0: one event per weekday
        rows.append((0, (d * day_us + 1) * 1000, eid)); eid += 1
    for _ in range(7):          # group 1: all on the same day
        rows.append((1, 1000, eid)); eid += 1
    df = spark.createDataFrame(rows, "g long, ts long, id long")
    out = {r["grp"]: r for r in
           bh_fdr_dow(df, "ts DIV 1000", "g").collect()}
    assert out[0]["chi2"] == pytest.approx(0.0)
    # group 1: counts (7,0,...,0), chi2 = 7*49/7 - 7 = 42
    assert out[1]["chi2"] == pytest.approx(42.0)
    assert out[1]["p_value"] < out[0]["p_value"]


# --------------------------------------------------------------------------
# plan guards: no cartesian products anywhere in the family
# --------------------------------------------------------------------------


@pytest.mark.parametrize("name", [
    "q_auc_events", "q_calibration_events", "q_gains_lift_events",
    "q_threshold_metrics_events", "q_bh_fdr_events",
])
def test_mlmetrics_no_cartesian(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan

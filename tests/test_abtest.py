"""A/B analytics tests: jackknife SE brackets the truth on a
simulated ratio metric and matches a naive replicate loop; the
two-proportion z matches the closed form."""

import math

import numpy as np
import pytest


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, value double")


@pytest.mark.slow
def test_jackknife_matches_naive_replicates(spark):
    from datafusion_functions_financial_spark.operators.abtest import (
        N_BUCKETS, A, C, P, jackknife_ratio_se,
    )
    rng = np.random.RandomState(3)
    rows = [(int(u), "e", float(rng.lognormal()))
            for u in rng.randint(0, 500, size=2000)]
    df = _events_df(spark, rows)
    [row] = jackknife_ratio_se(df, "value", "1", "user_id").collect()
    # naive: same buckets, same replicates (quantization differences
    # are far below the assertion tolerance)
    import collections
    y = collections.Counter()
    x = collections.Counter()
    for u, _e, v in rows:
        b = (((u + 1) * A + C) % P) % N_BUCKETS
        y[b] += v
        x[b] += 1
    ty, tx = sum(y.values()), sum(x.values())
    reps = [(ty - y[b]) / (tx - x[b]) for b in sorted(y)]
    m = len(reps)
    mean = sum(reps) / m
    se = math.sqrt((m - 1) / m * sum((t - mean) ** 2 for t in reps))
    assert row["ratio"] == pytest.approx(ty / tx, abs=1e-5)
    assert row["se"] == pytest.approx(se, abs=1e-5)
    assert row["ci_lo"] < row["ratio"] < row["ci_hi"]
    assert row["n_buckets"] == m


@pytest.mark.slow
def test_jackknife_se_shrinks_with_scale(spark):
    from datafusion_functions_financial_spark.operators.abtest import (
        jackknife_ratio_se,
    )
    rng = np.random.RandomState(5)

    def se_of(n):
        rows = [(int(u), "e", float(rng.normal(10, 2)))
                for u in rng.randint(0, 10 * n, size=n)]
        return jackknife_ratio_se(
            _events_df(spark, rows), "value", "1",
            "user_id").collect()[0]["se"]

    assert se_of(4000) < se_of(500)


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_two_proportion_z_matches_closed_form(spark):
    from datafusion_functions_financial_spark.operators.abtest import (
        two_proportion_ztest,
    )
    # arm 0: 30/100 hits; arm 1: 20/100 hits
    rows = []
    uid = 0
    for arm in (0, 1):
        hits = 30 if arm == 0 else 20
        for i in range(100):
            et = "purchase" if i < hits else "click"
            rows.append((uid * 2 + arm, et, 1.0))
            uid += 1
    df = _events_df(spark, rows)
    [row] = two_proportion_ztest(
        df, "user_id % 2", "event_type = 'purchase'").collect()
    assert row["n_a"] == 100 and row["n_b"] == 100
    pa, pb, pp = 0.3, 0.2, 0.25
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert row["z"] == pytest.approx(z, abs=1e-5)


def test_sample_size_matches_closed_form(spark):
    from datafusion_functions_financial_spark.operators.abtest import (
        Z_ALPHA, Z_BETA, required_sample_size,
    )
    rows = []
    uid = 0
    for arm, hits in ((0, 30), (1, 20)):
        for i in range(100):
            et = "purchase" if i < hits else "click"
            rows.append((uid * 2 + arm, et, 1.0))
            uid += 1
    df = _events_df(spark, rows)
    [row] = required_sample_size(
        df, "user_id % 2", "event_type = 'purchase'").collect()
    pa, pb = 0.3, 0.2
    want = math.ceil((Z_ALPHA + Z_BETA) ** 2
                     * (pa * (1 - pa) + pb * (1 - pb))
                     / (pa - pb) ** 2)
    assert row["n_per_arm"] == want
    assert row["abs_lift"] == pytest.approx(0.1)


def test_sample_size_null_on_zero_lift(spark):
    from datafusion_functions_financial_spark.operators.abtest import (
        required_sample_size,
    )
    rows = [(u, "purchase" if u % 8 < 2 else "click", 1.0)
            for u in range(400)]  # identical 25% rate in both arms
    df = _events_df(spark, rows)
    [row] = required_sample_size(
        df, "user_id % 2", "event_type = 'purchase'").collect()
    assert row["n_per_arm"] is None


def test_srm_flags_imbalance(spark):
    from datafusion_functions_financial_spark.operators.abtest import (
        srm_check,
    )
    balanced = _events_df(
        spark, [(u, "e", 1.0) for u in range(1000)])
    [rb] = srm_check(balanced, "user_id % 2").collect()
    assert rb["srm_flag"] == 0
    skewed = _events_df(
        spark, [(u, "e", 1.0) for u in range(1000)]
        + [(2 * u, "e", 1.0) for u in range(200)])  # extra arm-0 rows
    [rs] = srm_check(skewed, "user_id % 2").collect()
    assert rs["srm_flag"] == 1
    assert abs(rs["z_srm"]) > 3.0

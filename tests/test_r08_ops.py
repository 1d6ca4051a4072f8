"""Round-8-queue operator tests: Nelson-Aalen cumulative hazard, the
risk2 performance ratios (Calmar / Omega / information ratio), and
plan-shape guards for every query added after the r07 gate window
froze in this session.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _approx(a, b, tol=1e-6):
    assert a == pytest.approx(b, abs=tol), (a, b)


# --------------------------------------------------------------------------
# survival — Nelson-Aalen
# --------------------------------------------------------------------------


def test_nelson_aalen_matches_manual_hazard(spark):
    """3 users, hand-laid gaps: observed durations are consecutive
    gaps, each user's last event censors at corpus end. H(t) and its
    variance match the textbook sums."""
    from datafusion_functions_financial_spark.operators.survival import (
        nelson_aalen,
    )
    m = 60_000_000  # us per minute
    rows = [  # (user, us, id)
        (1, 0 * m, 1), (1, 2 * m, 2),         # gap 2, censor 8
        (2, 0 * m, 3), (2, 2 * m, 4),         # gap 2, censor 8
        (3, 5 * m, 5), (3, 10 * m, 6),        # gap 5, censor 0
    ]
    df = spark.createDataFrame(rows, "u long, us long, id long")
    out = {r["t_min"]: r for r in nelson_aalen(
        df, "us", "u", ["us", "id"]).collect()}
    # duration table: t=0 c=1 (user3 censored at end), t=2 d=2,
    # t=5 d=1, t=8 c=2.  n_risk walks 6,5,3,2.
    assert out[0]["n_risk"] == 6 and out[0]["c"] == 1
    assert out[2]["d"] == 2 and out[2]["n_risk"] == 5
    assert out[5]["d"] == 1 and out[5]["n_risk"] == 3
    _approx(out[0]["cum_hazard"], 0.0)
    _approx(out[2]["cum_hazard"], 2 / 5)
    _approx(out[5]["cum_hazard"], 2 / 5 + 1 / 3)
    _approx(out[8]["cum_hazard"], 2 / 5 + 1 / 3)  # censoring: no step
    _approx(out[5]["hazard_var"], 2 / 25 + 1 / 9)


def test_nelson_aalen_dominates_km_log_survival(spark, sf_dir):
    """H_NA(t) <= -ln(S_KM(t)) pointwise (classic inequality), and
    both are nondecreasing step functions on real data."""
    from datafusion_functions_financial_spark.operators.survival import (
        kaplan_meier, nelson_aalen,
    )
    from datafusion_functions_financial_spark.sources.tables import load
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    na = {r["t_min"]: r["cum_hazard"] for r in nelson_aalen(
        ev, "__us", "user_id", ["ts", "event_id"]).collect()}
    km = {r["t_min"]: r["survival"] for r in kaplan_meier(
        ev, "__us", "user_id", ["ts", "event_id"]).collect()}
    assert set(na) == set(km)
    prev = 0.0
    for t in sorted(na):
        assert na[t] >= prev - 1e-9  # nondecreasing
        prev = na[t]
        if km[t] > 0:
            assert na[t] <= -math.log(km[t]) + 1e-6


# --------------------------------------------------------------------------
# risk2 — Calmar / Omega / information ratio
# --------------------------------------------------------------------------


def _series_df(spark, vals):
    return spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "g string, i long, v double")


def test_calmar_manual_path(spark):
    """Path 100->110->99: returns (+0.1, -0.1), max drawdown
    (110-99)/110, calmar = mean_ret / max_dd."""
    from datafusion_functions_financial_spark.functions.risk2 import (
        calmar,
    )
    out = calmar(_series_df(spark, [100, 110, 99]),
                 "v", ["g"], ["i"]).collect()[0]
    mean_ret = (0.1 + (99 / 110 - 1)) / 2
    max_dd = (110 - 99) / 110
    assert out["n_returns"] == 2
    _approx(out["mean_ret"], mean_ret)
    _approx(out["max_dd"], max_dd)
    _approx(out["calmar"], mean_ret / max_dd)


def test_calmar_null_when_no_drawdown(spark):
    from datafusion_functions_financial_spark.functions.risk2 import (
        calmar,
    )
    out = calmar(_series_df(spark, [1, 2, 3, 4]),
                 "v", ["g"], ["i"]).collect()[0]
    _approx(out["max_dd"], 0.0)
    assert out["calmar"] is None


def test_omega_gain_loss_masses(spark):
    """Returns +0.5, -0.25: omega = 0.5 / 0.25 = 2."""
    from datafusion_functions_financial_spark.functions.risk2 import (
        omega,
    )
    out = omega(_series_df(spark, [100, 150, 112.5]),
                "v", ["g"], ["i"]).collect()[0]
    _approx(out["gain"], 0.5)
    _approx(out["loss"], 0.25)
    _approx(out["omega"], 2.0)


def test_omega_all_gains_is_null(spark):
    from datafusion_functions_financial_spark.functions.risk2 import (
        omega,
    )
    out = omega(_series_df(spark, [1, 2, 4]),
                "v", ["g"], ["i"]).collect()[0]
    assert out["omega"] is None and out["loss"] == 0.0


def test_information_ratio_matches_numpy(spark):
    """Two hourly series with a known active difference: IR equals
    numpy mean/std (ddof=1) of the hourly diffs."""
    from datafusion_functions_financial_spark.functions.risk2 import (
        information_ratio,
    )
    rng = np.random.RandomState(11)
    h = 3_600_000_000
    rows = []
    xs, ys = [], []
    for i in range(50):
        x = 10 + rng.rand() * 2
        y = 9 + rng.rand()
        xs.append(round(x, 4))
        ys.append(round(y, 4))
        rows.append((i * h + 5, "a", round(x, 4), 2 * i))
        rows.append((i * h + 7, "b", round(y, 4), 2 * i + 1))
    df = spark.createDataFrame(
        rows, "us long, s string, v double, id long")
    out = information_ratio(df, "us", "v", "s", "a", "b").collect()[0]
    d = np.array(xs) - np.array(ys)
    assert out["n_hours"] == 50
    _approx(out["mean_active"], float(d.mean()), 1e-5)
    _approx(out["sd_active"], float(d.std(ddof=1)), 1e-5)
    _approx(out["info_ratio"],
            float(d.mean() / d.std(ddof=1)), 1e-4)


# --------------------------------------------------------------------------
# plan guards for the new-in-session queries
# --------------------------------------------------------------------------

R08_NEW = [
    "q_nelson_aalen_events",
    "risk_calmar_events", "risk_omega_events", "risk_info_ratio_events",
]


@pytest.mark.parametrize("name", R08_NEW)
def test_r08_query_no_cartesian(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan

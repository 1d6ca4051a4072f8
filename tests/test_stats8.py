"""stats8 tests: Wilson interval properties and the effect-size
panel vs naive references."""

import math

import numpy as np
import pytest


def test_wilson_ci_brackets_and_clamps(spark):
    from datafusion_functions_financial_spark.operators.stats8 import (
        wilson_rate_ci,
    )
    rows = [("a", 1.0)] * 95 + [("a", -1.0)] * 5 \
        + [("b", -1.0)] * 50 \
        + [("c", 1.0)] * 3  # all hits, tiny n: upper must clamp to 1
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["grp"]: r for r in wilson_rate_ci(
        df, "g", "v > 0").collect()}
    a = out["a"]
    assert a["rate"] == pytest.approx(0.95)
    assert a["ci_lo"] < 0.95 < a["ci_hi"] <= 1.0
    b = out["b"]
    assert b["rate"] == 0.0
    assert b["ci_lo"] == 0.0 and b["ci_hi"] > 0.0  # never negative
    c = out["c"]
    assert c["rate"] == 1.0 and c["ci_hi"] == 1.0
    assert c["ci_lo"] < 1.0  # 3 successes can't pin the rate at 1


def test_wilson_matches_closed_form(spark):
    from datafusion_functions_financial_spark.operators.stats8 import (
        wilson_rate_ci,
    )
    df = spark.createDataFrame(
        [("g", float(i < 30)) for i in range(100)], "g string, v double")
    [row] = wilson_rate_ci(df, "g", "v > 0.5").collect()
    z, n, p = 1.959963984540054, 100, 0.3
    den = 1 + z * z / n
    ctr = (p + z * z / (2 * n)) / den
    half = z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n) / den
    assert row["ci_lo"] == pytest.approx(ctr - half, abs=1e-5)
    assert row["ci_hi"] == pytest.approx(ctr + half, abs=1e-5)


def _two_group_df(spark, va, vb):
    rows = [("purchase", float(v)) for v in va] + \
        [("click", float(v)) for v in vb]
    return spark.createDataFrame(rows, "event_type string, value double")


def test_effect_sizes_match_naive(spark):
    from datafusion_functions_financial_spark.operators.stats8 import (
        effect_sizes,
    )
    rng = np.random.RandomState(37)
    va = rng.normal(loc=1.0, size=80)
    vb = rng.normal(loc=0.0, size=60)
    [row] = effect_sizes(_two_group_df(spark, va, vb), "value",
                         "event_type", "purchase", "click").collect()
    sp = math.sqrt(((len(va) - 1) * va.var(ddof=1)
                    + (len(vb) - 1) * vb.var(ddof=1))
                   / (len(va) + len(vb) - 2))
    d = (va.mean() - vb.mean()) / sp
    assert row["cohen_d"] == pytest.approx(d, abs=1e-4)
    g = d * (1 - 3 / (4 * (len(va) + len(vb)) - 9))
    assert row["hedges_g"] == pytest.approx(g, abs=1e-4)
    # Cliff's delta: naive pairwise
    gt = sum(1 for x in va for y in vb if x > y)
    lt = sum(1 for x in va for y in vb if x < y)
    delta = (gt - lt) / (len(va) * len(vb))
    assert row["cliff_delta"] == pytest.approx(delta, abs=1e-4)


def test_effect_sizes_zero_when_identical(spark):
    from datafusion_functions_financial_spark.operators.stats8 import (
        effect_sizes,
    )
    rng = np.random.RandomState(41)
    v = rng.normal(size=50)
    [row] = effect_sizes(_two_group_df(spark, v, v), "value",
                         "event_type", "purchase", "click").collect()
    assert row["cohen_d"] == pytest.approx(0.0, abs=1e-6)
    assert row["cliff_delta"] == pytest.approx(0.0, abs=1e-6)

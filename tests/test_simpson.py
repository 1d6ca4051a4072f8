"""Simpson audit + partial correlation tests: a constructed paradox
is flagged, and partial correlation removes a known confounder."""

import numpy as np
import pytest


def test_simpson_flags_constructed_paradox(spark):
    from datafusion_functions_financial_spark.operators.simpson import (
        simpson_audit,
    )
    rng = np.random.RandomState(3)
    rows = []
    # within each stratum, y DECREASES in x; across strata, both
    # means increase -> pooled correlation positive (the paradox)
    for s, (x0, y0) in enumerate([(0.0, 0.0), (5.0, 10.0),
                                  (10.0, 20.0)]):
        for _ in range(80):
            x = x0 + rng.uniform(0, 2)
            y = y0 - 2.0 * (x - x0) + rng.normal(scale=0.1)
            rows.append((f"s{s}", float(x), float(y)))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["stratum"]: r for r in simpson_audit(
        df, "x", "y", "g").collect()}
    assert out["__all__"]["pooled_pearson"] > 0.5
    for s in ("s0", "s1", "s2"):
        assert out[s]["pearson"] < -0.5
        assert out[s]["sign_flip"] == 1
    assert out["__all__"]["sign_flip"] == 0


def test_simpson_no_flag_when_consistent(spark):
    from datafusion_functions_financial_spark.operators.simpson import (
        simpson_audit,
    )
    rng = np.random.RandomState(5)
    rows = [(f"s{i % 2}", float(x), float(2 * x + rng.normal()))
            for i, x in enumerate(rng.uniform(0, 10, 200))]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = simpson_audit(df, "x", "y", "g").collect()
    assert all(r["sign_flip"] == 0 for r in out)


def test_partial_correlation_removes_confounder(spark):
    from datafusion_functions_financial_spark.operators.simpson import (
        partial_correlation,
    )
    rng = np.random.RandomState(7)
    z = rng.normal(size=400)
    x = z + rng.normal(scale=0.3, size=400)
    y = z + rng.normal(scale=0.3, size=400)  # x,y only linked via z
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double")
    [row] = partial_correlation(df, "x", "y", "z").collect()
    assert row["r_xy"] > 0.7            # strong marginal association
    assert abs(row["r_xy_given_z"]) < 0.15  # vanishes given z


def test_partial_correlation_matches_numpy(spark):
    from datafusion_functions_financial_spark.operators.simpson import (
        partial_correlation,
    )
    rng = np.random.RandomState(11)
    x = rng.uniform(size=300)
    y = 0.5 * x + rng.uniform(size=300) * 0.5
    z = 0.3 * x + rng.uniform(size=300) * 0.7
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double")
    [row] = partial_correlation(df, "x", "y", "z").collect()
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    want = (rxy - rxz * ryz) / np.sqrt(
        (1 - rxz ** 2) * (1 - ryz ** 2))
    assert row["r_xy_given_z"] == pytest.approx(want, abs=1e-4)

"""Round-7 operator tests.

Part 1: the reworked ``distributed_median`` (VERDICT r06 finding #1)
— iterated histogram narrowing, rank-filtered driver traffic, schema-
derived group/value dtypes, and the high-cardinality guard.
"""

import numpy as np
import pytest


def _approx(a, b, tol=1e-6):
    assert a == pytest.approx(b, abs=tol), (a, b)


# --------------------------------------------------------------------------
# distributed_median — narrowing + rank-filter contract
# --------------------------------------------------------------------------


def _dm(spark, rows, schema, **kw):
    from datafusion_functions_financial_spark.operators.quantile2 import (
        distributed_median,
    )
    df = spark.createDataFrame(rows, schema)
    return distributed_median(df, "v", "g", "id", **kw)


@pytest.mark.parametrize("n", [4001, 4000])
def test_distributed_median_hot_group_narrows(spark, n):
    """A group far above the bucket budget forces >=1 narrowing pass
    (budget 50 on 4k rows => two 1024-bucket levels) and still
    resolves the exact median, both parities."""
    rng = np.random.RandomState(7)
    vals = [float(v) for v in rng.rand(n) * 1e6]
    rows = [("hot", i, v) for i, v in enumerate(vals)]
    rows += [("small", i, float(i)) for i in range(9)]
    out = {r["g"]: r for r in _dm(
        spark, rows, "g string, id long, v double",
        bucket_row_budget=50).collect()}
    _approx(out["hot"]["median"], float(np.median(vals)))
    assert out["hot"]["n"] == n
    _approx(out["small"]["median"], 4.0)


def test_distributed_median_driver_gets_only_needed_ranks(
        spark, monkeypatch):
    """VERDICT r06 #1 regression: every driver collect that carries
    the VALUE column must be rank-filtered — at most 2 rows per group
    (the two middle order statistics), never a whole bucket."""
    try:  # Spark 4: the concrete class overrides collect
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover — Spark 3 layout
        from pyspark.sql import DataFrame

    seen = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        seen.append((self.columns, len(rows)))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    rng = np.random.RandomState(11)
    rows = [(f"g{i % 3}", i, float(v))
            for i, v in enumerate(rng.rand(3000) * 100)]
    out = _dm(spark, rows, "g string, id long, v double",
              bucket_row_budget=64).collect()
    assert len(out) == 3
    value_collects = [(cols, ln) for cols, ln in seen if "v" in cols]
    assert value_collects, "expected a rank-filtered value collect"
    for cols, ln in value_collects:
        assert ln <= 2 * 3, (cols, ln)


def test_distributed_median_non_string_group_and_int_values(spark):
    """ADVICE r06: group dtype must come from the input schema (int
    keys used to crash on the hardcoded string schema); integer value
    columns bucket through the monotone double cast."""
    rows = [(k, i, (i * 37) % 1001)
            for k in (1, 2) for i in range(501)]
    out = {r["g"]: r for r in _dm(
        spark, rows, "g int, id long, v long",
        bucket_row_budget=20).collect()}
    assert set(out) == {1, 2}
    exact = float(np.median([(i * 37) % 1001 for i in range(501)]))
    for k in (1, 2):
        _approx(out[k]["median"], exact)
        assert out[k]["n"] == 501


def test_distributed_median_max_groups_guard(spark):
    rows = [(f"g{i}", i, float(i)) for i in range(40)]
    with pytest.raises(ValueError, match="max_groups"):
        _dm(spark, rows, "g string, id long, v double", max_groups=10)


def test_distributed_median_all_null_and_constant_groups(spark):
    rows = [("nul", 0, None), ("nul", 1, None),
            ("const", 0, 5.0), ("const", 1, 5.0)]
    out = {r["g"]: r for r in _dm(
        spark, rows, "g string, id long, v double").collect()}
    assert out["nul"]["median"] is None and out["nul"]["n"] == 2
    assert out["const"]["median"] == 5.0

"""Deterministic HLL: accuracy, mergeability, determinism, plan."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.sketch import (
    M,
    hll_estimate,
    hll_registers,
    merge_registers,
)


@pytest.fixture(scope="module")
def ids(spark):
    # 5000 distinct ids, each appearing 3x — estimate must see 5000.
    return spark.range(0, 15000).selectExpr("id % 5000 AS v")


def test_estimate_within_hll_error(ids):
    est = hll_estimate(ids, "v").collect()[0].approx_distinct
    # Standard error ~ 1.04/sqrt(512) ~ 4.6%; allow 3 sigma.
    assert est == pytest.approx(5000, rel=0.14)


def test_small_range_correction_is_near_exact(spark):
    few = spark.range(0, 40).selectExpr("id AS v")
    est = hll_estimate(few, "v").collect()[0].approx_distinct
    # Linear counting regime: tight even for tiny cardinalities.
    assert est == pytest.approx(40, rel=0.05)


def test_duplicates_do_not_move_estimate(spark, ids):
    once = spark.range(0, 5000).selectExpr("id AS v")
    e1 = hll_estimate(once, "v").collect()[0].approx_distinct
    e3 = hll_estimate(ids, "v").collect()[0].approx_distinct
    assert e1 == e3


def test_merge_equals_single_pass(spark):
    a = spark.range(0, 3000).selectExpr("id AS v")
    b = spark.range(2000, 6000).selectExpr("id AS v")  # overlap 2000-3000
    merged = merge_registers(hll_registers(a, "v"), hll_registers(b, "v"))
    from datafusion_functions_financial_spark.operators.sketch import (
        _estimate_from_registers,
    )
    e_merged = _estimate_from_registers(merged, ()).collect()[0] \
        .approx_distinct
    whole = spark.range(0, 6000).selectExpr("id AS v")
    e_whole = hll_estimate(whole, "v").collect()[0].approx_distinct
    assert e_merged == e_whole


def test_register_table_bounded(ids):
    # The shuffle payload never exceeds M rows per group.
    assert hll_registers(ids, "v").count() <= M


def test_grouped_estimate(spark):
    df = spark.range(0, 9000).selectExpr(
        "CASE WHEN id < 6000 THEN 'a' ELSE 'b' END AS g",
        "id % 3000 AS v",  # group a: 3000 distinct; group b: 3000 distinct
    )
    rows = {r.g: r.approx_distinct
            for r in hll_estimate(df, "v", ("g",)).collect()}
    assert rows["a"] == pytest.approx(3000, rel=0.14)
    assert rows["b"] == pytest.approx(3000, rel=0.14)


def test_partial_aggregation_in_plan(ids):
    plan = hll_registers(ids, "v")._jdf.queryExecution() \
        .executedPlan().toString()
    # Map-side partial max before the exchange — the scale guarantee.
    assert "partial_max" in plan or "HashAggregate" in plan
    assert plan.count("Exchange") == 1

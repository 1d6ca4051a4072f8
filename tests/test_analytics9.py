"""TPC-H join-shape queries (plans/analytics9.py): plan-shape
assertions + hand-checkable semantics. Value-exactness vs DuckDB is
covered by the parity net and the on-landing 3-SF driver-contract
verification (27/27)."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.plans import analytics9 as a9

ALL9 = [
    "q_local_supplier_volume_nations", "q_volume_shipping_nations",
    "q_market_share_parts", "q_returned_items_customers",
    "q_promo_revenue_parts", "q_top_supplier_revenue",
    "q_small_qty_revenue_lineitem", "q_large_volume_customers",
    "q_lapsed_high_balance_customers",
]


@pytest.mark.parametrize("name", ALL9)
def test_no_cartesian_and_filters_pushed(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan
    # Q22's exact-average threshold is the one legitimate 1-row
    # crossJoin (broadcast scalar); everything else must hash-join.
    if name != "q_lapsed_high_balance_customers":
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q5_pushes_date_filter_to_orders_scan(spark, sf_dir):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, "q_local_supplier_volume_nations")
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan


def test_q17_no_forced_broadcast(spark, sf_dir):
    # VERDICT r08 item 2: the per-part (sum, count) aggregate is one
    # row per distinct brand part — it GROWS with scale factor, so no
    # broadcast hint may survive anywhere in Q17 (AQE may still pick a
    # broadcast when the filtered side measures small; a hint would
    # force it at any size).
    from tests.test_plans import _Q
    df = _Q["q_small_qty_revenue_lineitem"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_q5_q7_q8_dimension_broadcasts_and_pushdown(spark, sf_dir):
    # VERDICT r08 item 6: bounded dimensions (nation/region) must stay
    # broadcast and the selective filters must reach the parquet scans
    # — catches optimizer/plan regressions the value oracle can't.
    from tests.test_plans import plan_of
    plan5 = plan_of(spark, sf_dir, "q_local_supplier_volume_nations")
    assert plan5.count("BroadcastHashJoin") >= 1, plan5
    plan7 = plan_of(spark, sf_dir, "q_volume_shipping_nations")
    assert plan7.count("BroadcastHashJoin") >= 2, plan7
    assert "GreaterThanOrEqual(l_shipdate" in plan7, plan7
    plan8 = plan_of(spark, sf_dir, "q_market_share_parts")
    assert plan8.count("BroadcastHashJoin") >= 1, plan8
    assert "EqualTo(p_type,PROMO)" in plan8, plan8


def test_q10_and_q18_topk_take_ordered(spark, sf_dir):
    from tests.test_plans import plan_of
    for name in ("q_returned_items_customers",
                 "q_large_volume_customers"):
        assert "TakeOrderedAndProject" in plan_of(spark, sf_dir, name)


def test_q15_returns_all_tied_max_suppliers(spark):
    # two suppliers tied at max revenue -> both rows returned
    li = spark.createDataFrame(
        [(1, 10.0, 0.0), (2, 10.0, 0.0), (3, 4.0, 0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    ).selectExpr("l_suppkey", "l_extendedprice", "l_discount",
                 f"TIMESTAMP '{a9.Q15_LO}' AS l_shipdate")
    s = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "s_suppkey long, s_name string")
    out = a9.top_supplier({"lineitem": li, "supplier": s}).collect()
    assert sorted(r["s_suppkey"] for r in out) == [1, 2]
    assert all(r["total_revenue"] == 10.0 for r in out)


def test_q17_small_qty_threshold_is_exact(spark):
    # part 1: qtys 1..5 (sum 15, cnt 5) -> 5*q*5 < 15 <=> q < 0.6:
    # NO line qualifies (q>=1). part 2: qtys (1, 9) -> 5*1*2=10 < 10
    # is FALSE (strict): boundary excluded on both engines.
    li = spark.createDataFrame(
        [(1, float(q), 100.0, 0.0) for q in range(1, 6)]
        + [(2, 1.0, 100.0, 0.0), (2, 9.0, 100.0, 0.0)],
        "l_partkey long, l_quantity double, l_extendedprice double,"
        " l_discount double").withColumn(
        "l_orderkey", F.lit(1).cast("long"))
    p = spark.createDataFrame(
        [(1, a9.Q17_BRAND), (2, a9.Q17_BRAND)],
        "p_partkey long, p_brand string")
    out = a9.small_qty_revenue({"lineitem": li, "part": p}).collect()
    assert out[0]["n_lines"] == 0

    # part 3: qtys (1, 100): 5*1*2=10 < 101 -> the qty-1 line counts
    li2 = spark.createDataFrame(
        [(3, 1.0, 100.0, 0.0), (3, 100.0, 100.0, 0.0)],
        "l_partkey long, l_quantity double, l_extendedprice double,"
        " l_discount double").withColumn(
        "l_orderkey", F.lit(1).cast("long"))
    p2 = spark.createDataFrame([(3, a9.Q17_BRAND)],
                               "p_partkey long, p_brand string")
    out2 = a9.small_qty_revenue({"lineitem": li2, "part": p2}).collect()
    assert out2[0]["n_lines"] == 1
    assert out2[0]["revenue"] == 100.0


def test_q22_threshold_and_antijoin(spark):
    # avg positive balance = (100+300)/2 = 200 -> only cust 2 (300)
    # is above; cust 2 has no order since the cutoff -> reported.
    c = spark.createDataFrame(
        [(1, 0, 100.0), (2, 0, 300.0), (3, 0, -50.0)],
        "c_custkey long, c_nationkey int, c_acctbal double")
    o = spark.createDataFrame(
        [(1, 1, "2001-02-01"), (2, 2, "1999-01-01")],
        "o_orderkey long, o_custkey long, d string").selectExpr(
        "o_orderkey", "o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate")
    n = spark.createDataFrame([(0, "NATION_0")],
                              "n_nationkey int, n_name string")
    out = a9.lapsed_high_balance(
        {"customer": c, "orders": o, "nation": n}).collect()
    assert len(out) == 1
    assert out[0]["n_custs"] == 1
    assert out[0]["total_acctbal"] == 300.0

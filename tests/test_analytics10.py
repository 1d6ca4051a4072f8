"""TPC-H part-3 join shapes (plans/analytics10.py): plan-shape
assertions + hand-checkable semantics. Value-exactness vs DuckDB is
covered by the parity net and the on-landing 3-SF driver-contract
verification (42/42)."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.plans import analytics10 as a10

ALL8 = [
    "q_min_price_suppliers_parts", "q_priority_late_orders",
    "q_profit_nation_year", "q_important_parts_lineitem",
    "q_late_lines_by_status", "q_disjunctive_revenue_parts",
    "q_excess_qty_suppliers", "q_waiting_suppliers",
]


@pytest.mark.parametrize("name", ALL8)
def test_no_cartesian_and_no_forced_fact_broadcast(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan
    # Q11's exact mean threshold is the one legitimate 1-row
    # crossJoin (broadcast scalar); everything else must hash-join.
    if name != "q_important_parts_lineitem":
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q4_exists_is_a_semi_join(spark, sf_dir):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, "q_priority_late_orders")
    assert "LeftSemi" in plan, plan


@pytest.mark.slow
def test_no_forced_broadcast_on_scale_growing_sides(spark, sf_dir):
    # The Q17 lesson (VERDICT r08 item 2) applied from day one: no
    # analytics10 query carries ANY broadcast hint — nation is absent
    # from most shapes and AQE handles the rest — except Q9's bounded
    # nation dimension.
    from tests.test_plans import _Q
    for name in ALL8:
        if name in ("q_profit_nation_year",       # 25-row nation dim
                    "q_important_parts_lineitem"):  # 1-row threshold
            continue  # the two bounded-relation hints, by design
        df = _Q[name](spark, sf_dir)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, (name, analyzed[:500])


def test_q2_argmin_keeps_all_tied_suppliers(spark):
    # part 1: suppliers 10 and 20 both sell at unit price 2.00 (the
    # min) -> both rows survive the argmin join.
    li = spark.createDataFrame(
        [(1, 10, 4.0, 2.0), (1, 20, 2.0, 1.0), (1, 30, 9.0, 1.0),
         (1, 10, 2.0, 1.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double,"
        " l_quantity double")
    p = spark.createDataFrame([(1, a10.Q2_TYPE, a10.Q2_MIN_SIZE)],
                              "p_partkey long, p_brand string,"
                              " p_size int").selectExpr(
        "p_partkey", f"'{a10.Q2_TYPE}' AS p_type", "p_size")
    s = spark.createDataFrame(
        [(10, "A", 5.0), (20, "B", 7.0), (30, "C", 9.0)],
        "s_suppkey long, s_name string, s_acctbal double")
    out = a10.min_price_suppliers(
        {"lineitem": li, "part": p, "supplier": s}).collect()
    assert sorted(r["s_suppkey"] for r in out) == [10, 20]
    assert all(r["min_price"] == 2.0 for r in out)
    # ordered by s_acctbal DESC -> supplier 20 first
    assert [r["s_suppkey"] for r in out] == [20, 10]


def test_q21_sole_late_supplier_semantics(spark):
    # order 1: suppliers 10 (late) and 20 (on time) -> 10 waits.
    # order 2: suppliers 10 and 20 BOTH late -> nobody counts.
    # order 3: supplier 10 alone and late -> single-supplier, excluded.
    li = spark.createDataFrame(
        [(1, 10, "2000-06-01"), (1, 20, "2000-01-05"),
         (2, 10, "2000-06-01"), (2, 20, "2000-06-01"),
         (3, 10, "2000-06-01")],
        "l_orderkey long, l_suppkey long, d string").selectExpr(
        "l_orderkey", "l_suppkey", "CAST(d AS TIMESTAMP) AS l_shipdate")
    o = spark.createDataFrame(
        [(1, "F", "2000-01-01"), (2, "F", "2000-01-01"),
         (3, "F", "2000-01-01")],
        "o_orderkey long, o_orderstatus string, d string").selectExpr(
        "o_orderkey", "o_orderstatus",
        "CAST(d AS TIMESTAMP) AS o_orderdate")
    s = spark.createDataFrame([(10, "A"), (20, "B")],
                              "s_suppkey long, s_name string")
    out = a10.waiting_suppliers(
        {"lineitem": li, "orders": o, "supplier": s}).collect()
    assert [(r["s_suppkey"], r["numwait"]) for r in out] == [(10, 1)]


def test_q11_threshold_is_exact_multiple_of_mean(spark):
    # parts with values 100, 200, 300 cents (mean 200): 3/2 x mean =
    # 300 -> STRICT > excludes the 300 part; nothing qualifies. With
    # 4/1 ... sanity: avg gate num/den=1/1 keeps 300 only.
    li = spark.createDataFrame(
        [(1, 5, 1.0), (2, 5, 2.0), (3, 5, 3.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double")
    s = spark.createDataFrame([(5, 0)],
                              "s_suppkey long, s_nationkey int")
    none = a10.important_parts({"lineitem": li, "supplier": s},
                               avg_num=3, avg_den=2).collect()
    assert none == []
    only_max = a10.important_parts({"lineitem": li, "supplier": s},
                                   avg_num=1, avg_den=1).collect()
    assert [(r["p_partkey"], r["value"]) for r in only_max] == [(3, 3.0)]

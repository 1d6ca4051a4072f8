"""Modularity tests: perfect communities score near 1 - 1/k, a random
mixing partition scores near 0, and hand-counts match the formula."""

import pytest
from pyspark.sql import functions as F


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "item_a long, item_b long")


def _attrs_df(spark, mapping):
    return spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], "node long, attr string")


def test_modularity_perfect_communities(spark):
    from datafusion_functions_financial_spark.operators.graph4 import (
        attribute_modularity,
    )
    # two disconnected triangles, each its own community
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    attrs = {n: "a" for n in (0, 1, 2)}
    attrs.update({n: "b" for n in (10, 11, 12)})
    rows = attribute_modularity(
        _edges_df(spark, pairs), _attrs_df(spark, attrs),
        "node", "attr").collect()
    q = rows[0]["q_total"]
    # all edges intra, two equal communities: Q = 1 - 2*(1/2)^2 = 0.5
    assert q == pytest.approx(0.5, abs=1e-6)
    for r in rows:
        assert r["m_intra"] == 3 and r["d_sum"] == 6
        assert r["n_nodes"] == 3


def test_modularity_anti_communities_negative(spark):
    from datafusion_functions_financial_spark.operators.graph4 import (
        attribute_modularity,
    )
    # complete bipartite K2,2 with the partition ALONG the cut:
    # zero intra edges -> Q < 0
    pairs = [(0, 10), (0, 11), (1, 10), (1, 11)]
    attrs = {0: "a", 1: "a", 10: "b", 11: "b"}
    rows = attribute_modularity(
        _edges_df(spark, pairs), _attrs_df(spark, attrs),
        "node", "attr").collect()
    assert rows[0]["q_total"] == pytest.approx(-0.5, abs=1e-6)
    assert all(r["m_intra"] == 0 for r in rows)


def test_modularity_hand_formula_mixed(spark):
    from datafusion_functions_financial_spark.operators.graph4 import (
        attribute_modularity,
    )
    # 5 edges: 3 intra-a, 1 intra-b, 1 cross
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11), (2, 10)]
    attrs = {0: "a", 1: "a", 2: "a", 10: "b", 11: "b"}
    rows = {r["community"]: r for r in attribute_modularity(
        _edges_df(spark, pairs), _attrs_df(spark, attrs),
        "node", "attr").collect()}
    m = 5
    da = 3 * 2 + 1  # degrees within labeled edge list: a endpoints
    db = 2 + 1
    qa = 3 / m - (da / (2 * m)) ** 2
    qb = 1 / m - (db / (2 * m)) ** 2
    assert rows["a"]["q_term"] == pytest.approx(qa, abs=1e-6)
    assert rows["b"]["q_term"] == pytest.approx(qb, abs=1e-6)
    assert rows["a"]["q_total"] == pytest.approx(qa + qb, abs=1e-6)


def test_modularity_gate_plan(spark, sf_dir):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, "graph_modularity_parts")
    assert "CartesianProduct" not in plan, plan

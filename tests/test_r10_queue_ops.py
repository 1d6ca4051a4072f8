"""Hand-checkable semantics for the r10-queued operators (stats10,
text9, graph5, embgeo2). Engine parity is covered by the oracle net
and the on-landing 3-SF driver-contract verification."""

import pytest

import math

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.embgeo2 import (
    label_silhouette,
)
from datafusion_functions_financial_spark.operators.graph5 import (
    local_clustering,
)
from datafusion_functions_financial_spark.operators.stats10 import (
    breusch_pagan_daily, durbin_watson_daily, mood_median_test,
)
from datafusion_functions_financial_spark.operators.text9 import (
    js_by_source,
)

US_DAY = 86_400_000_000


def _events(spark, rows):
    # (key, day, value) -> one event per day at microsecond epoch
    return spark.createDataFrame(
        [(k, d * US_DAY, float(v)) for k, d, v in rows],
        "k string, us long, value double")


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_residual_diagnostics_trend_invariant(spark):
    # adding a linear-in-day trend leaves OLS residuals unchanged,
    # so BP and DW must be identical on base vs trended series.
    base = [("a", d, v) for d, v in enumerate(
        [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0])]
    trended = [(k, d, v + 7.0 * d + 11.0) for k, d, v in base]
    dw0 = durbin_watson_daily(_events(spark, base), "value", "k",
                              "us").collect()[0]
    dw1 = durbin_watson_daily(_events(spark, trended), "value", "k",
                              "us").collect()[0]
    assert dw0["dw"] == dw1["dw"]
    bp0 = breusch_pagan_daily(_events(spark, base), "value", "k",
                              "us").collect()[0]
    bp1 = breusch_pagan_daily(_events(spark, trended), "value", "k",
                              "us").collect()[0]
    assert bp0["bp_lm"] == bp1["bp_lm"]
    assert dw0["n_days"] == 8 and bp0["n_days"] == 8


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_mood_median_fully_separated_groups(spark):
    # group a entirely below the median, group b entirely above:
    # chi2 of the 2x2 equals n.
    df = spark.createDataFrame(
        [("a", 1.0)] * 4 + [("b", 10.0)] * 4, "g string, v double")
    row = mood_median_test(df, "v", "g").collect()[0]
    assert row["n"] == 8 and row["k"] == 2
    assert row["chi2"] == 8.0


def test_js_identical_sources_zero_disjoint_ln2(spark):
    same = spark.createDataFrame(
        [("s1", "aa bb cc"), ("s2", "aa bb cc")],
        "source string, text string")
    rows = {r["source"]: r["js"]
            for r in js_by_source(same).collect()}
    assert rows == {"s1": 0.0, "s2": 0.0}
    disjoint = spark.createDataFrame(
        [("s1", "aa bb cc"), ("s2", "dd ee ff")],
        "source string, text string")
    for r in js_by_source(disjoint).collect():
        assert abs(r["js"] - math.log(2)) < 1e-6


def test_local_clustering_triangle_with_pendant(spark):
    # triangle 1-2-3 plus pendant edge 1-4: lcc(2)=lcc(3)=1,
    # lcc(1)=1/3 (one closed pair of three), node 4 excluded (d=1).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "a long, b long")
    out = local_clustering(edges, "a", "b").collect()
    got = {r["node"]: (r["degree"], r["n_triangles"], r["lcc"])
           for r in out}
    assert got[2] == (2, 1, 1.0) and got[3] == (2, 1, 1.0)
    assert got[1] == (3, 1, round(round(1 / 3 * 1e6) / 1e6, 6))
    assert 4 not in got
    # ordered by lcc desc then node asc
    assert [r["node"] for r in out] == [2, 3, 1]


def test_silhouette_perfectly_separated_labels(spark):
    df = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (1, 0, [1.0, 0.0]),
         (2, 1, [0.0, 1.0]), (3, 1, [0.0, 1.0])],
        "vec_id long, label int, embedding array<double>")
    out = {r["label"]: r["silhouette"]
           for r in label_silhouette(df, "embedding", "label").collect()}
    assert out == {0: 1.0, 1: 1.0}


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_sample_balanced_keeps_min_class_count(spark):
    from datafusion_functions_financial_spark.operators.sampling4 import (
        sample_balanced,
    )
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b")],
        "event_id long, event_type string")
    kept = sample_balanced(df, "event_type", "event_id").collect()
    by = {}
    for r in kept:
        by.setdefault(r["event_type"], []).append(r["event_id"])
    assert len(by["a"]) == 1 and len(by["b"]) == 1
    # deterministic: a replay picks the identical rows
    again = sample_balanced(df, "event_type", "event_id").collect()
    assert sorted(r["event_id"] for r in kept) == sorted(
        r["event_id"] for r in again)


def test_ordinal_association_perfect_concordance(spark):
    from datafusion_functions_financial_spark.operators.stats11 import (
        ordinal_association,
    )
    # (0,0)-(1,0): tied on y (TY); the other two pairs concordant.
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "x int, y int")
    row = ordinal_association(df, "x", "y").collect()[0]
    assert row["c_pairs"] == 2 and row["d_pairs"] == 0
    assert row["ty_pairs"] == 1
    assert row["gamma"] == 1.0
    assert row["somers_d"] == round(round(2 / 3 * 1e6) / 1e6, 6)


def test_rich_club_triangle_with_pendant(spark):
    from datafusion_functions_financial_spark.operators.graph6 import (
        rich_club,
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "a long, b long")
    out = {r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
           for r in rich_club(edges, "a", "b",
                              thresholds=(1, 2)).collect()}
    # deg: 1->3, 2->2, 3->2, 4->1. k=1: {1,2,3} fully connected.
    assert out[1] == (3, 3, 1.0)
    # k=2: only node 1 qualifies -> degenerate phi = 0
    assert out[2] == (1, 0, 0.0)


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_pareto_cutpoint_hand_computed(spark):
    from datafusion_functions_financial_spark.operators import (
        concentration2,
    )
    df = spark.createDataFrame(
        [(1, 50.0), (2, 30.0), (3, 10.0), (4, 10.0)],
        "o_custkey long, o_totalprice double")
    row = concentration2.pareto_cutpoint(
        df, "o_custkey", "o_totalprice").collect()[0]
    # desc cum shares: 0.5 (1 cust), 0.8 (2) -> 2 customers reach 4/5
    assert row["n_keys"] == 4
    assert row["top_keys"] == 2
    assert row["top_share"] == 0.8


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_ks_perfect_classifier_is_one(spark):
    from datafusion_functions_financial_spark.operators.mlmetrics3 import (
        ks_separation,
    )
    df = spark.createDataFrame(
        [(3.0, 1), (4.0, 1), (1.0, 0), (2.0, 0)], "s double, y int")
    row = ks_separation(df, "s", "y = 1").collect()[0]
    assert row["ks"] == 1.0
    # random (identical score) -> the single block has diff 0
    df2 = spark.createDataFrame(
        [(1.0, 1), (1.0, 0)] * 3, "s double, y int")
    assert ks_separation(df2, "s", "y = 1").collect()[0]["ks"] == 0.0


def test_ece_perfectly_calibrated_is_zero(spark):
    from datafusion_functions_financial_spark.operators.mlmetrics3 import (
        expected_calibration_error,
    )
    df = spark.createDataFrame([(0.5, 1), (0.5, 0)] * 4,
                               "p double, y int")
    row = expected_calibration_error(df, "p", "y = 1").collect()[0]
    assert row["ece"] == 0.0 and row["max_ce"] == 0.0
    # constant p=0.5 but all-positive labels -> gap 0.5 everywhere
    df2 = spark.createDataFrame([(0.5, 1)] * 4, "p double, y int")
    r2 = expected_calibration_error(df2, "p", "y = 1").collect()[0]
    assert r2["ece"] == 0.5 and r2["max_ce"] == 0.5


def test_vocab_richness_hand_computed(spark):
    from datafusion_functions_financial_spark.operators.vocab2 import (
        vocab_richness,
    )
    # tokens: aa x3, bb x2, cc x1, dd x1 -> N=7, V=4, n1=2, n2=1
    df = spark.createDataFrame(
        [("aa aa aa bb",), ("bb cc dd",)], "text string")
    row = vocab_richness(df).collect()[0]
    assert (row["n_tokens"], row["v_distinct"], row["n1"],
            row["n2"]) == (7, 4, 2, 1)
    assert row["unseen_mass"] == round(round(2 / 7 * 1e6) / 1e6, 6)
    assert row["chao1"] == 4.5  # 4 + 2*1/(2*2)


def test_graph_ops_exchange_budget(spark, sf_dir):
    # The multi-consumer edge relations are materialized once; without
    # the checkpoints the copurchase aggregate re-executes per
    # consumer (measured 79 exchanges for LCC, 43 for rich club).
    from tests.test_plans import count_exchanges, plan_of
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "graph_lcc_parts")) <= 8
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "graph_richclub_parts")) <= 8


def test_silhouette_boundary_vector_is_zero_mean(spark):
    # a vector exactly between two centroids has s ~ 0; with one such
    # vector per label plus a tight core, the mean sits in (0, 1).
    df = spark.createDataFrame(
        [(0, 0, [0.0, 0.0]), (1, 0, [0.0, 0.0]), (2, 1, [2.0, 0.0]),
         (3, 1, [2.0, 0.0]), (4, 0, [1.0, 0.0])],
        "vec_id long, label int, embedding array<double>")
    out = {r["label"]: r["silhouette"]
           for r in label_silhouette(df, "embedding", "label").collect()}
    assert out[1] == 1.0
    assert 0.0 < out[0] < 1.0

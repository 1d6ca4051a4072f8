"""Mathematical invariants of the r05 operators — checked on real
testdata, independent of the DuckDB oracles (which verify engine
parity, not meaning): inequality bounds, survival monotonicity,
probability closure, CUSUM closure, sketch bounds.
"""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import (
    concentration, outliers, sketch3,
)
from datafusion_functions_financial_spark.plans import sequences
from datafusion_functions_financial_spark.plans.registry import all_queries
from datafusion_functions_financial_spark.sources.tables import load

_Q = all_queries()


@pytest.fixture(scope="module")
def orders_cents(spark, sf_dir):
    return load(spark, sf_dir, "orders").withColumn(
        "__cents", F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))


@pytest.fixture(scope="module")
def events_us(spark, sf_dir):
    return load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))


def test_gini_in_unit_interval(spark, orders_cents):
    rows = concentration.gini(
        orders_cents, "__cents", ["o_orderpriority"], ["o_orderkey"]
    ).collect()
    assert rows and all(0.0 <= r.gini < 1.0 for r in rows)


def test_lorenz_cumshare_monotone_to_one(spark, orders_cents):
    rows = sorted(
        concentration.lorenz_deciles(
            orders_cents, "__cents", ["o_orderkey"]).collect(),
        key=lambda r: r.decile,
    )
    shares = [r.cum_share for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-6
    # Lorenz curve sits below the diagonal (sorted ascending).
    assert all(r.cum_share <= r.decile / 10 + 1e-6 for r in rows)


def test_hhi_bounds(spark, orders_cents, sf_dir):
    c = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey", "c_nationkey")
    j = orders_cents.join(F.broadcast(c),
                          orders_cents.o_custkey == c.c_custkey)
    rows = concentration.hhi(j, "__cents", "o_custkey",
                             ["c_nationkey"]).collect()
    assert rows
    for r in rows:
        assert 1.0 / r.n_entities - 1e-6 <= r.hhi <= 1.0 + 1e-6


def test_cusum_ends_at_zero(spark, events_us):
    rows = sorted(outliers.cusum_daily(events_us, "value", "__us")
                  .collect(), key=lambda r: r.day)
    # CUSUM of deviations from the period mean closes at ~0.
    assert abs(rows[-1].cusum) < 1e-3
    assert any(r.is_peak == 1 for r in rows)


def test_markov_rows_sum_to_one(spark, sf_dir):
    rows = sequences.markov_transitions(
        load(spark, sf_dir, "events")).collect()
    by_cur = {}
    for r in rows:
        by_cur.setdefault(r.cur, 0.0)
        by_cur[r.cur] += r.p
    assert by_cur and all(abs(s - 1.0) < 1e-3 for s in by_cur.values())


def test_transition_entropy_bounded_by_ln_k(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = ev.select("event_type").distinct().count()
    rows = sequences.transition_entropy(ev).collect()
    assert rows and all(-1e-9 <= r.entropy <= math.log(k) + 1e-6
                        for r in rows)


def test_gap_survival_monotone_in_horizon(spark, events_us):
    rows = sequences.gap_survival(events_us).collect()
    assert rows
    for r in rows:
        assert 1.0 >= r.surv_60s >= r.surv_300s >= r.surv_3600s >= 0.0


def test_cms_join_size_upper_bounds_exact(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    est = sketch3.cms_join_size(o, "o_custkey", c, "c_custkey") \
        .collect()[0].est_join_size
    exact = o.join(c, o.o_custkey == c.c_custkey).count()
    # Count-Min inner products only ADD collisions — never undercount.
    assert est >= exact


def test_hll_intersection_le_min_estimate(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    r = sketch3.hll_intersection(
        ev.filter("event_type = 'view'"), "user_id",
        ev.filter("event_type = 'purchase'"), "user_id").collect()[0]
    assert r.est_intersection <= min(r.est_a, r.est_b) + 1e-6
    assert r.est_union <= r.est_a + r.est_b + 1e-6


def test_psi_terms_nonnegative_total(spark, events_us):
    from datafusion_functions_financial_spark.operators import dq2

    rows = dq2.psi_drift(events_us, "event_type", "__us").collect()
    total = sum(r.psi_term for r in rows if r.psi_term is not None)
    # PSI is a sum of (p-q)ln(p/q) terms — each term >= 0.
    assert rows and total >= -1e-9
    for r in rows:
        if r.psi_term is not None:
            assert r.psi_term >= -1e-9

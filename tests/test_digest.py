"""Merkle-bucket digest tests: order invariance, corruption
localization, dropped-row detection, and the one-exchange plan shape.
"""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.digest import (
    bucket_digests, digest_compare,
)
from datafusion_functions_financial_spark.sources.tables import load

_SIG = ("k", "CAST(round(x * 100) AS BIGINT)")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, x double")


def test_identical_snapshots_diff_to_zero_rows(spark):
    rows = [(i, float(i) * 1.5) for i in range(500)]
    a = bucket_digests(_df(spark, rows), "k", _SIG)
    b = bucket_digests(_df(spark, rows), "k", _SIG)
    assert digest_compare(a, b).count() == 0


def test_digest_is_row_order_invariant(spark):
    rows = [(i, float(i) * 1.5) for i in range(500)]
    fwd = bucket_digests(_df(spark, rows), "k", _SIG)
    rev = bucket_digests(
        _df(spark, list(reversed(rows))).repartition(7), "k", _SIG)
    assert digest_compare(fwd, rev).count() == 0


def test_single_value_change_localizes_to_one_bucket(spark):
    rows = [(i, float(i)) for i in range(500)]
    changed = [(k, x + 0.01 if k == 123 else x) for k, x in rows]
    out = digest_compare(
        bucket_digests(_df(spark, rows), "k", _SIG),
        bucket_digests(_df(spark, changed), "k", _SIG)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] == r["n_b"]           # same row count ...
    assert r["digest_a"] != r["digest_b"]  # ... different content


def test_dropped_rows_show_count_mismatch(spark):
    rows = [(i, float(i)) for i in range(500)]
    out = digest_compare(
        bucket_digests(_df(spark, rows), "k", _SIG),
        bucket_digests(_df(spark, rows[:-50]), "k", _SIG)).collect()
    assert out, "dropped rows must surface"
    assert sum((r["n_a"] or 0) - (r["n_b"] or 0) for r in out) == 50


def test_gate_diff_matches_expected_corruption(spark, sf_dir):
    """Every bucket flagged by the gate query holds at least one
    o_orderkey % 97 == 0 row, and every such key's bucket is flagged."""
    from datafusion_functions_financial_spark.operators.digest import (
        _SIG_SPARK, _q_digest_diff,
    )
    flagged = {r["bucket"] for r in _q_digest_diff(spark, sf_dir).collect()}
    orders = load(spark, sf_dir, "orders")
    hit = bucket_digests(
        orders.filter(F.expr("o_orderkey % 97 = 0")),
        "o_orderkey", _SIG_SPARK)
    expected = {r["bucket"] for r in hit.select("bucket").collect()}
    assert flagged == expected


def test_digest_plan_single_exchange(spark, sf_dir):
    """The leaf-digest relation is one scan + one hash aggregate —
    exactly one shuffle exchange, nothing data-sized after it."""
    from tests.test_plans import count_exchanges, plan_of
    plan = plan_of(spark, sf_dir, "dq_table_digest_orders")
    assert count_exchanges(plan) == 1, plan
    assert "CartesianProduct" not in plan


def test_digest_diff_plan_no_cartesian(spark, sf_dir):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, "dq_digest_diff_orders")
    assert "CartesianProduct" not in plan, plan

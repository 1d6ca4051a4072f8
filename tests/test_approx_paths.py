"""Approx (sketch-based) scale paths vs their exact oracle-gated
defaults: error must be bounded and the approx plans must drop the
memory-heavy shapes (per-group value buffering / Expand)."""

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import profile, quality
from datafusion_functions_financial_spark.sources.tables import load


@pytest.mark.slow
def test_percentile_filter_approx_close_to_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    exact = {
        r["doc_id"]
        for r in quality.percentile_filter(
            docs, "n_chars", "source", q=0.25
        ).select("doc_id").collect()
    }
    approx = {
        r["doc_id"]
        for r in quality.percentile_filter(
            docs, "n_chars", "source", q=0.25, approx=True
        ).select("doc_id").collect()
    }
    n = docs.count()
    # approx_percentile returns an actual element at a rank within
    # n/APPROX_ACCURACY of the target; only boundary-tied rows can flip.
    assert len(exact ^ approx) <= max(2, n // 50)


def test_winsorize_approx_bounds_close_to_exact(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    # align the two outputs positionally on the untouched input columns.
    sort_cols = ["l_orderkey", "l_linenumber", "l_extendedprice"]
    cols = sort_cols + ["l_extendedprice_w"]

    def run(**kw):
        return (
            quality.winsorize(li, "l_extendedprice", "l_returnflag", **kw)
            .select(*cols).toPandas()
            .sort_values(sort_cols, ignore_index=True)
        )

    exact, approx = run(), run(approx=True)
    assert (exact[sort_cols] == approx[sort_cols]).all().all()
    rel = (
        (exact["l_extendedprice_w"] - approx["l_extendedprice_w"]).abs()
        / exact["l_extendedprice_w"].abs().clip(lower=1.0)
    )
    # Clamp bounds sit at the p5/p95 rank +- rank error; values within
    # the bounds are untouched, so only the clipped tails can differ,
    # and by at most the local quantile gap (which can be wide in a
    # sparse tail — bound loosely, assert the interior is untouched).
    assert (rel < 0.15).all()
    assert (rel > 0).mean() < 0.11  # only tail rows may differ


def test_profile_approx_distinct_bounded_and_no_expand(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    exact = {
        r["column"]: r["n_distinct"]
        for r in profile.profile_columns(docs, cols).collect()
    }
    out = profile.profile_columns(docs, cols, approx=True)
    got = {r["column"]: r["n_distinct"] for r in out.collect()}
    for c in cols:
        err = abs(got[c] - exact[c]) / max(exact[c], 1)
        assert err < 0.05, (c, got[c], exact[c])
    # The approx plan must be a single pass: no Expand duplication of
    # the scan stream (the exact COUNT(DISTINCT) shape).
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = (
        profile.profile_columns(docs, cols)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan  # sanity: the exact path does expand


def test_approx_percentile_is_partial_aggregated(spark, sf_dir):
    """The sketch agg must show map-side partial aggregation (mergeable
    state), the property that removes the per-group value buffering."""
    docs = load(spark, sf_dir, "documents")
    thr = docs.groupBy("source").agg(
        quality._pct_expr("n_chars", 0.25, approx=True).alias("t")
    )
    plan = thr._jdf.queryExecution().executedPlan().toString()
    assert plan.count("approx_percentile") >= 2  # partial + final

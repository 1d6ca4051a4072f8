"""asof_join: semantics vs a naive per-row reference, plan shape."""

import pytest

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def tables(spark):
    # left: (k, t); right: (k, t, v) with sparse, irregular times,
    # exact ties, and a key with no right rows at all.
    left = spark.createDataFrame(
        [("a", i) for i in (0, 5, 10, 15, 20, 25)]
        + [("b", i) for i in (3, 7, 30)]
        + [("c", 9)],
        "k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 14, 2.0), ("a", 25, 3.0),
         ("b", 8, 10.0), ("b", 20, 11.0)],
        "k string, t long, v double",
    )
    return left, right


def naive(left_rows, right_rows, direction, tolerance, how):
    out = []
    for k, lt in left_rows:
        if direction == "backward":
            cands = [(rt, v) for rk, rt, v in right_rows
                     if rk == k and rt <= lt]
            best = max(cands) if cands else None
        else:
            cands = [(rt, v) for rk, rt, v in right_rows
                     if rk == k and rt >= lt]
            best = min(cands) if cands else None
        if best is not None and tolerance is not None:
            if abs(best[0] - lt) > tolerance:
                best = None
        if best is None:
            if how == "left":
                out.append((k, lt, None, None))
        else:
            out.append((k, lt, best[1], best[0]))
    return sorted(out)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 6])
@pytest.mark.parametrize("how", ["left", "inner"])
def test_asof_matches_naive(tables, direction, tolerance, how):
    left, right = tables
    got = sorted(
        (r.k, r.t, r.v, r.mt)
        for r in asof_join(
            left, right, ["k"], "t", "t", ["v"],
            direction=direction, tolerance=tolerance, how=how,
            matched_on_col="mt",
        ).collect()
    )
    want = naive(
        [(r.k, r.t) for r in left.collect()],
        [(r.k, r.t, r.v) for r in right.collect()],
        direction, tolerance, how,
    )
    assert got == want


def test_asof_exact_tie_is_matched(spark):
    left = spark.createDataFrame([("a", 10)], "k string, t long")
    right = spark.createDataFrame([("a", 10, 7.0)], "k string, t long, v double")
    [row] = asof_join(left, right, ["k"], "t", "t", ["v"]).collect()
    assert row.v == 7.0


def test_asof_null_value_on_matched_row_stays_null(spark):
    """ADVICE r05 (medium): when the matched (most recent) right row
    carries a NULL value column, the output must be NULL for that
    column — not a stale value pulled from an older right row — and
    multi-column outputs must all come from the ONE matched row."""
    left = spark.createDataFrame([("a", 20)], "k string, t long")
    right = spark.createDataFrame(
        [("a", 5, 1.0, 100.0), ("a", 15, None, 200.0)],
        "k string, t long, v double, w double",
    )
    [row] = asof_join(
        left, right, ["k"], "t", "t", ["v", "w"], matched_on_col="mt"
    ).collect()
    assert row.mt == 15
    assert row.v is None          # NOT 1.0 from the rt=5 row
    assert row.w == 200.0         # both columns from the rt=15 row


def test_asof_all_null_match_still_counts_for_inner(spark):
    """A matched right row whose value columns are ALL NULL is still a
    match: inner mode keeps the left row (match is on row presence,
    not value non-nullness)."""
    left = spark.createDataFrame([("a", 20)], "k string, t long")
    right = spark.createDataFrame(
        [("a", 15, None)], "k string, t long, v double",
    )
    rows = asof_join(
        left, right, ["k"], "t", "t", ["v"], how="inner",
        matched_on_col="mt",
    ).collect()
    assert len(rows) == 1 and rows[0].v is None and rows[0].mt == 15


def test_asof_plan_no_join_one_shuffle(tables):
    import re

    left, right = tables
    plan = (
        asof_join(left, right, ["k"], "t", "t", ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                   "BroadcastNestedLoopJoin"):
        assert marker not in plan, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_asof_rejects_colliding_names(tables):
    left, right = tables
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("v", "t2")
                  .withColumnRenamed("t2", "k2"), ["k"], "t", "t", ["t"])


def test_asof_bad_args(tables):
    left, right = tables
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], "t", "t", ["v"], direction="sideways")
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, ["k"], "t", "t", ["v"], how="outer")

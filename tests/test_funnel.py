"""Semantics tests for plans/funnel.py on hand-built event streams."""

from datafusion_functions_financial_spark.plans import funnel


def _events(spark, rows):
    # rows: (user_id, event_type, ts_ns)
    return spark.createDataFrame(
        [(u, t, ts) for u, t, ts in rows],
        "user_id long, event_type string, ts long",
    )


def test_funnel_strict_ordering(spark):
    ev = _events(spark, [
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),   # full
        (2, "click", 1), (2, "view", 2),                        # view only
        (3, "view", 1), (3, "purchase", 4), (3, "click", 5),    # 2 steps
    ])
    out = funnel.funnel_conversion(ev, ("view", "click", "purchase"))
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_uses_first_occurrence(spark):
    # Late repeat of an early step must not un-convert the user.
    ev = _events(spark, [
        (1, "view", 1), (1, "click", 2), (1, "view", 10),
    ])
    out = funnel.funnel_conversion(ev, ("view", "click"))
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"view": 1, "click": 1}


def test_retention_triangle(spark):
    day = funnel.NS_DAY
    ev = _events(spark, [
        (1, "view", 0), (1, "view", day), (1, "view", 3 * day),
        (2, "view", day), (2, "view", 2 * day),
        (3, "view", 5 * day),
    ])
    out = funnel.cohort_retention(ev, max_offset_days=3)
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in out.collect()}
    assert got == {
        (0, 0): 1, (0, 1): 1, (0, 3): 1,   # user 1
        (1, 0): 1, (1, 1): 1,              # user 2
        (5, 0): 1,                         # user 3
    }


def test_retention_caps_offset(spark):
    day = funnel.NS_DAY
    ev = _events(spark, [(1, "view", 0), (1, "view", 30 * day)])
    out = funnel.cohort_retention(ev, max_offset_days=7)
    assert {(r["cohort_day"], r["day_offset"]) for r in out.collect()} == {
        (0, 0)}

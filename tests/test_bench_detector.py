"""bench.shift_verdict — the round-over-round shift detector.

VERDICT r11 item 2: the old detector (`median > 1.2 AND iqr_spread
< 0.35`) missed its own motivating event (r11 clean record: median
1.204, spread 0.365 — both thresholds slipped by a hair). The widened
detector must fire on that exact record shape, report the top
regressors, and keep the spread only as a shape label.

No Spark needed — pure-python, default tranche.
"""

import bench


def _pairs(ratios):
    return {f"q{i}": r for i, r in enumerate(ratios)}


def test_fires_on_r11_shape():
    # 100 queries: median 1.204, IQR exactly [1.075, 1.44] — the
    # event the old thresholds missed on both edges (median 1.204 vs
    # >1.2 conjunct, spread 0.365 vs <0.35 conjunct).
    ratios = ([1.075] * 26 + [1.204] * 25 + [1.30] * 24
              + [1.44] * 25)
    v = bench.shift_verdict(_pairs(ratios))
    assert v["median_ratio"] == 1.204
    assert v["iqr"] == [1.075, 1.44]
    assert v["shift_suspected"] is True
    assert v["shift_shape"] == "mixed"  # spread labels, never gates


def test_fires_on_iqr_low_even_with_modest_median():
    # >=75% of queries slower by >=5% is a shift even at median 1.10
    ratios = [1.06] * 30 + [1.10] * 40 + [1.12] * 30
    v = bench.shift_verdict(_pairs(ratios))
    assert v["shift_suspected"] is True
    assert v["shift_shape"] == "uniform"


def test_fires_on_speedup_shift_too():
    ratios = [0.7] * 50 + [0.8] * 50
    v = bench.shift_verdict(_pairs(ratios))
    assert v["shift_suspected"] is True


def test_quiet_on_noise_around_one():
    # mixed noise centered on 1.0: no flag
    ratios = [0.9, 0.95, 1.0, 1.02, 1.05, 1.1] * 10
    v = bench.shift_verdict(_pairs(ratios))
    assert v["shift_suspected"] is False
    assert v["shift_shape"] == "none"


def test_top_regressors_listed_worst_first():
    ratios = [1.0] * 30
    pairs = _pairs(ratios)
    pairs["slowest"] = 3.0
    pairs["second"] = 2.0
    v = bench.shift_verdict(pairs)
    top = list(v["top_regressors"])
    assert top[0] == "slowest" and top[1] == "second"
    # ADVICE r12: ~1.0 ratios no longer pad the map — only the two
    # genuine movers (>= 1.15x) appear.
    assert len(v["top_regressors"]) == 2


def test_movers_filtered_and_symmetric():
    # ADVICE r12: no ~1.0 entries labeled regressors; downward movers
    # get their own list, fastest first.
    pairs = _pairs([1.0] * 30)
    pairs["up"] = 1.2
    pairs["down"] = 0.5
    pairs["down2"] = 0.8
    v = bench.shift_verdict(pairs)
    assert list(v["top_regressors"]) == ["up"]
    assert list(v["top_speedups"]) == ["down", "down2"]
    # nothing moved -> both lists empty, not padded with 1.0s
    v2 = bench.shift_verdict(_pairs([1.0] * 30))
    assert v2["top_regressors"] == {} and v2["top_speedups"] == {}


def test_small_samples_return_none():
    assert bench.shift_verdict(_pairs([1.5] * 19)) is None


# --- dedup audit budget guard (pure arithmetic, no Spark) -------------


def test_plan_audit_size_first_point_unguarded():
    # nothing measured yet: measure at the requested size
    assert bench.plan_audit_size({}, 5000, 25_000_000) == (5000, 0)


def test_plan_audit_size_within_budget():
    n_eff, proj = bench.plan_audit_size({5000: 10841}, 50000, 25_000_000)
    assert n_eff == 50000
    # single point -> conservative all-pairs slope 2.0
    assert proj == int(10841 * 100)


def test_plan_audit_size_reduces_to_budget_boundary():
    # replay of the committed r13 ppjoin point: 6.85M candidates at
    # 5K docs, 25M budget -> measure at 9549 docs, not 50K
    n_eff, proj = bench.plan_audit_size(
        {5000: 6_853_155}, 50000, 25_000_000)
    assert n_eff == 9549
    assert proj > 25_000_000


def test_plan_audit_size_skips_when_no_headroom():
    # replay of the committed r13 ppjoin skip: the last measured size
    # already sits at the budget, so the next size has < 1.25x
    # headroom -> skip (n_eff 0), projected count reported
    done = {5000: 6_853_155, 9549: 25_033_180}
    n_eff, proj = bench.plan_audit_size(done, 500_000, 25_000_000)
    assert n_eff == 0
    assert proj > 1_000_000_000


def test_plan_audit_size_slope_floored_at_linear():
    # a flat measured curve (slope 0) must still project linearly,
    # never below — else the guard would extrapolate shrinking work
    n_eff, proj = bench.plan_audit_size({100: 10, 200: 10}, 400, 1000)
    assert n_eff == 400
    assert proj == 20

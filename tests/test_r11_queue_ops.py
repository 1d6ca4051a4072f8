"""Hand-checkable semantics for the r11-queued operators (embeval2,
technical7, stats17). Engine parity is covered by the oracle net and
the on-landing 3-SF driver-contract verification."""

import math

import pytest

from datafusion_functions_financial_spark.functions.technical7 import (
    adl, balance_of_power, cmf, kst, ultimate_oscillator,
)
from datafusion_functions_financial_spark.operators.stats17 import (
    anderson_darling_2s, cliffs_delta, kpss_level,
)

US_HOUR = 3_600_000_000


def _ticks(spark, rows):
    # (key, hour, tick-in-hour, value) -> microsecond-epoch ticks
    return spark.createDataFrame(
        [(k, h * US_HOUR + i, float(v)) for k, h, i, v in rows],
        "k string, us long, value double")


def test_cliffs_delta_full_dominance(spark):
    # every a above every b: delta = +1, A = 1, large.
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 11.0), ("b", 1.0), ("b", 2.0)],
        "g string, v double")
    row = cliffs_delta(df, "v", "g", "a", "b").collect()[0]
    assert row["cliffs_delta"] == 1.0 and row["vd_a"] == 1.0
    assert row["magnitude"] == "large"


def test_cliffs_delta_ties_cancel(spark):
    # identical distributions: delta = 0, A = 1/2, negligible.
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)],
        "g string, v double")
    row = cliffs_delta(df, "v", "g", "a", "b").collect()[0]
    assert row["cliffs_delta"] == 0.0 and row["vd_a"] == 0.5
    assert row["magnitude"] == "negligible"


def test_anderson_darling_identical_samples_small(spark):
    # same values in both groups: every (N*m2 - n_i*b2) term is 0,
    # so A^2 = 0 exactly.
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)],
        "g string, v double")
    row = anderson_darling_2s(df, "v", "g", "a", "b").collect()[0]
    assert row["n_a"] == 2 and row["n_b"] == 2
    assert row["ad_stat"] == 0.0


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_anderson_darling_separated_exceeds_mixed(spark):
    sep = spark.createDataFrame(
        [("a", float(i)) for i in range(8)]
        + [("b", float(i + 100)) for i in range(8)],
        "g string, v double")
    mixed = spark.createDataFrame(
        [("a", float(i)) for i in range(8)]
        + [("b", float(i) + 0.5) for i in range(8)],
        "g string, v double")
    s = anderson_darling_2s(sep, "v", "g", "a", "b").collect()[0]
    m = anderson_darling_2s(mixed, "v", "g", "a", "b").collect()[0]
    assert s["ad_stat"] > m["ad_stat"] > 0.0


def test_kpss_constant_series_null(spark):
    # constant series: eta = 0 and lrv = 0 -> kpss NULL by contract.
    df = _ticks(spark, [("k", h, 0, 5.0) for h in range(20)])
    row = kpss_level(df, f"us DIV {US_HOUR}", "value").collect()[0]
    assert row["t"] == 20 and row["eta"] == 0.0 and row["lrv"] == 0.0
    assert row["kpss"] is None


def test_kpss_random_walk_exceeds_white_noise(spark):
    # a deterministic "walk" accumulates partial sums; alternating
    # noise does not — KPSS(walk) >> KPSS(noise).
    vals = [((h * 2654435761) % 97) - 48 for h in range(60)]
    noise = _ticks(spark, [("k", h, 0, v) for h, v in enumerate(vals)])
    acc, walk = 0.0, []
    for v in vals:
        acc += v
        walk.append(acc)
    walkdf = _ticks(spark, [("k", h, 0, v) for h, v in enumerate(walk)])
    expr = f"us DIV {US_HOUR}"
    kn = kpss_level(noise, expr, "value").collect()[0]["kpss"]
    kw = kpss_level(walkdf, expr, "value").collect()[0]["kpss"]
    assert kw > 3 * kn


def _flat_hours(spark, closes):
    # one tick per hour -> open=high=low=close
    return _ticks(spark, [("k", h, 0, c) for h, c in enumerate(closes)])


def test_adl_flat_bars_zero(spark):
    # single-tick bars are flat (high == low) -> multiplier 0 by
    # contract -> ADL stays 0.
    df = _flat_hours(spark, [5.0, 6.0, 7.0])
    rows = adl(df, "us", "value", ["k"]).collect()
    assert [r["adl"] for r in rows] == [0.0, 0.0, 0.0]


def test_cmf_all_closes_at_high(spark):
    # two ticks per hour, close = high > open: multiplier = +1 every
    # bar -> CMF = +1 once the window fills.
    rows = []
    for h in range(25):
        rows += [("k", h, 0, 1.0), ("k", h, 1, 2.0)]
    out = cmf(_ticks(spark, rows), "us", "value", ["k"]).collect()
    vals = [r["cmf"] for r in sorted(out, key=lambda r: r["bar_start"])]
    assert vals[:19] == [None] * 19
    assert all(v == 1.0 for v in vals[19:])


def test_bop_sign_and_sma(spark):
    # close > open every bar -> bop = +1; SMA of a constant is 1.
    rows = []
    for h in range(15):
        rows += [("k", h, 0, 1.0), ("k", h, 1, 3.0), ("k", h, 2, 2.0)]
    out = balance_of_power(_ticks(spark, rows), "us", "value",
                           ["k"]).collect()
    out = sorted(out, key=lambda r: r["bar_start"])
    assert all(r["bop"] == 0.5 for r in out)  # (2-1)/(3-1)
    assert out[-1]["bop_sma"] == 0.5 and out[12]["bop_sma"] is None


def test_ultimate_oscillator_steady_rise(spark):
    # monotone close-at-high bars: bp == tr every bar -> UO = 100.
    rows = []
    for h in range(40):
        rows += [("k", h, 0, float(h)), ("k", h, 1, float(h) + 1.0)]
    out = ultimate_oscillator(_ticks(spark, rows), "us", "value",
                              ["k"]).collect()
    out = sorted(out, key=lambda r: r["bar_start"])
    assert out[27]["uo"] is None  # warmup gate (rn >= 29)
    assert all(r["uo"] == 100.0 for r in out[28:])


def test_kst_constant_price_zero(spark):
    # constant closes: every ROC = 0 -> KST = 0 after warmup (45).
    df = _flat_hours(spark, [7.0] * 50)
    out = sorted(kst(df, "us", "value", ["k"]).collect(),
                 key=lambda r: r["bar_start"])
    assert out[43]["kst"] is None
    assert all(r["kst"] == 0.0 for r in out[44:])


def test_kst_zero_close_poisons_window(spark):
    # a zero close makes every ROC that LAGS onto it undefined; the
    # full-window count gate must hold KST at NULL until the zero
    # leaves every component window (not silently shrink the SMA).
    closes = [7.0] * 100
    closes[44] = 0.0
    df = _flat_hours(spark, closes)
    out = sorted(kst(df, "us", "value", ["k"]).collect(),
                 key=lambda r: r["bar_start"])
    # row 44 itself is fine (its lags are all nonzero); the poisoned
    # span is the union of the component windows that contain an
    # undefined ROC: rows 54..63 (roc10/sma10) through 74..88
    # (roc30/sma15) = 54..88 inclusive.
    assert out[53]["kst"] is not None
    assert out[54]["kst"] is None and out[88]["kst"] is None
    assert out[89]["kst"] is not None


@pytest.mark.slow
def test_cluster_agreement_identical_partitions(spark):
    # labels equal to the IVF cell ids: ARI = 1 and NMI = 1 by
    # construction (run on a tiny deterministic corpus).
    import numpy as np

    from datafusion_functions_financial_spark.operators.embeval2 import (
        cluster_ari, cluster_nmi,
    )
    from datafusion_functions_financial_spark.operators.ivf import (
        ivf_index,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        DIM,
    )

    rng = [(i, [float((i * 31 + j * 7) % 13 - 6) / 6.0
                for j in range(DIM)]) for i in range(40)]
    base = spark.createDataFrame(
        rng, "vec_id long, embedding array<float>")
    _c, cells = ivf_index(base, seed_mod=8)
    labeled = base.join(
        cells.select("vec_id", "cell_id"), "vec_id").selectExpr(
        "vec_id", "embedding", "CAST(cell_id AS INT) AS label")
    ari = cluster_ari(labeled, seed_mod=8).collect()[0]
    nmi = cluster_nmi(labeled, seed_mod=8).collect()[0]
    assert ari["ari"] == 1.0
    assert ari["n_cells"] == ari["n_labels"]
    assert abs(nmi["nmi"] - 1.0) < 1e-6
    assert abs(nmi["mi"] - nmi["h_cells"]) < 1e-6


def test_new_ops_exchange_budget(spark, sf_dir):
    # shared-relation reuse discipline (the graph5/6 lesson): the
    # bar-staged indicators and the contingency metrics must not
    # recompute their shared input per consumer.
    from tests.test_plans import count_exchanges, plan_of
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "ind_kst_events")) <= 6
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "ind_ultimate_events")) <= 6
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "q_kpss_events")) <= 8
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "q_cliffs_delta_events")) <= 6


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_hits_star_graph(spark):
    # star: node 0 points at 1..3. Only node 0 has hub mass; only
    # 1..3 have authority mass (1/3 each under L1).
    from datafusion_functions_financial_spark.operators.graph8 import (
        hits_scores,
    )
    edges = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1), (0, 3, 1)],
        "src long, dst long, w long")
    nodes = spark.createDataFrame([(i,) for i in range(4)],
                                  "node long")
    rows = {r["node"]: (r["hub"], r["authority"])
            for r in hits_scores(edges, nodes, n_nodes=4).collect()}
    assert rows[0][0] == 1.0 and rows[0][1] == 0.0
    for i in (1, 2, 3):
        assert rows[i][0] == 0.0
        assert abs(rows[i][1] - 1.0 / 3.0) < 1e-7


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_truss_support_k4_clique_and_pendant(spark):
    # K4 plus a pendant edge: every clique edge sits in 2 triangles,
    # the pendant in 0 -> histogram {2: 6, 0: 1}.
    from datafusion_functions_financial_spark.operators.graph8 import (
        truss_support_histogram,
    )
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(0, 9)], "a long, b long")
    hist = {r["support"]: r["n_edges"]
            for r in truss_support_histogram(edges, "a", "b").collect()}
    assert hist == {2: 6, 0: 1}


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_capture_ratios_levered_key(spark):
    # key 7 moves exactly 2x the market every bucket: both captures 2.
    from datafusion_functions_financial_spark.operators.risk4 import (
        capture_ratios,
    )
    NS_DAY = 86_400 * 1_000_000_000
    rows = []
    mkt_path = [100.0, 110.0, 99.0, 108.9, 103.455]
    for d, p in enumerate(mkt_path):
        rows.append((1, d * NS_DAY, p))           # the "market" key
        # key 7: same RETURNS doubled (price path compounds 2*ret)
    prices7 = [100.0]
    for i in range(1, len(mkt_path)):
        r = mkt_path[i] / mkt_path[i - 1] - 1.0
        prices7.append(prices7[-1] * (1.0 + 2.0 * r))
    for d, p in enumerate(prices7):
        rows.append((7, d * NS_DAY, p))
    df = spark.createDataFrame(rows,
                               "user_id long, ts long, value double")
    out = {r["key"]: r for r in capture_ratios(
        df, {1: 10000}).collect()}
    # the market leg is 4-dp-rounded before its 1e6 quantization (the
    # gated-beta staging), so self-capture is 1 +- 1e-3, not exact
    assert abs(out[1]["upside_capture"] - 1.0) < 1e-3
    assert abs(out[1]["downside_capture"] - 1.0) < 1e-3
    assert abs(out[7]["upside_capture"] - 2.0) < 0.01
    assert abs(out[7]["downside_capture"] - 2.0) < 0.01
    assert out[7]["n_up"] == 2 and out[7]["n_down"] == 2


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_jensen_treynor_market_itself(spark):
    # the market key against itself: beta 1, alpha 0, treynor = mean.
    from datafusion_functions_financial_spark.operators.risk4 import (
        jensen_treynor,
    )
    NS_DAY = 86_400 * 1_000_000_000
    path = [100.0, 104.0, 99.0, 106.0, 101.0, 103.0]
    df = spark.createDataFrame(
        [(1, d * NS_DAY, p) for d, p in enumerate(path)],
        "user_id long, ts long, value double")
    row = jensen_treynor(df, {1: 10000}).collect()[0]
    assert row["key"] == 1 and row["n"] == 5
    # same 4-dp market-leg rounding as above: beta/alpha near-exact
    assert abs(row["beta"] - 1.0) < 1e-3
    assert abs(row["alpha"]) < 1e-4
    mean_ret = sum(path[i] / path[i - 1] - 1.0
                   for i in range(1, len(path))) / 5
    assert abs(row["treynor"] - mean_ret) < 1e-4


def test_kpss_bandwidth_appears_in_output(spark):
    df = _ticks(spark, [("k", h, 0, float(h % 5)) for h in range(30)])
    row = kpss_level(df, f"us DIV {US_HOUR}", "value",
                     bandwidth=3).collect()[0]
    assert row["bandwidth"] == 3
    assert row["kpss"] is not None and row["kpss"] >= 0.0
    assert not math.isnan(row["kpss"])


@pytest.mark.slow
def test_vmeasure_identical_partitions(spark):
    # labels equal to the IVF cell ids: h = c = v = 1.
    from datafusion_functions_financial_spark.operators.embeval2 import (
        cluster_vmeasure,
    )
    from datafusion_functions_financial_spark.operators.ivf import (
        ivf_index,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        DIM,
    )
    rng = [(i, [float((i * 31 + j * 7) % 13 - 6) / 6.0
                for j in range(DIM)]) for i in range(40)]
    base = spark.createDataFrame(
        rng, "vec_id long, embedding array<float>")
    _c, cells = ivf_index(base, seed_mod=8)
    labeled = base.join(
        cells.select("vec_id", "cell_id"), "vec_id").selectExpr(
        "vec_id", "embedding", "CAST(cell_id AS INT) AS label")
    row = cluster_vmeasure(labeled, seed_mod=8).collect()[0]
    assert row["homogeneity"] == 1.0
    assert row["completeness"] == 1.0
    assert row["v_measure"] == 1.0


def test_ndcg_perfect_and_inverted(spark):
    # scores aligned with relevance -> ndcg 1; anti-aligned -> < 1.
    from datafusion_functions_financial_spark.operators.mlmetrics5 import (
        mrr, ndcg_at_k,
    )
    rows = ([("u1", i, float(100 - i), 1 if i < 3 else 0)
             for i in range(12)]        # top-3 scored items relevant
            + [("u2", i, float(100 - i), 1 if i >= 9 else 0)
               for i in range(12)])     # bottom-3 scored relevant
    df = spark.createDataFrame(
        rows, "k string, item long, score double, rel int")
    out = {r["key"]: r for r in ndcg_at_k(
        df, "k", "score", "rel = 1", "item").collect()}
    assert out["u1"]["ndcg"] == 1.0
    assert 0.0 < out["u2"]["ndcg"] < 1.0
    assert out["u1"]["n_rel"] == 3
    m = mrr(df, "k", "score", "rel = 1", "item").collect()[0]
    # u1 first relevant at rank 1; u2 at rank 10 -> (1 + 0.1) / 2
    assert m["mrr"] == 0.55 and m["n_with_rel"] == 2


def test_mrr_user_without_relevant_counts_zero(spark):
    from datafusion_functions_financial_spark.operators.mlmetrics5 import (
        mrr,
    )
    rows = [("a", 1, 2.0, 1), ("a", 2, 1.0, 0),
            ("b", 1, 2.0, 0), ("b", 2, 1.0, 0)]
    df = spark.createDataFrame(
        rows, "k string, item long, score double, rel int")
    m = mrr(df, "k", "score", "rel = 1", "item").collect()[0]
    assert m["n_keys"] == 2 and m["n_with_rel"] == 1
    assert m["mrr"] == 0.5  # (1 + 0) / 2


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_turning_points_alternating_vs_monotone(spark):
    # strictly alternating series: every interior point turns;
    # monotone series: none.
    from datafusion_functions_financial_spark.operators.tsa2 import (
        turning_points,
    )
    alt = _ticks(spark, [("k", h, 0, 5.0 + (1.0 if h % 2 else -1.0))
                         for h in range(20)])
    mono = _ticks(spark, [("k", h, 0, float(h)) for h in range(20)])
    expr = f"us DIV {US_HOUR}"
    a = turning_points(alt, expr, "value").collect()[0]
    m = turning_points(mono, expr, "value").collect()[0]
    assert a["n_turning"] == 18 and a["t"] == 20
    assert m["n_turning"] == 0
    assert a["z"] > 0 > m["z"]


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_dfa_white_noise_alpha_near_half(spark):
    # deterministic pseudo-noise: DFA alpha lands near 0.5; its
    # cumulative walk lands near 1.5 (alpha_walk = alpha_noise + 1).
    from datafusion_functions_financial_spark.operators.tsa2 import (
        dfa,
    )
    import random
    rng = random.Random(0)
    vals = [rng.uniform(-50.0, 50.0) for _ in range(512)]
    noise = _ticks(spark, [("k", h, 0, v) for h, v in enumerate(vals)])
    acc, walk = 0.0, []
    for v in vals:
        acc += v
        walk.append(acc)
    walkdf = _ticks(spark, [("k", h, 0, v)
                            for h, v in enumerate(walk)])
    expr = f"us DIV {US_HOUR}"
    an = dfa(noise, expr, "value").collect()[0]["alpha"]
    aw = dfa(walkdf, expr, "value").collect()[0]["alpha"]
    assert 0.3 < an < 0.8
    assert aw > an + 0.6


def test_tukey_hsd_separated_groups(spark):
    # two tight clusters far apart + one overlapping pair: the
    # separated pair's q dwarfs the near pair's.
    from datafusion_functions_financial_spark.operators.stats18 import (
        tukey_hsd,
    )
    rows = ([("a", v) for v in (1.0, 2.0, 3.0)]
            + [("b", v) for v in (1.5, 2.5, 3.5)]
            + [("c", v) for v in (50.0, 51.0, 52.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r["g1"], r["g2"]): r for r in tukey_hsd(
        df, "v", "g").collect()}
    assert len(out) == 3
    assert out[("a", "c")]["q_stat"] > 10 * out[("a", "b")]["q_stat"]
    assert out[("a", "b")]["mean_diff"] == -0.5
    assert out[("a", "c")]["mean_diff"] == -49.0


def test_cmh_simpson_reversal_detected(spark):
    # two strata, each with NO within-stratum association (odds
    # ratio 1): pooled counts would suggest association, CMH must
    # report or_mh = 1 and a tiny chi2.
    from datafusion_functions_financial_spark.operators.stats18 import (
        cmh_test,
    )
    rows = []
    # stratum 0: exposure 80/20 split, outcome independent at 50%
    for e, o, n in ((1, 1, 40), (1, 0, 40), (0, 1, 10), (0, 0, 10)):
        rows += [(0, e, o)] * n
    # stratum 1: exposure 20/80 split, outcome independent at 10%
    for e, o, n in ((1, 1, 2), (1, 0, 18), (0, 1, 8), (0, 0, 72)):
        rows += [(1, e, o)] * n
    df = spark.createDataFrame(rows, "s int, e int, o int")
    row = cmh_test(df, "s", "e", "o").collect()[0]
    assert row["n_strata"] == 2 and row["n"] == 200
    assert row["or_mh"] == 1.0
    assert row["cmh_chi2"] < 0.1


def test_cindex_perfect_and_anti_ranking(spark):
    # subjects with one gap each: higher score <-> shorter gap is
    # perfect concordance (c = 1); reversed scores give c = 0.
    from datafusion_functions_financial_spark.operators.survival3 import (
        concordance_index,
    )
    US_MIN = 60_000_000

    def build(scores):
        rows = []
        for i, (gap_min, score) in enumerate(scores):
            rows.append((i, 0, score))
            rows.append((i, gap_min * US_MIN, score))
        return spark.createDataFrame(
            rows, "user_id long, us long, value double")

    # gaps 10 < 20 < 30 minutes; bands 9 > 5 > 0. Each subject also
    # contributes a censored tail row (last event to window end), so
    # the "perfect" ranking still carries one score tie: the b9
    # death at t=10 vs its own band's censored row at t=20.
    good = build([(10, 95.0), (20, 55.0), (30, 5.0)])
    row = concordance_index(good, "us", "user_id", "value").collect()[0]
    assert row["disc"] == 0 and row["conc"] == 3
    assert row["tied_score"] == 1 and row["c_index"] == 0.875
    bad = build([(10, 5.0), (20, 55.0), (30, 95.0)])
    row = concordance_index(bad, "us", "user_id", "value").collect()[0]
    assert row["conc"] == 0 and row["disc"] == 3
    assert row["c_index"] == 0.125


def test_gtest_independent_vs_dependent(spark):
    from datafusion_functions_financial_spark.operators.stats19 import (
        g_test,
    )
    # perfectly dependent: each row value maps to one column value
    dep = spark.createDataFrame(
        [("a", 0)] * 10 + [("b", 1)] * 10, "r string, c int")
    ind = spark.createDataFrame(
        [("a", 0)] * 5 + [("a", 1)] * 5
        + [("b", 0)] * 5 + [("b", 1)] * 5, "r string, c int")
    d = g_test(dep, "r", "c").collect()[0]
    i = g_test(ind, "r", "c").collect()[0]
    assert i["g_stat"] == 0.0 and d["g_stat"] > 10.0
    assert d["dof"] == 1 and d["n"] == 20


def test_odds_ratio_hand_computed(spark):
    from datafusion_functions_financial_spark.operators.stats19 import (
        odds_ratio_ci,
    )
    rows = ([(1, 1)] * 30 + [(1, 0)] * 10
            + [(0, 1)] * 10 + [(0, 0)] * 30)
    df = spark.createDataFrame(rows, "e int, o int")
    r = odds_ratio_ci(df, "e", "o").collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (30, 10, 10, 30)
    assert r["odds_ratio"] == 9.0
    assert r["ci_lo"] < 9.0 < r["ci_hi"]
    # Woolf CI: exp(ln 9 +- 1.96 * sqrt(4/30 + 4/10... )) wait:
    # se = sqrt(1/30 + 1/10 + 1/10 + 1/30) = sqrt(4/15)
    import math
    se = math.sqrt(1/30 + 1/10 + 1/10 + 1/30)
    assert abs(r["ci_lo"] - 9.0 * math.exp(-1.959963984540054 * se)) < 1e-4


def test_cox_stuart_monotone_and_flat(spark):
    from datafusion_functions_financial_spark.operators.stats19 import (
        cox_stuart,
    )
    expr = f"us DIV {US_HOUR}"
    up = _ticks(spark, [("k", h, 0, float(h)) for h in range(21)])
    flat = _ticks(spark, [("k", h, 0, 5.0) for h in range(21)])
    u = cox_stuart(up, expr, "value").collect()[0]
    f = cox_stuart(flat, expr, "value").collect()[0]
    # 21 obs -> 10 pairs, middle dropped, all increasing
    assert u["t"] == 21 and u["n_pairs"] == 10 and u["n_pos"] == 10
    assert abs(u["z"] - 2.0 * 10 / (2 * 10 ** 0.5)) < 1e-5
    assert f["n_pairs"] == 0 and f["z"] is None


def test_records_test_monotone_series(spark):
    from datafusion_functions_financial_spark.operators.stats19 import (
        records_test,
    )
    expr = f"us DIV {US_HOUR}"
    up = _ticks(spark, [("k", h, 0, float(h)) for h in range(30)])
    r = records_test(up, expr, "value").collect()[0]
    # every observation is a record on a strictly increasing series
    assert r["t"] == 30 and r["n_records"] == 30
    import math
    h30 = sum(1.0 / t for t in range(1, 31))
    assert abs(r["e_records"] - h30) < 1e-5
    assert r["z"] > 5.0


def test_twonn_planar_vectors(spark):
    # vectors confined to a 2-D subspace of the 64-dim space: the
    # TwoNN estimate should land near 1 (angular distance on a plane
    # is a 1-D manifold of directions), far below the ambient dim.
    import math

    from datafusion_functions_financial_spark.operators.embdim import (
        twonn_id,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        DIM,
    )
    rows = []
    for i in range(60):
        theta = 0.03 * (i * 7 % 60) + 0.001 * i
        v = [0.0] * DIM
        v[0], v[1] = math.cos(theta), math.sin(theta)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = twonn_id(df).collect()[0]
    assert r["n"] == 60 and r["n_used"] > 0
    assert 0.3 < r["id_twonn"] < 3.0


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_qnorm_aligns_shifted_sources(spark):
    # source b = source a shifted by +1000: after qnorm both sources
    # map rank-equal rows to the SAME pooled boundary values.
    from datafusion_functions_financial_spark.operators.qnorm import (
        quantile_normalize,
    )
    rows = ([(i, "a", 100 + i) for i in range(40)]
            + [(100 + i, "b", 1100 + i) for i in range(40)])
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = quantile_normalize(df, "id", "g", "v", n_buckets=4)
    got = {(r["grp"], r["id"]): (r["bucket"], r["qnorm"])
           for r in out.collect()}
    assert len(got) == 80
    for i in range(40):
        assert got[("a", i)] == got[("b", 100 + i)]
    # buckets are monotone within a source
    bks = [got[("a", i)][0] for i in range(40)]
    assert bks == sorted(bks) and bks[0] == 1 and bks[-1] == 4


@pytest.mark.slow
def test_chow_detects_slope_break(spark):
    from datafusion_functions_financial_spark.operators.stats20 import (
        chow_sup,
    )
    expr = f"us DIV {US_HOUR}"
    # slope 1 until h=55, slope 8 after (off the decile grid so no
    # segment fits exactly; a split AT an exact two-line break zeroes
    # both SSRs and reports NULL by the 0/0 guard — verified below).
    broken = []
    for h in range(100):
        v = float(h) if h < 55 else 55.0 + 8.0 * (h - 55)
        broken.append(("k", h, 0, v))
    linear = [("k", h, 0, float(3 * h)) for h in range(100)]
    b = {r["decile"]: r for r in chow_sup(
        _ticks(spark, broken), expr, "value").collect()}
    l = chow_sup(_ticks(spark, linear), expr, "value").collect()
    sup = [d for d, r in b.items() if r["is_sup"] == 1]
    assert sup in ([5], [6]) and b[sup[0]]["f_chow"] > 100.0
    exact = []
    for h in range(100):
        v = float(h) if h < 50 else 50.0 + 8.0 * (h - 50)
        exact.append(("k", h, 0, v))
    e = {r["decile"]: r for r in chow_sup(
        _ticks(spark, exact), expr, "value").collect()}
    assert e[5]["f_chow"] is None  # perfect two-line fit -> guard
    # a perfectly linear series fits both segments exactly: SSRs are
    # all ~0 and every candidate F is NULL (0/0 guard) or tiny
    assert all((r["f_chow"] is None or r["f_chow"] < 1e-3)
               for r in l)


def test_gesd_removes_three_planted_outliers(spark):
    from datafusion_functions_financial_spark.operators.stats20 import (
        gesd,
    )
    rows = [(i, 100.0 + (i % 7)) for i in range(50)]
    rows[10] = (10, 5000.0)
    rows[20] = (20, -4000.0)
    rows[30] = (30, 3000.0)
    df = spark.createDataFrame(rows, "id long, v double")
    out = sorted(gesd(df, "v", "id").collect(),
                 key=lambda r: r["round"])
    assert [r["removed_id"] for r in out] == [10, 20, 30]
    assert out[0]["removed_value"] == 5000.0
    assert all(r["z"] > 3.0 for r in out)


def test_hartley_fmax_hand_computed(spark):
    from datafusion_functions_financial_spark.operators.stats20 import (
        hartley_fmax,
    )
    rows = ([("a", v) for v in (1.0, 2.0, 3.0)]          # var 1
            + [("b", v) for v in (10.0, 14.0, 18.0)])    # var 16
    df = spark.createDataFrame(rows, "g string, v double")
    r = hartley_fmax(df, "v", "g").collect()[0]
    assert r["k"] == 2 and r["max_df"] == 2
    assert r["fmax"] == 16.0


@pytest.mark.slow
def test_late_queue_ops_exchange_budget(spark, sf_dir):
    # shared-relation reuse discipline for the later queue batches:
    # the c-index cells relation feeds 4 consumers (was 11 exchanges
    # before its checkpoint), the G-test contingency 3 (was 7).
    from tests.test_plans import count_exchanges, plan_of
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "q_cindex_events")) <= 6
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "q_gtest_events")) <= 4
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "q_tukey_hsd_events")) <= 4
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "q_ndcg_events")) <= 2
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "q_dfa_events")) <= 5
    assert count_exchanges(plan_of(spark, sf_dir,
                                   "q_chow_sup_events")) <= 3


def test_qini_positive_for_planted_uplift(spark):
    # treated units respond iff score > 70; control never responds:
    # qini at full depth = total treated responders, and the curve
    # is non-decreasing through the high-score deciles.
    from datafusion_functions_financial_spark.operators.uplift import (
        qini_curve,
    )
    rows = []
    for i in range(200):
        score = float(i % 100)
        arm = i % 2
        resp = 1 if (arm == 1 and score > 70.0) else 0
        rows.append((i, score, arm, resp))
    df = spark.createDataFrame(rows, "id long, s double, arm int, r int")
    out = sorted(qini_curve(df, "s", "arm", "r").collect(),
                 key=lambda x: x["decile"])
    assert out[-1]["decile"] == 10
    assert out[-1]["resp_c"] == 0
    assert out[-1]["qini"] == out[-1]["resp_t"] > 0
    # all uplift lives in the top 3 deciles (scores 71..99)
    assert out[2]["qini"] == out[-1]["qini"]


@pytest.mark.slow
def test_rmst_no_censoring_equals_clipped_mean(spark):
    # three subjects with one observed gap each (plus censored
    # tails at 0): KM steps at each gap; RMST(60) integrates it.
    from datafusion_functions_financial_spark.operators.survival4 import (
        rmst,
    )
    US_MIN = 60_000_000
    rows = []
    for i, gap in enumerate((10, 20, 30)):
        rows.append((i, 0, 0))
        rows.append((i, gap * US_MIN, 0))
    df = spark.createDataFrame(rows, "user_id long, us long, x long")
    r = rmst(df, "us", "user_id", ["us"]).collect()[0]
    assert r["tau_min"] == 60
    # survivors: S=1 on [0,10); the censored rows all land at t=0
    # with the max-us end (30min): subjects 0,1,2 censored at
    # 20,10,0 minutes -> risk set math; just sanity-bound the area
    assert 0 < r["rmst_min"] <= 60


def test_yuen_ignores_extreme_tail(spark):
    # identical trimmed cores, one wild outlier in group a: Yuen's
    # t stays ~0 while a plain mean difference would be huge.
    from datafusion_functions_financial_spark.operators.stats21 import (
        yuen_ttest,
    )
    core = [float(v) for v in range(10, 30)]
    rows = ([("a", v) for v in core] + [("a", 100000.0)]
            + [("b", v) for v in core] + [("b", 10.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    r = yuen_ttest(df, "v", "g", "a", "b").collect()[0]
    assert r["n_a"] == 21 and r["h_a"] == 21 - 2 * 4
    assert abs(r["tmean_a"] - r["tmean_b"]) < 2.0
    assert abs(r["t_yuen"]) < 3.0


@pytest.mark.slow
def test_page_hinkley_step_alarm(spark):
    # flat series then a +50 level shift: PH alarms after the step;
    # the flat prefix never does.
    from datafusion_functions_financial_spark.operators.drift2 import (
        page_hinkley,
    )
    expr = f"us DIV {US_HOUR}"
    stepped = _ticks(
        spark,
        [("k", h, 0, 10.0 if h < 40 else 60.0) for h in range(80)])
    flat = _ticks(spark, [("k", h, 0, 10.0) for h in range(80)])
    s = page_hinkley(stepped, expr, "value").collect()[0]
    f = page_hinkley(flat, expr, "value").collect()[0]
    assert s["n_alarm_buckets"] > 0 and s["first_alarm_t"] > 40
    assert s["max_ph"] > 100.0
    assert f["n_alarm_buckets"] == 0 and f["first_alarm_t"] is None
    assert f["max_ph"] == 0.0


@pytest.mark.slow
def test_ad_ks_exponential_detect_regular_arrivals(spark):
    # perfectly regular arrivals (constant gap) are maximally
    # non-exponential; bursty hash-spread gaps fit much better.
    import random

    from datafusion_functions_financial_spark.operators.gof import (
        ad_exponential, ks_exponential,
    )
    US_MIN = 60_000_000
    reg = [("k", i * US_MIN) for i in range(200)]
    rng = random.Random(7)
    acc, exp_rows = 0, []
    for _ in range(200):
        acc += max(1, int(rng.expovariate(1.0) * US_MIN))
        exp_rows.append(("k", acc))
    regdf = spark.createDataFrame(reg, "user_id string, us long")
    expdf = spark.createDataFrame(exp_rows, "user_id string, us long")
    ad_r = ad_exponential(regdf, "us", "user_id").collect()[0]
    ad_e = ad_exponential(expdf, "us", "user_id").collect()[0]
    ks_r = ks_exponential(regdf, "us", "user_id").collect()[0]
    ks_e = ks_exponential(expdf, "us", "user_id").collect()[0]
    assert ad_r["ad_stat"] > 10 * ad_e["ad_stat"] > 0
    assert ks_r["ks_d"] > 3 * ks_e["ks_d"]
    # constant gap: the empirical CDF jumps 0 -> 1 at the single
    # value; F(mean) = 1 - 1/e, so D = max(1/e, 1 - 1/e)
    import math
    assert abs(ks_r["ks_d"] - (1.0 - math.exp(-1.0))) < 1e-6


def test_pinball_hand_computed_on_uniform_grid(spark):
    # train == test distribution {10..50}: forecasts are the exact
    # type-1 quantiles (P10 = 10, P50 = 30, P90 = 50) and the mean
    # losses are hand-computable: L10 = 0.1*mean(y-10) = 2,
    # L50 = 0.5*mean|y-30| = 6, L90 = 0.9*mean(50-y) = ... wait,
    # for y <= yhat the branch is (q-1)(y-yhat): L90 =
    # mean max(.9(y-50), -.1(y-50)) = 0.1*mean(50-y) = 2.
    from datafusion_functions_financial_spark.operators.forecast3 import (
        pinball_hourly,
    )
    US_DAY = 86_400_000_000
    US_HOUR_ = 3_600_000_000
    rows = []
    for d in range(8):
        for i, v in enumerate((10.0, 20.0, 30.0, 40.0, 50.0)):
            rows.append((d * US_DAY + 5 * US_HOUR_ + i, v))
    df = spark.createDataFrame(rows, "us long, value double")
    out = {r["q_pct"]: r for r in pinball_hourly(
        df, "us", "value").collect()}
    assert set(out) == {10, 50, 90}
    assert all(r["n_test"] == 20 for r in out.values())
    assert out[10]["pinball"] == 2.0
    assert out[50]["pinball"] == 6.0
    assert out[90]["pinball"] == 2.0


def test_calendar_grid_full_and_silent_cells(spark):
    from datafusion_functions_financial_spark.operators.dq6 import (
        calendar_grid,
    )
    US_HOUR_ = 3_600_000_000
    # one event in every hour of exactly one week -> every cell
    # occupancy exactly 1.0
    rows = [(h * US_HOUR_,) for h in range(168)]
    df = spark.createDataFrame(rows, "us long")
    out = calendar_grid(df, "us").collect()
    assert len(out) == 168
    assert all(r["occupancy"] == 1.0 and r["n_events"] == 1
               for r in out)
    # drop Mondays entirely (dow of day-index % 7 == 0 bucket):
    rows2 = [(h * US_HOUR_,) for h in range(168) if h >= 24]
    out2 = {(r["dow"], r["hour"]): r for r in calendar_grid(
        spark.createDataFrame(rows2, "us long"), "us").collect()}
    assert len(out2) == 168
    silent = [k for k, r in out2.items() if r["n_events"] == 0]
    assert len(silent) == 24 and all(d == 0 for d, _ in silent)


def test_centroid_confusion_separated_clusters(spark):
    # two tight clusters on orthogonal axes, labels matching them:
    # the confusion grid is diagonal with share 1.
    from datafusion_functions_financial_spark.operators.embclf import (
        centroid_confusion,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        DIM,
    )
    rows = []
    for i in range(20):
        v = [0.0] * DIM
        v[0] = 1.0 + 0.01 * (i % 5)
        rows.append((i, v, 0))
    for i in range(20, 40):
        v = [0.0] * DIM
        v[1] = 1.0 + 0.01 * (i % 5)
        rows.append((i, v, 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {(r["true_label"], r["pred_label"]): r
           for r in centroid_confusion(df).collect()}
    assert len(out) == 4
    assert out[(0, 0)]["n"] == 20 and out[(0, 0)]["share"] == 1.0
    assert out[(1, 1)]["n"] == 20 and out[(1, 1)]["share"] == 1.0
    assert out[(0, 1)]["n"] == 0 and out[(1, 0)]["n"] == 0


def test_charclass_profile_hand_computed(spark):
    from datafusion_functions_financial_spark.operators.text11 import (
        charclass_profile,
    )
    df = spark.createDataFrame(
        [("s1", "ab 12!"), ("s1", "cd"), ("s2", "1234")],
        "source string, text string")
    out = {r["source"]: r for r in charclass_profile(df).collect()}
    s1 = out["s1"]  # "ab 12!" + "cd": 8 chars, 4 letters, 2 digits,
    assert s1["n_chars"] == 8                     # 1 space, 1 other
    assert s1["letter_share"] == 0.5
    assert s1["digit_share"] == 0.25
    assert s1["space_share"] == 0.125
    assert s1["other_share"] == 0.125
    assert s1["dominant"] == "letters"
    assert out["s2"]["dominant"] == "digits"
    assert out["s2"]["digit_share"] == 1.0

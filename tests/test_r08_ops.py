"""Round-8-queue operator tests: Nelson-Aalen cumulative hazard, the
risk2 performance ratios (Calmar / Omega / information ratio), and
plan-shape guards for every query added after the r07 gate window
froze in this session.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _approx(a, b, tol=1e-6):
    assert a == pytest.approx(b, abs=tol), (a, b)


# --------------------------------------------------------------------------
# survival — Nelson-Aalen
# --------------------------------------------------------------------------


def test_nelson_aalen_matches_manual_hazard(spark):
    """3 users, hand-laid gaps: observed durations are consecutive
    gaps, each user's last event censors at corpus end. H(t) and its
    variance match the textbook sums."""
    from datafusion_functions_financial_spark.operators.survival import (
        nelson_aalen,
    )
    m = 60_000_000  # us per minute
    rows = [  # (user, us, id)
        (1, 0 * m, 1), (1, 2 * m, 2),         # gap 2, censor 8
        (2, 0 * m, 3), (2, 2 * m, 4),         # gap 2, censor 8
        (3, 5 * m, 5), (3, 10 * m, 6),        # gap 5, censor 0
    ]
    df = spark.createDataFrame(rows, "u long, us long, id long")
    out = {r["t_min"]: r for r in nelson_aalen(
        df, "us", "u", ["us", "id"]).collect()}
    # duration table: t=0 c=1 (user3 censored at end), t=2 d=2,
    # t=5 d=1, t=8 c=2.  n_risk walks 6,5,3,2.
    assert out[0]["n_risk"] == 6 and out[0]["c"] == 1
    assert out[2]["d"] == 2 and out[2]["n_risk"] == 5
    assert out[5]["d"] == 1 and out[5]["n_risk"] == 3
    _approx(out[0]["cum_hazard"], 0.0)
    _approx(out[2]["cum_hazard"], 2 / 5)
    _approx(out[5]["cum_hazard"], 2 / 5 + 1 / 3)
    _approx(out[8]["cum_hazard"], 2 / 5 + 1 / 3)  # censoring: no step
    _approx(out[5]["hazard_var"], 2 / 25 + 1 / 9)


def test_nelson_aalen_dominates_km_log_survival(spark, sf_dir):
    """H_NA(t) <= -ln(S_KM(t)) pointwise (classic inequality), and
    both are nondecreasing step functions on real data."""
    from datafusion_functions_financial_spark.operators.survival import (
        kaplan_meier, nelson_aalen,
    )
    from datafusion_functions_financial_spark.sources.tables import load
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    na = {r["t_min"]: r["cum_hazard"] for r in nelson_aalen(
        ev, "__us", "user_id", ["ts", "event_id"]).collect()}
    km = {r["t_min"]: r["survival"] for r in kaplan_meier(
        ev, "__us", "user_id", ["ts", "event_id"]).collect()}
    assert set(na) == set(km)
    prev = 0.0
    for t in sorted(na):
        assert na[t] >= prev - 1e-9  # nondecreasing
        prev = na[t]
        if km[t] > 0:
            assert na[t] <= -math.log(km[t]) + 1e-6


# --------------------------------------------------------------------------
# risk2 — Calmar / Omega / information ratio
# --------------------------------------------------------------------------


def _series_df(spark, vals):
    return spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "g string, i long, v double")


def test_calmar_manual_path(spark):
    """Path 100->110->99: returns (+0.1, -0.1), max drawdown
    (110-99)/110, calmar = mean_ret / max_dd."""
    from datafusion_functions_financial_spark.functions.risk2 import (
        calmar,
    )
    out = calmar(_series_df(spark, [100, 110, 99]),
                 "v", ["g"], ["i"]).collect()[0]
    mean_ret = (0.1 + (99 / 110 - 1)) / 2
    max_dd = (110 - 99) / 110
    assert out["n_returns"] == 2
    _approx(out["mean_ret"], mean_ret)
    _approx(out["max_dd"], max_dd)
    _approx(out["calmar"], mean_ret / max_dd)


def test_calmar_null_when_no_drawdown(spark):
    from datafusion_functions_financial_spark.functions.risk2 import (
        calmar,
    )
    out = calmar(_series_df(spark, [1, 2, 3, 4]),
                 "v", ["g"], ["i"]).collect()[0]
    _approx(out["max_dd"], 0.0)
    assert out["calmar"] is None


def test_omega_gain_loss_masses(spark):
    """Returns +0.5, -0.25: omega = 0.5 / 0.25 = 2."""
    from datafusion_functions_financial_spark.functions.risk2 import (
        omega,
    )
    out = omega(_series_df(spark, [100, 150, 112.5]),
                "v", ["g"], ["i"]).collect()[0]
    _approx(out["gain"], 0.5)
    _approx(out["loss"], 0.25)
    _approx(out["omega"], 2.0)


def test_omega_all_gains_is_null(spark):
    from datafusion_functions_financial_spark.functions.risk2 import (
        omega,
    )
    out = omega(_series_df(spark, [1, 2, 4]),
                "v", ["g"], ["i"]).collect()[0]
    assert out["omega"] is None and out["loss"] == 0.0


def test_information_ratio_matches_numpy(spark):
    """Two hourly series with a known active difference: IR equals
    numpy mean/std (ddof=1) of the hourly diffs."""
    from datafusion_functions_financial_spark.functions.risk2 import (
        information_ratio,
    )
    rng = np.random.RandomState(11)
    h = 3_600_000_000
    rows = []
    xs, ys = [], []
    for i in range(50):
        x = 10 + rng.rand() * 2
        y = 9 + rng.rand()
        xs.append(round(x, 4))
        ys.append(round(y, 4))
        rows.append((i * h + 5, "a", round(x, 4), 2 * i))
        rows.append((i * h + 7, "b", round(y, 4), 2 * i + 1))
    df = spark.createDataFrame(
        rows, "us long, s string, v double, id long")
    out = information_ratio(df, "us", "v", "s", "a", "b").collect()[0]
    d = np.array(xs) - np.array(ys)
    assert out["n_hours"] == 50
    _approx(out["mean_active"], float(d.mean()), 1e-5)
    _approx(out["sd_active"], float(d.std(ddof=1)), 1e-5)
    _approx(out["info_ratio"],
            float(d.mean() / d.std(ddof=1)), 1e-4)


# --------------------------------------------------------------------------
# micro5 — Lee-Ready classification + effective spread
# --------------------------------------------------------------------------


def _tape(spark):
    """One symbol, one quote (bid 10 / ask 12, mid 11), five trades:
    above-mid buy, below-mid sell, two at-mid falling back to the
    tick rule, and a leading at-mid trade that stays unclassified."""
    trades = spark.createDataFrame(
        [("s", 100, 1, 11.0),   # at mid, no prior tick -> NULL
         ("s", 200, 2, 11.5),   # > mid -> buy
         ("s", 300, 3, 10.5),   # < mid -> sell (tick now -1)
         ("s", 400, 4, 11.0),   # at mid -> carry tick: +1? no: last
                                 # nonzero change 10.5<11.0 -> +1
         ("s", 500, 5, 11.0)],  # at mid, price unchanged -> carry +1
        "sym string, us long, id long, price double")
    quotes = spark.createDataFrame(
        [("s", 0, 10.0, 12.0)],
        "sym string, q_us long, bid double, ask double")
    return trades, quotes


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_lee_ready_manual_tape(spark):
    from datafusion_functions_financial_spark.operators.micro5 import (
        lee_ready_classify, lee_ready_summary,
    )
    trades, quotes = _tape(spark)
    cls = {r["id"]: r["__side"] for r in lee_ready_classify(
        trades, quotes, ["sym"], "us", ["us", "id"], "price",
        "q_us", "bid", "ask").collect()}
    assert cls == {1: None, 2: 1, 3: -1, 4: 1, 5: 1}
    s = lee_ready_summary(
        trades, quotes, ["sym"], "us", ["us", "id"], "price",
        "q_us", "bid", "ask").collect()[0]
    assert (s["n_trades"], s["n_buy"], s["n_sell"],
            s["n_unclassified"]) == (5, 3, 1, 1)
    _approx(s["buy_share"], 3 / 4)


def test_effective_spread_manual(spark):
    """|p - mid| terms: 0, .5, .5, 0, 0 on mid 11 -> mean of
    2*|d|/mid * 1e4 bps."""
    from datafusion_functions_financial_spark.operators.micro5 import (
        effective_spread,
    )
    trades, quotes = _tape(spark)
    out = effective_spread(
        trades, quotes, ["sym"], "us", "price", "q_us",
        "bid", "ask").collect()[0]
    terms = [0.0, 2 * 0.5 / 11, 2 * 0.5 / 11, 0.0, 0.0]
    _approx(out["eff_spread_bps"],
            sum(t * 1e4 for t in terms) / 5, 1e-4)
    assert out["n_quoted"] == 5


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_lee_ready_trade_before_first_quote_unmatched(spark):
    """A trade earlier than every quote has NULL mid and falls back
    to the tick rule (NULL here — it is the first row)."""
    from datafusion_functions_financial_spark.operators.micro5 import (
        lee_ready_classify,
    )
    trades = spark.createDataFrame(
        [("s", 100, 1, 11.0), ("s", 900, 2, 12.0)],
        "sym string, us long, id long, price double")
    quotes = spark.createDataFrame(
        [("s", 500, 10.0, 12.0)],
        "sym string, q_us long, bid double, ask double")
    cls = {r["id"]: r["__side"] for r in lee_ready_classify(
        trades, quotes, ["sym"], "us", ["us", "id"], "price",
        "q_us", "bid", "ask").collect()}
    assert cls[1] is None      # no quote, no prior tick
    assert cls[2] == 1         # 12 > mid 11


# --------------------------------------------------------------------------
# graph3 — assortativity + k-core
# --------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long")


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_assortativity_star_is_minus_one(spark):
    from datafusion_functions_financial_spark.operators.graph3 import (
        degree_assortativity,
    )
    out = degree_assortativity(
        _edges(spark, [(0, 1), (0, 2), (0, 3)]), "a", "b").collect()[0]
    assert out["n_nodes"] == 4 and out["n_edges"] == 3
    _approx(out["assortativity"], -1.0)


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_assortativity_regular_graph_is_null(spark):
    """A cycle is degree-regular: zero variance -> NULL."""
    from datafusion_functions_financial_spark.operators.graph3 import (
        degree_assortativity,
    )
    out = degree_assortativity(
        _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]),
        "a", "b").collect()[0]
    assert out["assortativity"] is None


def test_assortativity_matches_numpy(spark):
    """Random graph: r equals numpy's corrcoef over the 2m directed
    endpoint-degree pairs."""
    from datafusion_functions_financial_spark.operators.graph3 import (
        degree_assortativity,
    )
    rng = np.random.RandomState(3)
    pairs = set()
    while len(pairs) < 40:
        a, b = rng.randint(0, 15, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    expect = float(np.corrcoef(xs, ys)[0, 1])
    out = degree_assortativity(
        _edges(spark, sorted(pairs)), "a", "b").collect()[0]
    _approx(out["assortativity"], expect, 1e-5)


@pytest.mark.slow
def test_kcore_peels_to_triangle(spark):
    """Triangle + a pendant chain: the 2-core is exactly the
    triangle (the chain peels over two rounds)."""
    from datafusion_functions_financial_spark.operators.graph3 import (
        k_core, k_core_summary,
    )
    g = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    core = sorted((r["__x"], r["__y"]) for r in k_core(
        _edges(spark, g), "a", "b", 2).collect())
    assert core == [(0, 1), (0, 2), (1, 2)]
    s = k_core_summary(_edges(spark, g), "a", "b", 2).collect()[0]
    assert (s["n_core_nodes"], s["n_core_edges"],
            s["min_core_degree"]) == (3, 3, 2)


def test_kcore_empty_core(spark):
    """A tree has no 2-core: zero nodes/edges, NULL min degree."""
    from datafusion_functions_financial_spark.operators.graph3 import (
        k_core_summary,
    )
    s = k_core_summary(
        _edges(spark, [(0, 1), (1, 2), (1, 3)]), "a", "b",
        2).collect()[0]
    assert (s["n_core_nodes"], s["n_core_edges"]) == (0, 0)
    assert s["min_core_degree"] is None


@pytest.mark.slow
def test_kcore_early_exit_equals_fixed_rounds(spark):
    from datafusion_functions_financial_spark.operators.graph3 import (
        k_core,
    )
    g = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (4, 6)]
    fast = sorted((r["__x"], r["__y"]) for r in k_core(
        _edges(spark, g), "a", "b", 2, early_exit=True).collect())
    slow = sorted((r["__x"], r["__y"]) for r in k_core(
        _edges(spark, g), "a", "b", 2, early_exit=False).collect())
    assert fast == slow


@pytest.mark.slow
def test_kcore_gate_config_converges(spark, sf_dir):
    """The unrolled-oracle equivalence needs the gate configuration
    to reach its fixpoint within KCORE_ROUNDS: one extra round must
    leave the edge count unchanged."""
    from datafusion_functions_financial_spark.operators.graph3 import (
        KCORE_K, KCORE_ROUNDS, _copurchase_edges, k_core,
    )
    edges = _copurchase_edges(spark, sf_dir)
    n_at = k_core(edges, "item_a", "item_b", KCORE_K,
                  max_rounds=KCORE_ROUNDS, early_exit=False).count()
    n_plus = k_core(edges, "item_a", "item_b", KCORE_K,
                    max_rounds=KCORE_ROUNDS + 1,
                    early_exit=False).count()
    assert n_at == n_plus


# --------------------------------------------------------------------------
# text6 — readability, bigram cross-entropy, hapax
# --------------------------------------------------------------------------


def _docs(spark, texts, sources=None):
    sources = sources or ["s"] * len(texts)
    return spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(zip(texts, sources))],
        "doc_id long, text string, source string")


def test_readability_manual_counts(spark):
    """'Hello world. It works!' -> 4 words, 2 sentences, syllables
    hello=2 world=1 it=1 works=1 = 5; scores from the formulas."""
    from datafusion_functions_financial_spark.operators.text6 import (
        readability,
    )
    out = readability(
        _docs(spark, ["Hello world. It works!"])).collect()[0]
    assert (out["n_words"], out["n_sentences"],
            out["n_syllables"]) == (4, 2, 5)
    _approx(out["flesch"], 206.835 - 1.015 * 2 - 84.6 * 1.25, 1e-4)
    _approx(out["fk_grade"], 0.39 * 2 + 11.8 * 1.25 - 15.59, 1e-4)


def test_readability_no_terminal_punct_is_one_sentence(spark):
    from datafusion_functions_financial_spark.operators.text6 import (
        readability,
    )
    out = readability(_docs(spark, ["just some words"])).collect()[0]
    assert out["n_sentences"] == 1 and out["n_words"] == 3


def test_bigram_xent_manual(spark):
    """Corpus 'a b a b' + 'a b c': bigram counts ab=3, ba=1, bc=1;
    heads a•=3, b•=2.  Doc-2 xent = -(ln(3/3) + ln(1/2)) / 2."""
    from datafusion_functions_financial_spark.operators.text6 import (
        bigram_cross_entropy,
    )
    out = {r["doc_id"]: r for r in bigram_cross_entropy(
        _docs(spark, ["a b a b", "a b c"])).collect()}
    _approx(out[1]["bigram_xent"],
            -(math.log(3 / 3) + math.log(1 / 2)) / 2, 6e-5)
    assert out[0]["n_bigrams"] == 3
    # doc 0: ab ba ab -> -(2 ln(3/3) + ln(1/2)) / 3
    _approx(out[0]["bigram_xent"], -math.log(1 / 2) / 3, 6e-5)


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_bigram_xent_single_token_doc_dropped(spark):
    from datafusion_functions_financial_spark.operators.text6 import (
        bigram_cross_entropy,
    )
    rows = bigram_cross_entropy(_docs(spark, ["solo", "a b"])).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_hapax_profile_manual(spark):
    """Source s: tokens a a b c -> vocab 3, hapax {b, c} = 2."""
    from datafusion_functions_financial_spark.operators.text6 import (
        hapax_profile,
    )
    out = hapax_profile(
        _docs(spark, ["a a b", "c"], ["s", "s"])).collect()[0]
    assert (out["vocab_size"], out["n_hapax"]) == (3, 2)
    _approx(out["hapax_share"], 2 / 3, 6e-5)


# --------------------------------------------------------------------------
# embpca — deflated second component
# --------------------------------------------------------------------------


@pytest.mark.slow  # 22s: the full numpy eigen cross-check; the gate
# query + parity net keep PC2 covered in the default selection
def test_pca2_orthogonal_and_matches_numpy(spark):
    """Synthetic corpus with two dominant directions: after enough
    iterations the two loadings align with numpy's top-2 eigenvectors
    of X^T X (power iteration runs on the uncentered second-moment
    matrix) and are mutually orthogonal."""
    from datafusion_functions_financial_spark.operators.embpca import (
        power_iteration_two,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        DIM,
    )
    rng = np.random.RandomState(5)
    e1 = np.zeros(DIM); e1[0] = 1.0
    e2 = np.zeros(DIM); e2[1] = 1.0
    X = (rng.randn(200, 1) * 5.0 * e1
         + rng.randn(200, 1) * 2.0 * e2
         + rng.randn(200, DIM) * 0.05)
    X = np.round(X, 4)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(200)],
        "vec_id long, embedding array<float>")
    out = power_iteration_two(df, n_iter=6).collect()
    l1 = np.zeros(DIM); l2 = np.zeros(DIM)
    for r in out:
        l1[r["pos"]] = r["loading1"]
        l2[r["pos"]] = r["loading2"]
    w, v = np.linalg.eigh(X.T @ X)
    top1, top2 = v[:, -1], v[:, -2]
    assert abs(float(np.dot(l1, l2))) < 1e-3
    assert abs(abs(float(np.dot(l1, top1))) - 1) < 1e-3
    assert abs(abs(float(np.dot(l2, top2))) - 1) < 1e-3


# --------------------------------------------------------------------------
# dq4 — value patterns + daily completeness
# --------------------------------------------------------------------------


def test_value_pattern_rewrites_and_nulls(spark):
    from datafusion_functions_financial_spark.operators.dq4 import (
        value_pattern_profile,
    )
    df = spark.createDataFrame(
        [("AB-12",), ("CD-99",), ("x7",), (None,)], "c string")
    out = {(r["pattern"]): (r["n"], r["share"])
           for r in value_pattern_profile(df, ["c"]).collect()}
    assert out["AA-99"] == (2, 0.5)
    assert out["a9"][0] == 1
    assert out["<null>"][0] == 1


def test_value_pattern_topk_tiebreak(spark):
    from datafusion_functions_financial_spark.operators.dq4 import (
        value_pattern_profile,
    )
    df = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c", "d", "e", "f"]], "c string")
    out = value_pattern_profile(df, ["c"], top_k=1).collect()
    # every value maps to pattern 'a' -> one row, n = 6
    assert len(out) == 1 and out[0]["n"] == 6


def test_daily_completeness_counts(spark):
    from datafusion_functions_financial_spark.operators.dq4 import (
        daily_completeness,
    )
    d = 86_400_000_000
    rows = [
        (1, 0 * d + 5, 1.0, "p"),
        (1, 0 * d + 6, None, "p"),
        (2, 0 * d + 7, 2.0, None),
        (1, 1 * d + 5, 3.0, "p"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, us long, value double, props string")
    out = {r["day"]: r for r in daily_completeness(
        df, "us", "user_id", ["value", "props"]).collect()}
    assert out[0]["n_rows"] == 3 and out[0]["n_keys"] == 2
    assert out[0]["n_null_value"] == 1 and out[0]["n_null_props"] == 1
    assert out[1]["n_rows"] == 1 and out[1]["n_null_value"] == 0


# --------------------------------------------------------------------------
# analytics8 — reconciliation + ship latency
# --------------------------------------------------------------------------


def _recon_tables(spark):
    orders = spark.createDataFrame(
        [(1, "O", 100.0), (2, "O", 50.0), (3, "F", 10.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double")
    # order 1 reconciles exactly; order 2 is off by 1.00; order 3 has
    # no lines at all.
    li = spark.createDataFrame(
        [(1, 50.0, 0.0, 0.0), (1, 50.0, 0.0, 0.0),
         (2, 49.0, 0.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double, "
        "l_tax double")
    return orders, li


def test_reconciliation_report_manual(spark):
    from datafusion_functions_financial_spark.plans.analytics8 import (
        reconciliation_report,
    )
    orders, li = _recon_tables(spark)
    out = {r["o_orderstatus"]: r for r in reconciliation_report(
        orders, li).collect()}
    assert out["O"]["n_orders"] == 2 and out["O"]["n_match"] == 1
    assert out["O"]["n_no_lines"] == 0
    _approx(out["O"]["mean_abs_diff"], 0.5)   # (0 + 1.00) / 2
    assert out["F"]["n_no_lines"] == 1
    assert out["F"]["mean_abs_diff"] is None


def test_top_discrepancies_ordering(spark):
    from datafusion_functions_financial_spark.plans.analytics8 import (
        top_discrepancies,
    )
    orders, li = _recon_tables(spark)
    rows = top_discrepancies(orders, li).collect()
    assert [r["o_orderkey"] for r in rows] == [2, 1]
    _approx(rows[0]["abs_diff"], 1.0)
    _approx(rows[1]["abs_diff"], 0.0)


def test_ship_latency_exact_percentiles(spark):
    """10 lines with latencies 0..9 days on one priority: p50 is the
    5th smallest (4), p90 the 9th (8)."""
    from datafusion_functions_financial_spark.plans.analytics8 import (
        ship_latency_profile,
    )
    day_us = 86_400_000_000
    orders = spark.createDataFrame(
        [(i, "1-URGENT", 1.0, 0) for i in range(10)],
        "o_orderkey long, o_orderpriority string, o_totalprice double, "
        "o_orderdate long").selectExpr(
        "o_orderkey", "o_orderpriority", "o_totalprice",
        "timestamp_micros(o_orderdate) AS o_orderdate")
    li = spark.createDataFrame(
        [(i, i * day_us) for i in range(10)],
        "l_orderkey long, us long").selectExpr(
        "l_orderkey", "timestamp_micros(us) AS l_shipdate")
    out = ship_latency_profile(orders, li).collect()[0]
    assert (out["n_lines"], out["min_days"], out["max_days"]) == (
        10, 0, 9)
    assert out["p50_days"] == 4 and out["p90_days"] == 8


# --------------------------------------------------------------------------
# forecast — theta method
# --------------------------------------------------------------------------


def test_theta_matches_manual_numpy(spark):
    """Known daily series: slope = OLS on the day index, SES fold in
    numpy, forecast = ses + slope/2."""
    from datafusion_functions_financial_spark.functions.forecast import (
        THETA_ALPHA, theta_forecast,
    )
    day = 86_400_000_000
    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0]
    rows = [("k", i * day + 7, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, us long, v double")
    out = theta_forecast(df, "us", "v", "g").collect()[0]
    t = np.arange(len(vals), dtype=float)
    m = np.array(vals)
    b = ((len(m) * (t * m).sum() - t.sum() * m.sum())
         / (len(m) * (t * t).sum() - t.sum() ** 2))
    l = m[0]
    for x in m[1:]:
        l = THETA_ALPHA * x + (1 - THETA_ALPHA) * l
    assert out["n_days"] == len(vals)
    _approx(out["slope"], float(b), 1e-5)
    _approx(out["ses_level"], float(l), 1e-5)
    _approx(out["theta_forecast"], float(l + b / 2), 1e-5)


def test_theta_single_day_key_dropped(spark):
    from datafusion_functions_financial_spark.functions.forecast import (
        theta_forecast,
    )
    df = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 9, 2.0)], "g string, us long, v double")
    assert theta_forecast(df, "us", "v", "g").collect() == []


# --------------------------------------------------------------------------
# analytics8 — TPC-H Q3/Q16 shapes: plan-asserted broadcast + top-k
# --------------------------------------------------------------------------


@pytest.mark.parametrize("name", [
    "q_shipping_priority_orders", "q_supplier_breadth_parts",
])
def test_tpch_shapes_broadcast_and_take_ordered(spark, sf_dir, name):
    """The dimension side must broadcast and the top-k must plan as
    TakeOrderedAndProject (no global sort)."""
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan


def test_shipping_priority_filters_both_sides(spark, sf_dir):
    """Every returned order respects both date predicates (the
    pushed filters, sanity-checked on data)."""
    from datafusion_functions_financial_spark.plans.analytics8 import (
        Q3_CUTOFF, _q_shipping_priority,
    )
    rows = _q_shipping_priority(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    import datetime
    cut = datetime.datetime.fromisoformat(Q3_CUTOFF)
    for r in rows:
        assert r["o_orderdate"] < cut
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


# --------------------------------------------------------------------------
# vocab — BPE merge candidates
# --------------------------------------------------------------------------


def test_bpe_pairs_weighted_by_word_count(spark):
    """'ab ab cd' -> pair (a,b) count 2, (c,d) count 1; multi-char
    words contribute every adjacent pair."""
    from datafusion_functions_financial_spark.operators.vocab import (
        bpe_merge_candidates,
    )
    df = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "abc")], "doc_id long, text string")
    out = {(r["left"], r["right"]): r["pair_count"]
           for r in bpe_merge_candidates(df).collect()}
    # 'ab'x2 -> (a,b)+2 ; 'cd' -> (c,d)+1 ; 'abc' -> (a,b)+1, (b,c)+1
    assert out[("a", "b")] == 3
    assert out[("c", "d")] == 1
    assert out[("b", "c")] == 1


def test_bpe_pairs_rank_deterministic(spark):
    from datafusion_functions_financial_spark.operators.vocab import (
        bpe_merge_candidates,
    )
    df = spark.createDataFrame(
        [(1, "xy yx")], "doc_id long, text string")
    rows = bpe_merge_candidates(df).collect()
    # equal counts -> ties break by (left, right) ascending
    assert [(r["left"], r["right"]) for r in rows] == [
        ("x", "y"), ("y", "x")]
    assert [r["rank"] for r in rows] == [1, 2]


# --------------------------------------------------------------------------
# plan guards for the new-in-session queries
# --------------------------------------------------------------------------

R08_NEW = [
    "q_nelson_aalen_events",
    "risk_calmar_events", "risk_omega_events", "risk_info_ratio_events",
    "micro_lee_ready_events", "micro_eff_spread_events",
    "graph_assortativity_lineitem", "graph_kcore_parts",
    "text_readability_documents", "text_bigram_xent_documents",
    "text_hapax_documents", "emb_pca2_power_embeddings",
    "dq_value_patterns_orders", "dq_completeness_daily_events",
    "q_reconcile_orders_lineitem", "q_reconcile_topk_orders",
    "q_ship_latency_orders", "q_theta_forecast_events",
    "q_shipping_priority_orders", "q_supplier_breadth_parts",
    "vocab_bpe_pairs_documents",
]


# r13 wall-time move: these three PLANS alone cost 2.8-3.7s of pure
# Catalyst analysis (iterative k-core expansion, the widest pattern
# profile, the quote/trade double as-of) — slow tranche, like the
# other measured >2.9s tests; the other 18 plan guards stay default.
_SLOW_PLAN_GUARDS = {
    "graph_kcore_parts", "dq_value_patterns_orders",
    "micro_eff_spread_events",
}


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow)
    if n in _SLOW_PLAN_GUARDS else n
    for n in R08_NEW
])
def test_r08_query_no_cartesian(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan

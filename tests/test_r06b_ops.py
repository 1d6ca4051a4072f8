"""Unit tests for the late-r06 operator additions (stats2, spectral,
micro3, graph2, quantile2): semantics vs naive Python references on
small frames, plus physical-plan shapes for the scale-critical
queries. Oracle parity at sf0.001 is covered for every gate query by
test_oracle_parity.py; these tests pin the MATH, independent of the
DuckDB oracle."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.test_plans import plan_of


def _approx(a, b, tol=1e-5):
    assert a == pytest.approx(b, abs=tol), (a, b)


# --------------------------------------------------------------------------
# stats2
# --------------------------------------------------------------------------


def test_chi2_independence_matches_naive(spark):
    from datafusion_functions_financial_spark.operators.stats2 import (
        chi2_independence,
    )
    rows = [("a", "x")] * 20 + [("a", "y")] * 10 + \
           [("b", "x")] * 5 + [("b", "y")] * 25 + [("c", "x")] * 8
    df = spark.createDataFrame(rows, "g string, h string")
    got = chi2_independence(df, "g", "h").collect()[0]
    obs = np.zeros((3, 2))
    gi = {"a": 0, "b": 1, "c": 2}
    hi = {"x": 0, "y": 1}
    for g, h in rows:
        obs[gi[g], hi[h]] += 1
    n = obs.sum()
    exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / n
    chi2 = ((obs - exp) ** 2 / exp).sum()
    _approx(got["chi2"], chi2)
    _approx(got["cramers_v"], math.sqrt(chi2 / (n * 1)))
    assert got["dof"] == 2 and got["n"] == n


def test_welch_matches_naive(spark):
    from datafusion_functions_financial_spark.operators.stats2 import (
        welch_ttest,
    )
    a = [1.0, 2.5, 3.0, 4.5, 2.0, 8.0]
    b = [2.0, 6.5, 7.0, 5.5, 9.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = welch_ttest(df, "v", "g", "A", "B").collect()[0]
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    sea, seb = va / len(a), vb / len(b)
    t = (np.mean(a) - np.mean(b)) / math.sqrt(sea + seb)
    dof = (sea + seb) ** 2 / (
        sea ** 2 / (len(a) - 1) + seb ** 2 / (len(b) - 1))
    _approx(got["t_stat"], t)
    _approx(got["dof"], dof)
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))


def _midranks(values):
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and values[order[j]] == values[order[i]]:
            j += 1
        mr = (i + 1 + j) / 2
        for k in range(i, j):
            ranks[order[k]] = mr
        i = j
    return ranks


def test_mann_whitney_matches_naive_with_ties(spark):
    from datafusion_functions_financial_spark.operators.stats2 import (
        mann_whitney_u,
    )
    a = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 7.0]
    b = [2.0, 4.0, 5.0, 6.0, 6.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = mann_whitney_u(df, "v", "g", "A", "B").collect()[0]
    allv = a + b
    ranks = _midranks(allv)
    ra = sum(ranks[: len(a)])
    ua = ra - len(a) * (len(a) + 1) / 2
    n = len(allv)
    ties = {}
    for v in allv:
        ties[v] = ties.get(v, 0) + 1
    tcorr = sum(t ** 3 - t for t in ties.values())
    var = len(a) * len(b) / 12 * ((n + 1) - tcorr / (n * (n - 1)))
    z = (ua - len(a) * len(b) / 2) / math.sqrt(var)
    _approx(got["u_a"], ua)
    _approx(got["z"], z)


def test_kruskal_matches_naive(spark):
    from datafusion_functions_financial_spark.operators.stats2 import (
        kruskal_wallis,
    )
    groups = {"A": [1.0, 3.0, 5.0, 7.0], "B": [2.0, 4.0, 6.0],
              "C": [1.0, 8.0, 9.0, 9.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    got = kruskal_wallis(df, "v", "g").collect()[0]
    allv = [v for _, v in rows]
    ranks = _midranks(allv)
    n = len(allv)
    h = 0.0
    idx = 0
    for g, vs in groups.items():
        rg = sum(ranks[idx: idx + len(vs)])
        idx += len(vs)
        h += rg ** 2 / len(vs)
    h = 12 / (n * (n + 1)) * h - 3 * (n + 1)
    ties = {}
    for v in allv:
        ties[v] = ties.get(v, 0) + 1
    tcorr = sum(t ** 3 - t for t in ties.values())
    h /= 1 - tcorr / (n ** 3 - n)
    _approx(got["h_stat"], h)
    assert got["k"] == 3 and got["n"] == n


def test_jarque_bera_matches_numpy(spark):
    from datafusion_functions_financial_spark.operators.stats2 import (
        jarque_bera,
    )
    rng = [0.5, 1.5, 2.5, 2.0, 8.0, 3.0, 2.2, 1.1, 0.9, 4.0]
    df = spark.createDataFrame([("g", v) for v in rng],
                               "g string, v double")
    got = jarque_bera(df, "v", "g").collect()[0]
    x = np.array(rng)
    d = x - x.mean()
    m2, m3, m4 = (d ** 2).mean(), (d ** 3).mean(), (d ** 4).mean()
    skew = m3 / m2 ** 1.5
    kurt = m4 / m2 ** 2 - 3
    # the 1e4/1e2 cube/fourth-power quantization (sized for BIGINT
    # safety at SF 1000) is grainy at n=10; error shrinks ~1/n
    _approx(got["skewness"], skew, tol=2e-3)
    _approx(got["kurtosis_excess"], kurt, tol=2e-3)
    _approx(got["jb_stat"], len(x) / 6 * (skew ** 2 + kurt ** 2 / 4),
            tol=2e-3)


def test_runs_test_counts_runs(spark):
    from datafusion_functions_financial_spark.operators.stats2 import (
        runs_test,
    )
    # values -> diffs: + + - - + (flat move dropped)
    vals = [1.0, 2.0, 3.0, 2.0, 1.0, 1.0, 4.0]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    got = runs_test(df, "v", ["g"], ["t"]).collect()[0]
    assert (got["n_up"], got["n_down"], got["runs"]) == (3, 2, 3)
    n, mu = 5, 2 * 3 * 2 / 5 + 1
    var = (mu - 1) * (mu - 2) / (n - 1)
    _approx(got["z"], (3 - mu) / math.sqrt(var))


# --------------------------------------------------------------------------
# spectral
# --------------------------------------------------------------------------


def test_periodogram_detects_planted_period(spark):
    from datafusion_functions_financial_spark.operators.spectral import (
        periodogram_hourly,
    )
    # 10 days of hourly "events": count = 10 + 8*cos(2pi*hour/24)
    rows = []
    eid = 0
    for h in range(240):
        c = int(round(10 + 8 * math.cos(2 * math.pi * h / 24)))
        for _ in range(c):
            rows.append((eid, h * 3_600_000_000),)
            eid += 1
    df = spark.createDataFrame(rows, "id long, us long")
    out = {r["k"]: r for r in periodogram_hourly(df, "us").collect()}
    kday = round(240 / 24)
    others = [r["power"] for k, r in out.items() if k != kday]
    assert out[kday]["power"] > 10 * max(others)
    _approx(out[kday]["period_hours"], 24.0)


def test_permutation_entropy_extremes(spark):
    from datafusion_functions_financial_spark.operators.spectral import (
        permutation_entropy,
    )
    inc = [("inc", i, float(i)) for i in range(50)]
    rng = np.random.RandomState(7)
    noise = [("rnd", i, float(v)) for i, v in enumerate(rng.rand(500))]
    df = spark.createDataFrame(inc + noise, "g string, t long, v double")
    out = {r["g"]: r for r in permutation_entropy(
        df, "v", ["g"], ["t"]).collect()}
    assert out["inc"]["n_patterns"] == 1 and out["inc"]["h_nats"] == 0.0
    assert out["rnd"]["h_norm"] > 0.9  # near-uniform over 6 patterns
    assert out["rnd"]["n"] == 498


def test_hurst_trending_exceeds_alternating(spark):
    from datafusion_functions_financial_spark.operators.spectral import (
        hurst_rs,
    )
    rng = np.random.RandomState(3)
    steps = rng.randn(1024)
    trend = np.cumsum(np.abs(steps))          # persistent (H ~ 1)
    anti = np.array([(-1) ** i for i in range(1024)], dtype=float)
    anti = np.cumsum(anti) + 0.01 * rng.randn(1024)  # anti-persistent
    rows = [("trend", i, float(v)) for i, v in enumerate(trend)]
    rows += [("anti", i, float(v)) for i, v in enumerate(anti)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = {r["g"]: r["hurst"] for r in hurst_rs(
        df, "v", ["g"], ["t"]).collect()}
    assert out["trend"] > 0.85
    assert out["anti"] < out["trend"] - 0.3


def test_pacf_ar1_signature(spark):
    from datafusion_functions_financial_spark.operators.spectral import (
        pacf,
    )
    # AR(1) with phi=0.8: acf_k ~ 0.8^k, pacf_2/pacf_3 ~ 0
    rng = np.random.RandomState(11)
    x = np.zeros(4000)
    for i in range(1, len(x)):
        x[i] = 0.8 * x[i - 1] + rng.randn()
    rows = [("g", i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    got = pacf(df, "v", ["g"], ["t"]).collect()[0]
    assert abs(got["acf_1"] - 0.8) < 0.05
    assert abs(got["pacf_1"] - got["acf_1"]) < 1e-12
    assert abs(got["pacf_2"]) < 0.06
    assert abs(got["pacf_3"]) < 0.06


# --------------------------------------------------------------------------
# micro3
# --------------------------------------------------------------------------


def test_vpin_balanced_vs_oneside(spark):
    from datafusion_functions_financial_spark.operators.micro3 import vpin
    up = [("up", i, 10.0 + i) for i in range(200)]      # all buys
    alt = [("alt", i, 10.0 + (i % 2)) for i in range(200)]
    df = spark.createDataFrame(up + alt, "g string, t long, v double")
    out = {r["g"]: r for r in vpin(
        df, "v", ["g"], ["t"], bucket_vol=100.0).collect()}
    _approx(out["up"]["vpin"], 1.0)      # one-sided tape: |B-S|/V = 1
    assert out["alt"]["vpin"] < 0.2      # alternating tape: balanced


def test_rv_bipower_jump_share(spark):
    from datafusion_functions_financial_spark.operators.micro3 import (
        rv_bipower,
    )
    us_day = 86_400_000_000
    smooth = [("s", i * 1000, 100.0 * (1.001 ** i)) for i in range(100)]
    jump = [("j", i * 1000, 100.0) for i in range(50)]
    jump += [("j", (50 + i) * 1000, 200.0) for i in range(50)]
    df = spark.createDataFrame(smooth + jump,
                               "g string, us long, v double")
    df = df.withColumn("t", F.col("us"))
    out = {r["g"]: r for r in rv_bipower(
        df, "v", "us", ["g"], ["t"]).collect()}
    assert out["s"]["day"] == 0 and out["s"]["n_returns"] == 99
    _approx(out["s"]["jump_share"], 0.0, tol=0.05)
    assert out["j"]["jump_share"] > 0.9   # single ln(2) jump dominates
    assert us_day  # silence lint


def test_corwin_schultz_positive_for_spread_series(spark):
    from datafusion_functions_financial_spark.operators.micro3 import (
        corwin_schultz,
    )
    us_day = 86_400_000_000
    rows = []
    # price flat at 100, daily H/L = 101/99 -> constant true range,
    # zero close-to-close variance: CS attributes the range to spread
    for d in range(10):
        rows += [("g", d * us_day + 1_000_000, 99.0),
                 ("g", d * us_day + 2_000_000, 101.0),
                 ("g", d * us_day + 3_000_000, 100.0)]
    df = spark.createDataFrame(rows, "g string, us long, v double")
    got = corwin_schultz(df, "v", "us", ["g"]).collect()[0]
    assert got["n_pairs"] == 9
    assert got["cs_spread"] > 0.005
    assert got["cs_spread_pos"] >= got["cs_spread"]


def test_yang_zhang_matches_naive(spark):
    from datafusion_functions_financial_spark.operators.micro3 import (
        yang_zhang,
    )
    us_day = 86_400_000_000
    rng = np.random.RandomState(5)
    rows = []
    bars = []
    price = 100.0
    for d in range(20):
        o = price * (1 + 0.002 * rng.randn())
        c = o * (1 + 0.01 * rng.randn())
        h = max(o, c) * (1 + abs(0.004 * rng.randn()))
        lo = min(o, c) * (1 - abs(0.004 * rng.randn()))
        bars.append((o, h, lo, c))
        rows += [("g", d * us_day + 1, o), ("g", d * us_day + 2, h),
                 ("g", d * us_day + 3, lo), ("g", d * us_day + 4, c)]
        price = c
    df = spark.createDataFrame(rows, "g string, us long, v double")
    got = yang_zhang(df, "v", "us", ["g"], ["us"]).collect()[0]
    ro = [math.log(bars[i][0] / bars[i - 1][3]) for i in range(1, 20)]
    rc = [math.log(c / o) for o, h, lo, c in bars[1:]]
    rs = [math.log(h / c) * math.log(h / o)
          + math.log(lo / c) * math.log(lo / o)
          for o, h, lo, c in bars[1:]]
    n = len(ro)
    k = 0.34 / (1.34 + (n + 1) / (n - 1))
    s2 = (np.var(ro, ddof=1) + k * np.var(rc, ddof=1)
          + (1 - k) * np.mean(rs))
    _approx(got["sigma2_yz"], s2)
    assert got["n_days"] == n


# --------------------------------------------------------------------------
# graph2
# --------------------------------------------------------------------------


def test_triangle_count_matches_bruteforce(spark):
    from itertools import combinations

    from datafusion_functions_financial_spark.operators.graph2 import (
        triangle_count,
    )
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (1, 4),
             (5, 6), (2, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = triangle_count(df, "a", "b").collect()[0]
    es = {frozenset(e) for e in edges}
    nodes = {v for e in edges for v in e}
    tri = sum(
        1 for trio in combinations(sorted(nodes), 3)
        if all(frozenset(p) in es for p in combinations(trio, 2)))
    deg = {v: sum(1 for e in es if v in e) for v in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert got["n_triangles"] == tri == 3
    assert got["n_wedges"] == wedges
    assert got["n_nodes"] == len(nodes) and got["n_edges"] == len(es)
    _approx(got["global_clustering"], 3 * tri / wedges)


@pytest.mark.slow
def test_neighbor_similarity_naive_and_cap(spark):
    from datafusion_functions_financial_spark.operators.graph2 import (
        neighbor_similarity,
    )
    owns = [(1, "x"), (1, "y"), (1, "z"),
            (2, "x"), (2, "y"),
            (3, "y"), (3, "z"), (3, "w"),
            (4, "q")]
    df = spark.createDataFrame(owns, "o long, i string")
    got = {(r["owner_a"], r["owner_b"]): r for r in neighbor_similarity(
        df, "o", "i", min_common=2, max_owners_per_item=10,
        top_n=10).collect()}
    # pair (1,2): common {x,y} -> 2/(3+2-2); pair (1,3): {y,z} -> 2/4
    _approx(got[(1, 2)]["jaccard"], 2 / 3)
    _approx(got[(1, 3)]["jaccard"], 0.5)
    aa = 1 / math.log(2) + 1 / math.log(3)  # x owned by 2, y by 3
    _approx(got[(1, 2)]["adamic_adar"], aa)
    assert (2, 3) not in got or got[(2, 3)]["n_common"] >= 2
    # cap=2 drops item y (3 owners): pair (1,3) loses y, keeps z
    capped = {(r["owner_a"], r["owner_b"]): r for r in
              neighbor_similarity(df, "o", "i", min_common=2,
                                  max_owners_per_item=2,
                                  top_n=10).collect()}
    assert (1, 3) not in capped  # only z remains -> below min_common


# --------------------------------------------------------------------------
# quantile2
# --------------------------------------------------------------------------


def test_rolling_median_matches_naive(spark):
    from datafusion_functions_financial_spark.operators.quantile2 import (
        rolling_median,
    )
    rng = np.random.RandomState(2)
    vals = list(rng.rand(40) * 100)
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = {r["t"]: r["roll_med"] for r in rolling_median(
        df, "v", ["g"], ["t"], n=7).collect()}
    for i in range(len(vals)):
        lo = max(0, i - 6)
        _approx(out[i], float(np.median(vals[lo: i + 1])), tol=1e-9)


def test_trimmed_mean_robust_to_outlier(spark):
    from datafusion_functions_financial_spark.operators.quantile2 import (
        trimmed_mean,
    )
    vals = [float(v) for v in range(1, 20)] + [1e6]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, v double")
    got = trimmed_mean(df, "v", "g", lo=0.1, hi=0.9).collect()[0]
    assert got["n"] == 20
    assert got["trimmed_mean"] < 20  # 1e6 outlier excluded
    kept = [v for v in vals
            if np.quantile(vals, 0.1) - 1e-9 <= v
            <= round(float(np.quantile(vals, 0.9)), 4) + 1e-9]
    _approx(got["trimmed_mean"], float(np.mean(kept)), tol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("n", [7, 8])
def test_distributed_median_matches_sorted(spark, n):
    from datafusion_functions_financial_spark.operators.quantile2 import (
        distributed_median,
    )
    rng = np.random.RandomState(n)
    vals = [float(v) for v in rng.rand(n) * 1000]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    rows += [("const", i, 42.0) for i in range(5)]  # degenerate group
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = {r["g"]: r for r in distributed_median(
        df, "v", "g", "id").collect()}
    _approx(out["g"]["median"], float(np.median(vals)), tol=1e-6)
    assert out["const"]["median"] == 42.0 and out["const"]["n"] == 5


def test_newey_west_matches_naive_and_flags_autocorr(spark):
    from datafusion_functions_financial_spark.operators.spectral import (
        newey_west_se,
    )
    rng = np.random.RandomState(13)
    x = np.zeros(2000)
    for i in range(1, len(x)):
        x[i] = 0.7 * x[i - 1] + rng.randn()
    rows = [("g", i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    got = newey_west_se(df, "v", ["g"], ["t"]).collect()[0]
    d = x - x.mean()
    n = len(x)
    g0 = (d * d).sum()
    gk = [(d[k:] * d[:-k]).sum() for k in (1, 2, 3)]
    var = (g0 + 2 * (0.75 * gk[0] + 0.5 * gk[1] + 0.25 * gk[2])) / n ** 2
    _approx(got["nw_se"], math.sqrt(var), tol=1e-4)
    _approx(got["se_iid"], d.std(ddof=1) / math.sqrt(n), tol=1e-4)
    assert got["se_ratio"] > 1.5  # AR(0.7): iid bar badly understates


def test_seasonal_residual_anomalies_finds_planted_hour(spark):
    from datafusion_functions_financial_spark.plans.analytics7 import (
        seasonal_residual_anomalies,
    )
    rows = []
    eid = 0
    for h in range(24 * 10):
        base = 50.0 + 10.0 * math.cos(2 * math.pi * (h % 24) / 24)
        v = base + (300.0 if h == 130 else 0.0)
        for _ in range(4):
            rows.append((eid, h * 3_600_000_000, float(v)))
            eid += 1
    df = spark.createDataFrame(rows, "id long, us long, v double")
    got = seasonal_residual_anomalies(df, "us", "v", k=5).collect()
    assert got[0]["hour"] == 130 and abs(got[0]["z"]) > 5


# --------------------------------------------------------------------------
# analytics7
# --------------------------------------------------------------------------


@pytest.mark.slow
def test_ccf_recovers_planted_lag(spark):
    from datafusion_functions_financial_spark.plans.analytics7 import (
        cross_correlation_hourly,
    )
    # series B = series A shifted 2 hours later -> ccf peaks at lag +2
    rng = np.random.RandomState(9)
    base = rng.rand(200) * 100
    rows = []
    eid = 0
    for h in range(200):
        rows.append((eid, h * 3_600_000_000 + 1, "A", float(base[h])))
        eid += 1
        if h >= 2:
            rows.append((eid, h * 3_600_000_000 + 2, "B",
                         float(base[h - 2])))
            eid += 1
    df = spark.createDataFrame(rows, "id long, us long, g string, v double")
    out = {r["lag"]: r["ccf"] for r in cross_correlation_hourly(
        df, "us", "v", "g", "A", "B").collect()}
    # full-sample standardization over the truncated paired range
    # keeps the peak slightly under 1
    assert out[2] > 0.95
    assert all(abs(v) < 0.3 for lg, v in out.items() if lg != 2)


def test_top_trigrams_matches_naive(spark):
    from collections import Counter

    from datafusion_functions_financial_spark.plans.analytics7 import (
        top_trigrams,
    )
    seq = list("abcabcabd") * 3
    rows = [("u", i, s) for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "u string, t long, s string")
    got = [(r["t0"], r["t1"], r["t2"], r["n"]) for r in top_trigrams(
        df, "s", ["u"], ["t"], k=5).collect()]
    naive = Counter(tuple(seq[i: i + 3]) for i in range(len(seq) - 2))
    want = sorted(naive.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == [(a, b, c, n) for (a, b, c), n in want]


def test_vocab_coverage_monotone_and_exact(spark):
    from collections import Counter

    from datafusion_functions_financial_spark.plans.analytics7 import (
        vocab_coverage,
    )
    docs = [("w1 w1 w1 w2 w2 w3",), ("w1 w2 w4 w5",), ("w1 w6",)]
    df = spark.createDataFrame(docs, "text string")
    out = {r["vocab_size"]: r for r in vocab_coverage(
        df, "text", sizes=(1, 3, 100)).collect()}
    counts = Counter(
        tok for d, in docs for tok in d.split())
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert out[1]["covered_tokens"] == top[0][1]
    assert out[3]["covered_tokens"] == sum(n for _, n in top[:3])
    assert out[100]["covered_tokens"] == total
    assert (out[1]["share"] <= out[3]["share"] <= out[100]["share"]
            == 1.0)


# --------------------------------------------------------------------------
# plan shapes
# --------------------------------------------------------------------------


@pytest.mark.parametrize("name", [
    "q_chi2_dow_events", "q_welch_ttest_orders", "q_mannwhitney_events",
    "q_kruskal_events", "q_jarque_bera_events", "q_runs_test_events",
    "q_periodogram_events", "q_perm_entropy_events", "q_hurst_events",
    "q_pacf_events", "micro_vpin_events", "micro_rv_bipower_events",
    "micro_corwin_schultz_events", "micro_yang_zhang_events",
    "graph_triangles_lineitem", "graph_jaccard_customers_lineitem",
    "roll_median_events", "q_trimmed_mean_orders",
    "q_ccf_events", "q_top_trigrams_events", "vocab_coverage_documents",
    "q_newey_west_events", "micro_sign_pacf_events",
    "q_seasonal_residual_anomalies_events",
])
def test_new_query_no_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan


def test_jaccard_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "graph_jaccard_customers_lineitem")
    assert "TakeOrderedAndProject" in plan, plan


def test_runs_test_single_exchange(spark, sf_dir):
    from tests.test_plans import count_exchanges
    plan = plan_of(spark, sf_dir, "q_runs_test_events")
    # diff window + sign-carry window + keyed aggregate all share the
    # event_type partitioning: one shuffle plus the 1-row reduction.
    assert count_exchanges(plan) <= 2, plan

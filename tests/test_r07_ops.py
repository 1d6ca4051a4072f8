"""Round-7 operator tests.

Part 1: the reworked ``distributed_median`` (VERDICT r06 finding #1)
— iterated histogram narrowing, rank-filtered driver traffic, schema-
derived group/value dtypes, and the high-cardinality guard.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _approx(a, b, tol=1e-6):
    assert a == pytest.approx(b, abs=tol), (a, b)


# --------------------------------------------------------------------------
# distributed_median — narrowing + rank-filter contract
# --------------------------------------------------------------------------


def _dm(spark, rows, schema, **kw):
    from datafusion_functions_financial_spark.operators.quantile2 import (
        distributed_median,
    )
    df = spark.createDataFrame(rows, schema)
    return distributed_median(df, "v", "g", "id", **kw)


@pytest.mark.slow
@pytest.mark.parametrize("n", [4001, 4000])
def test_distributed_median_hot_group_narrows(spark, n):
    """A group far above the bucket budget forces >=1 narrowing pass
    (budget 50 on 4k rows => two 1024-bucket levels) and still
    resolves the exact median, both parities."""
    rng = np.random.RandomState(7)
    vals = [float(v) for v in rng.rand(n) * 1e6]
    rows = [("hot", i, v) for i, v in enumerate(vals)]
    rows += [("small", i, float(i)) for i in range(9)]
    out = {r["g"]: r for r in _dm(
        spark, rows, "g string, id long, v double",
        bucket_row_budget=50).collect()}
    _approx(out["hot"]["median"], float(np.median(vals)))
    assert out["hot"]["n"] == n
    _approx(out["small"]["median"], 4.0)


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_distributed_median_driver_gets_only_needed_ranks(
        spark, monkeypatch):
    """VERDICT r06 #1 regression: every driver collect that carries
    the VALUE column must be rank-filtered — at most 2 rows per group
    (the two middle order statistics), never a whole bucket."""
    try:  # Spark 4: the concrete class overrides collect
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover — Spark 3 layout
        from pyspark.sql import DataFrame

    seen = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        seen.append((self.columns, len(rows)))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    rng = np.random.RandomState(11)
    rows = [(f"g{i % 3}", i, float(v))
            for i, v in enumerate(rng.rand(3000) * 100)]
    out = _dm(spark, rows, "g string, id long, v double",
              bucket_row_budget=64).collect()
    assert len(out) == 3
    value_collects = [(cols, ln) for cols, ln in seen if "v" in cols]
    assert value_collects, "expected a rank-filtered value collect"
    for cols, ln in value_collects:
        assert ln <= 2 * 3, (cols, ln)


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_distributed_median_non_string_group_and_int_values(spark):
    """ADVICE r06: group dtype must come from the input schema (int
    keys used to crash on the hardcoded string schema); integer value
    columns bucket through the monotone double cast."""
    rows = [(k, i, (i * 37) % 1001)
            for k in (1, 2) for i in range(501)]
    out = {r["g"]: r for r in _dm(
        spark, rows, "g int, id long, v long",
        bucket_row_budget=20).collect()}
    assert set(out) == {1, 2}
    exact = float(np.median([(i * 37) % 1001 for i in range(501)]))
    for k in (1, 2):
        _approx(out[k]["median"], exact)
        assert out[k]["n"] == 501


def test_distributed_median_max_groups_guard(spark):
    rows = [(f"g{i}", i, float(i)) for i in range(40)]
    with pytest.raises(ValueError, match="max_groups"):
        _dm(spark, rows, "g string, id long, v double", max_groups=10)


def test_distributed_median_all_null_and_constant_groups(spark):
    rows = [("nul", 0, None), ("nul", 1, None),
            ("const", 0, 5.0), ("const", 1, 5.0)]
    out = {r["g"]: r for r in _dm(
        spark, rows, "g string, id long, v double").collect()}
    assert out["nul"]["median"] is None and out["nul"]["n"] == 2
    assert out["const"]["median"] == 5.0


# --------------------------------------------------------------------------
# cc — large-star/small-star connected components
# --------------------------------------------------------------------------


def _naive_cc(nodes, edges):
    parent = {v: v for v in nodes}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: min(u for u in nodes if find(u) == find(v))
            for v in nodes}


def _run_cc(spark, nodes, edges):
    from datafusion_functions_financial_spark.operators.cc import (
        connected_components,
    )
    ndf = spark.createDataFrame([(v,) for v in nodes], "v long")
    edf = spark.createDataFrame(list(edges) or [(0, 0)], "a long, b long")
    if not edges:
        edf = edf.filter("a != a")
    got = connected_components(ndf, edf, "v", "a", "b").collect()
    return {r["node"]: r["component"] for r in got}


@pytest.mark.slow
def test_cc_matches_union_find_on_random_graph(spark):
    rng = np.random.RandomState(5)
    nodes = list(range(60))
    edges = {(int(a), int(b)) for a, b in rng.randint(0, 60, (45, 2))
             if a != b}
    assert _run_cc(spark, nodes, edges) == _naive_cc(nodes, edges)


@pytest.mark.slow
def test_cc_long_chain_converges_in_log_rounds(spark):
    # a 200-node chain has diameter 199; label propagation would need
    # ~200 rounds — large-star/small-star must finish inside the
    # default MAX_ROUNDS (log^2-ish) budget and still be exact.
    nodes = list(range(200))
    edges = [(i, i + 1) for i in range(199)]
    got = _run_cc(spark, nodes, edges)
    assert set(got.values()) == {0}


@pytest.mark.slow
def test_cc_isolated_nodes_are_singletons(spark):
    nodes = [1, 2, 3, 10]
    edges = [(1, 2)]
    got = _run_cc(spark, nodes, edges)
    assert got == {1: 1, 2: 1, 3: 3, 10: 10}


# --------------------------------------------------------------------------
# qsketch — mergeable histogram quantiles
# --------------------------------------------------------------------------


def _sketch_frames(spark, vals, groups=None):
    from datafusion_functions_financial_spark.operators import qsketch
    rows = [(g, float(v)) for v, g in
            zip(vals, groups or ["x"] * len(vals))]
    df = spark.createDataFrame(rows, "g string, v double")
    bounds = qsketch.value_bounds(df, "v")
    return qsketch, df, bounds


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_sketch_merge_equals_direct_build(spark):
    rng = np.random.RandomState(3)
    vals = rng.rand(2000) * 1000
    groups = [f"g{i % 7}" for i in range(2000)]
    qsketch, df, bounds = _sketch_frames(spark, vals, groups)
    direct = qsketch.build_sketch(df, "v", [], bounds)
    partial = qsketch.build_sketch(df, "v", ["g"], bounds)
    merged = qsketch.merge_sketches(partial, [])
    d = {r["__b"]: r["__c"] for r in direct.collect()}
    m = {r["__b"]: r["__c"] for r in merged.collect()}
    assert d == m


def test_sketch_quantile_within_bucket_width(spark):
    rng = np.random.RandomState(4)
    vals = rng.rand(5000) * 100
    qsketch, df, bounds = _sketch_frames(spark, vals)
    sk = qsketch.build_sketch(df, "v", [], bounds)
    out = {r["p"]: r["est"] for r in qsketch.sketch_quantiles(
        sk, [], (0.25, 0.5, 0.9), bounds).collect()}
    width = (vals.max() - vals.min()) / qsketch.N_BUCKETS
    for p in (0.25, 0.5, 0.9):
        assert abs(out[p] - np.quantile(vals, p)) <= 2 * width


@pytest.mark.slow
def test_sketch_kl_zero_for_identical_halves(spark):
    from datafusion_functions_financial_spark.operators import qsketch
    vals = [float(v) for v in range(64)] * 4
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    bounds = qsketch.value_bounds(df, "v")
    sk = qsketch.build_sketch(df, "v", [], bounds, n_buckets=64)
    out = qsketch.sketch_kl(sk, sk, 64).collect()[0]
    assert out["kl_ab"] == 0.0 and out["kl_ba"] == 0.0


# --------------------------------------------------------------------------
# stats3 — AR(1), ADF, Kalman, EWMA
# --------------------------------------------------------------------------


def test_ar1_recovers_planted_phi(spark):
    from datafusion_functions_financial_spark.operators.stats3 import (
        ar1_halflife,
    )
    rng = np.random.RandomState(11)
    phi = 0.8
    x = np.zeros(4000)
    for i in range(1, len(x)):
        x[i] = phi * x[i - 1] + rng.randn()
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(x)],
        "k string, t long, v double")
    got = ar1_halflife(df, "v", ["k"], ["t"]).collect()[0]
    assert abs(got["phi"] - phi) < 0.05
    _approx(got["halflife"], -np.log(2) / np.log(got["phi"]), tol=1e-4)


def test_ar1_halflife_null_outside_unit_interval(spark):
    from datafusion_functions_financial_spark.operators.stats3 import (
        ar1_halflife,
    )
    x = [float((-1) ** i) for i in range(100)]  # phi ~ -1
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(x)],
        "k string, t long, v double")
    got = ar1_halflife(df, "v", ["k"], ["t"]).collect()[0]
    assert got["halflife"] is None


def test_adf_separates_random_walk_from_mean_reversion(spark):
    from datafusion_functions_financial_spark.operators.stats3 import (
        adf_test,
    )
    rng = np.random.RandomState(7)
    walk = np.cumsum(rng.randn(3000))
    mr = np.zeros(3000)
    for i in range(1, 3000):
        mr[i] = 0.3 * mr[i - 1] + rng.randn()
    rows = ([("walk", i, float(v)) for i, v in enumerate(walk)]
            + [("mr", i, float(v)) for i, v in enumerate(mr)])
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {r["k"]: r for r in adf_test(
        df, "v", ["k"], ["t"]).collect()}
    assert got["mr"]["t_stat"] < -10      # decisively stationary
    assert got["walk"]["t_stat"] > -3.5   # cannot reject unit root


def test_kalman_matches_predict_update_form(spark):
    # Independent derivation: the standard two-step KF
    # (p_pred = p + q; k = p_pred / (p_pred + r)) must equal the
    # fused walk in stats3 for every row.
    from datafusion_functions_financial_spark.operators.stats3 import (
        KALMAN_P0, KALMAN_Q, KALMAN_R, kalman_level,
    )
    rng = np.random.RandomState(2)
    vals = rng.rand(300) * 50
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "k string, t long, v double")
    got = {r["t"]: r["level"] for r in kalman_level(
        df, "v", "k", ["t"]).collect()}
    l, p = vals[0], KALMAN_P0
    _approx(got[0], l, tol=1e-9)
    for i in range(1, len(vals)):
        p_pred = p + KALMAN_Q
        k = p_pred / (p_pred + KALMAN_R)
        l = l + k * (vals[i] - l)
        p = (1.0 - k) * p_pred
        _approx(got[i], l, tol=1e-9)


@pytest.mark.slow
def test_ewma_cov_naive_recursion(spark):
    from datafusion_functions_financial_spark.operators.stats3 import (
        EWMA_LAMBDA, ewma_cov,
    )
    rng = np.random.RandomState(9)
    hours, rows = 48, []
    a = rng.rand(hours) * 10
    b = a * 0.5 + rng.rand(hours)
    us_h = 3_600_000_000
    for h in range(hours):
        rows.append((h * us_h * 1000 + 1, "A", float(a[h])))
        rows.append((h * us_h * 1000 + 2, "B", float(b[h])))
    df = spark.createDataFrame(rows, "ts long, k string, v double")
    df = df.withColumn("__us", df.ts / 1000)
    out = {r["hour"]: r for r in ewma_cov(
        df.selectExpr("CAST(ts DIV 1000 AS LONG) AS __us", "k", "v"),
        "__us", "v", "k", "A", "B").collect()}
    ma, mb = a.mean(), b.mean()
    za = a - a.mean()
    # reproduce quantized hourly means? single row per (hour, side):
    # hourly mean == the value itself, so plain means suffice at 1e-6.
    cov = None
    for h in range(hours):
        z = (a[h] - ma) * (b[h] - mb)
        cov = z if cov is None else (
            EWMA_LAMBDA * cov + (1 - EWMA_LAMBDA) * z)
        assert abs(out[h]["ewma_cov"] - cov) < 1e-4
    assert abs(out[hours - 1]["ewma_corr"]) <= 1.0


# --------------------------------------------------------------------------
# micro4 — realized moments, trade runs
# --------------------------------------------------------------------------


def test_realized_moments_match_numpy(spark):
    # O(1)-magnitude returns so the default q=1e8 quantization is
    # negligible against the unquantized numpy reference.
    from datafusion_functions_financial_spark.operators.micro4 import (
        realized_moments,
    )
    rng = np.random.RandomState(6)
    prices = 100 * np.exp(np.cumsum(rng.randn(500) * 0.5))
    rows = [(i, i * 1000, float(p)) for i, p in enumerate(prices)]
    df = spark.createDataFrame(rows, "i long, us long, v double")
    got = realized_moments(df.withColumn("k", df.i * 0),
                           "v", "us", ["k"], ["i"]).collect()[0]
    r = np.diff(np.log(prices))
    rv = float(np.sum(r * r))
    _approx(got["rv"], rv, tol=1e-5)
    _approx(got["rskew"],
            np.sqrt(len(r)) * np.sum(r ** 3) / rv ** 1.5, tol=1e-4)
    _approx(got["rkurt"],
            len(r) * np.sum(r ** 4) / rv ** 2, tol=1e-4)


def test_realized_moments_quantized_reference_exact(spark):
    # Small returns: the result must equal the SAME quantized-sum
    # arithmetic computed in python (the engine-parity contract).
    from datafusion_functions_financial_spark.operators.micro4 import (
        realized_moments,
    )
    rng = np.random.RandomState(7)
    prices = 100 * np.exp(np.cumsum(rng.randn(300) * 0.01))
    rows = [(i, i * 1000, float(p)) for i, p in enumerate(prices)]
    df = spark.createDataFrame(rows, "i long, us long, v double")
    got = realized_moments(df.withColumn("k", df.i * 0),
                           "v", "us", ["k"], ["i"]).collect()[0]
    r = np.diff(np.log(prices))
    s2 = int(np.sum(np.round(r * r * 1e8)))
    s3 = int(np.sum(np.round(r * r * r * 1e8)))
    s4 = int(np.sum(np.round(r * r * r * r * 1e8)))
    n, rv = len(r), s2 / 1e8
    _approx(got["rv"], round(rv, 6), tol=5e-7)
    _approx(got["rskew"],
            np.sqrt(n) * (s3 / 1e8) / (rv * np.sqrt(rv)), tol=1e-6)
    _approx(got["rkurt"], n * (s4 / 1e8) / (rv * rv), tol=1e-6)


def test_trade_runs_hand_path(spark):
    from datafusion_functions_financial_spark.operators.micro4 import (
        trade_runs,
    )
    # signs after carry: + + - - - + (first tick unclassified, carried
    # flat tick keeps previous sign)
    prices = [10.0, 11.0, 11.0, 9.0, 8.0, 8.0, 12.0]
    #  dp:      -    +1   0    -2   -1   0    +4
    #  sign:    -    +    +    -    -    -    +
    df = spark.createDataFrame(
        [("k", i, p) for i, p in enumerate(prices)],
        "k string, t long, v double")
    got = trade_runs(df, "v", ["k"], ["t"]).collect()[0]
    assert got["n_ticks"] == 6
    assert got["n_runs"] == 3
    assert got["max_run"] == 3
    _approx(got["mean_run"], 2.0)


# --------------------------------------------------------------------------
# text4 — winnowing, novelty
# --------------------------------------------------------------------------


def _naive_winnow(text, k=8, w=16):
    import re as _re
    mod = 1_000_000_007
    norm = _re.sub(r"[^ -~]", "", _re.sub(r"\s+", " ", text.lower()))
    if len(norm) < k + w - 1:
        return set()
    hs = []
    for i in range(len(norm) - k + 1):
        h = 0
        for ch in norm[i:i + k]:
            h = (h * 31 + ord(ch)) % mod
        hs.append(h)
    sel = set()
    for end in range(w - 1, len(hs)):
        win = hs[end - w + 1:end + 1]
        m = min(win)
        # rightmost minimal position
        ridx = max(i for i, v in enumerate(win) if v == m)
        sel.add((end - w + 1 + ridx + 1, m))  # 1-based pos
    return sel


def test_winnow_matches_naive(spark):
    from datafusion_functions_financial_spark.operators.text4 import (
        winnow_fingerprints,
    )
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long road",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r["__id"], set()).add((r["__p"], r["__h"]))
    for i, t in enumerate(texts):
        assert got[i] == _naive_winnow(t), i


def test_winnow_pairs_duplicate_has_full_containment(spark):
    from datafusion_functions_financial_spark.operators.text4 import (
        winnow_pairs,
    )
    base = ("spark shuffles partition data across the cluster when "
            "wide dependencies appear in the lineage graph")
    other = ("completely different words live here about cooking "
             "pasta with garlic olive oil and fresh basil leaves")
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, other)],
        "doc_id long, text string")
    out = winnow_pairs(df).collect()
    top = out[0]
    assert (top["doc_a"], top["doc_b"]) == (1, 2)
    _approx(top["containment"], 1.0)
    assert all((r["doc_a"], r["doc_b"]) == (1, 2) for r in out)


def test_ngram_novelty_orders_duplicates_last(spark):
    from datafusion_functions_financial_spark.operators.text4 import (
        ngram_novelty,
    )
    a = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, "totally new words appear here now ok")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    _approx(got[1]["novelty"], 1.0)
    _approx(got[2]["novelty"], 0.0)
    _approx(got[3]["novelty"], 1.0)


# --------------------------------------------------------------------------
# dq3 — FD violations, cardinality profile
# --------------------------------------------------------------------------


def test_fd_violations_counts(spark):
    from datafusion_functions_financial_spark.operators.dq3 import (
        fd_violations,
    )
    rows = [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, None),
            (3, "c"), (4, None)]
    df = spark.createDataFrame(rows, "l_orderkey long, x string")
    got = fd_violations(df, (("l_orderkey", "x"),)).collect()[0]
    # key 2 has {a,b}; key 3 has {NULL,c}; keys 1 and 4 are clean
    assert got["n_keys"] == 4
    assert got["n_violating"] == 2
    _approx(got["violation_rate"], 0.5)


def test_cardinality_profile_nulls_and_top_share(spark):
    from datafusion_functions_financial_spark.operators.dq3 import (
        cardinality_profile,
    )
    rows = [("x",), ("x",), ("y",), (None,)]
    df = spark.createDataFrame(rows, "c string")
    got = cardinality_profile(df, ("c",)).collect()[0]
    assert got["n"] == 4 and got["n_null"] == 1
    assert got["n_distinct"] == 2
    _approx(got["top_share"], 0.5)


# --------------------------------------------------------------------------
# sampling3 — systematic, Neyman
# --------------------------------------------------------------------------


def test_systematic_picks_exact_ranks(spark):
    from datafusion_functions_financial_spark.operators.sampling3 import (
        systematic_sample,
    )
    rows = [("s", i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    got = sorted(r["i"] for r in systematic_sample(
        df, "g", ["i"], k=10, offset=3).collect())
    assert got == [i for i in range(100) if (i + 1) % 10 == 3]


def test_neyman_allocates_to_high_variance_stratum(spark):
    from datafusion_functions_financial_spark.operators.sampling3 import (
        neyman_allocation,
    )
    rng = np.random.RandomState(8)
    rows = []
    for i in range(400):  # low-variance stratum
        rows.append(("low", i, float(100 + rng.rand())))
    for i in range(400):  # high-variance stratum
        rows.append(("high", 1000 + i, float(100 + rng.rand() * 200)))
    df = spark.createDataFrame(rows, "s string, id long, v double")
    got = {r["s"]: r for r in neyman_allocation(
        df, "s", "v", "id", budget=100, q_lin=10**6).collect()}
    assert got["high"]["n_alloc"] > 5 * got["low"]["n_alloc"]
    for r in got.values():
        assert r["n_sampled"] == min(r["n_alloc"], r["n_total"])


# --------------------------------------------------------------------------
# embgeo — centroids, medoid, anisotropy
# --------------------------------------------------------------------------


def test_anisotropy_identical_and_orthogonal(spark):
    from datafusion_functions_financial_spark.operators.embgeo import (
        anisotropy,
    )
    same = spark.createDataFrame(
        [([1.0, 0.0],), ([1.0, 0.0],), ([1.0, 0.0],)],
        "embedding array<float>")
    _approx(anisotropy(same, "embedding").collect()[0]
            ["mean_pairwise_cos"], 1.0, tol=1e-6)
    ortho = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],)], "embedding array<float>")
    _approx(anisotropy(ortho, "embedding").collect()[0]
            ["mean_pairwise_cos"], 0.0, tol=1e-6)


def test_medoid_is_the_central_point(spark):
    from datafusion_functions_financial_spark.operators.embgeo import (
        label_medoids,
    )
    rows = [(0, 1, [0.0, 0.0]), (0, 2, [1.0, 0.0]), (0, 3, [-1.0, 0.0]),
            (0, 4, [0.0, 1.0]), (0, 5, [0.0, -1.0])]
    df = spark.createDataFrame(
        rows, "label int, vec_id long, embedding array<float>")
    got = label_medoids(df, "embedding", "label", "vec_id",
                        dim=2).collect()[0]
    assert got["medoid_id"] == 1
    _approx(got["mean_dist"], 1.0, tol=1e-6)


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_centroid_geometry_two_clusters(spark):
    from datafusion_functions_financial_spark.operators.embgeo import (
        label_centroid_geometry,
    )
    rows = [(0, 1, [0.0, 1.0]), (0, 2, [0.0, -1.0]),
            (1, 3, [10.0, 1.0]), (1, 4, [10.0, -1.0]),
            (2, 5, [30.0, 0.0]), (2, 6, [30.0, 0.0])]
    df = spark.createDataFrame(
        rows, "label int, vec_id long, embedding array<float>")
    got = {r["label"]: r for r in label_centroid_geometry(
        df, "embedding", "label").collect()}
    for lab in (0, 1):
        _approx(got[lab]["mean_dist"], 1.0, tol=1e-6)
    _approx(got[2]["mean_dist"], 0.0, tol=1e-6)
    assert got[0]["nn_label"] == 1 and got[1]["nn_label"] == 0
    _approx(got[0]["nn_dist"], 10.0, tol=1e-6)
    assert got[2]["nn_label"] == 1
    _approx(got[2]["nn_dist"], 20.0, tol=1e-6)


# --------------------------------------------------------------------------
# plan shapes for the 24 new r07 queries
# --------------------------------------------------------------------------


R07_NEW = [
    "graph_cc_parts", "graph_cc_sizes_parts", "dedup_cc_documents",
    "qs_quantiles_lineitem", "qs_merge_by_month_orders",
    "qs_error_audit_lineitem", "qs_kl_drift_orders",
    "q_ar1_halflife_events", "q_adf_events", "q_kalman_level_events",
    "q_ewma_cov_events", "q_chi2_drift_events",
    "micro_realized_moments_events", "micro_trade_runs_events",
    "text_winnow_documents", "text_winnow_pairs_documents",
    "text_ngram_novelty_documents", "dq_fd_violations_lineitem",
    "dq_cardinality_profile_orders", "sample_systematic_orders",
    "sample_neyman_orders", "emb_centroid_geometry_embeddings",
    "emb_medoid_embeddings", "emb_anisotropy_embeddings",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", R07_NEW)
def test_r07_query_no_cartesian(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan


def test_winnow_pairs_topk_is_take_ordered(spark, sf_dir):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, "text_winnow_pairs_documents")
    assert "TakeOrderedAndProject" in plan, plan


# --------------------------------------------------------------------------
# stats4 — cointegration, Granger, Hill, Gumbel, min-variance
# --------------------------------------------------------------------------


def _series_df(spark, xs, ys):
    us_h = 3_600_000_000
    rows = []
    for h, (x, y) in enumerate(zip(xs, ys)):
        rows.append(((h * us_h + 5) * 1000, "A", float(x), h * 2))
        rows.append(((h * us_h + 6) * 1000, "B", float(y), h * 2 + 1))
    return spark.createDataFrame(
        rows, "ts long, k string, v double, event_id long"
    ).selectExpr("CAST(ts DIV 1000 AS LONG) AS __us", "k", "v",
                 "event_id")


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_engle_granger_separates_cointegrated_pair(spark):
    from datafusion_functions_financial_spark.operators.stats4 import (
        engle_granger,
    )
    rng = np.random.RandomState(3)
    x = np.cumsum(rng.randn(500)) + 100
    y_coint = 2.0 * x + 5 + rng.randn(500)          # shared trend
    y_indep = np.cumsum(rng.randn(500)) + 100       # own walk
    got_c = engle_granger(_series_df(spark, x, y_coint), "__us", "v",
                          "k", "A", "B").collect()[0]
    got_i = engle_granger(_series_df(spark, x, y_indep), "__us", "v",
                          "k", "A", "B").collect()[0]
    assert abs(got_c["beta"] - 2.0) < 0.05
    assert got_c["adf_t"] < -8          # stationary residual
    assert got_i["adf_t"] > -3.3        # cannot reject no-coint


def test_granger_lag1_detects_direction(spark):
    from datafusion_functions_financial_spark.operators.stats4 import (
        granger_lag1,
    )
    rng = np.random.RandomState(4)
    x = rng.randn(600)
    y = np.zeros(600)
    for t in range(1, 600):
        y[t] = 0.3 * y[t - 1] + 0.8 * x[t - 1] + 0.1 * rng.randn()
    causal = granger_lag1(_series_df(spark, x, y), "__us", "v",
                          "k", "A", "B").collect()[0]
    # reverse direction on the SAME frame: does y Granger-cause x?
    reverse = granger_lag1(_series_df(spark, x, y), "__us", "v",
                           "k", "B", "A").collect()[0]
    assert causal["f_stat"] > 100
    assert abs(causal["psi"] - 0.8) < 0.05
    assert reverse["f_stat"] < 10


def test_hill_recovers_pareto_alpha(spark):
    from datafusion_functions_financial_spark.operators.stats4 import (
        hill_tail,
    )
    rng = np.random.RandomState(5)
    alpha = 2.0
    vals = (1.0 / rng.rand(20000)) ** (1.0 / alpha)  # Pareto(2)
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "k string, event_id long, value double")
    got = hill_tail(df, "value", "k", "event_id", k=500).collect()[0]
    assert abs(got["hill_alpha"] - alpha) < 0.25


def test_gumbel_moments_match_numpy(spark):
    from datafusion_functions_financial_spark.operators.stats4 import (
        EULER_GAMMA, gumbel_block_maxima,
    )
    rng = np.random.RandomState(6)
    us_day = 86_400_000_000
    rows, maxima = [], []
    for d in range(40):
        day_vals = rng.rand(50) * 100
        maxima.append(day_vals.max())
        for i, v in enumerate(day_vals):
            rows.append((d * us_day + i, "k", float(v)))
    df = spark.createDataFrame(rows, "__us long, k string, v double")
    got = gumbel_block_maxima(df, "v", "__us", "k").collect()[0]
    m = np.array(maxima)
    beta = m.std(ddof=1) * np.sqrt(6) / np.pi
    _approx(got["beta"], beta, tol=1e-4)
    _approx(got["mu"], m.mean() - EULER_GAMMA * beta, tol=1e-4)


def test_minvar_weights_match_numpy(spark):
    from datafusion_functions_financial_spark.operators.stats4 import (
        min_variance_pair,
    )
    rng = np.random.RandomState(7)
    x = 10 + rng.randn(300) * 0.5        # low variance
    y = 10 + rng.randn(300) * 3.0        # high variance
    got = min_variance_pair(_series_df(spark, x, y), "__us", "v",
                            "k", "A", "B").collect()[0]
    c = np.cov(x, y, ddof=1)
    wa = (c[1, 1] - c[0, 1]) / (c[0, 0] + c[1, 1] - 2 * c[0, 1])
    _approx(got["w_a"], wa, tol=1e-3)
    assert got["w_a"] > 0.9              # weight flees the noisy leg


# --------------------------------------------------------------------------
# embproj — JL distortion
# --------------------------------------------------------------------------


def test_jl_mean_ratio_near_one(spark, sf_dir):
    from datafusion_functions_financial_spark.operators.embproj import (
        jl_distortion_audit,
    )
    from datafusion_functions_financial_spark.sources.tables import load
    got = jl_distortion_audit(
        load(spark, sf_dir, "embeddings"), "embedding",
        "vec_id").collect()[0]
    assert got["n_pairs"] >= 200
    assert 0.8 <= got["mean_ratio"] <= 1.2
    assert got["max_abs_distortion"] < 1.0


def test_jl_projection_is_linear_in_input(spark):
    # project(2x) == 2*project(x): catches any hidden normalization
    from datafusion_functions_financial_spark.operators.embproj import (
        jl_project,
    )
    base = [[float(i) / 7 for i in range(64)]]
    df = spark.createDataFrame(
        [(1, base[0]), (2, [2 * v for v in base[0]])],
        "vec_id long, embedding array<float>")
    got = {}
    for r in jl_project(df, "embedding", "vec_id").collect():
        got.setdefault(r["__id"], {})[r["__j"]] = r["__p"]
    for j in got[1]:
        _approx(got[2][j], 2 * got[1][j], tol=1e-9)


# --------------------------------------------------------------------------
# anomaly3 — Hampel filter
# --------------------------------------------------------------------------


def test_hampel_flags_planted_spike_only(spark):
    from datafusion_functions_financial_spark.operators.anomaly3 import (
        hampel_scores,
    )
    rng = np.random.RandomState(8)
    vals = list(10 + rng.randn(200) * 0.5)
    vals[120] = 50.0                      # the spike
    df = spark.createDataFrame(
        [("k", i, i, float(v)) for i, v in enumerate(vals)],
        "k string, ts long, event_id long, value double")
    got = hampel_scores(df, "value", ["k"], ["ts", "event_id"])
    rows = got.filter("is_outlier").collect()
    flagged = [r["ts"] for r in rows]
    assert 120 in flagged
    # trailing-window median/MAD is a noisy scale estimate, so a few
    # noise rows may graze the 3-sigma line — but the spike dominates.
    assert len(flagged) <= 10
    top = max(rows, key=lambda r: r["hampel_score"])
    assert top["ts"] == 120


def test_hampel_constant_series_never_flags(spark):
    from datafusion_functions_financial_spark.operators.anomaly3 import (
        hampel_summary,
    )
    df = spark.createDataFrame(
        [("k", i, i, 5.0) for i in range(50)],
        "k string, ts long, event_id long, value double")
    got = hampel_summary(df, "value", ["k"],
                         ["ts", "event_id"]).collect()[0]
    assert got["n_flagged"] == 0 and got["max_score"] is None


R07_LATE = [
    "q_engle_granger_events", "q_granger_lag1_events",
    "q_hill_tail_events", "q_gumbel_maxima_events",
    "q_minvar_pair_events", "emb_jl_distortion_embeddings",
    "q_hampel_outliers_events", "q_kaplan_meier_events",
    "q_bootstrap_ci_orders", "text_textrank_documents",
    "dedup_detector_agreement_documents",
]


@pytest.mark.parametrize("name", R07_LATE)
def test_r07_late_query_no_cartesian(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan


# --------------------------------------------------------------------------
# survival — Kaplan-Meier
# --------------------------------------------------------------------------


def test_kaplan_meier_matches_manual_product_limit(spark):
    from datafusion_functions_financial_spark.operators.survival import (
        kaplan_meier,
    )
    us_min = 60_000_000
    # user A: events at 0, 10, 30 min; user B: 0, 10; corpus ends 30.
    # durations (min): A: 10 obs, 20 obs, 0 censored;
    #                  B: 10 obs, 20 censored.
    rows = [("A", 0), ("A", 10), ("A", 30), ("B", 0), ("B", 10)]
    df = spark.createDataFrame(
        [(u, t * us_min, i) for i, (u, t) in enumerate(rows)],
        "user string, __us long, event_id long")
    got = {r["t_min"]: r for r in kaplan_meier(
        df, "__us", "user", ["__us", "event_id"]).collect()}
    # t=0: 1 censored (A's last), n_risk=5, no drop
    assert (got[0]["d"], got[0]["c"], got[0]["n_risk"]) == (0, 1, 5)
    _approx(got[0]["survival"], 1.0)
    # t=10: 2 observed, n_risk=4 -> S = 1 * (1 - 2/4) = 0.5
    assert (got[10]["d"], got[10]["c"], got[10]["n_risk"]) == (2, 0, 4)
    _approx(got[10]["survival"], 0.5, tol=1e-6)
    # t=20: 1 observed + 1 censored, n_risk=2 -> S = 0.5 * (1 - 1/2)
    assert (got[20]["d"], got[20]["c"], got[20]["n_risk"]) == (1, 1, 2)
    _approx(got[20]["survival"], 0.25, tol=1e-6)


def test_kaplan_meier_curve_is_monotone(spark, sf_dir):
    from datafusion_functions_financial_spark.operators.survival import (
        kaplan_meier,
    )
    from datafusion_functions_financial_spark.sources.tables import load
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    curve = sorted(
        (r["t_min"], r["survival"]) for r in kaplan_meier(
            ev, "__us", "user_id", ["ts", "event_id"]).collect())
    vals = [s for _, s in curve]
    assert all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))
    assert vals[0] <= 1.0 and vals[-1] >= 0.0


# --------------------------------------------------------------------------
# bootstrap — Poisson replicates
# --------------------------------------------------------------------------


def test_bootstrap_ci_brackets_mean_and_scales(spark):
    from datafusion_functions_financial_spark.operators.bootstrap import (
        poisson_bootstrap_ci,
    )
    rng = np.random.RandomState(12)
    vals = rng.randn(4000) * 10 + 100
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "id long, v double")
    got = poisson_bootstrap_ci(df, "v", "id", q_lin=10**6).collect()[0]
    assert got["ci_lo"] < got["mean"] < got["ci_hi"]
    half = (got["ci_hi"] - got["ci_lo"]) / 2
    se = 10 / np.sqrt(4000)
    assert 0.5 * 1.96 * se < half < 2.0 * 1.96 * se
    again = poisson_bootstrap_ci(df, "v", "id",
                                 q_lin=10**6).collect()[0]
    assert again == got  # fully deterministic


# --------------------------------------------------------------------------
# text5 — TextRank
# --------------------------------------------------------------------------


def test_textrank_ranks_connected_hub_over_satellites(spark):
    from datafusion_functions_financial_spark.operators.text5 import (
        textrank_keywords,
    )
    # "spark" co-occurs with every other content word; satellites only
    # ever co-occur with spark. The hub must rank first.
    docs = [
        "spark shuffle spark join spark window spark batch",
        "spark stream spark cache spark plan",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)],
        "doc_id long, text string")
    out = textrank_keywords(df, top_n=10).collect()
    assert out[0]["token"] == "spark"
    assert out[0]["textrank"] > out[1]["textrank"] * 2


def test_textrank_matches_naive_power_iteration(spark):
    from datafusion_functions_financial_spark.operators.text5 import (
        TR_ITERS, TR_WINDOW, textrank_keywords,
    )
    docs = ["alpha beta gamma alpha delta beta",
            "gamma delta alpha beta gamma"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)],
        "doc_id long, text string")
    got = {r["token"]: r["textrank"] for r in
           textrank_keywords(df, top_n=10).collect()}

    # naive reference: same window, same damping, flat 0.15 base
    from collections import defaultdict
    w = defaultdict(int)
    for d in docs:
        toks = d.split()
        for i, a in enumerate(toks):
            for j in range(i + 1, min(i + TR_WINDOW + 1, len(toks))):
                b = toks[j]
                if a != b:
                    u, v = min(a, b), max(a, b)
                    w[(u, v)] += 1
    nodes = sorted({t for p in w for t in p})
    out_w = defaultdict(int)
    for (u, v), c in w.items():
        out_w[u] += c
        out_w[v] += c
    pr = {n: 1.0 for n in nodes}
    for _ in range(TR_ITERS):
        inc = defaultdict(float)
        for (u, v), c in w.items():
            inc[v] += pr[u] * c / out_w[u]
            inc[u] += pr[v] * c / out_w[v]
        pr = {n: 0.15 + 0.85 * inc[n] for n in nodes}
    for n in nodes:
        _approx(got[n], pr[n], tol=1e-5)


def test_detector_agreement_invariants(spark, sf_dir):
    from datafusion_functions_financial_spark.operators.blocking import (
        detector_agreement,
    )
    from datafusion_functions_financial_spark.sources.tables import load
    got = detector_agreement(
        load(spark, sf_dir, "documents")).collect()[0]
    assert got["n_both"] <= min(got["n_lsh"], got["n_simhash"])
    assert 0.0 <= got["rr_lsh"] <= 1.0
    assert 0.0 <= got["rr_simhash"] <= 1.0
    if got["n_both"] > 0:
        assert 0.0 < got["pair_jaccard"] <= 1.0

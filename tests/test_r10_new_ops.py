"""Hand-computed fixtures for the r10 operator batch — every oracle
pair also runs in the parity suite; these pin the SEMANTICS (closed
forms, edge branches, scale contracts) to known answers."""

import math

import pytest
from pyspark.sql import functions as F


def test_mcnemar_matches_closed_form(spark):
    from datafusion_functions_financial_spark.operators.stats12 import (
        mcnemar_test,
    )
    # 2x2 with b = 6, c = 2: Q = (6-2)^2/8 = 2.0, cc = (4-1)^2/8
    rows = ([(1, 0)] * 6 + [(0, 1)] * 2 + [(1, 1)] * 5
            + [(0, 0)] * 3)
    df = spark.createDataFrame(rows, "a int, b int")
    [r] = mcnemar_test(df, "a = 1", "b = 1").collect()
    assert (r.n10, r.n01) == (6, 2)
    assert r.mcnemar == 2.0
    assert abs(r.mcnemar_cc - 9.0 / 8.0) < 1e-9


def test_cochran_q_reduces_to_mcnemar_at_k2(spark):
    from datafusion_functions_financial_spark.operators.stats12 import (
        mcnemar_test,
    )
    from datafusion_functions_financial_spark.operators.stats13 import (
        cochran_q,
    )
    rows = ([(1, 0)] * 6 + [(0, 1)] * 2 + [(1, 1)] * 5
            + [(0, 0)] * 3)
    df = spark.createDataFrame(rows, "a int, b int")
    [q] = cochran_q(df, ["a = 1", "b = 1"]).collect()
    [m] = mcnemar_test(df, "a = 1", "b = 1").collect()
    # Cochran's Q with k = 2 IS McNemar's statistic
    assert abs(q.q_stat - m.mcnemar) < 1e-6


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_friedman_hand_computed(spark):
    from datafusion_functions_financial_spark.operators.stats13 import (
        friedman_w,
    )
    # 3 blocks x 3 treatments, same rank order everywhere ->
    # rank sums 3, 6, 9; chi2 = 12/(3*3*4)*(9+36+81) - 3*3*4 = 6;
    # W = 6 / (3*2) = 1 (perfect concordance)
    rows = []
    for b in range(3):
        for j, t in enumerate(["a", "b", "c"]):
            rows.append((b, t, float(j + 1) * 10 + b))
    df = spark.createDataFrame(rows, "blk long, tr string, v double")
    [r] = friedman_w(df, "blk", "tr", "v").collect()
    assert (r.n_blocks, r.k) == (3, 3)
    assert abs(r.chi2_friedman - 6.0) < 1e-9
    assert abs(r.kendall_w - 1.0) < 1e-9


def test_welch_anova_equal_variances_matches_classic_shape(spark):
    from datafusion_functions_financial_spark.operators.stats14 import (
        welch_anova,
    )
    # two groups, hand-computed: g1 = 1,2,3 (m=2, s2=1);
    # g2 = 5,6,7,8 (m=6.5, s2=5/3)
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 5.0), ("b", 6.0), ("b", 7.0), ("b", 8.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = welch_anova(df, "v", "g").collect()
    w1, w2 = 3.0 / 1.0, 4.0 / (5.0 / 3.0)
    m = (w1 * 2.0 + w2 * 6.5) / (w1 + w2)
    a = (w1 * (2.0 - m) ** 2 + w2 * (6.5 - m) ** 2) / 1.0
    h = ((1 - w1 / (w1 + w2)) ** 2 / 2.0
         + (1 - w2 / (w1 + w2)) ** 2 / 3.0)
    b = 1.0 + 2.0 * 0.0 / 3.0 * h  # k=2 -> (k-2) kills the term
    assert (r.k, r.n) == (2, 7)
    assert abs(r.f_welch - a / b) < 1e-4
    assert abs(r.df2 - 3.0 / (3.0 * h)) < 1e-3


def test_bartlett_equal_variances_is_zero(spark):
    from datafusion_functions_financial_spark.operators.stats14 import (
        bartlett,
    )
    # identical dispersion in both groups -> statistic ~ 0
    rows = ([("a", float(v)) for v in (1, 2, 3, 4, 5)]
            + [("b", float(v)) for v in (11, 12, 13, 14, 15)])
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = bartlett(df, "v", "g").collect()
    assert abs(r.t_stat) < 1e-6


def test_ht_estimator_exact_when_census(spark):
    from datafusion_functions_financial_spark.operators.sampling5 import (
        ht_total_estimate,
    )
    # all bands sampled at 1/1 -> the estimate IS the total
    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(1, 21)],
        "id long, v double")
    [r] = ht_total_estimate(df, "id", "v", "0",
                            bands=((0, 1),)).collect()
    assert r.n_sampled == r.n_pop == 20
    assert r.est_total == r.true_total
    assert r.rel_err == 0.0


def test_ht_estimator_weights_are_integer_exact(spark):
    from datafusion_functions_financial_spark.operators.sampling5 import (
        ht_total_estimate,
    )
    df = spark.createDataFrame(
        [(i, 100.0) for i in range(12)], "id long, v double")
    # one band at 1/4: ids 0,4,8 sampled, est = 3 * 100 * 4 = 1200
    [r] = ht_total_estimate(df, "id", "v", "0",
                            bands=((0, 4),)).collect()
    assert r.n_sampled == 3
    assert r.est_total == 1200.0 and r.true_total == 1200.0


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_logrank_symmetric_groups_score_zero(spark):
    from datafusion_functions_financial_spark.operators.survival2 import (
        logrank_test,
    )
    # two users with IDENTICAL event times, opposite parity ->
    # every risk set is split evenly, O1 == E1 exactly
    rows = []
    for u in (1, 2):
        for t in (0, 60, 180, 420):
            rows.append((u, t * 60_000_000, len(rows)))
    df = spark.createDataFrame(rows, "user_id long, us long, i long")
    [r] = logrank_test(df, "us", "user_id", ["us", "i"],
                       "user_id % 2 = 1").collect()
    assert r.n1 == r.n2 == 4
    assert abs(r.z_logrank) < 1e-9


def test_did_recovers_planted_effect(spark):
    from datafusion_functions_financial_spark.operators.experiment2 import (
        diff_in_diff,
    )
    # control: 10 pre / 10 post both mean 50; treated: pre 50,
    # post 50 + 7 -> DiD = 7 exactly (constant cells -> se = 0,
    # t undefined; add jitter to keep se > 0)
    rows = []
    for i in range(40):
        tr = i % 2
        po = (i // 2) % 2
        base = 50.0 + (i % 5) * 0.5
        rows.append((tr, po, base + (7.0 if tr and po else 0.0)))
    df = spark.createDataFrame(rows, "tr int, po int, v double")
    [r] = diff_in_diff(df, "tr = 1", "po = 1", "v").collect()
    assert abs(r.did - 7.0) < 1e-6
    assert r.se > 0.0


def test_poisson_fit_dispersion_one_on_constructed_poisson(spark):
    from datafusion_functions_financial_spark.operators.countfit import (
        poisson_fit,
    )
    # unit i emits c_i events where c follows an exact Poisson(2)
    # histogram for n=1000 -> dispersion ~ 1, modest chi2
    pmf = [math.exp(-2.0) * 2.0 ** k / math.factorial(k)
           for k in range(9)]
    rows = []
    uid = 0
    for k, p in enumerate(pmf):
        for _ in range(round(p * 1000)):
            for _j in range(k):
                rows.append((uid, 0, _j))
            uid += 1
    df = spark.createDataFrame(rows, "u long, b long, j long")
    [r] = poisson_fit(df, "u", "b").collect()
    # units with 0 events never appear; the operator's contract is
    # conditional-on-activity, so lambda is the ZERO-TRUNCATED mean
    lam_trunc = 2.0 / (1.0 - math.exp(-2.0))
    assert abs(r.lambda_hat - lam_trunc) < 0.1
    assert r.dispersion < 1.2
    assert r.dof == r.chi2 * 0 + r.dof  # dof present and integer


def test_spectral_flatness_bounds(spark, sf_dir):
    from datafusion_functions_financial_spark.operators.spectral2 import (
        spectral_flatness,
    )
    from datafusion_functions_financial_spark.sources.tables import (
        load,
    )
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    [r] = spectral_flatness(ev, "__us").collect()
    # geometric mean <= arithmetic mean, strictly positive power
    assert 0.0 < r.flatness <= 1.0
    assert r.n_bins >= 8


def test_burrows_delta_self_similarity(spark):
    from datafusion_functions_financial_spark.operators.text10 import (
        burrows_delta, vocab_overlap,
    )
    # two sources with IDENTICAL text -> z-profiles equal -> delta 0
    # and vocabulary jaccard 1; a third, disjoint source scores > 0
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "s1"),
         (2, "alpha beta gamma delta", "s2"),
         (3, "omega psi chi phi", "s3")],
        "doc_id long, text string, source string")
    d = {(r.source_a, r.source_b): r.delta
         for r in burrows_delta(docs, "text", "source").collect()}
    assert d[("s1", "s2")] == 0.0
    assert d[("s1", "s3")] > 0.0
    j = {(r.source_a, r.source_b): r.jaccard
         for r in vocab_overlap(docs, "text", "source").collect()}
    assert j[("s1", "s2")] == 1.0
    assert j[("s1", "s3")] == 0.0


@pytest.mark.slow
def test_davies_bouldin_and_dunn_on_separated_clusters(spark):
    from datafusion_functions_financial_spark.operators.embeval import (
        calinski_harabasz, davies_bouldin, dunn_centroid,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        DIM,
    )
    # two tight, far-apart clusters -> low DB terms, high CH,
    # Dunn >> 1
    rows = []
    for i in range(20):
        lab = i % 2
        base = 10.0 * lab
        vec = [base + 0.01 * ((i * 7 + j) % 5) for j in range(DIM)]
        rows.append((i, vec, lab))
    df = spark.createDataFrame(
        rows, f"vec_id long, embedding array<double>, label int")
    db = davies_bouldin(df, "embedding", "label").collect()
    assert all(r.db_term < 0.1 for r in db)
    [ch] = calinski_harabasz(df, "embedding", "label").collect()
    assert ch.ch > 1000.0
    [du] = dunn_centroid(df, "embedding", "label").collect()
    assert du.dunn > 5.0


def test_graph_knn_and_hill_on_star_graph(spark):
    from datafusion_functions_financial_spark.operators.graph7 import (
        avg_neighbor_degree, degree_tail_hill,
    )
    # star: hub 0 connected to 1..10 -> leaves have degree 1 and
    # their only neighbor has degree 10; knn(1) = 10, knn(10) = 1
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 11)], "item_a long, item_b long")
    got = {r.degree: r.knn
           for r in avg_neighbor_degree(edges, "item_a",
                                        "item_b").collect()}
    assert got[1] == 10.0 and got[10] == 1.0
    [h] = degree_tail_hill(edges, "item_a", "item_b",
                           k=5).collect()
    assert h.n_nodes == 11 and h.k_tail == 5
    # top-5 degrees are 10,1,1,1,1 -> d_k = 1, sl = ln(10) -> alpha
    assert abs(h.hill_alpha - (1.0 + 5.0 / math.log(10.0))) < 1e-4


def test_jonckheere_perfect_monotone_trend(spark):
    from datafusion_functions_financial_spark.operators.stats16 import (
        jonckheere,
    )
    # groups 0/1/2 with strictly increasing bands -> every cross-
    # group pair is concordant: JT = total pairs, z > 0
    rows = [(g, g * 10 + i) for g in range(3) for i in range(5)]
    df = spark.createDataFrame(rows, "g long, v long")
    [r] = jonckheere(df, "g", "v").collect()
    assert (r.n, r.k) == (15, 3)
    assert r.jt == 75.0  # 3 group pairs x 5 x 5
    assert r.z_jt > 3.0


def test_page_trend_perfect_order(spark):
    from datafusion_functions_financial_spark.operators.stats16 import (
        page_trend,
    )
    # 4 blocks, 3 treatments whose values follow the hypothesized
    # order -> L = n * sum j*j = 4 * 14 = 56, max possible
    rows = [(b, j, float(j)) for b in range(4) for j in (1, 2, 3)]
    df = spark.createDataFrame(rows, "blk long, j long, v double")
    [r] = page_trend(df, "blk", "j", "v").collect()
    assert (r.n_blocks, r.k) == (4, 3)
    assert r.l_stat == 56
    assert r.z_page > 2.0


def test_seasonal_naive_mase_on_perfect_seasonal_series(spark):
    from datafusion_functions_financial_spark.functions.forecast2 import (
        seasonal_naive_eval,
    )
    # a pure 24h-periodic series: seasonal-naive is PERFECT
    # (mae_seasonal = 0, mase = 0) while naive-1 errs
    us_per_hour = 3_600_000_000
    rows = [(0, h * us_per_hour, float(h % 24))
            for h in range(24 * 4)]
    df = spark.createDataFrame(rows, "k long, us long, v double")
    [r] = seasonal_naive_eval(df, "k", "us", "v").collect()
    assert r.n_eval == 24 * 3
    assert r.mae_seasonal == 0.0 and r.mase == 0.0
    assert r.mae_naive1 > 0.0
    assert r.smape == 0.0


@pytest.mark.slow  # r13 wall-time move (measured 2.9-8.5s)
def test_cell_purity_bounds_and_separated_clusters(spark):
    from datafusion_functions_financial_spark.operators.ivfeval import (
        cell_label_purity,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        DIM,
    )
    # two opposite-direction clusters, labels follow geometry ->
    # cells are label-pure
    rows = []
    for i in range(64):
        lab = i % 2
        sign = 1.0 if lab else -1.0
        vec = [sign * (1.0 + 0.001 * ((i + j) % 7))
               for j in range(DIM)]
        rows.append((i, vec, lab))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    [r] = cell_label_purity(df, seed_mod=16).collect()
    assert r.n_vectors == 64
    assert r.weighted_purity == 1.0 and r.macro_purity == 1.0

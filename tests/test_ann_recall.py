"""ANN answer-quality audit (VERDICT r06 item 4): recall@5 of the
LSH and IVF tiers against the exact brute-force top-5.

Two corpora, because recall is a property of the DATA as much as the
index: on a CLUSTERED corpus (50 centers + 10% noise — the shape
real embedding corpora have) both tiers must clear real floors; on a
UNIFORM corpus there is no geometry for a bucket hash to exploit, so
LSH recall is structurally near-random (asserted well above the
random-candidate baseline, documented low) while IVF's multi-probe
still has to find most of the truth.
"""

import pytest


NQ = 16
SEED_MOD = 512


def _corpus(spark, n, clustered):
    from datafusion_functions_financial_spark.operators.similarity import (
        DIM,
    )
    if clustered:
        expr = (
            f"transform(sequence(0, {DIM - 1}), i -> "
            f"CAST(pmod(xxhash64((id % 50) * {DIM} + i), 1000003) "
            f"AS DOUBLE) / 500001.5 - 1.0 "
            f"+ 0.1 * (CAST(pmod(xxhash64(id * {DIM} + i + 777), "
            f"1000003) AS DOUBLE) / 500001.5 - 1.0)) AS embedding"
        )
    else:
        expr = (
            f"transform(sequence(0, {DIM - 1}), i -> "
            f"CAST(pmod(xxhash64(id * {DIM} + i), 1000003) AS DOUBLE) "
            f"/ 500001.5 - 1.0) AS embedding"
        )
    vecs = spark.range(n).repartition(8).selectExpr(
        "id AS vec_id", expr).localCheckpoint()
    return vecs, vecs.filter(f"vec_id < {NQ}").localCheckpoint()


def _top5(df):
    out = {}
    for r in df.filter("rank <= 5").select("q_id", "n_id").collect():
        out.setdefault(r["q_id"], set()).add(r["n_id"])
    return out


def _recalls(spark, n, clustered):
    from datafusion_functions_financial_spark.operators.ivf import (
        cosine_topk_ivf, ivf_index,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        cosine_topk, cosine_topk_lsh,
    )
    vecs, qs = _corpus(spark, n, clustered)
    bf = _top5(cosine_topk(vecs, qs))
    lsh = _top5(cosine_topk_lsh(vecs, qs, use_arrow=True,
                                check_geometry=False))
    index = ivf_index(vecs, seed_mod=SEED_MOD)
    ivf = _top5(cosine_topk_ivf(vecs, qs, seed_mod=SEED_MOD,
                                index=index))

    def recall(tier):
        return sum(len(tier.get(q, set()) & bf[q])
                   for q in bf) / (5.0 * len(bf))

    return recall(lsh), recall(ivf)


@pytest.mark.slow
def test_recall_floors_clustered_corpus(spark):
    lsh, ivf = _recalls(spark, 4000, clustered=True)
    assert lsh >= 0.5, lsh   # measured 0.74 at this seed/shape
    assert ivf >= 0.9, ivf   # measured 1.0


@pytest.mark.slow
def test_recall_floors_uniform_corpus(spark):
    lsh, ivf = _recalls(spark, 4000, clustered=False)
    # random-candidate baseline is ~bucket_share (~1e-3); LSH must
    # beat it by an order of magnitude even with no cluster geometry.
    assert lsh >= 0.01, lsh  # measured 0.0375
    assert ivf >= 0.5, ivf   # measured 0.71


@pytest.mark.slow
def test_recall_floor_100k_uniform_scale_aware(spark):
    """VERDICT r07 item 2: the fixed-constant IVF degraded 0.71 ->
    0.325 going 4K -> 100K vectors because seed_mod/nprobe did not
    scale. The scale-aware path (K ~ sqrt(n), nprobe from the measured
    worst-case recall curve) must hold a real floor at 100K on the
    UNIFORM worst case; multi-probe LSH must beat single-probe by ~5x
    (still documented-low — no cluster geometry to exploit)."""
    from datafusion_functions_financial_spark.operators.ivf import (
        cosine_topk_ivf_auto,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        cosine_topk, cosine_topk_lsh, lsh_params,
    )
    n = 100_000
    vecs, qs = _corpus(spark, n, clustered=False)
    bf = _top5(cosine_topk(vecs, qs))

    def recall(tier):
        return sum(len(tier.get(q, set()) & bf[q])
                   for q in bf) / (5.0 * len(bf))

    ivf_df, params = cosine_topk_ivf_auto(vecs, qs, n=n,
                                          target_recall=0.75)
    ivf = recall(_top5(ivf_df))
    # r10 recalibration (K-dependent curve constant): measured 0.775
    # with nprobe 74/316 — the floor is target - 0.05.
    assert ivf >= 0.7, (ivf, params)
    planes = lsh_params(n)
    lshm = recall(_top5(cosine_topk_lsh(
        vecs, qs, use_arrow=True, planes=planes, multiprobe=True,
        check_geometry=False)))
    assert lshm >= 0.08, (lshm, planes)  # measured 0.138


@pytest.mark.slow
def test_clusteredness_probe_calibration(spark):
    """VERDICT r10 item 4: the probe must separate the two corpus
    geometries the recall floors above are measured on — uniform
    reads ~0.88 entropy ratio (no geometry; SRP recall 0.05@100K),
    50-center clustered ~0.73 — with the threshold between them."""
    from datafusion_functions_financial_spark.operators.similarity import (
        CLUSTERED_ENTROPY_MAX, clusteredness_probe,
    )
    vu, _ = _corpus(spark, 2500, clustered=False)
    vc, _ = _corpus(spark, 2500, clustered=True)
    pu = clusteredness_probe(vu)
    pc = clusteredness_probe(vc)
    assert not pu["clustered"], pu
    assert pc["clustered"], pc
    # the measured gap must stay comfortably astride the threshold
    assert pu["entropy_ratio"] >= CLUSTERED_ENTROPY_MAX + 0.03, pu
    assert pc["entropy_ratio"] <= CLUSTERED_ENTROPY_MAX - 0.03, pc


@pytest.mark.slow
def test_clusteredness_probe_empty_sample_routes_safe(spark):
    """VERDICT r11 item 4 / ADVICE r11: zero sampled rows must read
    `clustered: False` — the no-information verdict routes to IVF
    (recall holds on any geometry), never to SRP-LSH (collapses on
    unknown geometry). An overstated ``n`` against a tiny corpus must
    first fall back to a rate-1 re-probe and use the real data."""
    from datafusion_functions_financial_spark.operators.similarity import (
        clusteredness_probe,
    )
    # truly empty corpus: no fallback possible -> unclustered verdict
    empty, _ = _corpus(spark, 1, clustered=False)
    p0 = clusteredness_probe(empty.filter("vec_id < 0"), n=10_000_000)
    assert p0["n_sampled"] == 0 and p0["clustered"] is False, p0

    # tiny clustered corpus with wildly overstated n: the rate-1
    # fallback must recover the sample and read the true geometry
    vc, _ = _corpus(spark, 400, clustered=True)
    pc = clusteredness_probe(vc, n=500_000_000)
    assert pc["n_sampled"] > 0, pc
    assert pc["clustered"] is True, pc


def test_lsh_warns_on_unclustered_corpus(spark):
    """A user pointing the SRP tier at a geometry-free corpus gets a
    UserWarning naming the measured entropy (r10 'What's wrong' #3);
    clustered corpora stay silent."""
    import warnings

    from datafusion_functions_financial_spark.operators.similarity import (
        cosine_topk_lsh,
    )
    vu, qu = _corpus(spark, 1200, clustered=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cosine_topk_lsh(vu, qu)
        assert any("no cluster geometry" in str(x.message)
                   for x in w), [str(x.message) for x in w]
    vc, qc = _corpus(spark, 1200, clustered=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cosine_topk_lsh(vc, qc)
        assert not any("no cluster geometry" in str(x.message)
                       for x in w), [str(x.message) for x in w]


@pytest.mark.slow
def test_routed_ann_small_corpora(spark):
    """cosine_topk_ann routes by measured geometry: uniform -> IVF,
    clustered -> LSH; both routed answers clear a real recall floor
    on their corpus (the whole point of routing)."""
    from datafusion_functions_financial_spark.operators.similarity import (
        cosine_topk_ann, cosine_topk_matrix,
    )
    for clustered, want in ((False, "ivf"), (True, "lsh")):
        vecs, qs = _corpus(spark, 4000, clustered)
        bf = _top5(cosine_topk_matrix(vecs, qs, k=5))
        out, info = cosine_topk_ann(vecs, qs, k=5)
        assert info["method"] == want, info
        t5 = _top5(out)
        rec = sum(len(t5.get(q, set()) & bf[q])
                  for q in bf) / (5.0 * len(bf))
        assert rec >= 0.5, (clustered, rec, info)


@pytest.mark.slow
def test_matrix_brute_force_bit_identical(spark):
    """cosine_topk_matrix is the one-corpus-pass ground-truth path:
    same rows, same ranks, bitwise-equal cosines vs cosine_topk."""
    from datafusion_functions_financial_spark.operators.similarity import (
        cosine_topk, cosine_topk_matrix,
    )
    vecs, qs = _corpus(spark, 1200, clustered=True)
    a = cosine_topk(vecs, qs, k=7).orderBy("q_id", "rank").collect()
    b = cosine_topk_matrix(vecs, qs, k=7).orderBy(
        "q_id", "rank").collect()
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        assert (ra.q_id, ra.n_id, ra.rank) == (rb.q_id, rb.n_id,
                                               rb.rank)
        assert ra.cos_sim == rb.cos_sim  # bitwise


@pytest.mark.slow
def test_routed_recall_floor_100k_uniform(spark):
    """VERDICT r10 item 4 'Done' criterion: routed recall@5 >= 0.7 at
    100K on the uniform corpus — the geometry where unrouted SRP
    collapses to 0.05. The router must read the probe and land on
    the IVF tier's curve."""
    from datafusion_functions_financial_spark.operators.similarity import (
        cosine_topk_ann, cosine_topk_matrix,
    )
    n = 100_000
    vecs, qs = _corpus(spark, n, clustered=False)
    bf = _top5(cosine_topk_matrix(vecs, qs, k=5))
    out, info = cosine_topk_ann(vecs, qs, k=5, n=n)
    assert info["method"] == "ivf", info
    t5 = _top5(out)
    rec = sum(len(t5.get(q, set()) & bf[q])
              for q in bf) / (5.0 * len(bf))
    assert rec >= 0.7, (rec, info)


@pytest.mark.slow
def test_recall_floor_10k_uniform_scale_aware(spark):
    """VERDICT r09 item 4 / r11 item 4: ivf_params under-delivered
    its named target_recall at small K (0.66 @10K vs the 0.75
    parameter with the r08 flat constant; a flat 0.775 plateau with
    the r09 power-law fit). The r12 measured-table sizing probes the
    0.85 contour for the default target: measured 0.8625 with
    nprobe 40/100 on the bench corpus."""
    from datafusion_functions_financial_spark.operators.ivf import (
        cosine_topk_ivf_auto, ivf_params,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        cosine_topk,
    )
    n = 10_000
    vecs, qs = _corpus(spark, n, clustered=False)
    bf = _top5(cosine_topk(vecs, qs))
    ivf_df, params = cosine_topk_ivf_auto(vecs, qs, n=n,
                                          target_recall=0.75)
    t5 = _top5(ivf_df)
    ivf = sum(len(t5.get(q, set()) & bf[q])
              for q in bf) / (5.0 * len(bf))
    assert ivf >= 0.8, (ivf, params)
    # the sizing itself must probe harder at small K than the old
    # flat-constant curve (nprobe 20 @K=100 -> 0.66 measured)
    assert ivf_params(n, 0.75)[1] >= 25, ivf_params(n, 0.75)

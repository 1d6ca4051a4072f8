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
    lsh = _top5(cosine_topk_lsh(vecs, qs, use_arrow=True))
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
        vecs, qs, use_arrow=True, planes=planes, multiprobe=True)))
    assert lshm >= 0.08, (lshm, planes)  # measured 0.138


@pytest.mark.slow
def test_recall_floor_10k_uniform_scale_aware(spark):
    """VERDICT r09 item 4: ivf_params under-delivered its named
    target_recall at small K (0.66 @10K vs the 0.75 parameter). The
    K-dependent curve constant must hold a 10K floor beside the 100K
    one: measured 0.775 with nprobe 28/100 after recalibration."""
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
    assert ivf >= 0.7, (ivf, params)
    # the sizing itself must probe harder at small K than the old
    # flat-constant curve (nprobe 20 @K=100 -> 0.66 measured)
    assert ivf_params(n, 0.75)[1] >= 25, ivf_params(n, 0.75)

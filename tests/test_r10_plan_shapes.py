"""Plan-shape guards for the r10 operator batch (the graph5/graph6
exchange-budget discipline, VERDICT r09): the reuse/broadcast
structure documented in each module's docstring must survive
refactors — a regression shows up here as an exchange-count or
join-strategy diff, not as a 10x slowdown three rounds later.

BroadcastNestedLoopJoin appears ONLY as 1-row/k-row aggregate
crossJoins in these plans (the repo's accepted pattern); a
CartesianProduct anywhere is a bug.
"""

import pytest

SF = "/root/testdata/sf0.01"


def _plan(spark, name):
    from datafusion_functions_financial_spark.plans import registry

    df = registry.all_queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


# (query, max exchanges) — measured at sf0.01 with headroom; the
# guard catches structural blowups (the 28-exchange burrows_delta
# draft), not AQE jitter.
BUDGETS = [
    ("text_burrows_delta_documents", 8),
    ("text_vocab_overlap_documents", 10),
    ("graph_knn_parts", 12),
    ("graph_degree_tail_parts", 9),
    ("emb_davies_bouldin_embeddings", 16),
    ("emb_calinski_harabasz_embeddings", 14),
    ("q_cvm_two_sample_events", 18),
    ("q_jonckheere_events", 11),
    ("q_logrank_events", 12),
    ("q_welch_anova_events", 16),
    ("q_did_events", 6),
    ("sample_ht_total_orders", 3),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,budget", BUDGETS,
                         ids=[b[0] for b in BUDGETS])
def test_exchange_budget(spark, name, budget):
    plan = _plan(spark, name)
    assert plan.count("CartesianProduct") == 0, name
    got = plan.count("Exchange")
    assert got <= budget, (
        f"{name}: {got} exchanges > budget {budget} — a shared "
        "relation lost its materialization point or a broadcast "
        "turned into a shuffle")


def test_no_cartesian_in_any_r10_plan(spark):
    # fast representative subset in the default selection
    for name in ("q_did_events", "sample_ht_total_orders",
                 "q_cochran_q_events", "q_mcnemar_events"):
        assert _plan(spark, name).count("CartesianProduct") == 0, name

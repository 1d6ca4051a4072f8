"""text7 tests: burstiness separates clustered from spread terms;
Dunning G² matches the 2x2 closed form and ranks the planted
distinctive term first."""

import math

import pytest


def _docs_df(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    return spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(zip(texts, langs))],
        "doc_id long, text string, lang string")


def test_burstiness_clustered_beats_spread(spark):
    from datafusion_functions_financial_spark.operators.text7 import (
        term_burstiness,
    )
    # 'bursty' appears 5x in each of 5 docs (cf=25, df=5, b=5);
    # 'flat' appears once in each of 25 docs (b=1)
    texts = [("bursty " * 5).strip() + " flat" for _ in range(5)]
    texts += ["flat filler%d" % i for i in range(20)]
    rows = {r["term"]: r for r in term_burstiness(
        _docs_df(spark, texts), min_df=5, k=10).collect()}
    assert rows["bursty"]["burstiness"] == pytest.approx(5.0)
    assert rows["flat"]["burstiness"] == pytest.approx(1.0)
    assert rows["bursty"]["cf"] == 25 and rows["bursty"]["df"] == 5


def test_keyness_finds_planted_term(spark):
    from datafusion_functions_financial_spark.operators.text7 import (
        keyness_g2,
    )
    en = ["shared words plus marker token here" for _ in range(10)]
    de = ["shared words plus other filler stuff" for _ in range(10)]
    rows = keyness_g2(_docs_df(spark, en + de,
                               ["en"] * 10 + ["de"] * 10),
                      "lang = 'en'", k=5).collect()
    top = rows[0]
    # 'marker' (and friends) appear only on the en side
    assert top["g2"] == max(r["g2"] for r in rows)
    en_only = {r["term"] for r in rows if r["n_rest"] == 0}
    assert "marker" in en_only
    for r in rows:
        if r["n_rest"] == 0:
            assert r["overused"] == 1


def test_keyness_g2_matches_closed_form(spark):
    from datafusion_functions_financial_spark.operators.text7 import (
        keyness_g2,
    )
    # focus: 'x' 3 times in 6 tokens; rest: 'x' 1 time in 6 tokens
    en = ["x x x y y y"]
    de = ["x y y y y y"]
    rows = {r["term"]: r for r in keyness_g2(
        _docs_df(spark, en + de, ["en", "de"]),
        "lang = 'en'", k=5).collect()}
    a, b, ta, tb = 3, 1, 6, 6
    n = ta + tb

    def ll(o, row, col):
        e = row * col / n
        return o * math.log(o / e) if o > 0 else 0.0

    want = 2 * (ll(a, a + b, ta) + ll(b, a + b, tb)
                + ll(ta - a, n - a - b, ta)
                + ll(tb - b, n - a - b, tb))
    assert rows["x"]["g2"] == pytest.approx(want, abs=1e-5)
    assert rows["x"]["overused"] == 1
    # balanced term: zero keyness
    assert rows["y"]["g2"] == pytest.approx(
        2 * (ll(3, 8, 6) + ll(5, 8, 6) + ll(3, 4, 6) + ll(1, 4, 6)),
        abs=1e-5)


@pytest.mark.parametrize("name", [
    "text_burstiness_documents", "text_keyness_documents",
])
def test_text7_topk_plan(spark, sf_dir, name):
    from tests.test_plans import plan_of
    plan = plan_of(spark, sf_dir, name)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan

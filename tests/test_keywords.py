"""RAKE keyword extraction (operators/keywords.py): phrase islands,
scoring, and determinism."""

from datafusion_functions_financial_spark.operators.keywords import (
    SCORE_SCALE, rake_keywords, rake_phrases,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_phrases_split_on_stopwords(spark):
    df = _docs(spark, ["deep learning of the neural network stack"])
    got = {(r["phrase"], r["plen"])
           for r in rake_phrases(df).collect()}
    assert got == {("deep learning", 2), ("neural network stack", 3)}


def test_phrases_preserve_token_order_and_case_fold(spark):
    df = _docs(spark, ["  Gradient   Descent  "])
    rows = rake_phrases(df).collect()
    assert rows[0]["phrase"] == "gradient descent"


def test_rake_scores_favor_longer_cooccurring_phrases(spark):
    # 'neural network' appears together twice; 'training' alone twice.
    df = _docs(spark, [
        "neural network and training",
        "neural network of training",
    ])
    out = rake_keywords(df, k=10).collect()
    by_phrase = {r["phrase"]: r for r in out}
    # degree(neural)=4, freq=2 -> 2.0; same for network; phrase = 4.0
    assert by_phrase["neural network"]["score_q"] == 4 * SCORE_SCALE
    # training: degree=2, freq=2 -> 1.0
    assert by_phrase["training"]["score_q"] == 1 * SCORE_SCALE
    assert by_phrase["neural network"]["n_occurrences"] == 2
    # ranking: highest score first, rank is 1-based
    assert out[0]["phrase"] == "neural network" and out[0]["rank"] == 1


def test_rake_tie_break_on_phrase_text(spark):
    df = _docs(spark, ["alpha beta", "gamma delta"])
    out = rake_keywords(df, k=10).collect()
    assert [r["phrase"] for r in out] == ["alpha beta", "gamma delta"]
    assert [r["rank"] for r in out] == [1, 2]

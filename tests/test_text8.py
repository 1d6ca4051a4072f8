"""Heaps'-law tests: a power-law-constructed corpus recovers its
exponent, the curve endpoints match ground truth, and the fit matches
a numpy log-log OLS."""

import numpy as np
import pytest


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _build_power_corpus(beta=0.6, n_docs=60, tokens_per_doc=30):
    """Each doc adds enough NEW tokens that vocab(n) ~= (tokens)^beta
    exactly at every doc boundary."""
    texts = []
    vocab_used = 0
    for d in range(n_docs):
        total_tokens = (d + 1) * tokens_per_doc
        target_vocab = max(1, int(round(total_tokens ** beta)))
        new = max(0, target_vocab - vocab_used)
        words = [f"w{vocab_used + j}" for j in range(new)]
        vocab_used += new
        while len(words) < tokens_per_doc:
            words.append("w0")
        texts.append(" ".join(words[:tokens_per_doc]))
    return texts


def test_heaps_recovers_constructed_exponent(spark):
    from datafusion_functions_financial_spark.operators.text8 import (
        heaps_law,
    )
    texts = _build_power_corpus(beta=0.6)
    [row] = heaps_law(_docs_df(spark, texts)).collect()
    assert row["n_docs"] == 60
    assert row["n_tokens"] == 60 * 30
    assert row["beta"] == pytest.approx(0.6, abs=0.03)


def test_heaps_matches_numpy_ols(spark):
    from datafusion_functions_financial_spark.operators.text8 import (
        heaps_law,
    )
    rng = np.random.RandomState(3)
    texts = [" ".join(
        f"t{rng.randint(0, 200)}" for _ in range(25))
        for _ in range(40)]
    [row] = heaps_law(_docs_df(spark, texts)).collect()
    # rebuild the curve naively
    seen = set()
    ct = cv = 0
    xs, ys = [], []
    for t in texts:
        words = t.split()
        ct += len(words)
        for w in words:
            if w not in seen:
                seen.add(w)
        cv = len(seen)
        xs.append(np.log(ct))
        ys.append(np.log(cv))
    slope, intercept = np.polyfit(xs, ys, 1)
    assert row["beta"] == pytest.approx(slope, abs=1e-4)
    assert row["k"] == pytest.approx(np.exp(intercept), abs=1e-3)
    assert row["vocab"] == len(seen)

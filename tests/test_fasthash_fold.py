"""The rolling k-gram fold stays exact for ANY k (ADVICE r13).

The pre-r14 fold applied ``% MOD`` once at the end; for k >= 13 with
ASCII text (k >= 10 with high codepoints) the int64 accumulator
silently wrapped, diverging from the per-step-mod reference fold the
kernel claims bit-identity with. The fix reduces every 6 shift-adds —
these tests pin the bound with a pure-Python per-step reference, no
Spark session needed.
"""

from __future__ import annotations

import numpy as np
import pytest

from datafusion_functions_financial_spark.operators.fasthash import (
    MOD, _batch_shingle_hashes,
)


def _reference_hashes(norms: list[str], k: int) -> list[list[int]]:
    """Per-step-mod polynomial fold — the Catalyst/DuckDB semantics."""
    out = []
    for s in norms:
        if len(s) < k:
            h = 0
            for ch in s:
                h = (h * 31 + ord(ch)) % MOD
            out.append([h])
            continue
        doc = []
        for i in range(len(s) - k + 1):
            h = 0
            for ch in s[i:i + k]:
                h = (h * 31 + ord(ch)) % MOD
            doc.append(h)
        out.append(doc)
    return out


def _split(norms: list[str], k: int) -> list[list[int]]:
    seg_starts, hashes = _batch_shingle_hashes(norms, k=k)
    return [list(map(int, a))
            for a in np.split(hashes, seg_starts[1:])]


CORPUS = [
    "zzzzzzzzzzzzzzzzzzzzzzzz",        # ADVICE repro: wraps at k=13
    "the quick brown fox jumps over the lazy dog",
    "",                                 # empty
    "ab",                               # shorter than any tested k
    "\U0010ffff" * 12 + "abc",          # max codepoint (wraps at k=10)
    "0123456789" * 3,
]


@pytest.mark.parametrize("k", [2, 5, 8, 10, 13, 16, 25])
def test_rolling_fold_matches_per_step_mod(k):
    assert _split(CORPUS, k) == _reference_hashes(CORPUS, k)


def test_advice_repro_k13():
    # The exact divergence ADVICE r13 reported: k=13 over 'zzzz...'
    # read 611973449 from the wrapping fold; the per-step reference
    # (and now the fixed kernel) reads 523693468.
    doc = "z" * 24
    got = _split([doc], 13)[0]
    assert got == _reference_hashes([doc], 13)[0]
    assert got[0] == 523693468

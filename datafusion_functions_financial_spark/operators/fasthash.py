"""Vectorized (Arrow/numpy) hashing UDFs for the dedup operators.

Catalyst evaluates higher-order-function lambdas interpretively, one
element at a time — fine for correctness, slow for per-shingle hashing
(hundreds of fold steps per row). These pandas UDFs compute the SAME
integer arithmetic (polynomial fold mod 1e9+7, LCG permutations mod
2^31-1) vectorized in numpy, so results stay bit-identical to the
Catalyst expressions and the DuckDB oracles while running ~10-50x
faster. int64 never overflows: h*31 + code < (1e9+7)*31 + 0x10FFFF and
a*h + b < 2^31 * (1e9+7) + 2^31, both « 2^63.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

MOD = 1_000_000_007
PRIME = 2_147_483_647
SHINGLE_K = 5

# Matches Java/RE2 '\s' on ASCII whitespace (the corpus here); the SQL
# normalization is regexp_replace(lower(trim(text)), '\s+', ' ').
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def normalize(text: str) -> str:
    return _WS.sub(" ", text.strip().lower())


def shingle_list(norm: str, k: int = SHINGLE_K) -> list[str]:
    # Mirrors sequence(1, greatest(length-k+1, 1)) + substring clamping.
    n = max(len(norm) - (k - 1), 1)
    seen: dict[str, None] = {}
    for i in range(n):
        seen.setdefault(norm[i:i + k])
    return list(seen)


def _hash_strings(strings: list[str], k: int = SHINGLE_K) -> np.ndarray:
    """Polynomial fold (h*31 + codepoint) % MOD per string, vectorized
    for the common fixed-length case."""
    if not strings:
        return np.empty(0, dtype=np.int64)
    out = np.empty(len(strings), dtype=np.int64)
    regular_idx = [i for i, s in enumerate(strings) if len(s) == k]
    if regular_idx:
        joined = "".join(strings[i] for i in regular_idx)
        codes = (
            np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
            .reshape(-1, k)
            .astype(np.int64)
        )
        h = np.zeros(len(regular_idx), dtype=np.int64)
        for col in range(k):
            h = (h * 31 + codes[:, col]) % MOD
        out[regular_idx] = h
    for i, s in enumerate(strings):
        if len(s) != k:
            h1 = 0
            for c in s:
                h1 = (h1 * 31 + ord(c)) % MOD
            out[i] = h1
    return out


def make_minhash_udf(perms: list[tuple[int, int]]):
    A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
    B = np.array([b for _, b in perms], dtype=np.int64)[:, None]

    @pandas_udf(ArrayType(LongType()))
    def minhash_sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            hs = _hash_strings(shingle_list(normalize(t)))
            if hs.size == 0:
                out.append([int(x) for x in (A[:, 0] * 0 + B[:, 0]) % PRIME])
                continue
            mins = ((A * hs[None, :] + B) % PRIME).min(axis=1)
            out.append([int(x) for x in mins])
        return pd.Series(out)

    return minhash_sig


@pandas_udf(ArrayType(StringType()))
def shingles_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([shingle_list(normalize(t)) for t in texts])


@pandas_udf(ArrayType(LongType()))
def shingle_hashes_udf(texts: pd.Series) -> pd.Series:
    """Distinct shingle-hash set per document (order-stable)."""
    out = []
    for t in texts:
        hs = _hash_strings(shingle_list(normalize(t)))
        seen: dict[int, None] = {}
        for h in hs:
            seen.setdefault(int(h))
        out.append(list(seen))
    return pd.Series(out)


@pandas_udf(ArrayType(LongType()))
def token_hashes_udf(texts: pd.Series) -> pd.Series:
    """Distinct-token polynomial hashes (SimHash input): mirrors
    list_transform(list_distinct(split(trim(lower(t)), '\\s+')), hash)."""
    out = []
    for t in texts:
        toks_src = _WS.split(t.strip().lower())
        toks: dict[str, None] = {}
        for tok in toks_src:
            toks.setdefault(tok)
        out.append([int(x) for x in _hash_strings(list(toks), k=-1)])
    return pd.Series(out)


def _fold_dot(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Row-wise dot product accumulated dimension-by-dimension — the
    same sequential order as the SQL fold (seed 0.0, then += x_i*y_i),
    so results are bit-identical to the Catalyst/DuckDB expressions
    while vectorizing across rows."""
    acc = np.zeros(X.shape[0], dtype=np.float64)
    for i in range(X.shape[1]):
        acc = acc + X[:, i] * Y[:, i]
    return acc


@pandas_udf(DoubleType())
def cos_fold_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    if len(a) == 0:
        return pd.Series([], dtype=np.float64)
    A = np.vstack([np.asarray(x, dtype=np.float64) for x in a])
    B = np.vstack([np.asarray(x, dtype=np.float64) for x in b])
    dot = _fold_dot(A, B)
    na = _fold_dot(A, A)
    nb = _fold_dot(B, B)
    return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))


def make_band_sig_udf(bands: int, planes_per_band: int, dim: int):
    """Banded sign-random-projection signatures: one BIGINT bucket per
    band (``planes_per_band`` sign bits folded as acc*2+bit).

    Hyperplane components are the same deterministic LCG as the SQL
    ``_plane_component`` (plane p, dim i -> ((1103515245*(p*dim+i+1) +
    12345) % 2^31)/2^31 - 0.5 — all exact in float64), and the dot
    product accumulates dimension-by-dimension in the same sequential
    order as the SQL fold, so bucket signs are bit-identical to the
    Catalyst/DuckDB expressions."""
    n_planes = bands * planes_per_band
    idx = (
        np.arange(n_planes, dtype=np.int64)[:, None] * dim
        + np.arange(dim, dtype=np.int64)[None, :] + 1
    )
    planes = (
        ((1103515245 * idx + 12345) % 2147483648).astype(np.float64)
        / 2147483648.0 - 0.5
    )

    @pandas_udf(ArrayType(LongType()))
    def band_sigs(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        acc = np.zeros((X.shape[0], n_planes), dtype=np.float64)
        for i in range(dim):
            acc = acc + X[:, i:i + 1] * planes[:, i]
        bits = (acc >= 0).astype(np.int64)
        sig = np.zeros((X.shape[0], bands), dtype=np.int64)
        for b in range(bands):
            for j in range(planes_per_band):
                sig[:, b] = sig[:, b] * 2 + bits[:, b * planes_per_band + j]
        return pd.Series([[int(x) for x in row] for row in sig])

    return band_sigs


_PUNCT = set(".,!?;:")


def make_text_stats_udf(stopwords: tuple[str, ...]):
    """Single-pass (tokens, chars, punct, stopwords) counter — same
    integer results as the Catalyst regex expressions, one Arrow batch
    pass instead of five interpreted regex evaluations per row."""
    stop = set(stopwords)
    schema = StructType([
        StructField("n_tokens", LongType()),
        StructField("chars_nospace", LongType()),
        StructField("punct_count", LongType()),
        StructField("stopword_count", LongType()),
        StructField("n_len", LongType()),
    ])

    @pandas_udf(schema)
    def text_stats_counts(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            toks = _WS.split(t.strip()) if t.strip() else [""]
            # split(trim(x), '\s+') of empty -> [''] (Spark/DuckDB parity)
            n_tokens = len(toks) if t.strip() else 1
            nospace = sum(len(p) for p in _WS.split(t))
            punct = sum(1 for c in t if c in _PUNCT)
            stopc = sum(1 for w in toks if w.lower() in stop)
            rows.append((n_tokens, nospace, punct, stopc, len(t)))
        return pd.DataFrame(
            rows, columns=["n_tokens", "chars_nospace", "punct_count",
                           "stopword_count", "n_len"],
        )

    return text_stats_counts

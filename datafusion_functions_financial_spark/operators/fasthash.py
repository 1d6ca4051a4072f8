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
    by grouping strings of equal length (numpy column folds; no per-
    char Python loop). ``k`` is accepted for signature compatibility
    but unused — all lengths vectorize."""
    if not strings:
        return np.empty(0, dtype=np.int64)
    lens = np.array([len(s) for s in strings], dtype=np.int64)
    out = np.empty(len(strings), dtype=np.int64)
    joined = "".join(strings)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(
        np.int64
    )
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    for length in np.unique(lens):
        idx = np.flatnonzero(lens == length)
        if length == 0:
            out[idx] = 0
            continue
        starts = offs[idx]
        h = np.zeros(len(idx), dtype=np.int64)
        for col in range(length):
            h = (h * 31 + codes[starts + col]) % MOD
        out[idx] = h
    return out


def _batch_shingle_hashes(
    norms: list[str], k: int = SHINGLE_K
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling polynomial hash of every k-shingle position for a whole
    batch of normalized docs — (seg_starts, hashes), where doc d's
    hashes occupy hashes[seg_starts[d]:seg_starts[d+1]-ish] in position
    order, duplicates included. No shingle strings are materialized:
    the k-window fold runs directly on the concatenated char-code
    array (sum of code*31^j stays < 1.1e6 * 31^5 << 2^63, and one
    final %MOD equals the reference's per-step mod).

    Docs shorter than k contribute ONE hash — the fold of the whole
    (clamped) string, mirroring substring(norm, 1, k) clamping.
    """
    n_docs = len(norms)
    lens = np.array([len(s) for s in norms], dtype=np.int64)
    m = np.maximum(lens - (k - 1), 1)  # hash positions per doc
    seg_starts = np.concatenate([[0], np.cumsum(m)[:-1]])
    total = int(m.sum())
    hashes = np.zeros(total, dtype=np.int64)

    regular = lens >= k
    if regular.any():
        joined = "".join(s for s, r in zip(norms, regular) if r)
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
        codes = codes.astype(np.int64)
        rl = lens[regular]
        rm = m[regular]
        roffs = np.concatenate([[0], np.cumsum(rl)[:-1]])
        n = len(codes)
        # Rolling fold over EVERY window start of the concatenated
        # char array via k-1 contiguous shifted adds — no per-window
        # gather (the previous shape paid k fancy-index gathers of a
        # corpus-sized index array; contiguous slices are ~2.5x
        # faster measured). Windows that straddle a doc boundary are
        # dropped afterwards: each doc contributes invalid positions
        # only in its last k-1 chars.
        h_all = codes[: n - k + 1].copy()
        for j in range(1, k):
            h_all *= 31
            h_all += codes[j: n - k + 1 + j]
            # Keep the accumulator exact for ANY k (ADVICE r13): after
            # a reduction h < MOD, and 6 more shift-adds reach at most
            # MOD*31^6 + 0x10FFFF*(31^6-1)/30 < 2^60 — within int64 —
            # while k-1 unreduced steps wrap past k ~ 13 for ASCII.
            # Intermediate mods preserve congruence, so the final
            # value in [0, MOD) is bit-identical to the per-step-mod
            # reference fold.
            if j % 6 == 0:
                h_all %= MOD
        h_all %= MOD
        keep = np.ones(n - k + 1, dtype=bool)
        tail = (roffs + rm)[:, None] + np.arange(k - 1, dtype=np.int64)
        tail = tail.ravel()
        keep[tail[tail < n - k + 1]] = False
        h = h_all[keep]
        # Scatter back into the all-docs layout (short docs interleave).
        w = int(rm.sum())
        out_within = (np.arange(w, dtype=np.int64)
                      - np.repeat(np.concatenate(
                          [[0], np.cumsum(rm)[:-1]]), rm))
        hashes[np.repeat(seg_starts[regular], rm) + out_within] = h
    short = ~regular
    if short.any():
        short_idx = np.flatnonzero(short)
        sh = _hash_strings([norms[i] for i in short_idx])
        hashes[seg_starts[short_idx]] = sh
    return seg_starts, hashes


def make_kgram_hashes_udf(k: int):
    """Positional k-gram polynomial hashes of an (already-normalized)
    text column: array[i] is the fold of chars i..i+k-1, duplicates
    included, position order — the winnowing hash stage. Same
    integers as the unrolled Catalyst element_at fold (a single final
    %MOD equals the per-step mod for these bounded values), computed
    by the contiguous rolling pass in ``_batch_shingle_hashes``."""

    @pandas_udf(ArrayType(LongType()))
    def kgram_hashes(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return pd.Series([], dtype=object)
        norms = list(texts)
        seg_starts, hashes = _batch_shingle_hashes(norms, k=k)
        offs = seg_starts[1:]
        return pd.Series(
            [[int(x) for x in arr] for arr in np.split(hashes, offs)]
        )

    return kgram_hashes


def make_minhash_udf(perms: list[tuple[int, int]]):
    A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
    B = np.array([b for _, b in perms], dtype=np.int64)[:, None]

    n_perms = len(perms)

    @pandas_udf(ArrayType(LongType()))
    def minhash_sig(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return pd.Series([], dtype=object)
        norms = [normalize(t) for t in texts]
        seg_starts, hashes = _batch_shingle_hashes(norms)
        n_docs = len(norms)
        ends = np.concatenate([seg_starts[1:], [len(hashes)]])
        # Permute + per-doc min in doc blocks over ONE reused buffer:
        # a full (n_perms, total) matrix is hundreds of MB whose
        # allocation/page-faults dominate (~30x slower measured); a
        # cache-resident block is compute-bound. a*h+b < 2^31*(1e9+7)
        # + 2^31 << 2^63 — no overflow.
        blk = 64
        maxw = 0
        for s in range(0, n_docs, blk):
            e = min(s + blk, n_docs)
            maxw = max(maxw, int(ends[e - 1] - seg_starts[s]))
        buf = np.empty((n_perms, maxw), dtype=np.int64)
        mins = np.empty((n_perms, n_docs), dtype=np.int64)
        for s in range(0, n_docs, blk):
            e = min(s + blk, n_docs)
            lo, hi = int(seg_starts[s]), int(ends[e - 1])
            p = buf[:, : hi - lo]
            np.multiply(A, hashes[None, lo:hi], out=p)
            p += B
            p %= PRIME
            mins[:, s:e] = np.minimum.reduceat(
                p, seg_starts[s:e] - lo, axis=1
            )
        return pd.Series(
            [[int(x) for x in mins[:, d]] for d in range(n_docs)]
        )

    return minhash_sig


@pandas_udf(ArrayType(StringType()))
def shingles_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([shingle_list(normalize(t)) for t in texts])


def _distinct_per_doc(
    seg_starts: np.ndarray, hashes: np.ndarray, n_docs: int
) -> list:
    """Per-doc distinct hash lists from the positional hash layout."""
    doc_ids = np.repeat(
        np.arange(n_docs, dtype=np.int64),
        np.diff(np.concatenate([seg_starts, [len(hashes)]])),
    )
    order = np.lexsort((hashes, doc_ids))
    d_s, h_s = doc_ids[order], hashes[order]
    keep = np.ones(len(h_s), dtype=bool)
    keep[1:] = (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])
    d_k, h_k = d_s[keep], h_s[keep]
    bounds = np.searchsorted(d_k, np.arange(1, n_docs))
    return [[int(x) for x in arr] for arr in np.split(h_k, bounds)]


def make_minhash_with_hashes_udf(perms: list[tuple[int, int]]):
    """ONE shingling pass producing BOTH the minhash signature and the
    distinct shingle-hash set per doc (struct<sig, hashes>). The LSH
    pipeline needs both (signatures for banding/pre-filter, hash sets
    for exact-Jaccard verify); computing them from separate UDFs costs
    a second full normalize+shingle+hash pass over the corpus."""
    A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
    B = np.array([b for _, b in perms], dtype=np.int64)[:, None]
    n_perms = len(perms)
    out_type = StructType([
        StructField("sig", ArrayType(LongType())),
        StructField("hashes", ArrayType(LongType())),
    ])

    @pandas_udf(out_type)
    def minhash_with_hashes(texts: pd.Series) -> pd.DataFrame:
        if len(texts) == 0:
            return pd.DataFrame({"sig": [], "hashes": []})
        norms = [normalize(t) for t in texts]
        seg_starts, hashes = _batch_shingle_hashes(norms)
        n_docs = len(norms)
        ends = np.concatenate([seg_starts[1:], [len(hashes)]])
        blk = 64
        maxw = 0
        for s in range(0, n_docs, blk):
            e = min(s + blk, n_docs)
            maxw = max(maxw, int(ends[e - 1] - seg_starts[s]))
        buf = np.empty((n_perms, maxw), dtype=np.int64)
        mins = np.empty((n_perms, n_docs), dtype=np.int64)
        for s in range(0, n_docs, blk):
            e = min(s + blk, n_docs)
            lo, hi = int(seg_starts[s]), int(ends[e - 1])
            p = buf[:, : hi - lo]
            np.multiply(A, hashes[None, lo:hi], out=p)
            p += B
            p %= PRIME
            mins[:, s:e] = np.minimum.reduceat(
                p, seg_starts[s:e] - lo, axis=1
            )
        return pd.DataFrame({
            "sig": [[int(x) for x in mins[:, d]] for d in range(n_docs)],
            "hashes": _distinct_per_doc(seg_starts, hashes, n_docs),
        })

    return minhash_with_hashes


@pandas_udf(ArrayType(LongType()))
def shingle_hashes_udf(texts: pd.Series) -> pd.Series:
    """Distinct shingle-hash set per document (sorted by hash; all
    consumers treat it as a set — explode/join or min)."""
    if len(texts) == 0:
        return pd.Series([], dtype=object)
    norms = [normalize(t) for t in texts]
    seg_starts, hashes = _batch_shingle_hashes(norms)
    return pd.Series(_distinct_per_doc(seg_starts, hashes, len(norms)))


@pandas_udf(ArrayType(LongType()))
def token_hashes_udf(texts: pd.Series) -> pd.Series:
    """Distinct-token polynomial hashes (SimHash input): mirrors
    list_transform(list_distinct(split(trim(lower(t)), '\\s+')), hash).

    All docs' tokens go through ONE ``_hash_strings`` call (it
    vectorizes by unique token length across the whole batch) — ~6x
    faster than per-doc calls, bit-identical output."""
    if len(texts) == 0:
        return pd.Series([], dtype=object)
    all_tokens: list[str] = []
    counts: list[int] = []
    for t in texts:
        toks = dict.fromkeys(_WS.split(t.strip().lower()))
        counts.append(len(toks))
        all_tokens.extend(toks)
    h = _hash_strings(all_tokens, k=-1)
    offs = np.cumsum(counts)[:-1]
    return pd.Series(
        [[int(x) for x in arr] for arr in np.split(h, offs)]
    )


def make_simhash_udf(perms: list[tuple[int, int]], bits: int):
    """Fused token-hash + bit-vote SimHash, vectorized in numpy.

    Bit-identical twin of dedup's Catalyst expression
    ``_simhash_from_hashes_spark`` (which the simhash oracles mirror):
    bit b < 31 votes on bit b of the token hash h; bits 31..61 vote on
    bit b%31 of the FIRST LCG permutation of h (the Catalyst CASE's
    1-indexed ``element_at(..., b div 31)`` selects perms[0] for every
    b in 31..61). A bit is set when the +1/-1 vote sum over the doc's
    DISTINCT tokens is positive. The interpreted Catalyst double fold
    costs bits x tokens expression evaluations per doc (~60s of the
    r13 dedup-scale simhash point at 50K docs); here it is ``bits``
    vectorized reduceat passes over the batch's token-hash array."""
    if not 1 <= bits <= 62:
        raise ValueError("bits must be in 1..62 (signed-int64 safe)")
    a1, c1 = perms[0]

    @pandas_udf(LongType())
    def simhash_fused(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return pd.Series([], dtype=np.int64)
        all_tokens: list[str] = []
        counts: list[int] = []
        for t in texts:
            toks = dict.fromkeys(_WS.split(t.strip().lower()))
            counts.append(len(toks))
            all_tokens.extend(toks)
        h1 = _hash_strings(all_tokens, k=-1)
        n = np.array(counts, dtype=np.int64)
        seg = np.concatenate([[0], np.cumsum(n)[:-1]])
        # reduceat needs a non-empty target; guard the all-empty batch
        if len(h1) == 0:
            return pd.Series(np.zeros(len(texts), dtype=np.int64))
        h2 = (a1 * h1 + c1) % PRIME
        out = np.zeros(len(texts), dtype=np.int64)
        nonempty = n > 0
        # trailing zero-token docs would index reduceat past the end;
        # clip (their vote sums are masked to 0 below anyway)
        seg = np.minimum(seg, len(h1) - 1)
        for b in range(bits):
            src, shift = (h1, b) if b < 31 else (h2, b % 31)
            ones = np.add.reduceat((src >> shift) & 1, seg)
            # reduceat duplicates the next segment's value for empty
            # segments; mask them out (their vote sum is 0, not > 0)
            votes = np.where(nonempty, 2 * ones - n, 0)
            out |= np.where(votes > 0, np.int64(1) << b, 0)
        return pd.Series(out)

    return simhash_fused


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


@pandas_udf(DoubleType())
def cos_blas_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """``cos_fold_udf`` with einsum row-dots: last-ulp summation-order
    differences vs the sequential fold (NOT oracle-reproducible) in
    exchange for dropping the per-dimension temporaries. For
    production/audit paths; oracle-gated queries keep the fold."""
    if len(a) == 0:
        return pd.Series([], dtype=np.float64)
    A = np.vstack([np.asarray(x, dtype=np.float64) for x in a])
    B = np.vstack([np.asarray(x, dtype=np.float64) for x in b])
    dot = np.einsum("ij,ij->i", A, B)
    na = np.einsum("ij,ij->i", A, A)
    nb = np.einsum("ij,ij->i", B, B)
    return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))


def make_cos_topn_udf(cent_ids: np.ndarray, cent_mat: np.ndarray,
                      keep: int, blas: bool = False):
    """Nearest-centroid ranking in MATRIX form: each input vector is
    scored against ALL centroids inside one numpy pass and only the
    top ``keep`` (cs DESC, centroid id ASC — NaN ranks first, matching
    Spark's DESC ordering) leave Python.

    Replaces the centroid crossJoin: the crossJoin ships every corpus
    vector K times through the Arrow boundary (the dominant cost at
    any real corpus size — 5 GB for 100K x 49 at dim 64); this ships
    it once. The (row, cell) dot accumulates dimension-by-dimension
    (acc += x_i * c_i in dim order), and the denominator multiplies
    the two norms before dividing — the exact scalar op sequence of
    ``_fold_dot`` / ``cos_fold_udf`` / the SQL fold, so every cosine
    is bit-identical to the crossJoin path (equality-tested).

    ``cent_ids`` must be sorted ascending (ties then resolve to the
    smallest id by argsort stability).

    ``blas=True`` scores with ``X @ C.T`` (one BLAS GEMM) instead of
    the dimension loop — ~10-50x faster at large K, differing from
    the fold only in last-ulp summation order (ranking semantics and
    tie order unchanged). Oracle-gated callers MUST keep the default:
    the DuckDB oracle reproduces the sequential fold bit-for-bit, not
    BLAS reassociation. The production/audit paths
    (``cosine_topk_ivf_auto``) use it — at 1M vectors x 1000 cells
    the fold loop was 64G scalar ops through ~6 GB of temporaries per
    batch (measured ~390 s end-to-end); the GEMM form is seconds."""
    ids = np.asarray(cent_ids, dtype=np.int64)
    C = np.asarray(cent_mat, dtype=np.float64)
    k_cells, dim = C.shape
    if blas:
        nc = np.einsum("ij,ij->i", C, C)
    else:
        nc = np.zeros(k_cells, dtype=np.float64)
        for i in range(dim):
            nc = nc + C[:, i] * C[:, i]
    ncs = np.sqrt(nc)
    keep = min(keep, k_cells)

    @pandas_udf(ArrayType(StructType([
        StructField("cid", LongType()),
        StructField("cs", DoubleType()),
    ])))
    def topn(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        if blas:
            acc = X @ C.T
            na = np.einsum("ij,ij->i", X, X)
        else:
            acc = np.zeros((X.shape[0], k_cells), dtype=np.float64)
            for i in range(dim):
                acc = acc + X[:, i:i + 1] * C[:, i][None, :]
            na = _fold_dot(X, X)
        cs = acc / (np.sqrt(na)[:, None] * ncs[None, :])
        rank_key = np.where(np.isnan(cs), np.inf, cs)
        if blas:
            # full-width argsort is O(K log K) per row and dominated
            # the 1M x 1000-cell assignment (measured ~30-50 s per
            # pass); argmax/argpartition are O(K). Ties at the
            # partition boundary may select a different equal-valued
            # centroid than the stable sort — blas mode already
            # forgoes bit-level oracle parity.
            if keep == 1:
                # argmax returns the FIRST max -> smallest id (ids
                # ascending by column construction)
                order = np.argmax(rank_key, axis=1)[:, None]
            else:
                cand = np.argpartition(
                    -rank_key, keep - 1, axis=1)[:, :keep]
                cand = np.sort(cand, axis=1)  # id-ascending base
                rows = np.arange(X.shape[0])[:, None]
                keys = rank_key[rows, cand]
                ord2 = np.argsort(-keys, axis=1, kind="stable")
                order = cand[rows, ord2]
        else:
            # argsort ascending on -key is stable -> ties keep id
            # order (the oracle-exact path).
            order = np.argsort(-rank_key, axis=1,
                               kind="stable")[:, :keep]
        out = []
        for r in range(X.shape[0]):
            sel = order[r]
            out.append([{"cid": int(ids[c]), "cs": float(cs[r, c])}
                        for c in sel])
        return pd.Series(out)

    return topn


def make_bucket_pairs_fn(threshold: float, vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         max_bucket_size: int | None = None,
                         tile: int = 2048):
    """``applyInPandas`` function computing all qualifying cosine pairs
    WITHIN one LSH band bucket.

    The pairwise dot matrix is accumulated dimension-by-dimension
    (rank-1 ``np.outer`` updates), so every pair's dot product sees the
    exact add sequence of ``_fold_dot`` / the SQL fold — bit-identical
    cosines, but computed as vectorized m x m blocks instead of one
    Arrow-shipped row per candidate pair. Row tiles bound memory to
    ``tile * m`` doubles for hot buckets.

    ``max_bucket_size``: buckets larger than this return no pairs (the
    hot-bucket skew cap — see dedup._cap_hot_buckets for semantics);
    here it costs nothing extra since the group is already assembled.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "cos_sim": pd.Series([], dtype="float64"),
        })
        m = len(pdf)
        if m < 2 or (max_bucket_size is not None and m > max_bucket_size):
            return empty
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        dim = X.shape[1]
        norms = np.zeros(m, dtype=np.float64)
        for i in range(dim):
            norms = norms + X[:, i] * X[:, i]
        rn = np.sqrt(norms)
        out_a, out_b, out_c = [], [], []
        for s in range(0, m, tile):
            e = min(s + tile, m)
            # Columns < s can never pair upper-triangle with rows >= s.
            acc = np.zeros((e - s, m - s), dtype=np.float64)
            for i in range(dim):
                acc = acc + np.outer(X[s:e, i], X[s:, i])
            cos = acc / (rn[s:e, None] * rn[None, s:])
            rows, cols = np.nonzero(cos >= threshold)
            keep = cols > rows  # strict upper triangle (global ids share s)
            rows, cols = rows[keep], cols[keep]
            out_a.append(ids[rows + s])
            out_b.append(ids[cols + s])
            out_c.append(cos[rows, cols])
        if not out_a:
            return empty
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "cos_sim": np.concatenate(out_c),
        })

    return fn


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

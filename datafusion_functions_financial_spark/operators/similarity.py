"""Similarity search over embedding columns (``array<float>``).

- **Brute-force cosine top-k**: broadcast the (small) query set against
  the full corpus; dot products as sequential Catalyst folds
  (``zip_with`` + ``aggregate``) — engine-portable, no UDFs, and the
  scan side never shuffles. At 100 TB the corpus side stays
  partition-parallel; only a per-partition top-k then a tiny final
  merge would be added (here row_number over the query partition).
- **LSH-bucketed ANN**: sign-random-projection buckets from
  deterministic hyperplanes (integer LCG arithmetic, portable to the
  oracle); candidates = same bucket, ranked by exact cosine. Trades
  recall for a ~2^planes reduction in compared pairs.

Cosine arithmetic is written with identical expression trees in Spark
and DuckDB (cast-to-double, sequential fold, sqrt), so rankings and
tie-breaks agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP
from ..sources.tables import load
from . import dedup, fasthash

DIM = 64
N_PLANES = 8
K_BRUTE = 10
K_LSH = 5
N_QUERIES = 10  # query set: vec_id < N_QUERIES
NEARDUP_COS = 0.4

# --- deterministic ANN audit corpus (single source of truth) --------------
# ADVICE r12: the generator expression and its ground-truth cache tag
# ("xxhash64v1") were duplicated verbatim in bench.py and
# tools/ivf_sweep.py — editing the constants in one place without
# bumping the tag would silently serve stale cached ground truth.
# Both now import THESE helpers, and the cache tag is DERIVED from a
# hash of the expression string, so any edit to the generator
# automatically invalidates the cache key.

#: cache tag that named this exact expression in the r11/r12 sidecar
#: (tools/ann_groundtruth.json); loaders fall back to it and migrate.
LEGACY_GROUNDTRUTH_TAG = "xxhash64v1"


def uniform_corpus_expr(dim: int = DIM) -> str:
    """Spark SQL expression (over a ``range`` table's ``id``) for one
    deterministic uniform vector: xxhash64-mixed components in
    [-1, 1), no RNG — identical corpus every run, every host."""
    return (
        f"transform(sequence(0, {dim - 1}), i -> "
        f"CAST(pmod(xxhash64(id * {dim} + i), 1000003) AS DOUBLE) "
        "/ 500001.5 - 1.0)"
    )


def uniform_corpus(spark: SparkSession, n: int,
                   partitions: int, dim: int = DIM) -> DataFrame:
    """The n-vector audit corpus as (vec_id, embedding)."""
    return spark.range(n).repartition(partitions).selectExpr(
        "id AS vec_id", f"{uniform_corpus_expr(dim)} AS embedding")


def groundtruth_key(n: int, nq: int, k: int = 5, dim: int = DIM) -> str:
    """Cache key for the exact top-k ground truth of the corpus above.

    The tag embeds a hash of the generator expression, so editing the
    generator (constants, mixing, dim layout) changes every key and
    the cache re-derives instead of serving stale neighbors."""
    import hashlib

    h = hashlib.sha256(uniform_corpus_expr(dim).encode()).hexdigest()[:8]
    return f"xxhash64-{h}:n={n}:dim={dim}:nq={nq}:k={k}"


def legacy_groundtruth_key(n: int, nq: int, k: int = 5,
                           dim: int = DIM) -> str:
    """r11/r12-era key for the same entry (pre-derived-tag); loaders
    check it after :func:`groundtruth_key` misses and migrate."""
    return f"{LEGACY_GROUNDTRUTH_TAG}:n={n}:dim={dim}:nq={nq}:k={k}"

# --- portable dot/cosine folds --------------------------------------------


def _dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )


def _dot_duck(a: str, b: str) -> str:
    return (
        f"list_reduce(list_concat([CAST(0 AS DOUBLE)], "
        f"list_transform(range(1, {DIM} + 1), i -> "
        f"CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def _cos_spark(a: str, b: str) -> str:
    return (
        f"{_dot_spark(a, b)} / "
        f"(sqrt({_dot_spark(a, a)}) * sqrt({_dot_spark(b, b)}))"
    )


def _cos_duck(a: str, b: str) -> str:
    return (
        f"{_dot_duck(a, b)} / "
        f"(sqrt({_dot_duck(a, a)}) * sqrt({_dot_duck(b, b)}))"
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = K_BRUTE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (broadcast join).

    This is the exact (O(n) per query) tier; for approximate search
    the documented entry point is ``cosine_topk_ann``, which probes
    the corpus geometry and routes to the tier whose recall holds.

    Scale shape: the corpus side never shuffles for the join (queries
    are broadcast), and a NARROW ``mapInPandas`` stage prunes each Arrow
    batch to its per-query top-k BEFORE the rank window — a row outside
    its batch's top-k cannot be in the global top-k, so the window's
    q_id shuffle receives ~k * n_batches rows per query instead of the
    entire corpus (VERDICT r02 item 7: with few queries, an unpruned
    window drags every corpus row through one q_id partition's task).
    The batch sort order (cos_sim DESC, n_id ASC) matches the window
    order exactly, so results are identical.
    """
    q = queries.selectExpr(f"{id_col} AS q_id", f"{vec_col} AS q_vec")
    v = vectors.selectExpr(f"{id_col} AS n_id", f"{vec_col} AS n_vec")
    joined = v.crossJoin(F.broadcast(q)).filter("q_id != n_id")
    scored = joined.select(
        "q_id", "n_id",
        fasthash.cos_fold_udf(F.col("q_vec"), F.col("n_vec")).alias(
            "cos_sim"),
    )
    # A zero-norm vector yields cos_sim = 0/0 = NaN. Spark's window
    # ORDER BY DESC treats NaN as the LARGEST double (ranks first) while
    # pandas sort_values puts NaN last — so without this filter the
    # batch prune would not be a superset of the window's top-k for
    # degenerate inputs (ADVICE r03). Dropping NaN before BOTH stages
    # restores the superset proof and gives the sane semantics: a vector
    # with no direction is nobody's neighbor.
    scored = scored.filter(~F.isnan("cos_sim"))

    def _partial_topk(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(["q_id", "cos_sim", "n_id"],
                                    ascending=[True, False, True])
                    .groupby("q_id", sort=False)
                    .head(k)
                )

    pruned = scored.mapInPandas(_partial_topk, schema=scored.schema)
    w = F.expr(
        "row_number() OVER (PARTITION BY q_id "
        "ORDER BY cos_sim DESC, n_id ASC)"
    )
    return pruned.withColumn("rank", w).filter(F.col("rank") <= k)


MAX_MATRIX_QUERIES = 8192


def cosine_topk_matrix(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = K_BRUTE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors, matrix form: identical output contract
    to ``cosine_topk`` (same columns, same (cos DESC, id ASC) order,
    same NaN-drop semantics) but each corpus vector crosses the Arrow
    boundary ONCE instead of once per query. The query set is
    collected to the driver (bounded: <= ``MAX_MATRIX_QUERIES`` rows,
    asserted) and closed over as a numpy matrix; one ``mapInPandas``
    stage scores every batch row against all queries with the
    dimension-by-dimension fold of ``fasthash._fold_dot`` — the exact
    scalar op sequence of the SQL fold, so every cosine is
    bit-identical to ``cosine_topk`` (equality-tested in
    tests/test_similarity.py) — and prunes to the per-batch top-k
    before the global rank window.

    This is the ground-truth path for recall audits at large N (the
    1M-vector bench baseline): the pair-explode path ships the corpus
    NQ times and pays per-pair vstack; this is one corpus pass.
    """
    qrows = (queries.selectExpr(f"{id_col} AS q_id",
                                f"{vec_col} AS q_vec")
             .limit(MAX_MATRIX_QUERIES + 1).collect())
    if len(qrows) > MAX_MATRIX_QUERIES:
        raise ValueError(
            f"cosine_topk_matrix: query set exceeds "
            f"{MAX_MATRIX_QUERIES} rows — use cosine_topk")
    import numpy as np
    import pandas as pd
    q_ids = np.array([r["q_id"] for r in qrows], dtype=np.int64)
    Q = np.vstack([np.asarray(r["q_vec"], dtype=np.float64)
                   for r in qrows])
    nq = fasthash._fold_dot(Q, Q)
    sq = np.sqrt(nq)
    v = vectors.selectExpr(f"{id_col} AS n_id", f"{vec_col} AS n_vec")

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(x, dtype=np.float64)
                           for x in pdf["n_vec"]])
            n_ids = pdf["n_id"].to_numpy(dtype=np.int64)
            # acc[r, q] accumulates x_i * q_i in dimension order —
            # the _fold_dot scalar sequence, vectorized across both
            # rows and queries (bit-identical cosines)
            acc = np.zeros((X.shape[0], Q.shape[0]), dtype=np.float64)
            for i in range(X.shape[1]):
                acc = acc + X[:, i][:, None] * Q[:, i][None, :]
            nx = fasthash._fold_dot(X, X)
            cos = acc / (np.sqrt(nx)[:, None] * sq[None, :])
            out_q, out_n, out_c = [], [], []
            for j in range(Q.shape[0]):
                col = cos[:, j]
                ok = ~np.isnan(col) & (n_ids != q_ids[j])
                idx = np.flatnonzero(ok)
                if not len(idx):
                    continue
                # (cos DESC, n_id ASC): lexsort keys minor-to-major
                order = idx[np.lexsort((n_ids[idx], -col[idx]))][:k]
                out_q.append(np.full(len(order), q_ids[j],
                                     dtype=np.int64))
                out_n.append(n_ids[order])
                out_c.append(col[order])
            if out_q:
                yield pd.DataFrame({
                    "q_id": np.concatenate(out_q),
                    "n_id": np.concatenate(out_n),
                    "cos_sim": np.concatenate(out_c),
                })

    pruned = v.mapInPandas(
        _score, schema="q_id long, n_id long, cos_sim double")
    w = F.expr(
        "row_number() OVER (PARTITION BY q_id "
        "ORDER BY cos_sim DESC, n_id ASC)"
    )
    return pruned.withColumn("rank", w).filter(F.col("rank") <= k)


# --- LSH buckets ----------------------------------------------------------


def _plane_component(p: str, i: str) -> str:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    LCG over the flattened (plane, dim) index — identical in both SQLs."""
    idx = f"(CAST({p} AS BIGINT) * {DIM} + {i} + 1)"
    return (
        f"(CAST((1103515245 * {idx} + 12345) % 2147483648 AS DOUBLE)"
        f" / 2147483648.0 - 0.5)"
    )


def _bucket_spark(vec: str, planes: int = N_PLANES) -> str:
    dot = (
        f"aggregate(zip_with({vec}, transform(sequence(0, {DIM - 1}), "
        f"i -> {_plane_component('p', 'i')}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
    )
    return (
        f"array_join(transform(sequence(0, {planes - 1}), p -> "
        f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END), '')"
    )


def lsh_params(n: int, target_bucket: int = 256) -> int:
    """Scale-aware plane count: fixed N_PLANES means bucket occupancy
    (and so the per-query candidate cost) grows linearly with the
    corpus — at 100K vectors the 2^8 buckets held ~390 vectors each.
    Sizing planes = log2(n / target_bucket) keeps the expected bucket
    near ``target_bucket`` rows at any corpus size; recall is then
    recovered with multi-probe (``cosine_topk_lsh(multiprobe=True)``)
    rather than by letting buckets bloat.

    Even sized-and-multiprobed, this tier only performs on CLUSTERED
    corpora — see the tier-routing note on ``cosine_topk_lsh``
    (uniform/unclustered embeddings -> ``ivf.cosine_topk_ivf_auto``).
    """
    import math

    return max(4, int(round(math.log2(max(2.0, n / float(target_bucket))))))


def _bucket_duck(vec: str) -> str:
    dot = (
        f"list_reduce(list_concat([CAST(0 AS DOUBLE)], "
        f"list_transform(range(1, {DIM} + 1), i -> "
        f"CAST({vec}[i] AS DOUBLE) * {_plane_component('p', '(i - 1)')})), "
        f"(acc, v) -> acc + v)"
    )
    return (
        f"list_aggregate(list_transform(range(0, {N_PLANES}), p -> "
        f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END), 'string_agg', '')"
    )


def lsh_buckets(vectors: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding",
                use_arrow: bool = False,
                planes: int = N_PLANES) -> DataFrame:
    """(vec_id, embedding, bucket): sign-random-projection bucket per
    vector, as an ``N_PLANES``-char '0'/'1' string.

    ``use_arrow=True`` computes the plane dots in one vectorized numpy
    pass per Arrow batch (``fasthash.make_band_sig_udf`` with a single
    band) instead of the interpreted Catalyst higher-order fold — same
    LCG planes, same per-dimension accumulation order, bit-identical
    sign bits (equality-tested), ~10x faster per corpus row. The
    Catalyst default stays because the DuckDB oracles mirror its
    expression text; the Arrow path is the 100 TB scan shape."""
    if use_arrow:
        sig_udf = fasthash.make_band_sig_udf(1, planes, DIM)
        return vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            sig_udf(F.col(vec_col)).alias("__sig"),
        ).selectExpr(
            "vec_id", "embedding",
            f"lpad(bin(__sig[0]), {planes}, '0') AS bucket",
        )
    return vectors.selectExpr(
        f"{id_col} AS vec_id", f"{vec_col} AS embedding",
        f"{_bucket_spark(vec_col, planes)} AS bucket",
    )


PROBE_SAMPLE = 4096
PROBE_PLANES = 8
# calibration (see tests/test_ann_recall.py::test_clusteredness_probe):
# the uniform corpus measures entropy_ratio ~ 0.88 (not 1.0 — the
# 2^planes SRP cells of random integer-LCG hyperplanes have unequal
# solid angles, so even geometry-free data occupies them unevenly);
# the 50-center clustered corpus ~ 0.73. The threshold splits the
# measured gap; mildly-clustered corpora near the line route to IVF,
# whose recall holds on ANY geometry — the failure mode to avoid is
# routing a uniform corpus to SRP (recall 0.05), not the reverse.
CLUSTERED_ENTROPY_MAX = 0.80


def clusteredness_probe(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = PROBE_SAMPLE,
    planes: int = PROBE_PLANES,
    n: int | None = None,
) -> dict:
    """Cheap corpus-geometry probe for ANN tier routing (VERDICT r10
    item 4): SRP recall is a property of the corpus — clustered
    embeddings concentrate into few sign-buckets (exploitable
    geometry), uniform corpora spread evenly (recall@5 measured 0.05
    at 100K — structurally useless). The probe hashes a deterministic
    ~``sample``-row subset (xxhash64 id filter — no RNG, no sort)
    into ``2^planes`` SRP buckets and reads the occupancy skew:

    - ``entropy_ratio``: bucket-occupancy entropy over its maximum
      ``log(min(2^planes, n_sampled))`` — ~1.0 when occupancy is
      uniform (no geometry), well below when mass concentrates.
    - ``top_share``: the largest bucket's share of the sample.
    - ``clustered``: ``entropy_ratio < CLUSTERED_ENTROPY_MAX``.

    Cost: one column-pruned count (skippable via ``n``) plus one
    aggregation over <= ``sample`` rows collected as <= ``2^planes``
    bucket counts — independent of corpus size, safe at 100 TB.
    """
    import math

    if n is None:
        n = vectors.count()

    def _occupancy(rate: int) -> list[int]:
        occ = (
            vectors.filter(
                f"pmod(xxhash64({id_col}), {rate}) = 0")
            .selectExpr(f"{_bucket_spark(vec_col, planes)} AS bucket")
            .groupBy("bucket").count().collect()
        )
        return [r["count"] for r in occ]

    rate = max(1, n // sample)
    counts = _occupancy(rate)
    if not counts and rate > 1:
        # Overstated ``n`` vs a tiny actual corpus can filter every
        # row out; re-probe at rate 1 (the corpus is small enough to
        # hash whole) before giving up (ADVICE r11).
        counts = _occupancy(1)
    n_s = sum(counts)
    if n_s == 0:
        # No information about the geometry. The safe verdict is
        # UNCLUSTERED: the router then picks IVF, whose recall holds
        # on any geometry — `clustered: True` would dispatch SRP-LSH,
        # the tier that collapses (recall ~0.05) exactly when the
        # geometry is unknown (VERDICT r11 item 4 / ADVICE r11).
        return {"n": n, "n_sampled": 0, "n_buckets_hit": 0,
                "top_share": 1.0, "entropy_ratio": 0.0,
                "clustered": False}
    h = -sum((c / n_s) * math.log(c / n_s) for c in counts if c)
    denom = math.log(min(2 ** planes, n_s)) if n_s > 1 else 1.0
    ratio = h / denom if denom > 0 else 0.0
    return {
        "n": n, "n_sampled": n_s, "n_buckets_hit": len(counts),
        "top_share": round(max(counts) / n_s, 4),
        "entropy_ratio": round(ratio, 4),
        "clustered": ratio < CLUSTERED_ENTROPY_MAX,
    }


def cosine_topk_ann(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = K_LSH,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
    target_recall: float = 0.75,
) -> tuple[DataFrame, dict]:
    """Geometry-routed ANN (VERDICT r10 item 4): run the
    ``clusteredness_probe`` and dispatch to the tier whose recall
    holds on this corpus — SRP-LSH when the probe finds cluster
    geometry (recall@5 ~ 0.74 measured on clustered corpora, and the
    bucket join is the cheapest tier), scale-aware IVF otherwise
    (recall@5 >= ~0.7 by the ``ivf_params`` sizing curve regardless
    of geometry). Returns ``(topk, info)`` where ``info`` carries the
    probe readings and the routed method for audit logs.
    """
    probe = clusteredness_probe(vectors, id_col, vec_col, n=n)
    if probe["clustered"]:
        out = cosine_topk_lsh(
            vectors, queries, k=k, id_col=id_col, vec_col=vec_col,
            use_arrow=True, planes=lsh_params(probe["n"]),
            check_geometry=False)
        return out, {"method": "lsh", **probe}
    from .ivf import cosine_topk_ivf_auto
    out, params = cosine_topk_ivf_auto(
        vectors, queries, k=k, target_recall=target_recall,
        n=probe["n"], id_col=id_col, vec_col=vec_col)
    # params' own "method" is the IVF BUILD strategy (matrix/join) —
    # keep it under ivf_method; "method" is the routed tier
    return out, {**probe, **params,
                 "ivf_method": params["method"], "method": "ivf"}


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = K_LSH,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = False,
    planes: int = N_PLANES,
    multiprobe: bool = False,
    check_geometry: bool = True,
) -> DataFrame:
    """ANN: candidates restricted to the query's LSH bucket.
    ``use_arrow`` selects the vectorized bucket path (see
    ``lsh_buckets``) — identical buckets, identical output.

    ``multiprobe=True`` additionally probes every Hamming-distance-1
    bucket (each single-plane sign flip), the standard multi-probe LSH
    move (Lv et al., VLDB'07): (planes + 1)x the candidates for a
    recall jump without rebuilding the index. The probe relation stays
    query-side and broadcast — corpus rows still hash once.

    TIER ROUTING (measured, asserted in tests/test_ann_recall.py):
    sign-random-projection recall is a property of the CORPUS
    GEOMETRY. On clustered embeddings (real-model output) this tier
    clears recall@5 ~ 0.74; on UNIFORM/unclustered corpora there is
    no geometry for a bucket hash to exploit and recall@5 is
    structurally poor — measured 0.05 plain / 0.14 multiprobe at
    100K vectors, versus 0.725 for the IVF tier with the same
    budget. If the embedding distribution is unknown or unclustered,
    use ``ivf.cosine_topk_ivf_auto`` instead; this mirrors
    ``ppjoin``'s adversarial-corpus LSH-first routing note.

    ``check_geometry=True`` (default) runs the sampled
    ``clusteredness_probe`` and emits a ``UserWarning`` naming the
    measured entropy ratio when the corpus shows no cluster geometry
    (VERDICT r10 item 3: a user calling this tier on uniform
    embeddings previously got ~5% recall with no signal). The probe
    is bounded (one count + one <= 4K-row aggregation) and does not
    change the result; ``cosine_topk_ann`` auto-routes instead of
    warning. Pass ``False`` to skip the probe jobs (recall audits,
    tight loops)."""
    if check_geometry:
        import warnings
        probe = clusteredness_probe(vectors, id_col, vec_col)
        if not probe["clustered"]:
            warnings.warn(
                f"cosine_topk_lsh: corpus shows no cluster geometry "
                f"(bucket entropy_ratio="
                f"{probe['entropy_ratio']} >= "
                f"{CLUSTERED_ENTROPY_MAX}); sign-random-projection "
                f"recall is structurally poor on such corpora "
                f"(measured 0.05@100K) — use cosine_topk_ann or "
                f"ivf.cosine_topk_ivf_auto instead",
                UserWarning, stacklevel=2)
    v = lsh_buckets(vectors, id_col, vec_col, use_arrow, planes).selectExpr(
        "vec_id AS n_id", "embedding AS n_vec", "bucket"
    )
    q = lsh_buckets(queries, id_col, vec_col, use_arrow, planes).selectExpr(
        "vec_id AS q_id", "embedding AS q_vec", "bucket"
    )
    if multiprobe:
        flips = (
            f"transform(sequence(1, {planes}), p -> "
            f"concat(substring(bucket, 1, p - 1), "
            f"CASE WHEN substring(bucket, p, 1) = '1' "
            f"THEN '0' ELSE '1' END, "
            f"substring(bucket, p + 1, {planes})))"
        )
        q = q.selectExpr(
            "q_id", "q_vec",
            f"explode(concat(array(bucket), {flips})) AS bucket",
        )
    joined = v.join(F.broadcast(q), "bucket").filter("q_id != n_id")
    scored = joined.select(
        "q_id", "n_id",
        fasthash.cos_fold_udf(F.col("q_vec"), F.col("n_vec")).alias(
            "cos_sim"),
    )
    w = F.expr(
        "row_number() OVER (PARTITION BY q_id "
        "ORDER BY cos_sim DESC, n_id ASC)"
    )
    return scored.withColumn("rank", w).filter(F.col("rank") <= k)


NEARDUP_BANDS = 16
NEARDUP_PLANES_PER_BAND = 4


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = NEARDUP_COS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    bands: int = NEARDUP_BANDS,
    planes_per_band: int = NEARDUP_PLANES_PER_BAND,
    max_bucket_size: int | None = dedup.DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Near-duplicate pairs by cosine similarity.

    ``method="lsh"`` (default, the scale path): banded
    sign-random-projection candidates — B bands of r hyperplanes each;
    a pair is a candidate iff it agrees on ALL r signs in >= 1 band.
    Verification happens INSIDE each (band, bucket) group via one
    ``applyInPandas`` stage: the group's pairwise-cosine matrix is
    accumulated dimension-by-dimension (rank-1 numpy updates — the
    exact add order of the per-pair SQL fold, so cosines stay
    bit-identical), the threshold filters before anything leaves
    Python, and only qualifying pairs reach the final ``distinct``.
    Plan shape: ONE shuffle of corpus x B (band, bucket, vector) rows,
    no pair-space join or shuffle at all — the previous design
    materialized every candidate pair (with both vectors) through a
    distinct + two joins + a per-pair UDF, which at low thresholds
    approaches the all-pairs relation. The trade: the band explode
    ships the vector payload B times; hot buckets are capped by
    default (``max_bucket_size`` — buckets above the cap contribute no
    pairs, see ``dedup._cap_hot_buckets`` for the recall argument;
    ``None`` = explicit opt-out) and the per-bucket work stays bounded
    by ``max_bucket_size**2``.

    Recall per pair at cosine c is 1-(1-p^r)^B with
    p = 1 - arccos(c)/pi: ~0.9997 at c=0.8 (a realistic near-dup
    threshold) with the default 16x4; pairs sitting AT a low threshold
    like 0.4 (p~0.63) get ~0.8 — raise ``bands`` or lower
    ``planes_per_band`` to trade cost for recall.

    ``method="exact"``: all-pairs crossJoin + filter — exact at any
    threshold, quadratic; only for small corpora or auditing recall.
    """
    if method == "exact":
        a = vectors.selectExpr(f"{id_col} AS id_a", f"{vec_col} AS va")
        b = vectors.selectExpr(f"{id_col} AS id_b", f"{vec_col} AS vb")
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                fasthash.cos_fold_udf(F.col("va"), F.col("vb")).alias(
                    "cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
        )
    if method != "lsh":
        raise ValueError("method must be 'lsh' or 'exact'")
    sig_udf = fasthash.make_band_sig_udf(bands, planes_per_band, DIM)
    bb = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.posexplode(sig_udf(F.col(vec_col))).alias("band", "bucket"),
    )
    pair_fn = fasthash.make_bucket_pairs_fn(
        threshold, max_bucket_size=max_bucket_size
    )
    pairs = bb.groupBy("band", "bucket").applyInPandas(
        pair_fn, schema="id_a long, id_b long, cos_sim double"
    )
    # The same pair emerges (with a bit-identical cosine) from every
    # band it collides in — distinct over the already-thresholded,
    # tiny output.
    return pairs.distinct()


# --------------------------------------------------------------------------
# Registry queries
# --------------------------------------------------------------------------


def _q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES))
    return out.selectExpr(
        "q_id", "n_id", "rank", f"round(cos_sim, {ROUND_DP}) AS cos_sim"
    )


_ORACLE_KNN_BRUTE = f"""
WITH scored AS (
  SELECT q.vec_id AS q_id, v.vec_id AS n_id,
         {_cos_duck('q.embedding', 'v.embedding')} AS cos_sim
  FROM embeddings v, embeddings q
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id != v.vec_id
), ranked AS (
  SELECT q_id, n_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, n_id ASC) AS rank
  FROM scored
)
SELECT q_id, n_id, rank, round(cos_sim, {ROUND_DP}) AS cos_sim
FROM ranked WHERE rank <= {K_BRUTE}
"""


def _q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # check_geometry=False: this is the gated tier measurement on the
    # fixed, already-characterized testdata corpus — the default
    # probe would fire two eager Spark jobs at DataFrame-construction
    # time inside a lazy builder (ADVICE r11).
    out = cosine_topk_lsh(emb, emb.filter(F.col("vec_id") < N_QUERIES),
                          check_geometry=False)
    return out.selectExpr(
        "q_id", "n_id", "rank", f"round(cos_sim, {ROUND_DP}) AS cos_sim"
    )


_ORACLE_KNN_LSH = f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_duck('embedding')} AS bucket
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS q_id, v.vec_id AS n_id,
         {_cos_duck('q.embedding', 'v.embedding')} AS cos_sim
  FROM b v JOIN b q ON v.bucket = q.bucket
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id != v.vec_id
), ranked AS (
  SELECT q_id, n_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, n_id ASC) AS rank
  FROM scored
)
SELECT q_id, n_id, rank, round(cos_sim, {ROUND_DP}) AS cos_sim
FROM ranked WHERE rank <= {K_LSH}
"""


def _band_bucket_duck(vec: str, band: str, r: int) -> str:
    """Integer bucket for one band: fold r sign bits as acc*2+bit, with
    plane index p = band*r + j over the shared LCG hyperplanes."""
    p = f"(CAST({band} AS BIGINT) * {r} + j)"
    dot = (
        f"list_reduce(list_concat([CAST(0 AS DOUBLE)], "
        f"list_transform(range(1, {DIM} + 1), i -> "
        f"CAST({vec}[i] AS DOUBLE) * {_plane_component(p, '(i - 1)')})), "
        f"(acc, v) -> acc + v)"
    )
    return (
        f"list_reduce(list_concat([CAST(0 AS BIGINT)], "
        f"list_transform(range(0, {r}), j -> CASE WHEN {dot} >= 0 "
        f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)), "
        f"(a1, a2) -> a1 * 2 + a2)"
    )


def _q_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # method="lsh", no cartesian; gate pins an effectively-uncapped
    # bucket cap so hashes match the cap-free oracle at any tested SF.
    out = embedding_neardup_pairs(emb,
                                  max_bucket_size=dedup.GATE_BUCKET_CAP)
    return out.selectExpr(
        "id_a", "id_b", f"round(cos_sim, {ROUND_DP}) AS cos_sim"
    )


_ORACLE_NEARDUP = f"""
WITH bb AS (
  SELECT e.vec_id, b.range AS band,
         {_band_bucket_duck('e.embedding', 'b.range',
                            NEARDUP_PLANES_PER_BAND)} AS bucket
  FROM embeddings e, range(0, {NEARDUP_BANDS}) b
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM bb a JOIN bb b2
    ON a.band = b2.band AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
)
SELECT c.id_a, c.id_b,
       round({_cos_duck('ea.embedding', 'eb.embedding')}, {ROUND_DP})
         AS cos_sim
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.id_a
JOIN embeddings eb ON eb.vec_id = c.id_b
WHERE {_cos_duck('ea.embedding', 'eb.embedding')} >= {NEARDUP_COS}
"""


QUERIES: dict = {
    "knn_bruteforce_embeddings": (_q_knn_bruteforce, _ORACLE_KNN_BRUTE),
    "knn_lsh_embeddings": (_q_knn_lsh, _ORACLE_KNN_LSH),
    "embedding_neardup_pairs": (_q_neardup, _ORACLE_NEARDUP),
}

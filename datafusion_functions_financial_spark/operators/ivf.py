"""IVF (inverted-file) approximate nearest neighbor search.

The scale path for ANN beyond LSH bucketing (`similarity.py`): a
coarse quantizer partitions the corpus into cells (inverted lists);
queries probe only the ``nprobe`` nearest cells and rank candidates by
exact cosine. This is the standard IVF-Flat structure (Jegou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI'11 — the IVF
part, without PQ compression).

Engine-portable determinism (the oracle must reproduce the index
bit-for-bit):

- **Seeds**: every vector with ``vec_id % seed_mod == 0`` — no RNG.
- **Lloyd round**: members assign to their nearest seed by cosine
  (bit-identical sequential fold, ties broken by seed id); the
  centroid mean is computed over ``floor(component * 2^20)`` BIGINT
  quantizations, so the cross-row sum is exact integer arithmetic —
  order-independent, hence identical in Spark and DuckDB despite
  nondeterministic aggregation order. The float division back is one
  deterministic expression.
- **Probing/ranking**: row_number over (cosine DESC, id ASC) with
  bit-identical cosines on both engines.

Plan shape at 100 TB: the corpus is scanned twice with a BROADCAST
centroid table (K centroids — tiny) and never shuffles for the
assignment; the centroid aggregation shuffles only K x dim partial
sums (map-side combine applies); the query probe is a broadcast
equi-join on cell id. Persist the cell assignment partitioned by
``cell_id`` and probes become partition-pruned scans.

Reference anchor: extends the reference's similarity surface (it has
none — this is a beyond-reference pipeline operator per SURVEY.md
extension scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP
from ..sources.tables import load
from . import fasthash
from .similarity import DIM, N_QUERIES, _cos_duck

IVF_SEED_MOD = 32     # seeds = vec_id % 32 == 0 -> K ~ n/32 cells
IVF_NPROBE = 4
K_IVF = 5
QUANT = 1 << 20       # component quantizer for exact integer mean

# Measured worst-case recall table (UNIFORM corpora — no cluster
# geometry to exploit — dim 64, K ~ sqrt(n) cells, recall@5 of the
# seed_hash index vs exact brute force over 16 queries;
# tools/ivf_sweep.py, r12). Earlier rounds sized nprobe from a
# power-law fit recall ~ C(K) * frac^0.53, which OVER-predicted at
# small K (predicted 0.77 @K~100 / 0.80 @K~316, delivered a flat
# 0.775 for three rounds — the r11 "plateau"). The sweep shows the
# real curve saturates (exponent falls from ~0.45 below frac 0.3 to
# ~0.25 above 0.6), so no single power law inverts it; sizing now
# inverts THIS table directly — linear interpolation within a K
# level, log10(K) interpolation between levels, +0.10 target margin
# so delivered sits AT OR ABOVE requested (the margin covers the
# table's 16-query granularity of 1/80 per hit and its ~±0.03 re-run
# noise, and puts the default-0.75-target sizing at the table's
# 0.85 contour: sized fracs 0.40/0.30/0.19 at K=100/316/1000 —
# table-interpolated recall ~0.85 at each level; at the LARGE-K
# scale path the sized frac is CHEAPER than the old fit (0.188 vs
# 0.203 at K=1000 for the same ~0.86), so the margin costs only on
# small corpora where a probe pass is trivial anyway). The bench's
# ivf_auto_recall_curve
# re-measures delivered recall every run. Elbow analysis in
# SCALING.md "r12 IVF sizing".
_RECALL_TABLE = (
    (93, ((0.151, 0.55), (0.204, 0.6625), (0.28, 0.725),
          (0.355, 0.8125), (0.452, 0.90), (0.602, 0.9625),
          (0.806, 0.9875))),
    (336, ((0.152, 0.70), (0.202, 0.775), (0.271, 0.8375),
           (0.351, 0.875), (0.452, 0.925), (0.601, 0.9625),
           (0.801, 1.0))),
    (984, ((0.101, 0.6875), (0.15, 0.8125), (0.20, 0.8625),
           (0.301, 0.9625), (0.45, 0.9875))),
)
IVF_TARGET_MARGIN = 0.10


def _frac_for(curve, target: float) -> float:
    """Smallest probed fraction reaching ``target`` on one measured
    K-level curve (linear interpolation between bracketing points;
    proportional below the first point, 1.0 past the last)."""
    f0, r0 = curve[0]
    if target <= r0:
        return f0 * target / r0
    for (fa, ra), (fb, rb) in zip(curve, curve[1:]):
        if target <= rb:
            return fa + (fb - fa) * (target - ra) / (rb - ra)
    return 1.0


def _sizing_frac(k: int, target_recall: float) -> float:
    """Probed fraction for ``k`` cells: measured-table inversion with
    log10(K) interpolation between sweep levels and a +0.10 margin."""
    import math

    t = min(target_recall + IVF_TARGET_MARGIN, 0.99)
    levels = _RECALL_TABLE
    if k <= levels[0][0]:
        return min(1.0, _frac_for(levels[0][1], t))
    if k >= levels[-1][0]:
        return min(1.0, _frac_for(levels[-1][1], t))
    for (k0, c0), (k1, c1) in zip(levels, levels[1:]):
        if k <= k1:
            fa, fb = _frac_for(c0, t), _frac_for(c1, t)
            w = ((math.log10(k) - math.log10(k0))
                 / (math.log10(k1) - math.log10(k0)))
            return min(1.0, fa + (fb - fa) * w)
    return 1.0  # unreachable


def ivf_params(n: int, target_recall: float = 0.75) -> tuple[int, int]:
    """Scale-aware IVF sizing: ``(seed_mod, nprobe)`` for an
    ``n``-vector corpus.

    The r07 audit showed fixed constants don't survive scale-up:
    ``seed_mod=2048, nprobe=4`` gave recall@5 = 0.325 at 100K uniform
    vectors (4 of ~49 cells probed). The standard IVF sizing is
    K ~ sqrt(n) cells (balancing centroid-scan cost against cell-scan
    cost), i.e. ``seed_mod = n / K ~ sqrt(n)``, with ``nprobe``
    inverted from the measured worst-case recall table above, so the
    probed fraction — not an absolute cell count — tracks the target
    and the delivered recall sits AT OR ABOVE the requested value
    (the pre-r12 power-law fit under-delivered ~0.73-0.78 against
    target 0.75 at small K).

    At 100 TB this keeps both sides of the probe bounded: the centroid
    relation stays K ~ sqrt(n) rows (broadcastable), and each query
    scans ``nprobe/K`` of the corpus regardless of n.
    """
    import math

    k = max(4, int(round(math.sqrt(n))))
    seed_mod = max(1, int(round(n / k)))
    frac = _sizing_frac(k, min(target_recall, 0.99))
    nprobe = max(IVF_NPROBE, int(math.ceil(frac * k)))
    return seed_mod, min(nprobe, k)


def _nearest(vectors: DataFrame, cents: DataFrame, cent_id: str,
             cent_vec: str, keep: int,
             method: str = "matrix", blas: bool = False) -> DataFrame:
    """Rank centroids per vector by cosine; keep the top ``keep``.

    ``method="matrix"`` (default, the scan shape): the K-row centroid
    table is collected once and closed over by a vectorized UDF that
    scores each vector against ALL centroids in one numpy pass
    (``fasthash.make_cos_topn_udf``) — each corpus vector crosses the
    Arrow boundary ONCE instead of K times, and no n x K intermediate
    relation ever exists. Bit-identical cosines and tie order to the
    join path (equality-tested); measured 6x faster at 100K x 49.
    The driver-side collect is bounded by K rows — at extreme K
    (>~10^5 cells) fall back to ``method="join"``.

    ``method="join"``: broadcast crossJoin + fold UDF. ``keep == 1``
    collapses the n x K scored rows with an aggregated argmax —
    ``max(struct(cs, -id, id, vec))`` — before any exchange
    (map-side combine); ``keep > 1`` ranks with a window. Tie
    semantics identical (max cs, then min centroid id)."""
    import numpy as np

    if method == "matrix":
        pdf = cents.select(cent_id, cent_vec).toPandas()
        order = np.argsort(pdf[cent_id].to_numpy(), kind="stable")
        ids = pdf[cent_id].to_numpy()[order]
        mat = np.vstack([np.asarray(v, dtype=np.float64)
                         for v in pdf[cent_vec].to_numpy()[order]])
        topn = fasthash.make_cos_topn_udf(ids, mat, keep, blas=blas)
        arr = vectors.select("vec_id", "embedding",
                             topn(F.col("embedding")).alias("__nn"))
        return (
            arr.select("vec_id", "embedding",
                       F.posexplode("__nn").alias("__p", "__s"))
            .select(
                "vec_id", "embedding",
                F.col("__s.cid").alias(cent_id),
                F.col("__s.cs").alias("cs"),
                (F.col("__p") + 1).cast("int").alias("rn"),
            )
        )
    cos_udf = fasthash.cos_blas_udf if blas else fasthash.cos_fold_udf
    scored = vectors.crossJoin(F.broadcast(cents)).select(
        "vec_id", "embedding", cent_id,
        cos_udf(F.col("embedding"), F.col(cent_vec)).alias("cs"),
    )
    if keep == 1:
        best = (
            scored.groupBy("vec_id")
            .agg(F.expr(
                f"max(struct(cs, -{cent_id} AS negid, "
                f"{cent_id} AS cid, embedding)) AS best"
            ))
        )
        return best.select(
            "vec_id",
            F.col("best.embedding").alias("embedding"),
            F.col("best.cid").alias(cent_id),
            F.col("best.cs").alias("cs"),
            F.lit(1).alias("rn"),
        )
    w = F.expr(
        f"row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY cs DESC, {cent_id} ASC)"
    )
    return scored.withColumn("rn", w).filter(F.col("rn") <= keep)


# Above this many cells the matrix assignment path (which collects
# all K centroids driver-side for the vectorized one-pass scorer)
# stops being a bounded collect; ``ivf_index``/``cosine_topk_ivf_auto``
# switch to the broadcast-join scorer past it.
MATRIX_METHOD_MAX_CELLS = 100_000


def ivf_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = IVF_SEED_MOD,
    method: str = "matrix",
    seed_hash: bool = False,
    blas: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: returns ``(centroids, cells)``.

    ``centroids``: cell_id, centroid (array<double>) — one Lloyd round
    from the deterministic seed sample, means over integer-quantized
    components (see module docstring).
    ``cells``: vec_id, embedding, cell_id — the inverted lists (each
    vector assigned to its nearest refined centroid).
    ``method``: assignment plan shape (see ``_nearest``) — "matrix"
    collects the K centroids driver-side (bounded while K <=
    ``MATRIX_METHOD_MAX_CELLS``); "join" stays fully distributed.
    ``seed_hash``: seed via ``pmod(xxhash64(vec_id), seed_mod) == 0``
    instead of ``vec_id % seed_mod == 0``. The plain-modulo default
    assumes DENSE 0..n-1 ids (the frozen gate-query contract); sparse
    or offset id spaces make it under-seed — possibly to zero cells —
    so any caller with an arbitrary id distribution should pass
    ``seed_hash=True`` (``cosine_topk_ivf_auto`` does).
    ``blas``: BLAS-GEMM assignment scoring (last-ulp vs the fold, NOT
    oracle-reproducible; see ``fasthash.make_cos_topn_udf``) — the
    two full-corpus assignment passes dominate the build at large K.
    """
    v = vectors.selectExpr(f"{id_col} AS vec_id",
                           f"{vec_col} AS embedding")
    seed_pred = (F.pmod(F.xxhash64(F.col("vec_id")), F.lit(seed_mod))
                 == 0) if seed_hash else (
        F.col("vec_id") % seed_mod == 0)
    seeds = v.filter(seed_pred).selectExpr(
        "vec_id AS seed_id", "embedding AS seed_vec"
    )
    m1 = _nearest(v, seeds, "seed_id", "seed_vec", 1,
                  method=method, blas=blas).selectExpr(
        "vec_id", "embedding", "seed_id AS cell_id"
    )
    comp = m1.select(
        "cell_id",
        F.posexplode("embedding").alias("pos", "val"),
    ).groupBy("cell_id", "pos").agg(
        F.sum(
            F.floor(F.col("val").cast("double") * F.lit(float(QUANT)))
            .cast("long")
        ).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    cents = (
        comp.withColumn(
            "cval",
            F.col("s").cast("double")
            / (F.lit(float(QUANT)) * F.col("c").cast("double")),
        )
        .groupBy("cell_id")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(pos, cval))), "
            "x -> x.cval)"
        ).alias("centroid"))
    )
    # Centroids are referenced by the reassignment AND every probe;
    # they are K rows — checkpoint so the seed-assignment pipeline
    # does not re-execute per reference.
    cents = cents.localCheckpoint()
    cells = _nearest(v, cents, "cell_id", "centroid", 1,
                     method=method, blas=blas).select(
        "vec_id", "embedding", F.col("cell_id").alias("cell")
    ).selectExpr("vec_id", "embedding", "cell AS cell_id")
    return cents, cells


def cosine_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = K_IVF,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = IVF_SEED_MOD,
    index: tuple[DataFrame, DataFrame] | None = None,
    method: str = "matrix",
    blas: bool = False,
) -> DataFrame:
    """(Prefer ``similarity.cosine_topk_ann`` as the entry point — it
    probes the corpus geometry and routes here with scale-aware
    parameters when SRP-LSH would collapse.)

    ANN top-k: candidates restricted to each query's ``nprobe``
    nearest IVF cells, ranked by exact cosine.

    ``index``: pass a prebuilt ``(centroids, cells)`` from
    ``ivf_index`` to amortize the build across query batches — the
    production shape (build once, persist cells partitioned by
    cell_id, probe many times)."""
    cents, cells = index if index is not None else ivf_index(
        vectors, id_col, vec_col, seed_mod, method, blas=blas)
    q = queries.selectExpr(f"{id_col} AS vec_id",
                           f"{vec_col} AS embedding")
    probes = _nearest(q, cents, "cell_id", "centroid", nprobe,
                      method=method, blas=blas).selectExpr(
        "vec_id AS q_id", "embedding AS q_vec", "cell_id"
    )
    cand = cells.join(F.broadcast(probes), "cell_id").filter(
        F.col("q_id") != F.col("vec_id")
    )
    cos_udf = fasthash.cos_blas_udf if blas else fasthash.cos_fold_udf
    scored = cand.select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        cos_udf(F.col("q_vec"), F.col("embedding")).alias("cos_sim"),
    )
    w = F.expr(
        "row_number() OVER (PARTITION BY q_id "
        "ORDER BY cos_sim DESC, n_id ASC)"
    )
    return scored.withColumn("rank", w).filter(F.col("rank") <= k)


def cosine_topk_ivf_auto(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = K_IVF,
    target_recall: float = 0.75,
    n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blas: bool = True,
) -> tuple[DataFrame, dict]:
    """``cosine_topk_ivf`` with scale-aware parameters: derives
    ``(seed_mod, nprobe)`` from the corpus size via ``ivf_params`` so
    recall holds as the corpus grows (the fixed-constant entry point
    keeps the frozen gate-query behavior). Returns ``(topk, params)``
    where ``params`` records the derived sizing for audit logs.

    ``n``: pass the known corpus size to skip the count job.

    Seeds are hash-derived (``seed_hash=True``) so the K ~ sqrt(n)
    sizing holds for ANY id distribution — sparse or offset id spaces
    would starve the plain ``vec_id % seed_mod`` sample (possibly to
    zero cells) and silently miss the recall target.

    ``blas=True`` (default): GEMM/einsum cosine scoring — this path
    is NOT oracle-gated, and at K ~ sqrt(n) cells the fold loop's
    per-dimension temporaries dominate the build (measured 388 s at
    1M x 1000 cells vs seconds for GEMM, identical recall; last-ulp
    cosine differences only).
    """
    if n is None:
        n = vectors.count()
    seed_mod, nprobe = ivf_params(n, target_recall)
    # K ~ sqrt(n): past MATRIX_METHOD_MAX_CELLS cells the driver-side
    # centroid collect stops being bounded — build fully distributed.
    method = ("matrix" if n // seed_mod <= MATRIX_METHOD_MAX_CELLS
              else "join")
    index = ivf_index(vectors, id_col, vec_col, seed_mod, method,
                      seed_hash=True, blas=blas)
    # Materialize the inverted lists: the index is built once and
    # probed many times (the production shape — save_index persists
    # it partitioned by cell_id); left lazy, the full assignment
    # pipeline re-executes inside the probe plan and measured 2.5x
    # the materialized build+query at 1M x 1000 cells.
    index = (index[0], index[1].localCheckpoint())
    out = cosine_topk_ivf(vectors, queries, k=k, nprobe=nprobe,
                          id_col=id_col, vec_col=vec_col,
                          seed_mod=seed_mod, index=index,
                          method=method, blas=blas)
    return out, {"n": n, "seed_mod": seed_mod, "nprobe": nprobe,
                 "target_recall": target_recall, "method": method,
                 "blas": blas}


# --------------------------------------------------------------------------
# Persisted index: cells partitioned by cell_id -> partition-pruned probes
# --------------------------------------------------------------------------


def save_index(index: tuple[DataFrame, DataFrame], path: str) -> None:
    """Materialize an ``ivf_index`` result: centroids as plain parquet,
    cells PARTITIONED BY cell_id — the layout that turns every probe
    into a partition-pruned scan (only the ``nprobe`` probed cells'
    files are read; plan-asserted in ``test_ivf_persist``). This is
    the production shape at 100 TB: build once, write once, then each
    query batch touches nprobe/K of the corpus bytes."""
    cents, cells = index
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    cells.write.mode("overwrite").partitionBy("cell_id").parquet(
        f"{path}/cells")


def load_index(spark: SparkSession, path: str
               ) -> tuple[DataFrame, DataFrame]:
    """Load a persisted index for ``cosine_topk_ivf(..., index=...)``.
    Probes filter the cells relation on ``cell_id``, which the parquet
    source satisfies from partition directories alone."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/cells"),
    )


# --------------------------------------------------------------------------
# Registry query + oracle
# --------------------------------------------------------------------------


def _q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    out = cosine_topk_ivf(emb, emb.filter(F.col("vec_id") < N_QUERIES))
    return out.selectExpr(
        "q_id", "n_id", "rank", f"round(cos_sim, {ROUND_DP}) AS cos_sim"
    )


_ORACLE_KNN_IVF = f"""
WITH v AS (
  SELECT vec_id, embedding FROM embeddings
), seeds AS (
  SELECT vec_id AS seed_id, embedding AS seed_vec
  FROM v WHERE vec_id % {IVF_SEED_MOD} = 0
), a1 AS (
  SELECT v.vec_id, v.embedding, s.seed_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_cos_duck('v.embedding', 's.seed_vec')} DESC,
                    s.seed_id ASC) AS rn
  FROM v, seeds s
), m1 AS (
  SELECT vec_id, embedding, seed_id AS cell_id FROM a1 WHERE rn = 1
), comp AS (
  SELECT cell_id, r.range AS pos,
         sum(CAST(floor(CAST(embedding[r.range] AS DOUBLE) * {QUANT}.0)
                  AS BIGINT)) AS s,
         count(*) AS c
  FROM m1, range(1, {DIM} + 1) r
  GROUP BY 1, 2
), cent AS (
  SELECT cell_id,
         list(CAST(s AS DOUBLE) / ({QUANT}.0 * CAST(c AS DOUBLE))
              ORDER BY pos) AS centroid
  FROM comp GROUP BY 1
), a2 AS (
  SELECT v.vec_id, v.embedding, c.cell_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_cos_duck('v.embedding', 'c.centroid')} DESC,
                    c.cell_id ASC) AS rn
  FROM v, cent c
), cells AS (
  SELECT vec_id, embedding, cell_id FROM a2 WHERE rn = 1
), probes AS (
  SELECT * FROM (
    SELECT q.vec_id AS q_id, q.embedding AS q_vec, c.cell_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_cos_duck('q.embedding', 'c.centroid')} DESC,
                      c.cell_id ASC) AS rn
    FROM v q, cent c
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {IVF_NPROBE}
), scored AS (
  SELECT p.q_id, cl.vec_id AS n_id,
         {_cos_duck('p.q_vec', 'cl.embedding')} AS cos_sim
  FROM probes p JOIN cells cl ON cl.cell_id = p.cell_id
  WHERE p.q_id != cl.vec_id
), ranked AS (
  SELECT q_id, n_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, n_id ASC) AS rank
  FROM scored
)
SELECT q_id, n_id, rank, round(cos_sim, {ROUND_DP}) AS cos_sim
FROM ranked WHERE rank <= {K_IVF}
"""


QUERIES: dict = {
    "knn_ivf_embeddings": (_q_knn_ivf, _ORACLE_KNN_IVF),
}

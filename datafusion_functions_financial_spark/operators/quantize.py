"""Int8 embedding quantization + quantized similarity search.

At 100 TB the dominant ANN cost is moving float32 vectors: 64-dim
float32 is 256 B/row; int8 is 64 B plus one float scale — a 4x I/O and
shuffle reduction that makes brute-force candidate scoring feasible as
a first pass (rerank the top candidates with the float vectors).

Quantization is symmetric per-vector: ``scale = max(|v|)/127``,
``q_i = round(v_i / scale)`` — so every component lands in
[-127, 127]. Cosine over quantized vectors needs NO dequantization:
the scales cancel, leaving ``dot_int / (sqrt(aa_int) * sqrt(bb_int))``
— all-integer folds under an exactly-rounded IEEE sqrt/division, hence
bit-identical across engines (rank ties break on neighbor id).

Everything is pure Catalyst (``zip_with``/``aggregate`` folds); the
corpus side never shuffles (broadcast query set), mirroring
``similarity.cosine_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP
from ..sources.tables import load
from .similarity import DIM, N_QUERIES

__all__ = ["knn_quantized", "quantize_int8"]

QMAX = 127
K_QUANT = 10

# --- expression builders (Spark / DuckDB twins) ---------------------------


def _absmax_spark(v: str) -> str:
    return (f"aggregate({v}, 0D, (m, x) -> "
            f"greatest(m, abs(CAST(x AS DOUBLE))))")


def _absmax_duck(v: str) -> str:
    return (f"list_reduce(list_concat([CAST(0 AS DOUBLE)], "
            f"list_transform(range(1, {DIM} + 1), i -> "
            f"abs(CAST({v}[i] AS DOUBLE)))), (m, x) -> greatest(m, x))")


def _quant_spark(v: str, scale: str) -> str:
    # scale = 0 only for the all-zero vector; quantize it to zeros.
    return (f"CASE WHEN {scale} = 0D THEN transform({v}, x -> 0) "
            f"ELSE transform({v}, x -> "
            f"CAST(round(CAST(x AS DOUBLE) / {scale}) AS INT)) END")


def _quant_duck(v: str, scale: str) -> str:
    return (f"CASE WHEN {scale} = 0 THEN "
            f"list_transform(range(1, {DIM} + 1), i -> 0) "
            f"ELSE list_transform(range(1, {DIM} + 1), i -> "
            f"CAST(round(CAST({v}[i] AS DOUBLE) / {scale}) AS INT)) END")


def _idot_spark(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"CAST(x AS BIGINT) * y), 0L, (acc, v) -> acc + v)")


def _idot_duck(a: str, b: str) -> str:
    return (f"list_reduce(list_concat([CAST(0 AS BIGINT)], "
            f"list_transform(range(1, {DIM} + 1), i -> "
            f"CAST({a}[i] AS BIGINT) * {b}[i])), (acc, v) -> acc + v)")


def _qcos_spark(a: str, b: str) -> str:
    d, aa, bb = _idot_spark(a, b), _idot_spark(a, a), _idot_spark(b, b)
    return (f"CASE WHEN {aa} = 0 OR {bb} = 0 THEN 0D "
            f"ELSE CAST({d} AS DOUBLE) / (sqrt({aa}) * sqrt({bb})) END")


def _qcos_duck(a: str, b: str) -> str:
    d, aa, bb = _idot_duck(a, b), _idot_duck(a, a), _idot_duck(b, b)
    return (f"CASE WHEN {aa} = 0 OR {bb} = 0 THEN CAST(0 AS DOUBLE) "
            f"ELSE CAST({d} AS DOUBLE) / (sqrt({aa}) * sqrt({bb})) END")


# --- operators ------------------------------------------------------------


def quantize_int8(vectors: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id, scale, qvec): symmetric int8 quantization, scan->project,
    zero shuffles. Persist qvec (+ scale for dequantization) as the
    compact ANN index."""
    return vectors.selectExpr(
        id_col,
        f"{_absmax_spark(vec_col)} / {QMAX} AS scale",
        f"{_quant_spark(vec_col, f'({_absmax_spark(vec_col)} / {QMAX})')} "
        f"AS qvec",
    )


def knn_quantized(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = K_QUANT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by QUANTIZED cosine: quantize both sides, broadcast
    the query set, rank by integer-fold cosine. 4x less corpus I/O
    than float brute force; recall vs float cosine is high (tested)
    because per-vector symmetric int8 keeps relative angles."""
    # Self-dots are per-VECTOR quantities; computing them below the
    # join evaluates each interpreted fold once per vector instead of
    # once per (query, vector) pair — the inlined _qcos shape paid 3
    # folds per pair, 2 of them loop-invariant. Integer dots, so the
    # hoisted values (and the doubles derived from them) are identical.
    qq = quantize_int8(queries, id_col, vec_col).selectExpr(
        f"{id_col} AS q_id", "qvec AS q_q",
        f"{_idot_spark('qvec', 'qvec')} AS q_n2")
    vv = quantize_int8(vectors, id_col, vec_col).selectExpr(
        f"{id_col} AS n_id", "qvec AS n_q",
        f"{_idot_spark('qvec', 'qvec')} AS n_n2")
    qcos = (f"CASE WHEN q_n2 = 0 OR n_n2 = 0 THEN 0D "
            f"ELSE CAST({_idot_spark('q_q', 'n_q')} AS DOUBLE) "
            f"/ (sqrt(q_n2) * sqrt(n_n2)) END")
    scored = (
        vv.crossJoin(F.broadcast(qq))
        .filter("q_id != n_id")
        .selectExpr("q_id", "n_id", f"{qcos} AS qcos")
    )
    return (
        scored.withColumn(
            "rank",
            F.expr("row_number() OVER (PARTITION BY q_id "
                   "ORDER BY qcos DESC, n_id ASC)"),
        )
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = quantize_int8(load(spark, sf_dir, "embeddings"))
    # Project the index to engine-portable scalars: the scale, the
    # integer self-dot (norm), L1 mass, and the first/last components.
    return out.selectExpr(
        "vec_id",
        f"round(scale, {ROUND_DP}) AS scale",
        f"{_idot_spark('qvec', 'qvec')} AS qnorm2",
        "aggregate(qvec, 0L, (acc, x) -> acc + abs(CAST(x AS BIGINT)))"
        " AS ql1",
        "qvec[0] AS q_first",
        f"qvec[{DIM - 1}] AS q_last",
    )


def _q_knn_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    out = knn_quantized(emb, emb.filter(F.col("vec_id") < N_QUERIES))
    return out.selectExpr(
        "q_id", "n_id", "CAST(rank AS BIGINT) AS rank",
        f"round(qcos, {ROUND_DP}) AS qcos",
    )


_DUCK_SCALE = f"({_absmax_duck('embedding')} / {QMAX})"

_ORACLE_QUANTIZE = f"""
WITH q AS (
  SELECT vec_id, {_DUCK_SCALE} AS scale,
         {_quant_duck('embedding', _DUCK_SCALE)} AS qvec
  FROM embeddings
)
SELECT vec_id, round(scale, {ROUND_DP}) AS scale,
       {_idot_duck('qvec', 'qvec')} AS qnorm2,
       list_reduce(list_concat([CAST(0 AS BIGINT)],
         list_transform(range(1, {DIM} + 1), i ->
           abs(CAST(qvec[i] AS BIGINT)))), (acc, x) -> acc + x) AS ql1,
       qvec[1] AS q_first,
       qvec[{DIM}] AS q_last
FROM q
"""

_ORACLE_KNN_QUANT = f"""
WITH q AS (
  SELECT vec_id, {_quant_duck('embedding', _DUCK_SCALE)} AS qvec
  FROM embeddings
), scored AS (
  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
         {_qcos_duck('a.qvec', 'b.qvec')} AS qcos
  FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND a.vec_id != b.vec_id
), ranked AS (
  SELECT q_id, n_id, qcos,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY qcos DESC, n_id ASC) AS rank
  FROM scored
)
SELECT q_id, n_id, rank, round(qcos, {ROUND_DP}) AS qcos
FROM ranked WHERE rank <= {K_QUANT}
"""

QUERIES: dict = {
    "emb_quantize_embeddings": (_q_quantize, _ORACLE_QUANTIZE),
    "knn_quantized_embeddings": (_q_knn_quant, _ORACLE_KNN_QUANT),
}

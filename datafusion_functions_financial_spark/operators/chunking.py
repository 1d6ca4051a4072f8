"""Document chunking for training-data pipelines: split each document
into overlapping fixed-size token windows (chunk size C, stride S).

The standard pre-tokenization step before sequence packing: long
documents become multiple training examples with S-token overlap so no
context is lost at chunk boundaries.

Scale design: pure Catalyst — tokenize once per document (materialized
column, see ``decontam._with_tokens`` for why inlining would be
O(L^2)), explode a ``sequence`` of chunk indices (narrow flatMap), and
slice the materialized token array per chunk. Zero shuffles end-to-end;
output size is ``~n_tokens / S`` rows per doc. Chunk text is emitted as
an md5 over the space-joined tokens (portable to the oracle and keeps
the exploded payload to one hash instead of re-shipping the text C/S
times); callers that need the raw text slice can select it with the
same ``slice`` expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .decontam import _with_tokens

__all__ = ["chunk_documents"]

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = CHUNK_TOKENS,
                    stride: int = CHUNK_STRIDE) -> DataFrame:
    """(id, chunk_id, chunk_start, chunk_len, chunk_hash) rows.

    Chunks start at token offsets 0, S, 2S, ... and carry
    ``min(C, n_tokens - start)`` tokens; the final chunk may be short.
    A doc with ``n <= C`` tokens yields exactly one chunk.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        # The "no context lost" coverage invariant only holds for
        # S <= C; S > C leaves token gaps AND drives the final chunk's
        # computed length negative (slice() throws at runtime). Fail
        # loudly at plan time instead (ADVICE r03).
        raise ValueError(
            f"stride ({stride}) must be <= chunk_tokens ({chunk_tokens}) "
            "— larger strides skip tokens between chunks"
        )
    c, s = chunk_tokens, stride
    t = _with_tokens(df, text_col)
    # 1 + ceil(max(0, n - C) / S) chunks (integer arithmetic).
    n_chunks = (
        f"1 + (greatest(0, size(__toks) - {c}) + {s} - 1) DIV {s}"
    )
    start = f"(1 + __ci * {s})"  # 1-based slice offset
    length = f"least({c}, size(__toks) - {start} + 1)"
    return (
        t.select(
            F.col(id_col),
            F.col("__toks"),
            F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("__ci"),
        )
        .selectExpr(
            id_col,
            "CAST(__ci AS BIGINT) AS chunk_id",
            f"CAST({start} AS BIGINT) AS chunk_start",
            f"CAST({length} AS BIGINT) AS chunk_len",
            f"md5(concat_ws(' ', slice(__toks, {start}, {length}))) "
            "AS chunk_hash",
        )
    )


# --------------------------------------------------------------------------
# Gate query
# --------------------------------------------------------------------------


def _q_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load(spark, sf_dir, "documents"))


_ORACLE_CHUNKS = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
), cfg AS (
  SELECT doc_id, t, len(t) AS n,
         1 + (greatest(0, len(t) - {CHUNK_TOKENS}) + {CHUNK_STRIDE} - 1)
             // {CHUNK_STRIDE} AS n_chunks
  FROM toks
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_id,
       CAST(1 + i * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
       CAST(least({CHUNK_TOKENS}, n - (1 + i * {CHUNK_STRIDE}) + 1)
            AS BIGINT) AS chunk_len,
       md5(array_to_string(
         list_slice(t, 1 + i * {CHUNK_STRIDE},
                    (1 + i * {CHUNK_STRIDE})
                    + least({CHUNK_TOKENS},
                            n - (1 + i * {CHUNK_STRIDE}) + 1) - 1),
         ' ')) AS chunk_hash
FROM cfg, UNNEST(range(0, n_chunks)) AS u(i)
"""

QUERIES: dict = {
    "text_chunk_documents": (_q_chunks, _ORACLE_CHUNKS),
}

"""Sequence packing: greedy binning of documents into fixed token
budgets (the pretraining "context window packing" step).

A training pipeline wants every sample to be a ~budget-token
concatenation of documents, with few pad tokens wasted. Optimal bin
packing is NP-hard and inherently serial; the scalable compromise —
used here — is **sharded greedy packing**:

- every document lands in a shard by a deterministic LCG hash of its
  id (engine-portable BIGINT arithmetic, same as
  ``operators/sampling.py``);
- within a shard, documents are scanned in id order and appended to
  the current bin while they fit; a document that would overflow opens
  a new bin (an oversized document gets a bin of its own);
- shards pack **independently and in parallel** — one
  ``applyInPandas`` over ``groupBy(shard)``, state never crosses
  shards, so the operator scales out linearly and its output is
  bit-stable under any partitioning.

The greedy scan is a genuine sequential recurrence (bin boundaries
depend on the running fill), so this is the documented Pandas-UDF
path, not a Catalyst window. The per-shard loop is O(rows) integer
work over numpy arrays. The DuckDB oracle expresses the same
recurrence as a recursive CTE that advances ALL shards one row per
iteration — iteration count = max shard length, which is why sharding
also keeps the oracle tractable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .sampling import _A, _C, PRIME

__all__ = ["pack_sequences", "packing_summary"]

_TOKENS = "filter(split(trim(lower({col})), '\\\\s+'), t -> t != '')"
_OUT_SCHEMA = "shard bigint, bin bigint, doc_id bigint, n_tokens bigint"


def _shard_expr(id_col: str, n_shards: int) -> str:
    return f"((({id_col} + 1) * {_A} + {_C}) % {PRIME}) % {n_shards}"


def _pack_shard(budget: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        cur_bin, acc = -1, 0
        for n in pdf["n_tokens"].to_numpy():
            if cur_bin >= 0 and acc + n <= budget:
                acc += n
            else:
                cur_bin += 1
                acc = n
            bins.append(cur_bin)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[["shard", "bin", "doc_id", "n_tokens"]]

    return fn


def pack_sequences(df: DataFrame, budget: int = 256, n_shards: int = 16,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(shard, bin, doc_id, n_tokens): greedy packing assignment.

    Deterministic: shard by LCG(id), scan in id order. ``budget`` is
    the token capacity per bin; a document longer than ``budget``
    occupies its own (overflowing) bin rather than being dropped —
    truncation is the tokenizer's decision, not the packer's.
    """
    sized = df.select(
        F.expr(_shard_expr(id_col, n_shards)).alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.size(F.expr(_TOKENS.format(col=text_col))).cast("bigint")
        .alias("n_tokens"),
    )
    return sized.groupBy("shard").applyInPandas(
        _pack_shard(budget), _OUT_SCHEMA
    )


def packing_summary(df: DataFrame, budget: int = 256, n_shards: int = 16,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-bin fill stats: (shard, bin, n_docs, fill_tokens, waste).

    ``waste`` is the pad count for a non-overflowing bin, 0 for an
    oversized single-doc bin.
    """
    packed = pack_sequences(df, budget, n_shards, text_col, id_col)
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("fill_tokens"),
        F.greatest(
            F.lit(0).cast("bigint"),
            (F.lit(budget) - F.sum("n_tokens")).cast("bigint"),
        ).alias("waste"),
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------

_BUDGET, _SHARDS = 256, 16


def _q_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load(spark, sf_dir, "documents"),
                          budget=_BUDGET, n_shards=_SHARDS)


def _q_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing_summary(load(spark, sf_dir, "documents"),
                           budget=_BUDGET, n_shards=_SHARDS)


_PACK_CTE = f"""
  sized AS (
    SELECT (((doc_id + 1) * {_A} + {_C}) % {PRIME}) % {_SHARDS} AS shard,
           doc_id,
           CAST(len(list_filter(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               t -> t != '')) AS BIGINT) AS n_tokens
    FROM documents
  ), sharded AS (
    SELECT shard, doc_id, n_tokens,
           row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
    FROM sized
  ), pack AS (
    SELECT shard, rn, doc_id, n_tokens,
           n_tokens AS acc, CAST(0 AS BIGINT) AS bin
    FROM sharded WHERE rn = 1
    UNION ALL
    SELECT s.shard, s.rn, s.doc_id, s.n_tokens,
           CASE WHEN p.acc + s.n_tokens <= {_BUDGET}
                THEN p.acc + s.n_tokens ELSE s.n_tokens END,
           CASE WHEN p.acc + s.n_tokens <= {_BUDGET}
                THEN p.bin ELSE p.bin + 1 END
    FROM pack p
    JOIN sharded s ON s.shard = p.shard AND s.rn = p.rn + 1
  )
"""

_ORACLE_PACK = f"""
WITH RECURSIVE {_PACK_CTE}
SELECT shard, bin, doc_id, n_tokens FROM pack
"""

_ORACLE_SUMMARY = f"""
WITH RECURSIVE {_PACK_CTE}
SELECT shard, bin,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS fill_tokens,
       CAST(greatest(0, {_BUDGET} - sum(n_tokens)) AS BIGINT) AS waste
FROM pack GROUP BY 1, 2
"""

QUERIES: dict = {
    "pack_sequences_documents": (_q_pack, _ORACLE_PACK),
    "pack_summary_documents": (_q_summary, _ORACLE_SUMMARY),
}

"""Streaming bottom-k distinct sketch: the ``operators/sketch4.py``
KMV sketch maintained as per-key Structured Streaming state.

The bottom-k of a union is the bottom-k of the concatenated parts —
the exact merge identity the batch tests assert — and a micro-batch
IS a part, so folding each batch's hashes into the kept set gives
state that equals the batch sketch of all rows seen, bit-for-bit,
under ANY micro-batch split or arrival order (set-min is order-free;
no watermark needed).

State per key: one sorted int64 array of ≤ k hashes — O(k), constant
in the stream length. Hashes use the identical LCG arithmetic as the
batch operator (pure int64, no modular ambiguity), so stream and
batch agree exactly; ``tests/test_streaming_bottomk.py`` asserts the
final per-key emission of an sf0.01 replay equals the batch sketch
aggregate row-for-row.

Emission is per-batch per-key (append mode): (key, n_kept, kth_hash)
— the latest row per key is the current distinct-count register;
apply ``sketch4.bottomk_estimate``'s closed form downstream.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType,
)

from ..operators.sketch4 import A, C, K, P

__all__ = ["bottomk_stream", "OUT_SCHEMA"]

OUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("n_kept", LongType()),
    StructField("kth_hash", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("kept", ArrayType(LongType())),
])


def _hashes(ids: pd.Series, salt: int) -> np.ndarray:
    u = ids.to_numpy(dtype=np.int64)
    return (((u + 1) * A + C + salt) % P + P) % P


def make_bottomk_fn(id_col: str, k: int = K, salt: int = 7):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        kept = np.array(state.get[0], dtype=np.int64) if state.exists \
            else np.empty(0, dtype=np.int64)
        new = _hashes(pdf[id_col], salt)
        merged = np.unique(np.concatenate([kept, new]))[:k]
        state.update(([int(x) for x in merged],))
        yield pd.DataFrame({
            "key": [key[0]],
            "n_kept": [len(merged)],
            "kth_hash": [int(merged[k - 1]) if len(merged) >= k
                         else None],
        })

    return fn


def bottomk_stream(stream: DataFrame, key_col: str, id_col: str,
                   k: int = K, salt: int = 7) -> DataFrame:
    """(key, n_kept, kth_hash) per key per micro-batch — the running
    KMV register relation."""
    if not stream.isStreaming:
        raise ValueError("bottomk_stream expects a streaming DataFrame;"
                         " use operators.sketch4 for batch")
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            make_bottomk_fn(id_col, k, salt),
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

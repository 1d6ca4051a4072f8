"""Streaming Kalman local-level filter: the
``operators/stats3.kalman_level`` fold as a stateful streaming
operator — each key carries (n, level, variance) and every arriving
tick emits its filtered level.

Replay-exact contract (the VPIN pattern): the per-tick update below
is operation-for-operation the batch walk (``k = (p+q)/(p+q+r);
l += k*(v-l); p = (1-k)*(p+q)``, seeded l=v_1, p=p0), so the union
of rows emitted across any in-order micro-batch replay equals the
batch ``kalman_level`` output bit for bit
(``tests/test_streaming_kalman.py`` asserts this on an sf0.01
events replay).

State per key is O(1): three scalars. No watermark needed — the fold
is prefix-deterministic; the only ordering requirement is the same
one the batch window has (rows per key arrive in (ts, seq) order,
which the replay harness and any log-compacted source provide).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from ..operators.stats3 import KALMAN_P0, KALMAN_Q, KALMAN_R

__all__ = ["kalman_level_stream", "LEVEL_SCHEMA"]

LEVEL_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("seq", LongType()),
    StructField("level", DoubleType()),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("l", DoubleType()),
    StructField("p", DoubleType()),
])


def make_kalman_fn(ts_col: str, seq_col: str, value_col: str,
                   q: float, r: float, p0: float):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values([ts_col, seq_col], kind="mergesort",
                              ignore_index=True)
        vals = pdf[value_col].to_numpy(dtype="float64")
        if state.exists:
            n, l, p = state.get
        else:
            n, l, p = 0, None, None
        out = []
        for v in vals:  # identical tree to _kalman_walk
            v = float(v)
            if l is None:
                l, p = v, p0
            else:
                k = (p + q) / (p + q + r)
                l = l + k * (v - l)
                p = (1.0 - k) * (p + q)
            out.append(l)
        n += len(vals)
        state.update((int(n), float(l), float(p)))
        yield pd.DataFrame(
            {"key": [key[0]] * len(out),
             "seq": pdf[seq_col].astype("int64"),
             "level": out})

    return fn


def kalman_level_stream(ticks: DataFrame, key_col: str, ts_col: str,
                        seq_col: str, value_col: str,
                        q: float = KALMAN_Q, r: float = KALMAN_R,
                        p0: float = KALMAN_P0) -> DataFrame:
    """Append-mode stream of (key, seq, level) — one filtered level
    per arriving tick."""
    return (
        ticks.groupBy(key_col).applyInPandasWithState(
            make_kalman_fn(ts_col, seq_col, value_col, q, r, p0),
            outputStructType=LEVEL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Streaming VPIN: the equal-volume bucket machinery of
``operators/micro3.py::vpin`` as a stateful streaming operator —
tick-rule side classification, exact BIGINT volume-bucket cuts, and
per-bucket (buy, sell) emission the moment a bucket completes.

Replay-exact contract (the repo's streaming north star): the fold
kernel below is ONE sequential walk shared conceptually with the
batch plan — same carried last-non-zero sign, same quantized
cumulative-volume bucket id (``greatest(cum-1, 0) DIV bq``, the
clamp defining the cum=0 corner engine-portably) — so the union of
bucket rows
emitted across any micro-batch replay equals the batch
``vpin_buckets`` table minus each key's trailing (incomplete)
bucket, bit for bit. ``tests/test_streaming_vpin.py`` asserts this
on synthetic tapes and on an sf0.01 events replay.

State per key is O(1): (n, last_price, last_sign, cum_vol_q,
current_bucket, buy_q, sell_q) — seven scalars, no row buffering,
no watermark needed.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from ..operators.micro3 import QV, VPIN_BUCKET_VOL

__all__ = ["vpin_bucket_stream", "vpin_fold", "BUCKET_SCHEMA"]

BUCKET_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("bucket", LongType()),
    StructField("buy_q", LongType()),
    StructField("sell_q", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("last_p", DoubleType()),
    StructField("last_sign", LongType()),
    StructField("cum_q", LongType()),
    StructField("cur_bkt", LongType()),
    StructField("buy_q", LongType()),
    StructField("sell_q", LongType()),
])

_INIT = (0, 0.0, 0, 0, -1, 0, 0)


def vpin_fold(prices: np.ndarray, state: tuple, bq: int):
    """Sequential VPIN bucket walk. Returns (finished_buckets,
    new_state) where finished_buckets is a list of
    (bucket_id, buy_q, sell_q). Mirrors the batch plan exactly:
    tick-rule sign carried through flat ticks, rows before the first
    price move excluded, bucket id ``greatest(cum - 1, 0) DIV bq`` —
    the clamp defines the cum=0 corner identically on Spark (trunc
    DIV) and the DuckDB oracle (floor //)."""
    n, last_p, last_sign, cum, cur, buy, sell = state
    out = []
    for p in prices:
        p = float(p)
        if n > 0:
            dp = p - last_p
            if dp != 0.0:
                last_sign = 1 if dp > 0 else -1
            s = last_sign
            if s != 0:
                vq = int(round(abs(p) * QV))
                num = max(cum + vq - 1, 0)  # clamp == batch greatest()
                b = num // bq
                if cur == -1:
                    cur = b
                elif b != cur:
                    out.append((cur, buy, sell))
                    buy = sell = 0
                    cur = b
                if s == 1:
                    buy += vq
                else:
                    sell += vq
                cum += vq
        last_p = p
        n += 1
    return out, (n, last_p, last_sign, cum, cur, buy, sell)


def make_vpin_fn(ts_col: str, seq_col: str, value_col: str,
                 bucket_vol: float):
    bq = int(round(bucket_vol * QV))

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
        st = state.get if state.exists else _INIT
        finished, new_st = vpin_fold(
            pdf[value_col].to_numpy(dtype="float64"), st, bq)
        state.update(new_st)
        if finished:
            yield pd.DataFrame(
                {"key": [key[0]] * len(finished),
                 "bucket": [b for b, _, _ in finished],
                 "buy_q": [x for _, x, _ in finished],
                 "sell_q": [x for _, _, x in finished]})

    return fn


def vpin_bucket_stream(ticks: DataFrame, key_col: str, ts_col: str,
                       seq_col: str, value_col: str,
                       bucket_vol: float = VPIN_BUCKET_VOL) -> DataFrame:
    """Append-mode stream of COMPLETED equal-volume buckets
    (key, bucket, buy_q, sell_q). The trailing in-progress bucket
    stays in state until later volume pushes past it — exactly the
    bucket the batch ``vpin`` drops. Compute the VPIN score over a
    sink's contents with ``abs(buy_q - sell_q) / (buy_q + sell_q)``
    averaged per key."""
    return (
        ticks.groupBy(key_col).applyInPandasWithState(
            make_vpin_fn(ts_col, seq_col, value_col, bucket_vol),
            outputStructType=BUCKET_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

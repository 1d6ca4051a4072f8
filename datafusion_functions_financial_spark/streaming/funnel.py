"""Streaming funnel progression: the ``plans/funnel.py``
strictly-ordered funnel as a stateful streaming operator — each user
carries the first-occurrence timestamp of every step, and a row is
emitted whenever the user's funnel depth changes.

Semantics anchor (stream == batch): depth is computed from FIRST
occurrences exactly as ``funnel_conversion`` does — the user has
reached depth k iff ``t_0 < t_1 < ... < t_{k-1}`` over the minimum
timestamp per step seen SO FAR. Because every update is a per-step
``min``, the final per-user depth after any replay equals the batch
depth on the same rows regardless of how rows split into
micro-batches (min is order-free), and
``tests/test_streaming_funnel.py`` asserts the aggregated depth
counts equal ``funnel_conversion``'s output on an sf0.001 replay.

State per user is O(n_steps): one nullable BIGINT per step plus the
last emitted depth. No watermark: firsts only tighten, so depth is a
function of the set of rows seen, not of arrival order. Emission is
change-driven (append mode) — the LAST emission per user is their
current depth, and intermediate emissions preserve progression
history for downstream alerting.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType,
)

__all__ = ["funnel_stream", "depth_of", "DEPTH_SCHEMA"]

DEPTH_SCHEMA = StructType([
    StructField("user", LongType()),
    StructField("depth", LongType()),
    StructField("at_ts", LongType()),
])


def depth_of(firsts: Sequence) -> int:
    """Funnel depth of a per-step first-occurrence vector: the
    longest strictly-increasing non-null prefix chain (the
    ``funnel_conversion`` reach conditions)."""
    depth = 0
    prev = None
    for t in firsts:
        if t is None:
            break
        if prev is not None and not (t > prev):
            break
        depth += 1
        prev = t
    return depth


def _state_schema(n_steps: int) -> StructType:
    fields = [StructField(f"t{i}", LongType()) for i in range(n_steps)]
    fields.append(StructField("last_depth", LongType()))
    return StructType(fields)


def make_funnel_fn(steps: Sequence[str], type_col: str, ts_col: str):
    steps = list(steps)
    n = len(steps)
    idx = {s: i for i, s in enumerate(steps)}

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        if state.exists:
            st = list(state.get)
            firsts, last_depth = st[:n], st[n]
        else:
            firsts, last_depth = [None] * n, 0
        for s, grp in pdf.groupby(type_col):
            i = idx.get(s)
            if i is None:
                continue
            t = int(grp[ts_col].min())
            if firsts[i] is None or t < firsts[i]:
                firsts[i] = t
        depth = depth_of(firsts)
        batch_ts = int(pdf[ts_col].max())
        state.update(tuple(
            [None if t is None else int(t) for t in firsts]
            + [int(depth)]))
        if depth != last_depth:
            yield pd.DataFrame(
                {"user": [key[0]], "depth": [depth],
                 "at_ts": [batch_ts]})

    return fn


def funnel_stream(events: DataFrame, steps: Sequence[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Append-mode stream of (user, depth, at_ts) — one row per user
    per micro-batch in which their funnel depth changed."""
    return (
        events.groupBy(user_col).applyInPandasWithState(
            make_funnel_fn(steps, type_col, ts_col),
            outputStructType=DEPTH_SCHEMA,
            stateStructType=_state_schema(len(steps)),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Custom stateful streaming sessionization (gap timeout).

The streaming counterpart of the batch ``plans/analytics.py``
sessionize operator, built as an explicit ``applyInPandasWithState``
state machine rather than the native ``session_window`` aggregate:

- native ``session_window`` emits aggregate rows only when the
  watermark closes a window and supports only aggregation outputs;
- this operator owns its state (session start / last-seen / count per
  key), closes sessions EITHER in-batch (a gap observed between two
  events of the same micro-batch) OR via an event-time TIMEOUT when
  the watermark passes ``last_seen + gap`` with no new data — the
  state-store pattern any bespoke streaming operator (order tracking,
  position keeping, fraud windows) follows at scale.

Output is append-mode: one row per CLOSED session, tagged with how it
closed (``'gap'`` or ``'timeout'``). Open sessions live only in the
state store — O(1) per key, keyed by symbol (shuffle on symbol only).

The per-batch transition is vectorized: numpy diff over the sorted
event times splits the batch into runs; only the final run stays in
state. Arithmetic is integer microseconds throughout (no float time).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

SESSION_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("closed_by", StringType()),
])

_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
])


def _to_frame(symbol: str, rows: list) -> pd.DataFrame:
    return pd.DataFrame({
        "symbol": [symbol] * len(rows),
        "session_start": [pd.Timestamp(r[0], unit="us") for r in rows],
        "session_end": [pd.Timestamp(r[1], unit="us") for r in rows],
        "n_events": [r[2] for r in rows],
        "closed_by": [r[3] for r in rows],
    })


def make_sessionizer(gap_seconds: int, ts_col: str = "timestamp"):
    """Build the ``applyInPandasWithState`` function for a gap of
    ``gap_seconds``. Kept separate for direct unit testing."""
    gap_us = int(gap_seconds) * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        symbol = key[0]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _to_frame(symbol, [(start, last, n, "timeout")])
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list = []
        # The iterator yields the key's rows in arbitrary chunk order —
        # gather and sort ONCE before the transition (a micro-batch's
        # per-key slice is bounded by the trigger, not the stream).
        chunks = [
            pdf[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
            for pdf in pdfs if len(pdf)
        ]
        if chunks:
            us = np.sort(np.concatenate(chunks))
            # Continuation: a gap between the stored session and the
            # first new event closes the stored session.
            if start is not None and us[0] - last > gap_us:
                closed.append((start, last, n, "gap"))
                start, last, n = None, None, 0
            # Split the batch into runs separated by > gap.
            cuts = np.nonzero(np.diff(us) > gap_us)[0] + 1
            bounds = np.concatenate(([0], cuts, [len(us)]))
            for i in range(len(bounds) - 1):
                lo, hi = bounds[i], bounds[i + 1]
                if start is None:
                    start, last, n = int(us[lo]), int(us[hi - 1]), hi - lo
                else:
                    # Late (out-of-order) events within the gap extend
                    # the open session in BOTH directions. A late event
                    # earlier than start - gap would belong to its own
                    # prior session; retroactive session bridging is
                    # out of scope (native session_window provides it).
                    start = min(start, int(us[lo]))
                    last = max(last, int(us[hi - 1]))
                    n += hi - lo
                if i < len(bounds) - 2:  # every run but the last closes
                    closed.append((start, last, n, "gap"))
                    start, last, n = None, None, 0
        if start is not None:
            state.update((int(start), int(last), int(n)))
            # Event-time timeout: fire when the watermark passes
            # last + gap. Spark requires a timeout strictly beyond the
            # current watermark.
            timeout_ms = last // 1000 + gap_us // 1000
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(timeout_ms, wm + 1))
        elif state.exists:
            state.remove()
        if closed:
            yield _to_frame(symbol, closed)

    return fn


def sessionize_stream(
    ticks: DataFrame,
    gap_seconds: int = 300,
    watermark: str = "30 minutes",
    key_col: str = "symbol",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Closed sessions per ``key_col`` from an event stream.

    ``ticks`` must be a streaming DataFrame with an event-time
    ``ts_col``; the watermark bounds state for timeout-based closure.
    """
    return (
        ticks.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            make_sessionizer(gap_seconds, ts_col),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

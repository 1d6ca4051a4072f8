"""Stateful streaming anomaly detection: per-key running z-score
(Welford online moments) with alert emission.

The monitoring primitive between the stateless signal stream
(``streaming/spark.py``) and the sessionizer state machine
(``streaming/sessions.py``): each key carries (count, mean, M2) in the
state store — O(1) per key, exactly the bounded-state discipline a
100 TB monitoring stream needs — and every incoming value is scored
against the distribution of everything BEFORE it (prior-window
z-score, so an outlier never dampens its own alert). Alerts emit in
append mode; state never stores raw events.

Replay equality: the per-key transition is one sequential Welford
loop shared VERBATIM with the batch twin (``batch_zscore_alerts``
sorts each key and runs the same function), so a replayed stream
reproduces the batch alert set bit-for-bit —
``tests/test_streaming_anomaly.py`` asserts it. Within a micro-batch
rows are sorted by (ts, seq) before the fold, so batch boundaries
cannot reorder updates.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
    TimestampType,
)

__all__ = ["zscore_alert_stream", "batch_zscore_alerts",
           "welford_alerts", "ALERT_SCHEMA"]

ALERT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("timestamp", TimestampType()),
    StructField("seq", LongType()),
    StructField("value", DoubleType()),
    StructField("zscore", DoubleType()),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("mean", DoubleType()),
    StructField("m2", DoubleType()),
])

MIN_OBS = 10  # no alerts until the baseline has this many points


def welford_alerts(values: np.ndarray, threshold: float,
                   state: tuple[int, float, float],
                   min_obs: int = MIN_OBS):
    """Sequential Welford update over ``values``; returns
    (alert_indices, zscores, new_state). Each value is scored against
    the PRIOR moments, then folded in. Shared by the streaming and
    batch paths — the replay-equality contract."""
    n, mean, m2 = state
    idx: list[int] = []
    zs: list[float] = []
    for i, x in enumerate(values):
        if n >= min_obs and m2 > 0.0:
            std = np.sqrt(m2 / (n - 1))
            z = (x - mean) / std
            if abs(z) >= threshold:
                idx.append(i)
                zs.append(float(z))
        n += 1
        delta = x - mean
        mean += delta / n
        m2 += delta * (x - mean)
    return idx, zs, (n, mean, m2)


def make_detector(threshold: float, ts_col: str = "timestamp",
                  seq_col: str = "seq", value_col: str = "price",
                  min_obs: int = MIN_OBS):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        symbol = key[0]
        if state.hasTimedOut:  # pragma: no cover - no timeout is set
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values([ts_col, seq_col], kind="mergesort",
                              ignore_index=True)
        st = state.get if state.exists else (0, 0.0, 0.0)
        vals = pdf[value_col].to_numpy(dtype="float64")
        idx, zs, new_st = welford_alerts(vals, threshold, st, min_obs)
        state.update(new_st)
        if idx:
            out = pdf.iloc[idx][[ts_col, seq_col, value_col]].copy()
            out.insert(0, "symbol", symbol)
            out["zscore"] = zs
            out.columns = ["symbol", "timestamp", "seq", "value",
                           "zscore"]
            yield out

    return fn


def zscore_alert_stream(ticks: DataFrame, threshold: float = 4.0,
                        key_col: str = "symbol",
                        ts_col: str = "timestamp",
                        seq_col: str = "seq",
                        value_col: str = "price",
                        min_obs: int = MIN_OBS) -> DataFrame:
    """Append-mode alert stream from a streaming tick source."""
    return (
        ticks.groupBy(key_col).applyInPandasWithState(
            make_detector(threshold, ts_col, seq_col, value_col,
                          min_obs),
            outputStructType=ALERT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_zscore_alerts(ticks: DataFrame, threshold: float = 4.0,
                        key_col: str = "symbol",
                        ts_col: str = "timestamp",
                        seq_col: str = "seq",
                        value_col: str = "price",
                        min_obs: int = MIN_OBS) -> DataFrame:
    """The batch oracle: per key, the identical Welford fold over the
    fully-sorted series."""

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, seq_col], kind="mergesort",
                              ignore_index=True)
        vals = pdf[value_col].to_numpy(dtype="float64")
        idx, zs, _ = welford_alerts(vals, threshold, (0, 0.0, 0.0),
                                    min_obs)
        out = pdf.iloc[idx][[key_col, ts_col, seq_col,
                             value_col]].copy()
        out["zscore"] = zs
        out.columns = ["symbol", "timestamp", "seq", "value", "zscore"]
        return out

    return ticks.groupBy(key_col).applyInPandas(compute, ALERT_SCHEMA)

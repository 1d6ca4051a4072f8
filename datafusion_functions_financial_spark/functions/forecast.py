"""Holt linear (double) exponential smoothing — the first DOUBLE-state
recursive kernel in the repo (level + trend evolve together), the
basic short-horizon forecaster a metrics platform runs per series.

Recurrence (seeds ℓ₁ = x₁, b₁ = 0):

    ℓ_t = α·x_t + (1−α)·(ℓ_{t−1} + b_{t−1})
    b_t = β·(ℓ_t − ℓ_{t−1}) + (1−β)·b_{t−1}

``forecast_1 = ℓ + b`` is the one-step-ahead prediction.

Engine parity: a two-component accumulator cannot ride DuckDB's
``list_reduce`` (the fold state must be an element), so the oracle is
a RECURSIVE CTE stepping rn→rn+1 — one iteration per series position,
advancing EVERY series in lockstep. The Python kernel and the SQL
step use the identical floating-point expression tree (α and 1−α
appear literally the same way in both), so level/trend/forecast are
bit-identical before rounding. Cost note: the recursive oracle is
O(max series length) join iterations — fine for the gate, not the
production path (the production path IS this Spark kernel).

Plan shape at scale: one hash shuffle on the series key into one
Arrow-batched ``applyInPandas`` pass — the same shape as the
reference-exact EMA/RSI kernels; the kernel is O(n) per series with
O(1) state.

Reference anchor: extends the recursive-indicator family of
src/lib.rs (the reference stops at single-state recurrences).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["holt_kernel", "holt_smooth"]

ALPHA = 0.2
BETA = 0.1


def holt_kernel(values: np.ndarray, alpha: float = ALPHA,
                beta: float = BETA):
    """(level, trend) arrays for one series in arrival order."""
    n = values.shape[0]
    lvl_out = np.empty(n)
    trd_out = np.empty(n)
    if n == 0:
        return lvl_out, trd_out
    one_minus_a = 1.0 - alpha
    one_minus_b = 1.0 - beta
    lvl = values[0]
    trd = 0.0
    lvl_out[0], trd_out[0] = lvl, trd
    for i in range(1, n):
        x = values[i]
        lvl_new = alpha * x + one_minus_a * (lvl + trd)
        trd = beta * (lvl_new - lvl) + one_minus_b * trd
        lvl = lvl_new
        lvl_out[i], trd_out[i] = lvl, trd
    return lvl_out, trd_out


def holt_fold2d(M: np.ndarray, alpha: float = ALPHA,
                beta: float = BETA, lengths: np.ndarray | None = None):
    """Row-parallel ``holt_kernel`` over a NaN-padded (G, L) matrix:
    one vectorized step per time index instead of a Python loop per
    series. Per-element op sequence is identical to the scalar kernel
    — bit-identical results (tested), INCLUDING null semantics: an
    in-series NaN propagates to every later level/trend exactly like
    the scalar kernel and the recursive-CTE oracle (ADVICE r05 —
    earlier versions held state across NaNs because pad slots and
    data NaNs were indistinguishable). ``lengths`` (per-row series
    length) separates the two: positions ``>= lengths[g]`` are pad
    (state frozen, output NaN); positions inside the series do plain
    arithmetic, so a data NaN poisons the fold from there on. With
    ``lengths=None`` every column is treated as data."""
    G, L = M.shape
    lvl_out = np.full((G, L), np.nan)
    trd_out = np.full((G, L), np.nan)
    if L == 0 or G == 0:
        return lvl_out, trd_out
    if lengths is None:
        lengths = np.full(G, L, dtype=np.int64)
    one_minus_a = 1.0 - alpha
    one_minus_b = 1.0 - beta
    # Position 0 mirrors the scalar kernel exactly: level echoes the
    # first value (NaN included), trend is 0.0 — a NaN first value
    # poisons the fold from position 1 via plain arithmetic.
    nonempty = lengths > 0
    lvl = M[:, 0].copy()
    trd = np.where(nonempty, 0.0, np.nan)
    lvl_out[:, 0] = np.where(nonempty, lvl, np.nan)
    trd_out[:, 0] = np.where(nonempty, 0.0, np.nan)
    for i in range(1, L):
        x = M[:, i]
        is_data = i < lengths
        lvl_new = alpha * x + one_minus_a * (lvl + trd)
        trd_new = beta * (lvl_new - lvl) + one_minus_b * trd
        lvl = np.where(is_data, lvl_new, lvl)
        trd = np.where(is_data, trd_new, trd)
        lvl_out[:, i] = np.where(is_data, lvl_new, np.nan)
        trd_out[:, i] = np.where(is_data, trd_new, np.nan)
    return lvl_out, trd_out


def holt_smooth(df: DataFrame, value_col: str, keys: Sequence[str],
                order: Sequence[str], alpha: float = ALPHA,
                beta: float = BETA) -> DataFrame:
    """Append ``level``, ``trend``, ``forecast_1`` per series.

    Partition-packed execution (the ``with_indicators`` pattern): one
    shuffle on the series key, every series in a partition folded in
    LOCKSTEP by ``holt_fold2d`` — one Arrow round-trip per partition
    instead of one Python call per series (measured 2.4 s → sub-second
    on the 1500-series events table at sf0.1)."""
    keys = list(keys)
    order = list(order)
    out_schema = StructType(
        df.schema.fields
        + [StructField("level", DoubleType(), True),
           StructField("trend", DoubleType(), True)]
    )

    def compute_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = (pd.concat(pdfs, ignore_index=True)
               if len(pdfs) > 1 else pdfs[0])
        if len(pdf) == 0:
            return
        kcols = pdf[keys]
        shifted = kcols.shift()
        changed = (
            (kcols.ne(shifted) & ~(kcols.isna() & shifted.isna()))
            .any(axis=1).to_numpy()
        )
        changed[0] = True
        starts = np.flatnonzero(changed)
        ends = np.append(starts[1:], len(pdf))
        arr = pdf[value_col].to_numpy(dtype=np.float64,
                                      na_value=np.nan)
        segs = [arr[st:en] for st, en in zip(starts, ends)]
        lens = np.array([s.shape[0] for s in segs], dtype=np.int64)
        maxlen = int(lens.max()) if len(lens) else 0
        M = np.full((len(segs), maxlen), np.nan)
        for g, s in enumerate(segs):
            M[g, : s.shape[0]] = s
        L2, T2 = holt_fold2d(M, alpha, beta, lengths=lens)
        lvl = np.full(len(pdf), np.nan)
        trd = np.full(len(pdf), np.nan)
        for g, (st, en) in enumerate(zip(starts, ends)):
            lvl[st:en] = L2[g, : en - st]
            trd[st:en] = T2[g, : en - st]
        pdf["level"] = lvl
        pdf["trend"] = trd
        yield pdf

    out = (
        df.repartition(*keys)
        .sortWithinPartitions(*keys, *order)
        .mapInPandas(compute_partition, out_schema)
    )
    return out.withColumn("forecast_1",
                          F.col("level") + F.col("trend"))


# --------------------------------------------------------------------------
# Gate query
# --------------------------------------------------------------------------


def _q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = holt_smooth(load(spark, sf_dir, "events"), "value",
                      ["user_id"], ["ts", "event_id"])
    return out.select(
        "user_id", "event_id",
        round_portable(F.col("level")).alias("level"),
        round_portable(F.col("trend")).alias("trend"),
        round_portable(F.col("forecast_1")).alias("forecast_1"),
    )


_A, _B = "0.2", "0.1"
_LVL_STEP = f"{_A}*b.value + (1.0 - {_A})*(h.lvl + h.trd)"

_ORACLE_HOLT = f"""
WITH RECURSIVE base AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), holt AS (
  SELECT user_id, event_id, value, rn,
         value AS lvl, CAST(0.0 AS DOUBLE) AS trd
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.event_id, b.value, b.rn,
         {_LVL_STEP} AS lvl,
         {_B}*(({_LVL_STEP}) - h.lvl) + (1.0 - {_B})*h.trd AS trd
  FROM base b JOIN holt h
    ON b.user_id = h.user_id AND b.rn = h.rn + 1
)
SELECT user_id, event_id,
  {round_portable_duck("lvl")} AS level,
  {round_portable_duck("trd")} AS trend,
  {round_portable_duck("lvl + trd")} AS forecast_1
FROM holt
"""


QUERIES: dict = {
    "q_holt_forecast_events": (_q_holt, _ORACLE_HOLT),
}

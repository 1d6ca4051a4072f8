"""Stream-stream interval join: enrich a trade stream with the quote
stream's updates from a bounded look-back window.

The missing piece between the stateless signal stream
(``streaming/spark.py``) and the stateful sessionizer
(``streaming/sessions.py``): joining TWO unbounded sources. Spark's
stream-stream join needs (a) watermarks on both sides and (b) a
time-range join condition so state can be evicted; this module wires
both and exposes the identical-expression batch twin for the
replay-equality bar every streaming surface here is held to
(``tests/test_streaming_joins.py``).

Semantics: INTERVAL join — each trade pairs with EVERY quote of the
same key from ``(trade_ts - max_lag, trade_ts]``. The "latest quote
per trade" (as-of) reduction is a downstream ``max_by`` over the
joined relation (batch: ``operators/asof.py`` does it in one pass;
streaming emits the interval pairs and lets the consumer reduce,
because an aggregation after a stream-stream join would hold back
results by another watermark delay).

State scale: each side buffers only rows younger than
watermark + max_lag per key — O(active keys × rate × window), evicted
by the watermark like the sessionizer's state. The join itself hash
partitions both streams on the key: one co-partitioned exchange per
side, exactly like the batch shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join_stream", "interval_join_batch"]


def _cond(key_col: str, left_ts: str, right_ts: str, max_lag: str):
    return (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}")
           > F.expr(f"l.{left_ts} - INTERVAL {max_lag}"))
    )


def _project(joined: DataFrame, key_col: str,
             left_cols, right_cols) -> DataFrame:
    keep = [F.col(f"l.{key_col}").alias(key_col)]
    keep += [F.col(f"l.{c}").alias(c) for c in left_cols]
    keep += [F.col(f"r.{c}").alias(c) for c in right_cols]
    return joined.select(*keep)


def interval_join_stream(left: DataFrame, right: DataFrame,
                         key_col: str, left_ts: str, right_ts: str,
                         left_cols, right_cols,
                         max_lag: str = "30 seconds",
                         watermark: str = "1 minute") -> DataFrame:
    """Watermarked stream-stream inner interval join (see module doc).
    ``left``/``right`` must be streaming DataFrames; output is
    append-mode capable."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    joined = lw.join(rw, _cond(key_col, left_ts, right_ts, max_lag))
    return _project(joined, key_col, left_cols, right_cols)


def interval_join_batch(left: DataFrame, right: DataFrame,
                        key_col: str, left_ts: str, right_ts: str,
                        left_cols, right_cols,
                        max_lag: str = "30 seconds") -> DataFrame:
    """The batch oracle: identical join predicate minus watermarks."""
    joined = left.alias("l").join(
        right.alias("r"), _cond(key_col, left_ts, right_ts, max_lag))
    return _project(joined, key_col, left_cols, right_cols)

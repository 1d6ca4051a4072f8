"""Streaming distinct-count via the deterministic HLL sketch.

``operators/sketch.py``'s register table is a plain
``groupBy(bucket).agg(max(rho))`` — exactly the shape Structured
Streaming maintains incrementally as stateful aggregation state. That
gives a streaming cardinality estimator with properties the built-in
``approx_count_distinct`` cannot offer:

- **bounded state**: at most ``2^p`` register rows per group, forever,
  regardless of stream length — no watermark needed because the state
  never grows past the register count;
- **replay-exact**: the hash is the repo-standard integer arithmetic,
  so restarting from a checkpoint, re-running the batch job, or
  running the DuckDB oracle over the same data produces the SAME
  estimate bit-for-bit (asserted in tests);
- **mergeable**: the streaming state IS the batch register table —
  union a live stream's sketch with historical shards via
  ``operators.sketch.merge_registers``.

Usage: ``hll_register_stream`` builds the streaming register
aggregation (run it with ``outputMode("complete")`` into a sink);
``estimate_from_registers`` turns any register table — streaming sink
contents or batch — into the estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sketch import (  # noqa: F401  (re-exported surface)
    M,
    P,
    _estimate_from_registers,
    hll_registers,
    merge_registers,
)

__all__ = ["hll_register_stream", "estimate_from_registers",
           "merge_registers"]


def hll_register_stream(stream_df: DataFrame, value_expr: str,
                        group_cols: tuple = ()) -> DataFrame:
    """Streaming register table for a streaming DataFrame: identical
    plan to the batch ``hll_registers`` (one stateful max-aggregation);
    Structured Streaming keeps <= 2^p rows of state per group."""
    if not stream_df.isStreaming:
        raise ValueError(
            "hll_register_stream expects a streaming DataFrame; "
            "use operators.sketch.hll_registers for batch"
        )
    return hll_registers(stream_df, value_expr, group_cols)


def estimate_from_registers(reg: DataFrame,
                            group_cols: tuple = ()) -> DataFrame:
    """(group..., approx_distinct) from a register table (streaming
    sink contents or batch)."""
    return _estimate_from_registers(reg, group_cols)

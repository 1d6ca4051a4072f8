"""Streaming heavy hitters via the deterministic Count-Min sketch.

``operators/sketch2.py``'s CMS cell table is a plain
``groupBy(row_j, col).agg(sum(w))`` — exactly the shape Structured
Streaming maintains incrementally as stateful aggregation state (the
same argument as ``cardinality.py``'s HLL registers):

- **bounded state**: at most d·w cell rows per group forever (2048 at
  the default 4×512) — no watermark needed, state never grows;
- **replay-exact**: cell hashing is the repo-standard integer
  arithmetic, so the streaming state equals the batch sketch over the
  same data bit-for-bit (asserted in tests), and equals the DuckDB
  oracle of the batch gate query;
- **mergeable**: the streaming state IS the batch cell table — union
  a live stream's cells with historical shards via
  ``operators.sketch2.cms_merge`` (counters are additive).

Usage: ``cms_cell_stream`` builds the streaming cell aggregation (run
with ``outputMode("complete")`` into a sink); estimate any candidate
set's counts from the sink contents with
``operators.sketch2.cms_estimate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sketch2 import (  # noqa: F401  (re-exported surface)
    CMS_D,
    CMS_W,
    cms_build,
    cms_estimate,
    cms_merge,
)

__all__ = ["cms_cell_stream", "cms_estimate", "cms_merge"]


def cms_cell_stream(stream_df: DataFrame, value_expr: str,
                    weight_expr: str = "1L",
                    group_cols: tuple = ()) -> DataFrame:
    """Streaming CMS cell table for a streaming DataFrame: identical
    plan to the batch ``cms_build`` (one stateful sum-aggregation);
    Structured Streaming keeps ≤ d·w rows of state per group."""
    if not stream_df.isStreaming:
        raise ValueError(
            "cms_cell_stream expects a streaming DataFrame; "
            "use operators.sketch2.cms_build for batch"
        )
    return cms_build(stream_df, value_expr, weight_expr, group_cols)

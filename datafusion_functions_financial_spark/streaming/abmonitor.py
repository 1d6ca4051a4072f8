"""Streaming experiment-assignment monitor: running per-arm unit
counts as Structured Streaming state (2 rows — O(1) forever), scored
with the batch SRM closed form on the sink contents. Sample-ratio
mismatch is the guardrail you want DURING the ramp, not after: a
broken assignment burns the whole experiment, and the z-score is
computable from nothing but the running counts.

Counts are order-free sums, so the stream state after any replay
equals the batch arm counts exactly (the digest/bottom-k replay bar,
asserted at sf0.01), and ``score_srm`` applied to the sink contents
equals ``operators.abtest.srm_check`` on the same rows bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.series import round_portable

__all__ = ["arm_counts_stream", "score_srm"]


def arm_counts_stream(stream: DataFrame, arm_expr: str) -> DataFrame:
    """(arm, n): running unit counts per arm (complete/update mode;
    state is one row per arm)."""
    if not stream.isStreaming:
        raise ValueError("arm_counts_stream expects a streaming "
                         "DataFrame; use operators.abtest for batch")
    return (
        stream.selectExpr(f"({arm_expr}) AS arm")
        .groupBy("arm")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def score_srm(counts: DataFrame) -> DataFrame:
    """(n_a, n_b, z_srm, srm_flag) from an (arm, n) relation — the
    identical closed form as ``operators.abtest.srm_check``."""
    s = counts.agg(
        F.sum(F.expr("CASE WHEN arm = 0 THEN n ELSE 0 END"))
        .cast("bigint").alias("na"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN n ELSE 0 END"))
        .cast("bigint").alias("nb"),
    )
    z = "(CAST(na - nb AS DOUBLE) / sqrt(CAST(na + nb AS DOUBLE)))"
    return s.select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        round_portable(F.expr(z), 6).alias("z_srm"),
        F.expr(f"CAST(CASE WHEN abs({z}) > 3.0 THEN 1 ELSE 0 END "
               "AS BIGINT)").alias("srm_flag"),
    )

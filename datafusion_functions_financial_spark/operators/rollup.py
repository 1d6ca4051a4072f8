"""Incremental time-bucket rollup (continuous-aggregate maintenance).

The hypertable/materialized-rollup pattern: an hourly bar table is kept
alongside the raw stream, and arriving data updates ONLY the buckets it
touches — the 100 TB property is that maintenance cost scales with the
delta, not with history.

Everything here is algebraic-aggregate state (SUM/COUNT/MIN/MAX as the
bar partial; AVG derived at read time), so merging is exact:

    merge(bar_partial(A), bar_partial(B)) == bar_partial(A ∪ B)

for any split of the input — which is precisely what the oracle gate
asserts: bars built from history, then incrementally merged with a
delta, must equal a single full recompute over everything (DuckDB runs
the full GROUP BY).

Plan shape (``incremental_rollup``):
- the delta is rolled up alone (small: one shuffle over delta keys);
- touched buckets are found from the delta partials (tiny key set);
- untouched bars pass through via broadcast LEFT ANTI join — history
  is never rescanned and never reshuffled;
- only the touched (bar, delta-partial) rows — proportional to the
  delta — go through the final merge aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

US_HOUR = 3600 * 1_000_000

# Bar-state columns: the algebraic partial for each (key, bucket).
_STATE = ("n", "sum_cents", "min_cents", "max_cents")


def bar_partials(
    events: DataFrame,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",          # epoch-ns long (nanosAsLong)
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Roll raw events up into per-(key, bucket) algebraic bar state.
    Values scale to integer cents so every partial is exact and the
    merge below is bit-deterministic regardless of split or order."""
    us_bucket = bucket_seconds * 1_000_000
    cents = "CAST(round(value * 100) AS BIGINT)".replace("value", value_col)
    return (
        events.withColumn(
            "bucket_start",
            F.expr(f"(({ts_col} DIV 1000) DIV {us_bucket})")
            * F.lit(bucket_seconds),
        )
        .groupBy(*keys, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(cents)).alias("sum_cents"),
            F.min(F.expr(cents)).alias("min_cents"),
            F.max(F.expr(cents)).alias("max_cents"),
        )
    )


def merge_bar_partials(
    bars: DataFrame,
    delta_bars: DataFrame,
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Exact algebraic merge of two bar-partial tables (n/sum add,
    min/max combine). Correct for any overlap, including buckets
    present on only one side."""
    group = [*keys, "bucket_start"]
    return (
        bars.unionByName(delta_bars)
        .groupBy(*group)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )


def incremental_rollup(
    bars: DataFrame,
    new_events: DataFrame,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Maintain a bar table against a batch of new events, touching
    only the buckets the delta lands in.

    History (``bars``) is split by a broadcast [anti|semi] join on the
    delta's (key, bucket) set: untouched bars stream through unchanged
    (no shuffle, no re-aggregation); touched bars merge with the delta
    partials. Cost scales with the delta, not the bar history.
    """
    group = [*keys, "bucket_start"]
    delta = bar_partials(
        new_events, keys=keys, ts_col=ts_col, value_col=value_col,
        bucket_seconds=bucket_seconds,
    )
    touched = delta.select(*group).distinct()
    untouched = bars.join(F.broadcast(touched), on=group, how="left_anti")
    affected = bars.join(F.broadcast(touched), on=group, how="left_semi")
    merged = merge_bar_partials(affected, delta, keys=keys)
    return untouched.unionByName(merged)


def maintain_partitioned_bars(
    spark: SparkSession,
    bars_path: str,
    new_events: DataFrame,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> list[str]:
    """Maintain an on-disk bar table partitioned by ``bucket_date``,
    rewriting ONLY the date partitions the delta touches.

    This is the durable form of :func:`incremental_rollup`:

    1. roll the delta up alone;
    2. collect its distinct bucket dates (driver-side, bounded by the
       delta's calendar span — days, not rows);
    3. read back ONLY those partitions (partition pruning: untouched
       dates are never scanned);
    4. merge and write with dynamic partition overwrite, which
       replaces exactly the touched date directories on disk.

    Returns the list of rewritten partition dates. Requires
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set here for
    the write, restored after).
    """
    group = [*keys, "bucket_start"]
    delta = bar_partials(
        new_events, keys=keys, ts_col=ts_col, value_col=value_col,
        bucket_seconds=bucket_seconds,
    ).withColumn(
        "bucket_date",
        F.to_date(F.timestamp_seconds(F.col("bucket_start"))),
    )
    touched = sorted(
        str(r[0]) for r in delta.select("bucket_date").distinct().collect()
    )
    if not touched:
        return []
    existing = (
        spark.read.parquet(bars_path)
        .filter(F.col("bucket_date").isin(touched))
        .drop("bucket_date")
    )
    merged = merge_bar_partials(
        existing, delta.drop("bucket_date"), keys=keys
    ).withColumn(
        "bucket_date",
        F.to_date(F.timestamp_seconds(F.col("bucket_start"))),
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition(*[F.col(c) for c in ("bucket_date",)])
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(bars_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return touched


# --------------------------------------------------------------------------
# Driver gate: bars(history) + delta, merged incrementally, must equal
# one full recompute over all events (the DuckDB oracle's GROUP BY).
# The cutoff is mid-hour so the boundary bucket genuinely exercises the
# merge path (history partial + delta partial in the same bucket).
# --------------------------------------------------------------------------

# 2024-01-20 12:30:00 UTC, in epoch-µs (events span 2024-01-01..30).
_CUTOFF_US = 1_705_753_800_000_000
_CUTOFF_NS = _CUTOFF_US * 1000


def _q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    history = events.filter(F.expr(f"ts < {_CUTOFF_NS}"))
    delta = events.filter(F.expr(f"ts >= {_CUTOFF_NS}"))
    bars = bar_partials(history)
    out = incremental_rollup(bars, delta)
    return out.selectExpr(
        "event_type", "bucket_start", "n", "sum_cents",
        "min_cents", "max_cents",
        "sum_cents / CAST(100 * n AS DOUBLE) AS avg_value",
    )


_ORACLE_INCREMENTAL_ROLLUP = f"""
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // {US_HOUR}) * 3600 AS bucket_start,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, bucket_start,
       count(*) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       min(cents) AS min_cents,
       max(cents) AS max_cents,
       CAST(sum(cents) AS BIGINT) / CAST(100 * count(*) AS DOUBLE)
         AS avg_value
FROM e
GROUP BY event_type, bucket_start
"""


QUERIES: dict = {
    "rollup_incremental_events": (
        _q_incremental_rollup, _ORACLE_INCREMENTAL_ROLLUP,
    ),
}

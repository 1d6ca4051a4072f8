"""Write sinks for pipeline outputs (beyond-reference: the crate never
writes, SURVEY §2.C — a usable engine must).

Layout conventions for 100 TB pipelines:

- **Partition by coarse pruning keys** (date, asset class): partition
  pruning turns time-range queries into directory listings. Never
  partition by high-cardinality keys (ticker, doc id) — small-file
  explosion.
- **Bucket by join/series keys** (ticker, orderkey): bucketed tables
  delete the shuffle for joins and for `with_indicators` series
  grouping (see tests/test_bucketed_join.py).
- **Size files** via a pre-write repartition on the partition columns
  so each output partition writes a handful of well-sized files
  instead of `shuffle.partitions` shards.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

__all__ = ["write_partitioned", "write_bucketed_table"]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    coalesce_per_partition: bool = True,
    format: str = "parquet",
) -> None:
    """Write a partitioned dataset with file-count hygiene."""
    partition_by = list(partition_by)
    out = df
    if partition_by and coalesce_per_partition:
        # One shuffle so each Hive partition is written by few tasks
        # (avoids shuffle.partitions x partitions tiny files).
        out = df.repartition(*partition_by)
    writer = out.write.mode(mode).format(format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) managed table —
    pre-shuffled storage that co-locates joins/groupBys on the bucket
    key (requires the metastore path, hence saveAsTable)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)

"""Input-parallelism guard for Python-UDF hashing passes.

A small parquet input (one row group) arrives as ONE scan partition, so
any per-row Python work downstream — MinHash/SimHash fused hashing,
feature extraction — runs as a single task no matter how many cores the
cluster has. Worse, an eager ``localCheckpoint`` of that stage puts the
serial task on the critical path (r03's LSH bench regression: the
checkpoint serialized a 1-task UDF pass that previously at least ran
its recomputed branches concurrently).

``ensure_min_parallelism`` repartitions ONLY when the plan has fewer
partitions than the session's default parallelism. At production scale
(thousands of scan partitions per 100 TB table) it is a no-op — no
shuffle is added; on small inputs it spreads the expensive Python pass
across all cores for the cost of shuffling a few MB of raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_parallelism"]


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``target`` partitions (default:
    ``sparkContext.defaultParallelism``) iff it currently has fewer.

    Checking the partition count forces physical planning of the scan
    (cheap — file listing only, no job); it does NOT execute the plan.
    """
    sc = df.sparkSession.sparkContext
    if target is None:
        target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

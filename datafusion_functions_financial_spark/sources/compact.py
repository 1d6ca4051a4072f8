"""Small-file compaction for parquet datasets written by streaming /
incremental jobs.

Micro-batch sinks and per-shard writers leave partitions littered with
kilobyte files; at 100 TB the scan's task count (and the NameNode /
object-store listing cost) is dominated by file COUNT, not bytes.
This module plans deterministic merge groups (first-fit-decreasing
bin packing toward a target file size) and rewrites only the
under-sized files — right-sized files are never touched, so repeated
compaction converges and touches O(new small files).

The rewrite is filesystem-level and NOT transactional (concurrent
readers can see a partial state during the swap) — table formats with
snapshot isolation should use their native compaction; this is the
raw-directory equivalent for plain parquet lakes, and the tests pin
the row-preservation contract.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

__all__ = ["CompactionPlan", "plan_compaction", "compact_directory"]

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


@dataclass(frozen=True)
class CompactionPlan:
    """Merge groups (each a list of file paths) plus the files left
    untouched. Deterministic for a given directory state."""

    groups: tuple[tuple[str, ...], ...]
    untouched: tuple[str, ...]

    @property
    def n_files_before(self) -> int:
        return sum(len(g) for g in self.groups) + len(self.untouched)

    @property
    def n_files_after(self) -> int:
        return len(self.groups) + len(self.untouched)


def plan_compaction(file_sizes: dict[str, int],
                    target_bytes: int = DEFAULT_TARGET_BYTES,
                    small_fraction: float = 0.5) -> CompactionPlan:
    """First-fit-decreasing bin packing of the under-sized files.

    Files >= ``small_fraction * target_bytes`` are already right-sized
    and stay untouched. The rest pack greedily (size desc, path asc
    tiebreak — fully deterministic) into bins capped at
    ``target_bytes``. A single-file group would be a pointless rewrite,
    so singletons go back to untouched.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    cutoff = small_fraction * target_bytes
    small = sorted(
        ((p, s) for p, s in file_sizes.items() if s < cutoff),
        key=lambda kv: (-kv[1], kv[0]),
    )
    untouched = [p for p, s in file_sizes.items() if s >= cutoff]
    bins: list[list] = []  # [files, total_bytes]
    for p, s in small:
        for b in bins:
            if b[1] + s <= target_bytes:
                b[0].append(p)
                b[1] += s
                break
        else:
            bins.append([[p], s])
    groups = []
    for files, _sz in bins:
        if len(files) > 1:
            groups.append(tuple(files))
        else:
            untouched.extend(files)
    return CompactionPlan(tuple(groups), tuple(sorted(untouched)))


def _local_parquet_sizes(path: str) -> dict[str, int]:
    out = {}
    for name in os.listdir(path):
        if name.endswith(".parquet") and not name.startswith("."):
            full = os.path.join(path, name)
            out[full] = os.path.getsize(full)
    return out


def compact_directory(spark: SparkSession, path: str,
                      target_bytes: int = DEFAULT_TARGET_BYTES,
                      small_fraction: float = 0.5,
                      dry_run: bool = False) -> CompactionPlan:
    """Compact one (local) parquet directory in place.

    Each merge group is read and rewritten as ONE file (coalesce(1) —
    the group was sized to a single target file), staged under a temp
    dir, then swapped in; originals are removed only after the staged
    write succeeds. Returns the executed (or planned, if ``dry_run``)
    plan."""
    plan = plan_compaction(_local_parquet_sizes(path), target_bytes,
                           small_fraction)
    if dry_run or not plan.groups:
        return plan
    for group in plan.groups:
        staging = os.path.join(path, f"_compact_{uuid.uuid4().hex}")
        (spark.read.parquet(*group).coalesce(1)
         .write.mode("overwrite").parquet(staging))
        part_files = [f for f in os.listdir(staging)
                      if f.endswith(".parquet")]
        assert len(part_files) == 1, part_files
        merged = os.path.join(
            path, f"compacted-{uuid.uuid4().hex}.parquet")
        os.replace(os.path.join(staging, part_files[0]), merged)
        shutil.rmtree(staging)
        for original in group:
            os.remove(original)
    return plan

"""Manifest-audited parquet snapshots: write a dataset together with
a ``_MANIFEST.json`` recording exactly what was written (row count,
schema DDL, per-file row counts and sizes), and validate a snapshot
against its manifest later.

Why: a 100-TB pipeline hands datasets between teams as directory
snapshots; "did the copy/transfer/retention job lose a file" must be
answerable WITHOUT re-reading the data. The manifest makes the check
O(footers): per-file row counts come from parquet metadata (no data
scan), so validation of a multi-TB snapshot reads a few KB per file.

The manifest is written AFTER the data (write, then enumerate) so a
crashed writer leaves a missing manifest — detectably incomplete —
never a manifest describing files that do not exist.

Counts are exact; validation re-derives them from the current footers
and compares. Schema comparison uses Spark's DDL string (stable and
engine-readable).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_with_manifest", "validate_manifest",
           "ManifestCheck"]

MANIFEST_NAME = "_MANIFEST.json"


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _footer_rows(fp: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(fp).metadata.num_rows


def write_with_manifest(df: DataFrame, path: str,
                        mode: str = "error") -> dict:
    """Write ``df`` as parquet at ``path`` plus ``_MANIFEST.json``;
    returns the manifest dict. Per-file row counts come from the
    parquet footers (no second data scan)."""
    df.write.mode(mode).parquet(path)
    files = []
    total = 0
    for fp in _parquet_files(path):
        rows = _footer_rows(fp)
        total += rows
        files.append({
            "name": os.path.relpath(fp, path),
            "rows": rows,
            "bytes": os.path.getsize(fp),
        })
    manifest = {
        "format": "parquet",
        "row_count": total,
        "n_files": len(files),
        "schema_ddl": df.schema.simpleString(),
        "files": files,
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


@dataclass
class ManifestCheck:
    ok: bool
    errors: list[str] = field(default_factory=list)
    manifest_rows: int = 0
    actual_rows: int = 0


def validate_manifest(spark: SparkSession, path: str) -> ManifestCheck:
    """Footer-only validation of a snapshot against its manifest:
    missing/extra files, per-file row drift, total row count, and
    schema DDL drift are each reported as distinct errors."""
    mpath = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mpath):
        return ManifestCheck(False, ["manifest missing"], 0, 0)
    with open(mpath) as fh:
        manifest = json.load(fh)
    errors: list[str] = []
    declared = {f["name"]: f for f in manifest["files"]}
    actual = {os.path.relpath(fp, path): fp
              for fp in _parquet_files(path)}
    for name in sorted(set(declared) - set(actual)):
        errors.append(f"missing file: {name}")
    for name in sorted(set(actual) - set(declared)):
        errors.append(f"extra file: {name}")
    total = 0
    for name in sorted(set(declared) & set(actual)):
        rows = _footer_rows(actual[name])
        total += rows
        if rows != declared[name]["rows"]:
            errors.append(
                f"row drift in {name}: manifest "
                f"{declared[name]['rows']}, actual {rows}")
    if not (set(declared) - set(actual)) and \
            total != manifest["row_count"]:
        errors.append(
            f"total rows: manifest {manifest['row_count']}, "
            f"actual {total}")
    # A snapshot that cannot even be READ (mixed physical schemas,
    # corrupt footer mix) is a validation failure, not a crash.
    try:
        ddl = spark.read.parquet(path).schema.simpleString()
    except Exception as exc:  # noqa: BLE001 — reported, not swallowed
        errors.append(f"unreadable snapshot: {type(exc).__name__}")
        ddl = None
    if ddl is not None and ddl != manifest["schema_ddl"]:
        errors.append(
            f"schema drift: manifest {manifest['schema_ddl']}, "
            f"actual {ddl}")
    return ManifestCheck(not errors, errors,
                         manifest["row_count"], total)

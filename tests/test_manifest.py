"""Manifest-audited snapshots: write+validate round trip, and each
corruption class (missing file, extra file, row drift via file swap,
schema drift) is detected with a distinct error."""

import os
import shutil

from datafusion_functions_financial_spark.sources.manifest import (
    MANIFEST_NAME, validate_manifest, write_with_manifest,
)
from datafusion_functions_financial_spark.sources.tables import load


def _snapshot(spark, sf_dir, tmp_path, name="snap"):
    df = load(spark, sf_dir, "orders").repartition(3)
    path = str(tmp_path / name)
    manifest = write_with_manifest(df, path)
    return df, path, manifest


def test_round_trip_validates(spark, sf_dir, tmp_path):
    df, path, manifest = _snapshot(spark, sf_dir, tmp_path)
    assert manifest["row_count"] == df.count()
    assert manifest["n_files"] == 3
    chk = validate_manifest(spark, path)
    assert chk.ok and chk.errors == []
    assert chk.actual_rows == manifest["row_count"]


def test_missing_file_detected(spark, sf_dir, tmp_path):
    _, path, manifest = _snapshot(spark, sf_dir, tmp_path)
    victim = os.path.join(path, manifest["files"][0]["name"])
    os.remove(victim)
    chk = validate_manifest(spark, path)
    assert not chk.ok
    assert any(e.startswith("missing file") for e in chk.errors)


def test_extra_file_detected(spark, sf_dir, tmp_path):
    _, path, manifest = _snapshot(spark, sf_dir, tmp_path)
    src = os.path.join(path, manifest["files"][0]["name"])
    shutil.copy(src, os.path.join(path, "part-extra.parquet"))
    chk = validate_manifest(spark, path)
    assert not chk.ok
    assert any(e.startswith("extra file") for e in chk.errors)


def test_row_drift_detected(spark, sf_dir, tmp_path):
    """Rewrite one data file with fewer rows (footer-level drift)."""
    import pyarrow.parquet as pq

    _, path, manifest = _snapshot(spark, sf_dir, tmp_path)
    victim = os.path.join(path, manifest["files"][0]["name"])
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, 1), victim)
    chk = validate_manifest(spark, path)
    assert not chk.ok
    assert any("row drift" in e for e in chk.errors)


def test_schema_drift_detected(spark, sf_dir, tmp_path):
    _, path, manifest = _snapshot(spark, sf_dir, tmp_path)
    import json
    mpath = os.path.join(path, MANIFEST_NAME)
    m = json.load(open(mpath))
    m["schema_ddl"] = m["schema_ddl"].replace("o_orderkey", "renamed")
    json.dump(m, open(mpath, "w"))
    chk = validate_manifest(spark, path)
    assert not chk.ok
    assert any("schema drift" in e for e in chk.errors)


def test_no_manifest_is_an_error(spark, sf_dir, tmp_path):
    _, path, _ = _snapshot(spark, sf_dir, tmp_path)
    os.remove(os.path.join(path, MANIFEST_NAME))
    chk = validate_manifest(spark, path)
    assert not chk.ok and chk.errors == ["manifest missing"]

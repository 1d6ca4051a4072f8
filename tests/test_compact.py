"""Small-file compaction (sources/compact.py): plan determinism, the
single-target-file invariant, and row preservation through a rewrite."""

import os

import pytest

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.sources.compact import (
    CompactionPlan, compact_directory, plan_compaction,
)


def test_plan_packs_small_files_and_keeps_big_ones():
    sizes = {"/d/big.parquet": 200, "/d/a.parquet": 40,
             "/d/b.parquet": 40, "/d/c.parquet": 30,
             "/d/d.parquet": 10}
    plan = plan_compaction(sizes, target_bytes=100, small_fraction=0.5)
    # big (200 >= 50) untouched; a+b+d pack to 90, c alone -> singleton
    # returns to untouched
    assert plan.n_files_before == 5
    flat = {p for g in plan.groups for p in g}
    assert "/d/big.parquet" not in flat
    assert all(sum(sizes[p] for p in g) <= 100 for g in plan.groups)
    assert all(len(g) > 1 for g in plan.groups)
    assert plan.n_files_after < plan.n_files_before


def test_plan_is_deterministic():
    sizes = {f"/d/f{i}.parquet": 10 + (i * 7) % 23 for i in range(20)}
    a = plan_compaction(sizes, target_bytes=60)
    b = plan_compaction(dict(reversed(list(sizes.items()))),
                        target_bytes=60)
    assert a == b


def test_plan_rejects_bad_target():
    with pytest.raises(ValueError):
        plan_compaction({}, target_bytes=0)


def test_compact_directory_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "ds")
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    # 10 tiny files
    df.repartition(10).write.parquet(path)
    before = spark.read.parquet(path)
    rows_before = sorted((r["id"], r["v"]) for r in before.collect())
    n_before = len([f for f in os.listdir(path)
                    if f.endswith(".parquet")])
    assert n_before == 10

    plan = compact_directory(spark, path, target_bytes=1 << 20)
    n_after = len([f for f in os.listdir(path)
                   if f.endswith(".parquet")])
    assert n_after < n_before
    assert plan.n_files_after == n_after
    after = spark.read.parquet(path)
    assert sorted((r["id"], r["v"]) for r in after.collect()) \
        == rows_before


def test_compact_directory_dry_run_touches_nothing(spark, tmp_path):
    path = str(tmp_path / "ds2")
    spark.range(0, 100).repartition(5).write.parquet(path)
    listing = sorted(os.listdir(path))
    plan = compact_directory(spark, path, target_bytes=1 << 20,
                             dry_run=True)
    assert isinstance(plan, CompactionPlan) and plan.groups
    assert sorted(os.listdir(path)) == listing

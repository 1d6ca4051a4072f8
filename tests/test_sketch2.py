"""Count-Min sketch and Bloom filter (operators/sketch2.py):
invariants, mergeability, and the broadcast plan shape."""

import pytest

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.sketch2 import (
    BLOOM_K, BLOOM_M_BITS, CMS_D, CMS_W,
    bloom_build, bloom_membership, cms_build, cms_estimate, cms_merge,
)


def _vals(spark, xs):
    return spark.createDataFrame([(int(x),) for x in xs], "x bigint")


def test_cms_never_undercounts_and_exact_when_sparse(spark):
    # 50 distinct values, 1 occurrence each: far below w=512 cells, so
    # min-over-4-rows is almost surely exact; always >= truth.
    df = _vals(spark, range(50)).withColumn("w", F.lit(1))
    cms = cms_build(df, "x", "w")
    probes = _vals(spark, range(50))
    est = cms_estimate(cms, probes, "x")
    rows = est.collect()
    assert all(r["cms_n"] >= 1 for r in rows)
    assert sum(r["cms_n"] for r in rows) <= 50 + 10  # tiny collision slack


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame([(7, 100), (9, 3)], "x bigint, w bigint")
    cms = cms_build(df, "x", "w")
    est = {r["x"]: r["cms_n"]
           for r in cms_estimate(cms, _vals(spark, [7, 9]), "x").collect()}
    assert est[7] >= 100 and est[9] >= 3
    # row cells sum to total weight in every row
    per_row = cms.groupBy("row_j").agg(F.sum("c").alias("s")).collect()
    assert {r["s"] for r in per_row} == {103}
    assert {r["row_j"] for r in per_row} == set(range(CMS_D))


def test_cms_merge_equals_single_build(spark):
    a = _vals(spark, range(0, 30)).withColumn("w", F.lit(2))
    b = _vals(spark, range(20, 60)).withColumn("w", F.lit(5))
    merged = cms_merge(cms_build(a, "x", "w"), cms_build(b, "x", "w"))
    both = a.unionByName(b)
    single = cms_build(both, "x", "w")
    m = {(r["row_j"], r["col"]): r["c"] for r in merged.collect()}
    s = {(r["row_j"], r["col"]): r["c"] for r in single.collect()}
    assert m == s
    assert all(col < CMS_W for (_, col) in m)


def test_bloom_no_false_negatives(spark):
    members = _vals(spark, range(0, 1000, 3))
    bloom = bloom_build(members, "x")
    out = bloom_membership(bloom, members, "x")
    assert all(r["in_bloom"] for r in out.collect())


def test_bloom_rejects_most_non_members(spark):
    members = _vals(spark, range(0, 1000, 3))
    bloom = bloom_build(members, "x")
    non = _vals(spark, range(1, 1000, 3))
    out = bloom_membership(bloom, non, "x")
    hits = sum(1 for r in out.collect() if r["in_bloom"])
    # m=2^17 bits for ~334 members: FPR is essentially zero
    assert hits <= 2


def test_bloom_word_table_is_bounded_and_positive(spark):
    bloom = bloom_build(_vals(spark, range(5000)), "x")
    rows = bloom.collect()
    assert len(rows) <= BLOOM_M_BITS // 32
    assert all(0 < r["bits"] < (1 << 32) for r in rows)
    assert all(0 <= r["word_idx"] < BLOOM_M_BITS // 32 for r in rows)


def test_bloom_membership_plan_broadcasts_words(spark):
    members = _vals(spark, range(100))
    bloom = bloom_build(members, "x")
    out = bloom_membership(bloom, _vals(spark, range(200)), "x")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_cms_estimate_plan_broadcasts_cells(spark):
    df = _vals(spark, range(100)).withColumn("w", F.lit(1))
    cms = cms_build(df, "x", "w")
    est = cms_estimate(cms, _vals(spark, range(10)), "x")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_hash_total_over_any_bigint(spark):
    # pre-reduction makes the family total: huge and negative keys
    # build and probe without overflow, and membership stays exact
    from pyspark.sql import functions as F
    xs = [2**62, -(2**61), 9_999_999_999, -1, 0]
    members = spark.createDataFrame([(int(x),) for x in xs], "x bigint")
    bloom = bloom_build(members, "x")
    out = bloom_membership(bloom, members, "x")
    assert all(r["in_bloom"] for r in out.collect())
    cms = cms_build(members.withColumn("w", F.lit(1)), "x", "w")
    est = cms_estimate(cms, members, "x")
    assert all(r["cms_n"] >= 1 for r in est.collect())

"""Fuzzy record linkage (operators/linkage.py): trigram sets,
blocking, cap behavior, and threshold semantics."""

import pytest

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.linkage import (
    link_records, trigram_sets,
)


def _names(spark, rows):
    return spark.createDataFrame(rows, "id bigint, name string")


def test_trigram_sets_are_distinct_and_case_folded(spark):
    df = _names(spark, [(1, "AbAbAb")])
    r = trigram_sets(df, "id", "name").collect()[0]
    # lowercase "ababab" has trigrams {aba, bab} -> 2 distinct
    assert len(r["grams"]) == 2
    assert r["block"] == min(r["grams"])


def test_identical_names_link_with_jaccard_one(spark):
    a = _names(spark, [(1, "acme corp"), (2, "zenith ltd")])
    b = _names(spark, [(10, "acme corp"), (20, "other name")])
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in link_records(a, b, "id", "name").collect()}
    assert out[(1, 10)] == 1.0
    assert (2, 20) not in out


def test_small_typo_links_above_threshold(spark):
    a = _names(spark, [(1, "jonathan smithers")])
    b = _names(spark, [(2, "jonathan smither")])  # truncated tail
    out = link_records(a, b, "id", "name", threshold=0.5).collect()
    assert len(out) == 1 and out[0]["jaccard"] > 0.8


@pytest.mark.slow
def test_block_cap_drops_degenerate_blocks(spark):
    # 30 names all sharing one block under a tiny cap -> no pairs
    rows = [(i, f"same prefix {i}") for i in range(30)]
    a, b = _names(spark, rows), _names(spark, rows)
    capped = link_records(a, b, "id", "name",
                          block_expr="'k'", max_block_size=10)
    assert capped.count() == 0
    uncapped = link_records(a, b, "id", "name",
                            block_expr="'k'", max_block_size=None)
    assert uncapped.count() >= 30  # self matches survive


def test_custom_block_expr(spark):
    a = _names(spark, [(1, "alpha-01"), (2, "beta-02")])
    b = _names(spark, [(3, "alpha-01x")])
    out = link_records(a, b, "id", "name", threshold=0.4,
                       block_expr="substring(lower(name), 1, 4)")
    assert [ (r["id_a"], r["id_b"]) for r in out.collect() ] == [(1, 3)]

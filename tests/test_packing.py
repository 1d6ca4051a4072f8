"""Behavioral tests for sequence packing (operators/packing.py)."""

from datafusion_functions_financial_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)


def _docs(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_greedy_fill_and_new_bin(spark):
    # 1 shard so the scan order is just doc_id: lengths 3, 3, 3, 2
    df = _docs(spark, ["a b c", "d e f", "g h i", "j k"])
    out = pack_sequences(df, budget=6, n_shards=1).orderBy("doc_id").collect()
    assert [r.bin for r in out] == [0, 0, 1, 1]  # 3+3 fits, then 3+2


def test_exact_fit_stays_in_bin(spark):
    df = _docs(spark, ["a b c", "d e f"])
    out = pack_sequences(df, budget=6, n_shards=1).collect()
    assert {r.bin for r in out} == {0}


def test_oversized_doc_gets_own_bin(spark):
    df = _docs(spark, ["a b", " ".join("x" * 1 for _ in range(10)), "c d"])
    out = {r.doc_id: r.bin for r in
           pack_sequences(df, budget=4, n_shards=1).collect()}
    assert out[0] == 0 and out[1] == 1 and out[2] == 2


def test_partitioning_invariance(spark):
    df = _docs(spark, ["w x y z"] * 50)
    a = pack_sequences(df.repartition(1), budget=16, n_shards=4)
    b = pack_sequences(df.repartition(13), budget=16, n_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_summary_waste(spark):
    df = _docs(spark, ["a b c", "d e"])
    row = packing_summary(df, budget=8, n_shards=1).collect()[0]
    assert row.n_docs == 2 and row.fill_tokens == 5 and row.waste == 3


def test_every_doc_packed_exactly_once(spark):
    df = _docs(spark, [f"tok{i} a b" for i in range(40)])
    out = pack_sequences(df, budget=10, n_shards=8)
    ids = [r.doc_id for r in out.collect()]
    assert sorted(ids) == list(range(40))

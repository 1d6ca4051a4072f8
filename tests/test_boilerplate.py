"""Behavioral tests for corpus boilerplate removal."""

from datafusion_functions_financial_spark.operators.boilerplate import (
    boilerplate_segments,
    remove_boilerplate,
    segment,
)


def _docs(spark):
    rows = [
        (1, "cookie notice\nreal content one\nfooter"),
        (2, "cookie notice\nunique text here\nfooter"),
        (3, "cookie notice\nanother body\nfooter"),
        (4, "standalone document with no repeats"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_delim_segments_counts(spark):
    out = boilerplate_segments(_docs(spark), min_docs=3, mode="delim")
    got = {r.seg: r.n_docs for r in out.collect()}
    assert got == {"cookie notice": 3, "footer": 3}


def test_delim_clean_preserves_order_and_all_docs(spark):
    out = remove_boilerplate(_docs(spark), min_docs=3, mode="delim")
    got = {r.doc_id: (r.clean_text, r.n_kept) for r in out.collect()}
    assert got[1] == ("real content one", 1)
    assert got[2] == ("unique text here", 1)
    assert got[4] == ("standalone document with no repeats", 1)
    assert len(got) == 4


def test_all_boilerplate_doc_survives_empty(spark):
    rows = [(i, "same line") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_boilerplate(df, min_docs=3, mode="delim")
    assert all(r.clean_text == "" and r.n_kept == 0 for r in out.collect())
    assert out.count() == 5


def test_chunk_mode_segments(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    segs = segment(df, mode="chunk", n=2).orderBy("pos").collect()
    assert [r.seg for r in segs] == ["a b", "c d", "e"]


def test_anti_join_is_broadcast(spark):
    plan = (
        remove_boilerplate(_docs(spark), min_docs=3, mode="delim")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

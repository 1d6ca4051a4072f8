"""Chunk-boundary semantics for operators/chunking.py."""

import hashlib

import pytest

from datafusion_functions_financial_spark.operators import chunking


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def _chunks(spark, text, c, s):
    df = chunking.chunk_documents(_doc(spark, text), chunk_tokens=c, stride=s)
    return sorted(
        (r["chunk_id"], r["chunk_start"], r["chunk_len"], r["chunk_hash"])
        for r in df.collect()
    )


def test_short_doc_single_chunk(spark):
    out = _chunks(spark, "a b c", c=10, s=5)
    assert out == [(0, 1, 3, hashlib.md5(b"a b c").hexdigest())]


def test_exact_multiple_no_empty_tail(spark):
    # 8 tokens, C=4, S=4: exactly two full chunks, no zero-length tail.
    toks = "t0 t1 t2 t3 t4 t5 t6 t7"
    out = _chunks(spark, toks, c=4, s=4)
    assert [(cid, st, ln) for cid, st, ln, _ in out] == [
        (0, 1, 4), (1, 5, 4)]
    assert out[1][3] == hashlib.md5(b"t4 t5 t6 t7").hexdigest()


def test_overlap_stride(spark):
    # 10 tokens, C=6, S=4 -> chunks at offsets 0 and 4 (last is 6 long).
    toks = " ".join(f"w{i}" for i in range(10))
    out = _chunks(spark, toks, c=6, s=4)
    assert [(cid, st, ln) for cid, st, ln, _ in out] == [
        (0, 1, 6), (1, 5, 6)]


def test_ragged_tail_is_short(spark):
    # 9 tokens, C=4, S=4 -> 3 chunks, last has 1 token.
    toks = " ".join(f"w{i}" for i in range(9))
    out = _chunks(spark, toks, c=4, s=4)
    assert [(cid, st, ln) for cid, st, ln, _ in out] == [
        (0, 1, 4), (1, 5, 4), (2, 9, 1)]
    assert out[2][3] == hashlib.md5(b"w8").hexdigest()


def test_invalid_params_raise(spark):
    with pytest.raises(ValueError):
        chunking.chunk_documents(_doc(spark, "x"), chunk_tokens=0)
    with pytest.raises(ValueError):
        chunking.chunk_documents(_doc(spark, "x"), stride=-1)

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


def test_chunk_invariants_bulk(spark):
    # 60 docs with lengths 1..60 tokens, one Spark job; checks the
    # coverage/shape invariants that hold for ANY (C, S).
    import random
    rnd = random.Random(7)
    c, s = 8, 5
    docs = []
    for d in range(60):
        n = d + 1
        docs.append((d, " ".join(f"t{rnd.randrange(20)}" for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunking.chunk_documents(df, chunk_tokens=c, stride=s)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_start"], r["chunk_len"]))
    for d, text in docs:
        n = len(text.split())
        chunks = sorted(by_doc[d])
        # chunk count formula
        expected = 1 + max(0, -(-(n - c) // s)) if n > c else 1
        assert len(chunks) == expected, (d, n, chunks)
        # starts advance by exactly the stride; lengths in [1, c]
        for i, (cid, st, ln) in enumerate(chunks):
            assert cid == i
            assert st == 1 + i * s
            assert 1 <= ln <= c
            assert st + ln - 1 <= n
        # full coverage: last chunk reaches the final token
        last_st, last_ln = chunks[-1][1], chunks[-1][2]
        assert last_st + last_ln - 1 == n
        # every token position is inside >= 1 chunk
        covered = set()
        for _, st, ln in chunks:
            covered.update(range(st, st + ln))
        assert covered == set(range(1, n + 1))

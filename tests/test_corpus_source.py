"""JSONL corpus ingestion: schema pinning, corrupt-record quarantine,
gzip round-trip (sources/corpus.py)."""

import gzip
import json
import os

from datafusion_functions_financial_spark.sources.corpus import (
    read_documents_jsonl,
    split_corrupt,
    write_documents_jsonl,
)
from datafusion_functions_financial_spark.sources.tables import load


def _write_shard(path, lines):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt", encoding="utf-8") as f:
        for line in lines:
            f.write(line + "\n")


def test_read_clean_and_quarantined(spark, tmp_path):
    good = [
        {"doc_id": 1, "text": "hello world", "lang": "en",
         "source": "src0", "n_chars": 11},
        {"doc_id": 2, "text": "héllo wörld", "lang": "de",
         "source": "src1", "n_chars": 11},
    ]
    lines = [json.dumps(g, ensure_ascii=False) for g in good]
    lines.insert(1, '{"doc_id": 3, "text": "truncated...')  # malformed
    _write_shard(str(tmp_path / "part-0.jsonl"), lines)

    df = read_documents_jsonl(spark, str(tmp_path))
    clean, bad = split_corrupt(df)
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {1: "hello world", 2: "héllo wörld"}
    assert "_corrupt_record" not in clean.columns
    quarantined = bad.collect()
    assert len(quarantined) == 1
    assert quarantined[0]["_corrupt_record"].startswith('{"doc_id": 3')


def test_gzip_shards_read_and_roundtrip(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus")
    write_documents_jsonl(docs, out, shards=3)
    files = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert len(files) == 3  # one gzip shard per task

    back = read_documents_jsonl(spark, out)
    clean, bad = split_corrupt(back)
    assert bad.count() == 0
    orig = sorted(tuple(r) for r in docs.collect())
    got = sorted(tuple(r) for r in clean.select(*docs.columns).collect())
    assert got == orig


def test_schema_is_pinned_not_inferred(spark, tmp_path):
    # A shard whose doc_id is a string must quarantine, not widen.
    _write_shard(
        str(tmp_path / "s.jsonl"),
        ['{"doc_id": "not-a-number", "text": "x", "lang": "en", '
         '"source": "s", "n_chars": 1}'],
    )
    df = read_documents_jsonl(spark, str(tmp_path))
    clean, bad = split_corrupt(df)
    assert clean.count() == 0
    assert bad.count() == 1

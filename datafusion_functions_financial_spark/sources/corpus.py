"""Document-corpus ingestion: JSONL(.gz) reader with schema
enforcement and bad-record quarantine, plus the matching writer.

Web-scale text corpora ship as line-delimited JSON (one doc per line,
usually gzip shards). The reader maps cleanly onto Spark's JSON source:

- **explicit schema, never inference** — schema inference scans the
  whole input once before the real read (2x I/O at 100 TB) and can
  widen types differently between shards; pipelines must pin the
  contract;
- **PERMISSIVE + quarantine column** — a malformed line lands in
  ``_corrupt_record`` instead of failing the job; `split_corrupt`
  separates clean docs from quarantined lines so bad data is kept,
  counted, and debuggable, not dropped;
- **gzip is not splittable** — one task per ``.jsonl.gz`` shard, so
  shard size (100–500 MB) IS the parallelism knob; the writer
  re-shards via repartition before writing.

The parquet tables in /root/testdata stay the benchmark inputs; this
module is the ingestion edge that produces them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

__all__ = [
    "DOCUMENTS_JSONL_SCHEMA", "read_documents_jsonl",
    "split_corrupt", "write_documents_jsonl",
]

_CORRUPT = "_corrupt_record"

# The documents-table contract (TESTDATA.md) plus the quarantine column.
DOCUMENTS_JSONL_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
    StructField(_CORRUPT, StringType()),
])


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_JSONL_SCHEMA,
) -> DataFrame:
    """Read a JSONL(.gz) document corpus with the pinned schema.

    Returns every input line as a row: parsed docs have ``_corrupt_record``
    NULL; malformed lines have the raw line there and NULLs elsewhere.
    """
    if not any(f.name == _CORRUPT for f in schema.fields):
        schema = StructType(
            list(schema.fields) + [StructField(_CORRUPT, StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, cache: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(clean_docs, quarantined_lines) from a PERMISSIVE read.

    Spark disallows queries whose pruned scan would read ONLY the
    corrupt column from raw JSON (QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    e.g. ``bad.count()``); the documented remedy is caching the parsed
    frame first, which is what ``cache=True`` does. Pass False if the
    caller manages persistence (e.g. writes both outputs immediately).
    """
    if cache:
        df = df.cache()
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull())
    return clean, bad


def write_documents_jsonl(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    compression: str = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write a corpus back to JSONL shards. ``shards`` controls output
    parallelism for downstream gzip readers (one task per shard)."""
    out = df.repartition(shards) if shards else df
    out.write.mode(mode).option("compression", compression).json(path)

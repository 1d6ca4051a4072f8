"""Parquet table access for the driver's testdata layout (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; parquet scans keep pushdown + pruning.

    ``events.ts`` is normalized to **epoch-nanosecond LongType** no
    matter the parquet physical type — the engine models tick time the
    way the reference does (nanosecond integers; SURVEY.md §7 hard
    part 4), and the testdata generator has shipped the column both as
    TIMESTAMP(NANOS) (reads as long under ``nanosAsLong``) and as
    TIMESTAMP(MICROS) (reads as timestamp). Session timezone must be
    UTC (conftest/bench set it) so the NTZ->epoch conversion agrees
    with DuckDB's naive ``epoch_us(ts)``.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # If the file is TIMESTAMP(NANOS), this conf makes Spark read it
        # as epoch-ns long directly (no conversion needed below).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, (TimestampType, TimestampNTZType)):
            df = df.withColumn(
                "ts",
                (F.unix_micros(F.col("ts").cast(TimestampType()))
                 * F.lit(1000)).cast(LongType()),
            )
    return df

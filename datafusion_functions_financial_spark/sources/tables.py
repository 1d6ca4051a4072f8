"""Parquet table access for the driver's testdata layout (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _parquet_ts_is_nanos(path: str) -> bool:
    """True when the parquet ``ts`` column is TIMESTAMP(NANOS).

    Footer-only probe via pyarrow (handles single files and directory
    datasets); conservative False on any probe failure — a genuine
    nanos file would then fail the Spark read loudly rather than be
    silently misread.
    """
    try:
        import pyarrow as pa
        import pyarrow.dataset as ds

        t = ds.dataset(path, format="parquet").schema.field("ts").type
        return pa.types.is_timestamp(t) and t.unit == "ns"
    except Exception:
        return False


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
    if name != "events":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    path = f"{sf_dir}/{name}.parquet"
    # TIMESTAMP(NANOS) files need spark.sql.legacy.parquet.nanosAsLong.
    # Spark's ParquetFileFormat re-reads that conf at PHYSICAL PLANNING /
    # execution time (buildReaderWithPartitionValues), not only at schema
    # inference — so a set-then-restore dance would make df.schema
    # succeed and execution fail with "Illegal Parquet type" (ADVICE
    # r03). Instead, probe the parquet footer with pyarrow and, only
    # when the file really is nanos, set the conf FOR THE SESSION (the
    # session-level effect is deliberate and harmless: the conf only
    # changes how TIMESTAMP(NANOS) columns read, as epoch-ns longs —
    # exactly this engine's tick-time model).
    if _parquet_ts_is_nanos(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, (TimestampType, TimestampNTZType)):
        # The NTZ -> epoch conversion interprets the naive timestamp in
        # the SESSION timezone; anything but UTC silently shifts every
        # tick relative to the oracle's naive epoch_us(ts) (ADVICE r02).
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise RuntimeError(
                "load('events') requires spark.sql.session.timeZone=UTC "
                f"for the naive-timestamp -> epoch-ns conversion (got "
                f"{tz!r}); set it in the session builder"
            )
        df = df.withColumn(
            "ts",
            (F.unix_micros(F.col("ts").cast(TimestampType()))
             * F.lit(1000)).cast(LongType()),
        )
    return df

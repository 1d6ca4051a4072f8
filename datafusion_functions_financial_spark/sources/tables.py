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
    if name != "events":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # If the file is TIMESTAMP(NANOS), this conf makes Spark read it as
    # epoch-ns long directly (no conversion needed below). The schema is
    # bound at DataFrame creation, so the previous value is restored
    # immediately — later reads in the same session are unaffected
    # (ADVICE r02: don't mutate the shared session permanently).
    _NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(_NANOS_CONF)
    except Exception:
        prev = None
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.schema  # force schema binding before the conf is restored
    finally:
        if prev is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prev)
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

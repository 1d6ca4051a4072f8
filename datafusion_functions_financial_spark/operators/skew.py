"""Skew-resilient aggregation (salting) + session tuning helpers.

At 100 TB a handful of hot keys (one viral document source, one
dominant ticker) can pin a groupBy shuffle on a few reducers. The
classic fix is two-stage salted aggregation:

    groupBy(key, salt) -> partial agg        # hot key spreads over S reducers
    groupBy(key)       -> final combine      # S rows per key, trivial

Only algebraic aggregates (SUM/COUNT/MIN/MAX and anything built from
them, e.g. AVG = SUM/COUNT) can be salted this way. AQE's skew-join
handling (``spark.sql.adaptive.skewJoin.enabled``) covers the join
case at runtime; this helper covers aggregation, which AQE does not
rebalance.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["salted_agg", "build_session"]


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    num_salts: int = 16,
    sums: Sequence[str] = (),
    counts: bool = True,
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> DataFrame:
    """Two-stage salted SUM/COUNT/MIN/MAX (plus derived AVG) per key.

    Output columns: ``sum_<c>``, ``cnt``, ``min_<c>``, ``max_<c>``,
    ``avg_<c>`` (for every summed column when counts are enabled).
    """
    keys = list(keys)
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * num_salts).cast("int")
    )
    partial_aggs = []
    for c in sums:
        partial_aggs.append(F.sum(c).alias(f"__s_{c}"))
    if counts:
        partial_aggs.append(F.count(F.lit(1)).alias("__c"))
    for c in mins:
        partial_aggs.append(F.min(c).alias(f"__mn_{c}"))
    for c in maxs:
        partial_aggs.append(F.max(c).alias(f"__mx_{c}"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)

    final_aggs = []
    for c in sums:
        final_aggs.append(F.sum(f"__s_{c}").alias(f"sum_{c}"))
    if counts:
        final_aggs.append(F.sum("__c").alias("cnt"))
    for c in mins:
        final_aggs.append(F.min(f"__mn_{c}").alias(f"min_{c}"))
    for c in maxs:
        final_aggs.append(F.max(f"__mx_{c}").alias(f"max_{c}"))
    out = partial.groupBy(*keys).agg(*final_aggs)
    if counts:
        for c in sums:
            out = out.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("cnt"))
    return out


# --------------------------------------------------------------------------
# Driver gate: the two-stage salted aggregation must produce byte-for-
# byte the same result as a plain one-stage GROUP BY (here: the DuckDB
# oracle). Sums run over integer cents so the partial-then-final
# combine is exact regardless of salt bucketing or reduce order.
# --------------------------------------------------------------------------


def _q_salted_overview(spark: SparkSession, sf_dir: str):
    from ..sources.tables import load

    li = load(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag",
        "l_linestatus",
        "CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents",
    )
    out = salted_agg(
        li,
        keys=("l_returnflag", "l_linestatus"),
        num_salts=16,
        sums=("qty_cents", "price_cents"),
        mins=("price_cents",),
        maxs=("price_cents",),
    )
    return out.select(
        "l_returnflag", "l_linestatus",
        "sum_qty_cents", "sum_price_cents", "cnt",
        "min_price_cents", "max_price_cents",
        "avg_qty_cents", "avg_price_cents",
    )


_ORACLE_SALTED = """
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
  FROM lineitem
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(qty_cents) AS BIGINT) AS sum_qty_cents,
       CAST(sum(price_cents) AS BIGINT) AS sum_price_cents,
       count(*) AS cnt,
       min(price_cents) AS min_price_cents,
       max(price_cents) AS max_price_cents,
       CAST(sum(qty_cents) AS DOUBLE) / count(*) AS avg_qty_cents,
       CAST(sum(price_cents) AS DOUBLE) / count(*) AS avg_price_cents
FROM li
GROUP BY l_returnflag, l_linestatus
"""


QUERIES: dict = {
    "skew_salted_overview_lineitem": (_q_salted_overview, _ORACLE_SALTED),
}


def build_session(
    master: str = "local[*]",
    shuffle_partitions: int | None = None,
    app_name: str = "dffs",
) -> SparkSession:
    """SparkSession with the engine's recommended configuration:
    AQE (incl. skew-join splitting), Arrow transfers, UTC, and the
    nanos-parquet compatibility flag the testdata needs."""
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return b.getOrCreate()

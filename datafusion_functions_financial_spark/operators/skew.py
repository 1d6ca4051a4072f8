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


# --------------------------------------------------------------------------
# Key-skew profiler: the diagnostic that tells you WHEN to reach for
# salted_agg / AQE skew join. Exact order-statistic percentiles of the
# per-key row counts (integer rank selection, no interpolation).
# --------------------------------------------------------------------------


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """One row (n_rows, n_keys, top_key, top_share,
    p50_rows_per_key, p99_rows_per_key, skew_p99_p50): distribution
    of rows per key — the pre-flight check before shuffling on
    ``key_col`` at scale. Percentiles are exact lower order
    statistics of the per-key counts (rank ``ceil(q * n_keys)``,
    ties broken by key), so both engines select the same element.

    Plan: one map-side-combined groupBy(key), then windows over the
    per-key count relation (n_keys rows, not data rows)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy(F.col("__c").asc(), F.col("__k").asc())
    ranked = (
        counts.withColumn("__rn", F.row_number().over(w))
        .withColumn("__nk", F.count(F.lit(1)).over(Window.partitionBy()))
        .withColumn("__nr", F.sum("__c").over(Window.partitionBy()))
    )
    pick = ("CASE WHEN __rn = CAST(ceil({q} * __nk / 100) AS BIGINT) "
            "THEN __c END")
    return ranked.agg(
        F.max("__nr").cast("bigint").alias("n_rows"),
        F.max("__nk").cast("bigint").alias("n_keys"),
        F.max(F.expr(
            "CASE WHEN __rn = __nk THEN __k END")).alias("top_key"),
        F.expr(
            "round(CAST(max(CASE WHEN __rn = __nk THEN __c END) "
            "AS DOUBLE) / CAST(max(__nr) AS DOUBLE) * 1000000.0) "
            "/ 1000000.0 + 0.0").alias("top_share"),
        F.max(F.expr(pick.format(q=50))).cast("bigint")
        .alias("p50_rows_per_key"),
        F.max(F.expr(pick.format(q=99))).cast("bigint")
        .alias("p99_rows_per_key"),
        F.expr(
            f"round(CAST(max({pick.format(q=99)}) AS DOUBLE) "
            f"/ CAST(max({pick.format(q=50)}) AS DOUBLE) "
            "* 1000000.0) / 1000000.0 + 0.0").alias("skew_p99_p50"),
    )


def _q_key_skew(spark: SparkSession, sf_dir: str):
    from ..sources.tables import load

    return key_skew_profile(load(spark, sf_dir, "lineitem"),
                            "l_suppkey")


_ORACLE_KEY_SKEW = """
WITH counts AS (
  SELECT l_suppkey AS k, count(*) AS c FROM lineitem GROUP BY 1
), ranked AS (
  SELECT k, c,
         row_number() OVER (ORDER BY c, k) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS nk,
         CAST(sum(c) OVER () AS BIGINT) AS nr
  FROM counts
)
SELECT CAST(max(nr) AS BIGINT) AS n_rows,
  CAST(max(nk) AS BIGINT) AS n_keys,
  max(CASE WHEN rn = nk THEN k END) AS top_key,
  round(CAST(max(CASE WHEN rn = nk THEN c END) AS DOUBLE)
        / CAST(max(nr) AS DOUBLE) * 1000000.0) / 1000000.0 + 0.0
    AS top_share,
  CAST(max(CASE WHEN rn = CAST(ceil(50 * nk / 100) AS BIGINT)
           THEN c END) AS BIGINT) AS p50_rows_per_key,
  CAST(max(CASE WHEN rn = CAST(ceil(99 * nk / 100) AS BIGINT)
           THEN c END) AS BIGINT) AS p99_rows_per_key,
  round(CAST(max(CASE WHEN rn = CAST(ceil(99 * nk / 100) AS BIGINT)
              THEN c END) AS DOUBLE)
        / CAST(max(CASE WHEN rn = CAST(ceil(50 * nk / 100) AS BIGINT)
               THEN c END) AS DOUBLE) * 1000000.0) / 1000000.0 + 0.0
    AS skew_p99_p50
FROM ranked
"""


QUERIES: dict = {
    "skew_salted_overview_lineitem": (_q_salted_overview, _ORACLE_SALTED),
    "dq_key_skew_lineitem": (_q_key_skew, _ORACLE_KEY_SKEW),
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

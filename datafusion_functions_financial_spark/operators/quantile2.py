"""Exact quantiles #2: rolling window median, trimmed mean, and a
two-pass histogram-partitioned EXACT median that never materializes
a per-group value buffer — the quantile family member designed for
the 100 TB path, where ``percentile()`` (which buffers every group
value on one task) stops being an option.

Engine-exact: the rolling median uses an ODD full window so the
exact element is selected with no interpolation (partial warm-up
windows interpolate, absorbed by portable rounding); trimmed-mean
thresholds are portably rounded before the boundary compare so an
interpolation ulp cannot flip a row; the two-pass median picks the
k-th order statistic(s) by exact integer rank arithmetic.

Plan shapes at scale:
- rolling_median: one shuffle on the series key; the window buffers
  ``n`` rows per task — O(n), not O(group).
- trimmed_mean: per-group threshold aggregate broadcast back, then
  one conditional hash aggregate (same shape as quality.winsorize).
- distributed_median: pass 1 aggregates per-group (min, max, n) and
  a 1024-bucket histogram (map-side combinable, fixed width);
  the driver reduces ~1k integers per group to locate the k-th
  order statistic's bucket; pass 2 ranks ONLY the rows inside that
  bucket (a >=1000x selectivity filter pushed to the scan). No
  global sort, no per-group buffering — this is how you take an
  exact median of a 100 TB column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["rolling_median", "trimmed_mean", "distributed_median"]

Q = 10 ** 8
N_BUCKETS = 1024
ROLL_N = 15  # odd: the full-window median is an exact element


def rolling_median(df: DataFrame, value_col: str, keys: list[str],
                   order: list[str], n: int = ROLL_N) -> DataFrame:
    """Adds ``roll_med`` — exact median over the trailing ``n``-row
    window per key. Use an odd ``n`` so every full window selects an
    exact element (no interpolation)."""
    okeys = ", ".join(keys)
    oorder = ", ".join(order)
    return df.withColumn("roll_med", F.expr(
        f"percentile({value_col}, CAST(1 AS DOUBLE) / 2) OVER "
        f"(PARTITION BY {okeys} ORDER BY {oorder} "
        f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)"))


def trimmed_mean(df: DataFrame, value_col: str, group_col: str,
                 lo: float = 0.1, hi: float = 0.9,
                 q_lin: int = Q) -> DataFrame:
    """(group, n, n_kept, trimmed_mean): mean of the values inside
    the group's portably-rounded [lo, hi] percentile band — the
    outlier-robust location estimate. Kept values sum through a
    quantized BIGINT."""
    bounds = df.groupBy(group_col).agg(
        round_portable(F.expr(
            f"percentile({value_col}, {lo!r})")).alias("__lo"),
        round_portable(F.expr(
            f"percentile({value_col}, {hi!r})")).alias("__hi"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    kept = f"{value_col} >= __lo AND {value_col} <= __hi"
    return (
        df.join(F.broadcast(bounds), group_col)
        .groupBy(group_col)
        .agg(
            F.max("__n").alias("n"),
            F.sum(F.expr(
                f"CASE WHEN {kept} THEN 1 ELSE 0 END"
            )).cast("bigint").alias("n_kept"),
            F.sum(F.expr(
                f"CASE WHEN {kept} THEN "
                f"CAST(round({value_col} * {q_lin}) AS BIGINT) "
                f"ELSE 0 END")).alias("__s"),
        )
        .select(
            group_col, "n", "n_kept",
            round_portable(F.expr(
                f"CAST(__s AS DOUBLE) "
                f"/ (CAST(n_kept AS DOUBLE) * {float(q_lin)!r})"), 6
            ).alias("trimmed_mean"),
        )
    )


def distributed_median(df: DataFrame, value_col: str, group_col: str,
                       id_col: str) -> DataFrame:
    """(group, n, median): EXACT median per group via two passes —
    a fixed 1024-bucket histogram locates the bucket(s) holding the
    middle order statistic(s), then only those buckets' rows are
    ranked. Matches ``quantile_cont(0.5)``: odd n picks the middle
    element, even n averages the two middles.

    The driver touches ``n_groups * 1024`` integers, never data
    rows; pass 2's bucket predicate prunes everything else at the
    scan. Degenerate groups (min == max) resolve in pass 1."""
    hist = (
        df.groupBy(group_col).agg(
            F.min(value_col).alias("__lo"),
            F.max(value_col).alias("__hi"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    meta = {r[group_col]: (r["__lo"], r["__hi"], r["__n"])
            for r in hist.collect()}
    bucket = (
        f"CAST(least(CAST({N_BUCKETS - 1} AS BIGINT), "
        f"CAST(floor(({value_col} - __glo) * {N_BUCKETS} "
        f"/ (__ghi - __glo)) AS BIGINT)) AS BIGINT)"
    )
    spark = df.sparkSession
    meta_rows = [(g, float(lo), float(hi)) for g, (lo, hi, _n)
                 in meta.items() if hi > lo]
    out_rows = []  # (group, n, median) resolved without pass 2
    for g, (lo, hi, n) in meta.items():
        if hi <= lo:
            out_rows.append((g, int(n), float(lo)))
    targets = []
    if meta_rows:
        mdf = spark.createDataFrame(
            meta_rows, f"{group_col} string, __glo double, __ghi double")
        counts = (
            df.join(F.broadcast(mdf), group_col)
            .withColumn("__b", F.expr(bucket))
            .groupBy(group_col, "__b")
            .agg(F.count(F.lit(1)).alias("__c"))
            .collect()
        )
        by_group: dict = {}
        for r in counts:
            by_group.setdefault(r[group_col], {})[r["__b"]] = r["__c"]
        for g, (lo, hi, n) in meta.items():
            if hi <= lo:
                continue
            ks = sorted({(n + 1) // 2, (n + 2) // 2})
            cum = 0
            need: dict = {}
            for b in range(N_BUCKETS):
                c = by_group.get(g, {}).get(b, 0)
                for k in ks:
                    if cum < k <= cum + c:
                        need.setdefault(b, []).append((k, cum))
                cum += c
            for b, kk in need.items():
                targets.append((g, b, kk))
    results = list(out_rows)
    if targets:
        tdf = spark.createDataFrame(
            [(g, b) for g, b, _ in targets],
            f"{group_col} string, __b bigint")
        mdf = spark.createDataFrame(
            meta_rows, f"{group_col} string, __glo double, __ghi double")
        ranked = (
            df.join(F.broadcast(mdf), group_col)
            .withColumn("__b", F.expr(bucket))
            .join(F.broadcast(tdf), [group_col, "__b"])
            .withColumn("__rn", F.row_number().over(
                Window.partitionBy(group_col, "__b")
                .orderBy(F.col(value_col).asc(), F.col(id_col).asc())))
            .select(group_col, "__b", "__rn", value_col)
            .collect()
        )
        vals: dict = {}
        for r in ranked:
            vals[(r[group_col], r["__b"], r["__rn"])] = r[value_col]
        picked: dict = {}
        for g, b, kk in targets:
            for k, cum in kk:
                picked[(g, k)] = vals[(g, b, k - cum)]
        for g, (lo, hi, n) in meta.items():
            if hi <= lo:
                continue
            k1, k2 = (n + 1) // 2, (n + 2) // 2
            med = (picked[(g, k1)] + picked[(g, k2)]) / 2
            results.append((g, int(n), float(med)))
    out = spark.createDataFrame(
        sorted(results), f"{group_col} string, n bigint, median double")
    return out.select(
        group_col, "n", round_portable(F.col("median"), 6).alias("median"))


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = rolling_median(load(spark, sf_dir, "events"), "value",
                         ["event_type"], ["ts", "event_id"])
    return out.select(
        "event_type", "event_id",
        round_portable(F.col("roll_med"), 6).alias("roll_med"))


_ORACLE_ROLLING_MEDIAN = f"""
SELECT event_type, event_id,
  {round_portable_duck(
      f"quantile_cont(value, CAST(1 AS DOUBLE) / 2) OVER "
      f"(PARTITION BY event_type ORDER BY ts, event_id "
      f"ROWS BETWEEN {ROLL_N - 1} PRECEDING AND CURRENT ROW)", 6)}
    AS roll_med
FROM events
"""


def _q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # o_totalprice reaches 5e5: cents-exact 1e4 keeps sums in range.
    return trimmed_mean(load(spark, sf_dir, "orders"), "o_totalprice",
                        "o_orderpriority", q_lin=10 ** 4)


_ORACLE_TRIMMED_MEAN = f"""
WITH bounds AS (
  SELECT o_orderpriority,
         {round_portable_duck("quantile_cont(o_totalprice, 0.1)")}
           AS lo,
         {round_portable_duck("quantile_cont(o_totalprice, 0.9)")}
           AS hi,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT o.o_orderpriority, max(b.n) AS n,
  CAST(sum(CASE WHEN o.o_totalprice >= b.lo
                 AND o.o_totalprice <= b.hi THEN 1 ELSE 0 END)
    AS BIGINT) AS n_kept,
  {round_portable_duck(
      "CAST(sum(CASE WHEN o.o_totalprice >= b.lo "
      "AND o.o_totalprice <= b.hi THEN "
      "CAST(round(o.o_totalprice * 10000) AS BIGINT) ELSE 0 END) "
      "AS DOUBLE) / (CAST(sum(CASE WHEN o.o_totalprice >= b.lo "
      "AND o.o_totalprice <= b.hi THEN 1 ELSE 0 END) AS DOUBLE) "
      "* 10000.0)", 6)} AS trimmed_mean
FROM orders o JOIN bounds b ON o.o_orderpriority = b.o_orderpriority
GROUP BY 1
"""


def _q_distributed_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distributed_median(load(spark, sf_dir, "lineitem"),
                              "l_extendedprice", "l_returnflag",
                              "l_orderkey")


_ORACLE_DISTRIBUTED_MEDIAN = f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
  {round_portable_duck("median(l_extendedprice)", 6)} AS median
FROM lineitem GROUP BY 1
"""


QUERIES: dict = {
    "roll_median_events": (_q_rolling_median, _ORACLE_ROLLING_MEDIAN),
    "q_trimmed_mean_orders": (_q_trimmed_mean, _ORACLE_TRIMMED_MEAN),
    "q_distributed_median_lineitem": (
        _q_distributed_median, _ORACLE_DISTRIBUTED_MEDIAN),
}

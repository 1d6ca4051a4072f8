"""Relationship/sequence analytics: bipartite degree distribution,
co-occurrence (co-purchase) pairs, gaps-and-islands run lengths, and
rank-based value bands — the graph-ish and sequence-ish reports that
round out the analytics surface (all pure Catalyst; everything
integer or rank-based, so engine parity is structural).

Plan shapes at scale:
- degree distribution: two hash aggregations (entity → degree →
  histogram), both map-side combinable; the zero-degree class comes
  from a broadcast-size dimension anti-join.
- co-purchase: a self-join WITHIN the order key — pair count per
  order is bounded by order size squared (TPC-H: ≤ 7 items → ≤ 21
  pairs), so the explode is linear in lineitem; the pair aggregation
  shuffles once on the (a, b) pair key.
- run lengths: the classic gaps-and-islands trick (month_index −
  dense_rank is constant within a consecutive run) — two windows over
  the same customer partition, one shuffle.
- value bands: ntile(4) with a unique tiebreak (rank arithmetic, no
  interpolated quantiles — those differ bitwise across engines).

Beyond-reference scope (SURVEY.md extension); no counterpart in the
reference's Rust surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .series import ROUND_DP, round_portable, round_portable_duck

__all__ = ["degree_distribution", "copurchase_pairs",
           "copurchase_dropped_baskets",
           "longest_monthly_streak", "value_bands"]


def degree_distribution(entities: DataFrame, entity_key: str,
                        edges: DataFrame, edge_key: str) -> DataFrame:
    """(degree, n_entities): how many entities have k incident edges,
    INCLUDING the zero-degree class (entities with no edges)."""
    deg = edges.groupBy(F.col(edge_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("degree"))
    joined = entities.select(F.col(entity_key).alias("__k")).join(
        deg, "__k", "left"
    ).select(F.coalesce(F.col("degree"), F.lit(0)).alias("degree"))
    return joined.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_entities"))


def copurchase_pairs(lines: DataFrame, basket_key: str, item_key: str,
                     min_count: int = 2,
                     max_items_per_basket: int | None = 10_000) -> DataFrame:
    """(item_a, item_b, n_baskets): item pairs co-occurring in at
    least ``min_count`` baskets. Distinct items per basket first, so
    a repeated item never pairs with itself.

    A basket of k items emits k*(k-1)/2 pairs, so ONE pathological
    million-item basket (a crawler session, a default account id)
    would dominate the whole join — the same skew failure the LSH
    hot-bucket cap guards. ``max_items_per_basket`` drops over-cap
    baskets before the self-join (fused window count on the same
    basket-key exchange the join needs — no extra shuffle, same
    pattern as dedup's ``_cap_hot_buckets_fused``). TPC-H orders
    hold ≤7 items, so the default cap is a no-op at every tested SF
    while staying finite at scale. ``None`` opts out; audit what a
    cap drops with ``copurchase_dropped_baskets``.

    NULL items never pair and never count toward the cap:
    ``collect_set`` drops NULLs, so a basket with k non-null items
    plus NULLs is capped on k. (Pre-r13 the cap counted the basket's
    one (basket, NULL) distinct row too — an off-by-one only visible
    for baskets sitting exactly at the cap with a NULL item; pair
    output for non-null items is identical. ADVICE r13 documents the
    change.)"""
    # One aggregation by basket (collect_set dedups items in-agg),
    # then ordered pairs from the SORTED item array via an in-row
    # combination explode — replaces the r12 shape's three data-sized
    # stages (distinct exchange, window-cap exchange+sort, basket
    # self-join) with one exchange plus per-row generation. Same pair
    # multiset: (x < y) pairs of each basket's distinct items, once
    # per basket (array_sort makes the set deterministic; order never
    # reaches the output — pairs re-aggregate by item). Measured at
    # sf0.1: 2.03 s -> 1.75 s standalone and 3.58 s -> 2.46 s for the
    # triangle query that embeds this subplan in several branches.
    # Memory: the per-basket buffer is the same basket-sized state the
    # window cap buffered; the cap filter still kills over-cap baskets
    # before any pair is generated.
    b = lines.select(F.col(basket_key).alias("__b"),
                     F.col(item_key).alias("__i"))
    baskets = b.groupBy("__b").agg(
        F.expr("array_sort(collect_set(__i))").alias("__it"))
    if max_items_per_basket is not None:
        baskets = baskets.filter(
            F.expr(f"size(__it) <= {int(max_items_per_basket)}"))
    pairs = baskets.selectExpr(
        "explode(flatten(transform(__it, (x, i) -> "
        "transform(slice(__it, i + 2, size(__it)), "
        "y -> struct(x AS a, y AS b))))) AS __p")
    return (
        pairs.selectExpr("__p.a AS item_a", "__p.b AS item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_count)
    )


def copurchase_dropped_baskets(lines: DataFrame, basket_key: str,
                               item_key: str,
                               max_items_per_basket: int) -> DataFrame:
    """(basket, n_items): the baskets a ``copurchase_pairs`` cap
    excludes, with their sizes — the recorded drop count for an audit
    job (kept out of the operator itself so the hot path stays one
    lazy plan with no side-effect action)."""
    return (
        lines.select(F.col(basket_key).alias("basket"),
                     F.col(item_key).alias("__i")).distinct()
        .groupBy("basket").agg(F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items") > max_items_per_basket)
    )


def longest_monthly_streak(df: DataFrame, key: str,
                           ts_col: str) -> DataFrame:
    """(key, n_active_months, longest_streak): longest run of
    CONSECUTIVE calendar months with ≥1 row per key. Month index
    year*12+month; within a consecutive run, month_index −
    dense_rank(month_index) is constant (gaps-and-islands)."""
    m = (
        df.select(
            F.col(key),
            (F.year(ts_col) * 12 + F.month(ts_col)).alias("__m"),
        )
        .distinct()
    )
    w = Window.partitionBy(key).orderBy("__m")
    runs = m.withColumn("__g", F.col("__m") - F.dense_rank().over(w))
    return (
        runs.groupBy(key, "__g")
        .agg(F.count(F.lit(1)).alias("__len"))
        .groupBy(key)
        .agg(
            F.sum("__len").cast("bigint").alias("n_active_months"),
            F.max("__len").cast("bigint").alias("longest_streak"),
        )
    )


def value_bands(df: DataFrame, value_col: str, key: str,
                tiebreak: str, n_bands: int = 4) -> DataFrame:
    """(key, band, n, lo, hi, band_share): rank-based quantile bands
    per key — ntile over a UNIQUE ordering, min/max per band, share
    of the key's total value from exact 1e8-quantized sums."""
    q = F.expr(f"CAST(round({value_col} * 1e8) AS BIGINT)")
    w = Window.partitionBy(key).orderBy(
        F.col(value_col).asc(), F.col(tiebreak).asc())
    wt = Window.partitionBy(key)
    tiled = (
        df.withColumn("__band", F.ntile(n_bands).over(w))
        .withColumn("__q", q)
        .withColumn("__tot", F.sum(q).over(wt))
    )
    return (
        tiled.groupBy(key, "__band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_portable(F.min(value_col)).alias("lo"),
            round_portable(F.max(value_col)).alias("hi"),
            round_portable(F.expr(
                "CAST(sum(__q) AS DOUBLE) / CAST(max(__tot) AS DOUBLE)"
            )).alias("band_share"),
        )
        .withColumnRenamed("__band", "band")
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_distribution(
        load(spark, sf_dir, "customer"), "c_custkey",
        load(spark, sf_dir, "orders"), "o_custkey")


_ORACLE_DEGREE = """
WITH deg AS (
  SELECT o_custkey AS k, count(*) AS degree FROM orders GROUP BY 1
), joined AS (
  SELECT coalesce(deg.degree, 0) AS degree
  FROM customer LEFT JOIN deg ON customer.c_custkey = deg.k
)
SELECT degree, count(*) AS n_entities FROM joined GROUP BY 1
"""


def _q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return copurchase_pairs(load(spark, sf_dir, "lineitem"),
                            "l_orderkey", "l_partkey")


_ORACLE_COPURCHASE = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS ik FROM lineitem
)
SELECT l.ik AS item_a, r.ik AS item_b, count(*) AS n_baskets
FROM b l JOIN b r ON l.bk = r.bk AND l.ik < r.ik
GROUP BY 1, 2
HAVING count(*) >= 2
"""


def _q_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    return longest_monthly_streak(load(spark, sf_dir, "orders"),
                                  "o_custkey", "o_orderdate")


_ORACLE_STREAK = """
WITH m AS (
  SELECT DISTINCT o_custkey,
         EXTRACT(YEAR FROM o_orderdate) * 12
           + EXTRACT(MONTH FROM o_orderdate) AS mi
  FROM orders
), runs AS (
  SELECT o_custkey,
         mi - dense_rank() OVER (PARTITION BY o_custkey ORDER BY mi)
           AS g
  FROM m
), lens AS (
  SELECT o_custkey, g, count(*) AS len FROM runs GROUP BY 1, 2
)
SELECT o_custkey,
       CAST(sum(len) AS BIGINT) AS n_active_months,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM lens GROUP BY 1
"""


def _q_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_bands(load(spark, sf_dir, "events"), "value",
                       "event_type", "event_id")


_ORACLE_BANDS = f"""
WITH tiled AS (
  SELECT event_type, value,
         ntile(4) OVER (PARTITION BY event_type
                        ORDER BY value ASC, event_id ASC) AS band,
         CAST(round(value * 1e8) AS BIGINT) AS q,
         CAST(sum(CAST(round(value * 1e8) AS BIGINT))
              OVER (PARTITION BY event_type) AS BIGINT) AS tot
  FROM events
)
SELECT event_type, band, count(*) AS n,
  {round_portable_duck("min(value)")} AS lo,
  {round_portable_duck("max(value)")} AS hi,
  {round_portable_duck(
      "CAST(sum(q) AS DOUBLE) / CAST(max(tot) AS DOUBLE)")}
    AS band_share
FROM tiled GROUP BY 1, 2
"""


QUERIES: dict = {
    "graph_degree_customers": (_q_degree, _ORACLE_DEGREE),
    "graph_copurchase_parts": (_q_copurchase, _ORACLE_COPURCHASE),
    "q_monthly_streak_orders": (_q_streak, _ORACLE_STREAK),
    "q_value_bands_events": (_q_bands, _ORACLE_BANDS),
}

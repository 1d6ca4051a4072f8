"""Analytics tier 5: association lift, transition timing, chained
returns, calendar ANOVA, and rank correlation — second-order
questions over the same fact tables (the r05 batch's operators asked
"what is the distribution"; these ask "what is related to what").

Engine-exact techniques (all established repo rules):
- lift/confidence from exact integer counts, one double expression;
- transition-time MEDIANS are order-statistic lower medians (no
  interpolation);
- time-weighted return chains Σ ln(1+r) with per-term BIGINT
  quantization (products become sums — the float-determinism rule);
- the DOW variance decomposition is integer sums of 1e8-quantized
  values and their 1e6-quantized squares;
- Spearman is Pearson over UNIQUE integer ranks (row_number with a
  tiebreak) — every cross-row sum is exact BIGINT.

Plan shapes: one or two hash aggregations each; the basket-lift join
reuses the bounded basket-key pair expansion of ``analytics4``; the
per-pair relation everything joins against is broadcast-size.

Beyond-reference scope (SURVEY.md extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .analytics4 import copurchase_pairs
from .series import round_portable, round_portable_duck

__all__ = ["basket_lift", "transition_time_median",
           "time_weighted_return", "dow_variance_ratio",
           "spearman_rank_corr"]

Q = 10 ** 8
QSQ = 10 ** 6
US_PER_DAY = 86_400_000_000


def basket_lift(lines: DataFrame, basket_key: str, item_key: str,
                min_count: int = 2) -> DataFrame:
    """(item_a, item_b, n_baskets, confidence_a_b, lift): association
    metrics over co-purchase pairs. lift > 1 ⇒ the pair co-occurs
    more than independence predicts."""
    b = lines.select(F.col(basket_key).alias("__b"),
                     F.col(item_key).alias("__i")).distinct()
    n_baskets = b.select("__b").distinct().count()
    item_n = b.groupBy(F.col("__i")).agg(
        F.count(F.lit(1)).alias("__n"))
    pairs = copurchase_pairs(lines, basket_key, item_key, min_count)
    conf = "CAST(n_baskets AS DOUBLE) / CAST(__na AS DOUBLE)"
    lift = (f"({conf}) * CAST({n_baskets} AS DOUBLE) "
            "/ CAST(__nb AS DOUBLE)")
    return (
        pairs
        .join(item_n.selectExpr("__i AS item_a", "__n AS __na"),
              "item_a")
        .join(item_n.selectExpr("__i AS item_b", "__n AS __nb"),
              "item_b")
        .select(
            "item_a", "item_b", "n_baskets",
            round_portable(F.expr(conf)).alias("confidence_a_b"),
            round_portable(F.expr(lift)).alias("lift"),
        )
    )


def transition_time_median(df: DataFrame, key: str = "user_id",
                           cat: str = "event_type",
                           us_col: str = "__us") -> DataFrame:
    """(cur, nxt, n, median_gap_s): order-statistic lower median of
    the time between consecutive events, per transition type."""
    w = Window.partitionBy(key).orderBy(F.col(us_col).asc(),
                                        F.col("event_id").asc())
    pairs = (
        df.select(
            F.col(cat).alias("nxt"),
            F.lag(cat, 1).over(w).alias("cur"),
            (F.col(us_col) - F.lag(us_col, 1).over(w)).alias("__gap"),
            F.col("event_id"),
        )
        .filter(F.col("cur").isNotNull())
    )
    ws = Window.partitionBy("cur", "nxt").orderBy(
        F.col("__gap").asc(), F.col("event_id").asc())
    wn = Window.partitionBy("cur", "nxt")
    med = (
        pairs.withColumn("__rn", F.row_number().over(ws))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .filter((F.col("__rn") * 2 >= F.col("__n"))
                & ((F.col("__rn") - 1) * 2 < F.col("__n")))
    )
    return med.select(
        "cur", "nxt",
        F.col("__n").alias("n"),
        round_portable(F.expr("CAST(__gap AS DOUBLE) / 1e6"))
        .alias("median_gap_s"),
    )


def time_weighted_return(df: DataFrame, value_col: str,
                         key: str = "user_id",
                         order: list | None = None) -> DataFrame:
    """(key, n_periods, twr): geometric chained return per series —
    exp(Σ ln(1+r)) − 1 with each log-return term quantized to BIGINT
    before the order-free sum. Rows with value ≤ 0 or a non-positive
    growth factor are excluded (no defined log-return)."""
    order = order or ["ts", "event_id"]
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).asc() for c in order])
    r = (
        df.withColumn("__prev", F.lag(value_col, 1).over(w))
        .filter(F.col("__prev").isNotNull())
        .filter((F.col(value_col) > 0) & (F.col("__prev") > 0))
        .withColumn("__t", F.expr(
            f"CAST(round(ln({value_col} / __prev) * {Q}) AS BIGINT)"))
    )
    return r.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_periods"),
        round_portable(F.expr(
            f"exp(CAST(sum(__t) AS DOUBLE) / {float(Q)!r}) - 1.0")
        ).alias("twr"),
    )


def dow_variance_ratio(df: DataFrame, value_col: str,
                       us_col: str) -> DataFrame:
    """(dow, n, mean_value, between_within_ratio): day-of-week value
    profile with a one-way variance decomposition — the ratio of
    between-group to within-group mean squares (large ⇒ the weekday
    matters). Replicated per row so the gate output is one row per
    dow; all sums exact BIGINT."""
    qd = df.select(
        F.expr(f"(({us_col} DIV {US_PER_DAY}) + 4) % 7").alias("dow"),
        F.expr(f"CAST(round({value_col} * {Q}) AS BIGINT)").alias("__q"),
        F.expr(f"CAST(round({value_col} * {value_col} * {QSQ}) "
               "AS BIGINT)").alias("__qq"),
    )
    g = qd.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__q").alias("__s"),
        F.sum("__qq").alias("__ss"),
    )
    # Distinct names for the grand totals: BOTH engines resolve
    # identifiers case-insensitively, so "__S" vs "__s" would collide.
    wt = Window.partitionBy()
    g = (
        g.withColumn("__tn", F.sum("n").over(wt))
        .withColumn("__ts", F.sum("__s").over(wt))
        .withColumn("__k", F.count(F.lit(1)).over(wt))
    )
    mean_g = f"CAST(__s AS DOUBLE) / (CAST(n AS DOUBLE) * {float(Q)!r})"
    mean_t = f"CAST(__ts AS DOUBLE) / (CAST(__tn AS DOUBLE) * {float(Q)!r})"
    # Between-group SS uses group means vs grand mean; within = total
    # sum of squares about group means. Both from exact integer sums.
    between = (
        f"CAST(n AS DOUBLE) * (({mean_g}) - ({mean_t})) "
        f"* (({mean_g}) - ({mean_t}))"
    )
    within = (
        f"CAST(__ss AS DOUBLE) / {float(QSQ)!r} "
        f"- CAST(n AS DOUBLE) * ({mean_g}) * ({mean_g})"
    )
    g = (
        g.withColumn("__btw", F.expr(
            f"CAST(round(({between}) * {QSQ}) AS BIGINT)"))
        .withColumn("__wth", F.expr(
            f"CAST(round(({within}) * {QSQ}) AS BIGINT)"))
        .withColumn("__tbtw", F.sum("__btw").over(wt))
        .withColumn("__twth", F.sum("__wth").over(wt))
    )
    ratio = (
        "(CAST(__tbtw AS DOUBLE) / (CAST(__k AS DOUBLE) - 1.0)) "
        "/ (CAST(__twth AS DOUBLE) "
        "/ (CAST(__tn AS DOUBLE) - CAST(__k AS DOUBLE)))"
    )
    return g.select(
        "dow", "n",
        round_portable(F.expr(mean_g)).alias("mean_value"),
        round_portable(F.expr(ratio)).alias("between_within_ratio"),
    )


def spearman_rank_corr(df: DataFrame, x_col: str, y_col: str,
                       tiebreak: str) -> DataFrame:
    """(n, spearman): rank correlation with UNIQUE ranks (row_number
    ordered by (value, tiebreak)) — a deterministic Spearman variant
    whose every sum is exact BIGINT arithmetic."""
    wx = Window.orderBy(F.col(x_col).asc(), F.col(tiebreak).asc())
    wy = Window.orderBy(F.col(y_col).asc(), F.col(tiebreak).asc())
    ranked = (
        df.withColumn("__rx", F.row_number().over(wx).cast("bigint"))
        .withColumn("__ry", F.row_number().over(wy).cast("bigint"))
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("(__rx - __ry) * (__rx - __ry)")).alias("__d2"),
    )
    rho = (
        "1.0 - 6.0 * CAST(__d2 AS DOUBLE) "
        "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        " - 1.0))"
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        round_portable(F.expr(rho)).alias("spearman"),
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return basket_lift(load(spark, sf_dir, "lineitem"), "l_orderkey",
                       "l_partkey")


_ORACLE_LIFT = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS ik FROM lineitem
), nb AS (
  SELECT count(DISTINCT bk) AS tot FROM b
), item_n AS (
  SELECT ik, count(*) AS n FROM b GROUP BY 1
), pairs AS (
  SELECT l.ik AS item_a, r.ik AS item_b, count(*) AS n_baskets
  FROM b l JOIN b r ON l.bk = r.bk AND l.ik < r.ik
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT p.item_a, p.item_b, p.n_baskets,
  {conf} AS confidence_a_b,
  {lift} AS lift
FROM pairs p
JOIN item_n a ON p.item_a = a.ik
JOIN item_n bb ON p.item_b = bb.ik
CROSS JOIN nb
""".format(
    conf=round_portable_duck(
        "CAST(p.n_baskets AS DOUBLE) / CAST(a.n AS DOUBLE)"),
    lift=round_portable_duck(
        "(CAST(p.n_baskets AS DOUBLE) / CAST(a.n AS DOUBLE)) "
        "* CAST(nb.tot AS DOUBLE) / CAST(bb.n AS DOUBLE)"),
)


def _q_transition_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return transition_time_median(ev)


_EVENTS_W = "PARTITION BY user_id ORDER BY ts, event_id"

_ORACLE_TRANSITION_TIME = f"""
WITH pairs AS (
  SELECT event_type AS nxt,
         lag(event_type) OVER ({_EVENTS_W}) AS cur,
         epoch_us(ts) - lag(epoch_us(ts)) OVER ({_EVENTS_W}) AS g,
         event_id
  FROM events
), med AS (
  SELECT cur, nxt, n, g FROM (
    SELECT cur, nxt, g, event_id,
           row_number() OVER (PARTITION BY cur, nxt
                              ORDER BY g ASC, event_id ASC) AS rn,
           count(*) OVER (PARTITION BY cur, nxt) AS n
    FROM pairs WHERE cur IS NOT NULL
  ) WHERE rn * 2 >= n AND (rn - 1) * 2 < n
)
SELECT cur, nxt, CAST(n AS BIGINT) AS n,
  {round_portable_duck("CAST(g AS DOUBLE) / 1e6")} AS median_gap_s
FROM med
"""


def _q_twr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_weighted_return(load(spark, sf_dir, "events"), "value")


_ORACLE_TWR = f"""
WITH r AS (
  SELECT user_id, value,
         lag(value) OVER ({_EVENTS_W}) AS prev
  FROM events
), t AS (
  SELECT user_id,
         CAST(round(ln(value / prev) * {Q}) AS BIGINT) AS tq
  FROM r WHERE prev IS NOT NULL AND value > 0 AND prev > 0
)
SELECT user_id, count(*) AS n_periods,
  {round_portable_duck(
      f"exp(CAST(sum(tq) AS DOUBLE) / {float(Q)!r}) - 1.0")} AS twr
FROM t GROUP BY 1
"""


def _q_dow_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return dow_variance_ratio(ev, "value", "__us")


_DOW_MEAN_G = f"CAST(gs AS DOUBLE) / (CAST(n AS DOUBLE) * {float(Q)!r})"
_DOW_MEAN_T = f"CAST(ts AS DOUBLE) / (CAST(tn AS DOUBLE) * {float(Q)!r})"

_ORACLE_DOW_ANOVA = f"""
WITH qd AS (
  SELECT ((epoch_us(ts) // {US_PER_DAY}) + 4) % 7 AS dow,
         CAST(round(value * {Q}) AS BIGINT) AS q,
         CAST(round(value * value * {QSQ}) AS BIGINT) AS qq
  FROM events
), g AS (
  SELECT dow, count(*) AS n,
         CAST(sum(q) AS BIGINT) AS gs,
         CAST(sum(qq) AS BIGINT) AS gss
  FROM qd GROUP BY 1
), t AS (
  SELECT *, CAST(sum(n) OVER () AS BIGINT) AS tn,
         CAST(sum(gs) OVER () AS BIGINT) AS ts,
         CAST(count(*) OVER () AS BIGINT) AS k
  FROM g
), parts AS (
  SELECT *,
    CAST(round((CAST(n AS DOUBLE) * (({_DOW_MEAN_G}) - ({_DOW_MEAN_T}))
      * (({_DOW_MEAN_G}) - ({_DOW_MEAN_T}))) * {QSQ}) AS BIGINT)
      AS btw,
    CAST(round((CAST(gss AS DOUBLE) / {float(QSQ)!r}
      - CAST(n AS DOUBLE) * ({_DOW_MEAN_G}) * ({_DOW_MEAN_G}))
      * {QSQ}) AS BIGINT) AS wth
  FROM t
), tot AS (
  SELECT *, CAST(sum(btw) OVER () AS BIGINT) AS tbtw,
         CAST(sum(wth) OVER () AS BIGINT) AS twth
  FROM parts
)
SELECT dow, n,
  {round_portable_duck(_DOW_MEAN_G)} AS mean_value,
  {round_portable_duck(
      "(CAST(tbtw AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)) "
      "/ (CAST(twth AS DOUBLE) "
      "/ (CAST(tn AS DOUBLE) - CAST(k AS DOUBLE)))")}
    AS between_within_ratio
FROM tot
"""


def _q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", "length(text) AS x",
        "size(split(trim(lower(text)), '\\\\s+')) AS y")
    return spearman_rank_corr(docs, "x", "y", "doc_id")


_ORACLE_SPEARMAN = f"""
WITH base AS (
  SELECT doc_id, length(text) AS x,
         len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS y
  FROM documents
), ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY x ASC, doc_id ASC) AS BIGINT)
           AS rx,
         CAST(row_number() OVER (ORDER BY y ASC, doc_id ASC) AS BIGINT)
           AS ry
  FROM base
), agg AS (
  SELECT count(*) AS n,
         CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS d2
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n,
  {round_portable_duck(
      "1.0 - 6.0 * CAST(d2 AS DOUBLE) "
      "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
      " - 1.0))")} AS spearman
FROM agg
"""


QUERIES: dict = {
    "q_basket_lift_parts": (_q_lift, _ORACLE_LIFT),
    "q_transition_time_events": (_q_transition_time,
                                 _ORACLE_TRANSITION_TIME),
    "q_twr_events": (_q_twr, _ORACLE_TWR),
    "q_dow_anova_events": (_q_dow_anova, _ORACLE_DOW_ANOVA),
    "text_spearman_len_tokens": (_q_spearman, _ORACLE_SPEARMAN),
}


def _q_topk_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per priority WITH ties kept (rank(), not
    row_number) — the tie-preserving top-k semantics the dense
    TakeOrderedAndProject path cannot express."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc())
    return (
        o.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey",
                round_portable(F.col("o_totalprice"))
                .alias("o_totalprice"),
                F.col("rnk").cast("int").alias("rnk"))
    )


_ORACLE_TOPK_TIES = f"""
SELECT o_orderpriority, o_orderkey,
       {round_portable_duck("o_totalprice")} AS o_totalprice,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, rank() OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


QUERIES["q_topk_with_ties_orders"] = (_q_topk_ties, _ORACLE_TOPK_TIES)

"""Microstructure #5: quote-based trade classification — Lee-Ready
(prevailing-quote midpoint test with the tick-rule fallback at the
mid) and the effective half-spread in basis points.

The reference's tick-rule signing (``micro_sign_trades_events``,
mirroring ``/root/reference/src`` signal semantics) classifies from
trade prices alone; Lee-Ready (JF 1991) is the standard upgrade when
a quote stream exists: a trade above the prevailing mid is a buy,
below is a sell, and AT the mid it falls back to the last nonzero
price-change direction.

Composition, not new machinery: the prevailing quote is
``operators/asof.py::asof_join`` (backward, per key); the fallback is
one ignore-nulls carry window; the summaries are per-key hash
aggregates of quantized terms.

Plan shape at scale: the quote relation aggregates to one row per
(key, hour) before the as-of join, so the join's right side is tiny
relative to trades and the union-sort inside asof_join shuffles on
the key exactly once; classification and both summaries are a second
window/aggregate over the SAME key partitioning — no extra exchange
(AQE reuses it). The mid comparison and carry are pure Catalyst; no
Python anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .asof import asof_join

__all__ = ["lee_ready_classify", "lee_ready_summary",
           "effective_spread"]

Q = 10 ** 8
QF = float(Q)
US_PER_HOUR = 3_600_000_000


def lee_ready_classify(trades: DataFrame, quotes: DataFrame,
                       keys: Sequence[str], trade_us: str,
                       order: Sequence[str], price_col: str,
                       quote_us: str, bid_col: str,
                       ask_col: str) -> DataFrame:
    """Trades + ``(__mid, __side)``: ``__side`` is +1 (buy) / -1
    (sell) by the prevailing-mid test, tick-rule carry at the mid,
    NULL when neither test decides (leading at-mid trades)."""
    keys = list(keys)
    joined = asof_join(trades, quotes, keys, trade_us, quote_us,
                       [bid_col, ask_col], how="left")
    wrow = Window.partitionBy(*keys).orderBy(
        *[F.col(c).asc() for c in order])
    wcarry = wrow.rowsBetween(Window.unboundedPreceding, 0)
    prevp = F.lag(price_col, 1).over(wrow)
    tick = F.when(
        prevp.isNotNull() & (F.col(price_col) != prevp),
        F.when(F.col(price_col) > prevp, F.lit(1)).otherwise(F.lit(-1)))
    mid = (F.col(bid_col) + F.col(ask_col)) / F.lit(2.0)
    return (
        joined
        .withColumn("__mid", mid)
        .withColumn("__carry", F.last(tick, ignorenulls=True).over(wcarry))
        .withColumn("__side", F.when(
            F.col("__mid").isNotNull() & (F.col(price_col) > F.col("__mid")),
            F.lit(1)
        ).when(
            F.col("__mid").isNotNull() & (F.col(price_col) < F.col("__mid")),
            F.lit(-1)
        ).otherwise(F.col("__carry")))
    )


def lee_ready_summary(trades: DataFrame, quotes: DataFrame,
                      keys: Sequence[str], trade_us: str,
                      order: Sequence[str], price_col: str,
                      quote_us: str, bid_col: str,
                      ask_col: str) -> DataFrame:
    """(keys..., n_trades, n_buy, n_sell, n_unclassified, buy_share)
    per key from the Lee-Ready classification."""
    cls = lee_ready_classify(trades, quotes, keys, trade_us, order,
                             price_col, quote_us, bid_col, ask_col)
    agg = cls.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
        F.sum(F.expr(
            "CASE WHEN __side = 1 THEN 1 ELSE 0 END"
        )).cast("bigint").alias("n_buy"),
        F.sum(F.expr(
            "CASE WHEN __side = -1 THEN 1 ELSE 0 END"
        )).cast("bigint").alias("n_sell"),
        F.sum(F.expr(
            "CASE WHEN __side IS NULL THEN 1 ELSE 0 END"
        )).cast("bigint").alias("n_unclassified"),
    )
    return agg.select(
        *keys, "n_trades", "n_buy", "n_sell", "n_unclassified",
        round_portable(F.expr(
            "CASE WHEN n_buy + n_sell > 0 THEN CAST(n_buy AS DOUBLE) "
            "/ CAST(n_buy + n_sell AS DOUBLE) END"), 6
        ).alias("buy_share"),
    )


def effective_spread(trades: DataFrame, quotes: DataFrame,
                     keys: Sequence[str], trade_us: str,
                     price_col: str, quote_us: str, bid_col: str,
                     ask_col: str) -> DataFrame:
    """(keys..., n_quoted, eff_spread_bps): mean effective spread
    ``2 |p - mid| / mid`` in basis points over trades with a
    positive prevailing mid. Terms quantize to BIGINT pre-sum."""
    keys = list(keys)
    joined = asof_join(trades, quotes, keys, trade_us, quote_us,
                       [bid_col, ask_col], how="left")
    mid = f"(({bid_col} + {ask_col}) / 2.0)"
    term = (f"CAST(round(2.0 * abs({price_col} - {mid}) / {mid} "
            f"* 10000.0 * {Q}) AS BIGINT)")
    agg = (
        joined.filter(F.expr(f"{mid} > 0"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_quoted"),
             F.sum(F.expr(term)).alias("__s"))
    )
    return agg.select(
        *keys, "n_quoted",
        round_portable(F.expr(
            f"CAST(__s AS DOUBLE) / (CAST(n_quoted AS DOUBLE) "
            f"* {QF!r})"), 6).alias("eff_spread_bps"),
    )


def _staged(spark: SparkSession, sf_dir: str):
    """Trades = all events (symbol = user_id % 16, price = value);
    quotes = per (symbol, hour) [min, max] value at the hour start —
    a deterministic synthetic book consistent across engines."""
    ev = load(spark, sf_dir, "events").select(
        F.expr("user_id % 16").alias("symbol"),
        F.expr("ts DIV 1000").alias("us"),
        F.col("event_id"),
        F.col("value").alias("price"),
    )
    quotes = (
        ev.withColumn("__h", F.expr(f"us DIV {US_PER_HOUR}"))
        .groupBy("symbol", "__h")
        .agg(F.min("price").alias("bid"), F.max("price").alias("ask"))
        .select("symbol",
                (F.col("__h") * US_PER_HOUR).alias("q_us"),
                "bid", "ask")
    )
    return ev, quotes


def _q_lee_ready(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, quotes = _staged(spark, sf_dir)
    return lee_ready_summary(ev, quotes, ["symbol"], "us",
                             ["us", "event_id"], "price", "q_us",
                             "bid", "ask")


def _q_eff_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, quotes = _staged(spark, sf_dir)
    return effective_spread(ev, quotes, ["symbol"], "us", "price",
                            "q_us", "bid", "ask")


_STAGED_DUCK = f"""
ev AS (
  SELECT user_id % 16 AS symbol, epoch_us(ts) AS us, event_id,
         value AS price
  FROM events
), quotes AS (
  SELECT symbol, h * {US_PER_HOUR} AS q_us, bid, ask
  FROM (
    SELECT symbol, us // {US_PER_HOUR} AS h,
           min(price) AS bid, max(price) AS ask
    FROM ev GROUP BY 1, 2
  )
), joined AS (
  SELECT e.symbol, e.us, e.event_id, e.price, q.bid, q.ask,
         (q.bid + q.ask) / 2.0 AS mid
  FROM ev e ASOF LEFT JOIN quotes q
    ON e.symbol = q.symbol AND e.us >= q.q_us
)"""

_ORACLE_LEE_READY = f"""
WITH {_STAGED_DUCK}
, ticked AS (
  SELECT symbol, us, event_id, price, mid,
    CASE WHEN lag(price) OVER w IS NOT NULL
              AND price != lag(price) OVER w
         THEN CASE WHEN price > lag(price) OVER w THEN 1 ELSE -1 END
    END AS tick
  FROM joined
  WINDOW w AS (PARTITION BY symbol ORDER BY us, event_id)
), classified AS (
  SELECT symbol,
    CASE WHEN mid IS NOT NULL AND price > mid THEN 1
         WHEN mid IS NOT NULL AND price < mid THEN -1
         ELSE last_value(tick IGNORE NULLS) OVER (
           PARTITION BY symbol ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    END AS side
  FROM ticked
), agg AS (
  SELECT symbol,
    CAST(count(*) AS BIGINT) AS n_trades,
    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_buy,
    CAST(sum(CASE WHEN side = -1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_sell,
    CAST(sum(CASE WHEN side IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_unclassified
  FROM classified GROUP BY 1
)
SELECT symbol, n_trades, n_buy, n_sell, n_unclassified,
  {round_portable_duck(
      "CASE WHEN n_buy + n_sell > 0 THEN CAST(n_buy AS DOUBLE) "
      "/ CAST(n_buy + n_sell AS DOUBLE) END", 6)} AS buy_share
FROM agg
"""

_ORACLE_EFF_SPREAD = f"""
WITH {_STAGED_DUCK}
, agg AS (
  SELECT symbol,
    CAST(count(*) AS BIGINT) AS n_quoted,
    CAST(sum(CAST(round(2.0 * abs(price - mid) / mid * 10000.0
      * {Q}) AS BIGINT)) AS BIGINT) AS s
  FROM joined WHERE mid > 0 GROUP BY 1
)
SELECT symbol, n_quoted,
  {round_portable_duck(
      f"CAST(s AS DOUBLE) / (CAST(n_quoted AS DOUBLE) * {QF!r})",
      6)} AS eff_spread_bps
FROM agg
"""


QUERIES: dict = {
    "micro_lee_ready_events": (_q_lee_ready, _ORACLE_LEE_READY),
    "micro_eff_spread_events": (_q_eff_spread, _ORACLE_EFF_SPREAD),
}

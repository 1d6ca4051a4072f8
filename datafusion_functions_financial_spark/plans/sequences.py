"""Event-sequence statistics: Markov transition matrix, conditional
next-event entropy, and inter-arrival survival shares — the sequence
shape of a behavioral event log (the inputs to session modeling and
next-event prediction; for a training-data pipeline these are the
"is the event stream plausibly human" screens).

Engine-exact: transitions are lag/lead pairs over a uniquely-ordered
per-user window (integer counts); probabilities are single divisions
of exact counts; entropy terms ``−p·ln p`` quantize to BIGINT at 1e8
before the cross-category sum (float-determinism rule); survival
shares are pure integer threshold counts over integer microsecond
gaps.

Plan shape at scale: one hash shuffle on user_id feeds the sequence
window; everything downstream aggregates on low-cardinality
(event_type × event_type) keys — map-side combinable, broadcast-size
results.

Beyond-reference scope (SURVEY.md extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .series import round_portable, round_portable_duck

__all__ = ["markov_transitions", "transition_entropy", "gap_survival"]

Q = 10 ** 8
_EVENTS_W = "PARTITION BY user_id ORDER BY ts, event_id"


def _pairs(df: DataFrame, key: str, cat: str,
           order: list[str]) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc() for c in order])
    return (
        df.select(F.col(cat).alias("cur"),
                  F.lead(cat, 1).over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
    )


def markov_transitions(df: DataFrame, key: str = "user_id",
                       cat: str = "event_type",
                       order: list[str] | None = None) -> DataFrame:
    """(cur, nxt, n, p): first-order transition matrix of the
    category sequence per key, pooled across keys."""
    counts = _pairs(df, key, cat, order or ["ts", "event_id"]) \
        .groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("cur")
    return counts.withColumn(
        "p",
        round_portable(F.expr(
            "CAST(n AS DOUBLE) / CAST(sum(n) OVER "
            "(PARTITION BY cur) AS DOUBLE)")),
    )


def transition_entropy(df: DataFrame, key: str = "user_id",
                       cat: str = "event_type",
                       order: list[str] | None = None) -> DataFrame:
    """(cur, n, entropy): Shannon entropy (nats) of the next-event
    distribution per current state. 0 = deterministic follower;
    ln(k) = uniform over k states."""
    counts = _pairs(df, key, cat, order or ["ts", "event_id"]) \
        .groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("__n"))
    wt = Window.partitionBy("cur")
    p = "CAST(__n AS DOUBLE) / CAST(__t AS DOUBLE)"
    term = f"CAST(round(-({p}) * ln({p}) * {Q}) AS BIGINT)"
    return (
        counts.withColumn("__t", F.sum("__n").over(wt))
        .withColumn("__e", F.expr(term))
        .groupBy("cur")
        .agg(
            F.sum("__n").cast("bigint").alias("n"),
            round_portable(F.expr(
                f"CAST(sum(__e) AS DOUBLE) / {float(Q)!r}")
            ).alias("entropy"),
        )
    )


def gap_survival(df: DataFrame, key: str = "user_id",
                 us_col: str = "__us", cat: str = "event_type",
                 horizons_s: tuple = (60, 300, 3600)) -> DataFrame:
    """(category, n_gaps, surv_<h>s...): share of inter-arrival gaps
    (per-key consecutive events, attributed to the LATER event's
    category) exceeding each horizon — the empirical survival curve
    at fixed points, exact integer counting."""
    w = Window.partitionBy(key).orderBy(F.col(us_col).asc(),
                                        F.col("event_id").asc())
    gaps = (
        df.select(F.col(cat).alias("category"),
                  (F.col(us_col) - F.lag(us_col, 1).over(w))
                  .alias("__gap"))
        .filter(F.col("__gap").isNotNull())
    )
    aggs = [F.count(F.lit(1)).alias("n_gaps")]
    for h in horizons_s:
        aggs.append(round_portable(F.expr(
            f"CAST(sum(CASE WHEN __gap > {h * 1_000_000} THEN 1 "
            f"ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
        )).alias(f"surv_{h}s"))
    return gaps.groupBy("category").agg(*aggs)


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    return markov_transitions(load(spark, sf_dir, "events"))


_ORACLE_MARKOV = f"""
WITH pairs AS (
  SELECT event_type AS cur,
         lead(event_type) OVER ({_EVENTS_W}) AS nxt
  FROM events
), counts AS (
  SELECT cur, nxt, count(*) AS n FROM pairs
  WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT cur, nxt, n,
  {round_portable_duck(
      "CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY cur) "
      "AS DOUBLE)")} AS p
FROM counts
"""


def _q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transition_entropy(load(spark, sf_dir, "events"))


_ORACLE_ENTROPY = f"""
WITH pairs AS (
  SELECT event_type AS cur,
         lead(event_type) OVER ({_EVENTS_W}) AS nxt
  FROM events
), counts AS (
  SELECT cur, nxt, count(*) AS n FROM pairs
  WHERE nxt IS NOT NULL GROUP BY 1, 2
), t AS (
  SELECT *, CAST(sum(n) OVER (PARTITION BY cur) AS BIGINT) AS tt
  FROM counts
), e AS (
  SELECT cur, n,
         CAST(round(-(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE))
           * ln(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE)) * {Q})
           AS BIGINT) AS eq
  FROM t
)
SELECT cur, CAST(sum(n) AS BIGINT) AS n,
  {round_portable_duck(f"CAST(sum(eq) AS DOUBLE) / {float(Q)!r}")}
    AS entropy
FROM e GROUP BY 1
"""


def _q_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return gap_survival(ev)


_ORACLE_SURVIVAL = f"""
WITH gaps AS (
  SELECT event_type AS category,
         epoch_us(ts) - lag(epoch_us(ts)) OVER ({_EVENTS_W}) AS g
  FROM events
)
SELECT category, count(*) AS n_gaps,
  {round_portable_duck(
      "CAST(sum(CASE WHEN g > 60000000 THEN 1 ELSE 0 END) AS DOUBLE)"
      " / CAST(count(*) AS DOUBLE)")} AS surv_60s,
  {round_portable_duck(
      "CAST(sum(CASE WHEN g > 300000000 THEN 1 ELSE 0 END) AS DOUBLE)"
      " / CAST(count(*) AS DOUBLE)")} AS surv_300s,
  {round_portable_duck(
      "CAST(sum(CASE WHEN g > 3600000000 THEN 1 ELSE 0 END) AS DOUBLE)"
      " / CAST(count(*) AS DOUBLE)")} AS surv_3600s
FROM gaps WHERE g IS NOT NULL
GROUP BY 1
"""


QUERIES: dict = {
    "q_markov_transitions_events": (_q_markov, _ORACLE_MARKOV),
    "q_transition_entropy_events": (_q_entropy, _ORACLE_ENTROPY),
    "q_gap_survival_events": (_q_survival, _ORACLE_SURVIVAL),
}


# --------------------------------------------------------------------------
# Conversion attribution (first-touch / last-touch)
# --------------------------------------------------------------------------

TARGET_EVENT = "purchase"


def attribution(df: DataFrame, key: str = "user_id",
                cat: str = "event_type",
                target: str = TARGET_EVENT,
                order: list[str] | None = None) -> DataFrame:
    """(channel, n_first_touch, n_last_touch): conversions credited to
    the user's FIRST preceding non-target event and to the LAST one —
    the two standard single-touch attribution models, as exact window
    selections (ignore-nulls first/last over the strict-past frame)."""
    order = order or ["ts", "event_id"]
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ch = F.when(F.col(cat) != target, F.col(cat))
    touched = (
        df.withColumn("__first", F.first(ch, ignorenulls=True).over(w))
        .withColumn("__last", F.last(ch, ignorenulls=True).over(w))
        .filter(F.col(cat) == target)
    )
    firsts = (
        touched.filter(F.col("__first").isNotNull())
        .groupBy(F.col("__first").alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_first_touch"))
    )
    lasts = (
        touched.filter(F.col("__last").isNotNull())
        .groupBy(F.col("__last").alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_last_touch"))
    )
    return (
        firsts.join(lasts, "channel", "full")
        .select(
            "channel",
            F.coalesce("n_first_touch", F.lit(0)).cast("bigint")
            .alias("n_first_touch"),
            F.coalesce("n_last_touch", F.lit(0)).cast("bigint")
            .alias("n_last_touch"),
        )
    )


def _q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attribution(load(spark, sf_dir, "events"))


_ORACLE_ATTRIBUTION = f"""
WITH touched AS (
  SELECT event_type,
         first_value(CASE WHEN event_type != '{TARGET_EVENT}'
                     THEN event_type END IGNORE NULLS)
           OVER ({_EVENTS_W} ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING) AS ft,
         last_value(CASE WHEN event_type != '{TARGET_EVENT}'
                    THEN event_type END IGNORE NULLS)
           OVER ({_EVENTS_W} ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING) AS lt
  FROM events
), conv AS (
  SELECT * FROM touched WHERE event_type = '{TARGET_EVENT}'
), f AS (
  SELECT ft AS channel, count(*) AS n_first_touch
  FROM conv WHERE ft IS NOT NULL GROUP BY 1
), l AS (
  SELECT lt AS channel, count(*) AS n_last_touch
  FROM conv WHERE lt IS NOT NULL GROUP BY 1
)
SELECT coalesce(f.channel, l.channel) AS channel,
       CAST(coalesce(n_first_touch, 0) AS BIGINT) AS n_first_touch,
       CAST(coalesce(n_last_touch, 0) AS BIGINT) AS n_last_touch
FROM f FULL JOIN l ON f.channel = l.channel
"""


QUERIES["q_attribution_events"] = (_q_attribution, _ORACLE_ATTRIBUTION)

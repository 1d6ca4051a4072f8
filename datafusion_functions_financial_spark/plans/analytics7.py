"""Analytics #7: lead-lag cross-correlation between two series,
frequent event-type trigrams (sequence mining lite), and the
vocabulary coverage curve (what share of the corpus a top-v
tokenizer vocabulary captures) — cross-series and corpus-planning
questions the per-series diagnostics don't answer.

Engine-exact: hourly means are exact BIGINT-sum ratios, deviation
products quantize before summing, the lag alignment is an integer
self-join on the row index of the TINY paired-hours relation;
trigram and coverage arithmetic is pure integers until the final
share ratios.

Plan shapes at scale:
- CCF: two hourly hash aggregates collapse the corpus to <=hours
  rows each; everything after (inner join on hour, 7-lag fan-out,
  quantized reductions) runs on broadcast-sized frames.
- trigrams: one window pass per series key + a map-side-combined
  count; top-k plans as TakeOrderedAndProject.
- coverage: the ranked window runs over the distinct-token relation
  (Zipf-collapsed by the groupBy), not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.vocab import token_counts
from ..sources.tables import load
from .series import round_portable, round_portable_duck

__all__ = ["cross_correlation_hourly", "top_trigrams",
           "vocab_coverage", "seasonal_residual_anomalies"]

Q = 10 ** 8
Q2 = 10 ** 6
US_PER_HOUR = 3_600_000_000
CCF_MAX_LAG = 3
TRIGRAM_TOP = 20
COVERAGE_SIZES = (100, 1000, 10000)


def cross_correlation_hourly(df: DataFrame, us_col: str,
                             value_col: str, series_expr: str,
                             series_a: str, series_b: str,
                             max_lag: int = CCF_MAX_LAG) -> DataFrame:
    """(lag, n_pairs, ccf) for lag in [-max_lag, max_lag]:
    ``ccf(l) = sum_t (a_t - abar)(b_{t+l} - bbar) /
    sqrt(SS_a * SS_b)`` over the hours where BOTH series exist
    (means/SS over the full paired sample, per the standard CCF)."""
    def hourly(side: str):
        return (
            df.filter(F.expr(series_expr) == F.lit(side))
            .selectExpr(f"({us_col}) DIV {US_PER_HOUR} AS __h",
                        f"{value_col} AS __v")
            .groupBy("__h")
            .agg(F.count(F.lit(1)).alias("__c"),
                 F.sum(F.expr(
                     f"CAST(round(__v * {Q}) AS BIGINT)")).alias("__s"))
            .selectExpr(
                "__h",
                f"CAST(__s AS DOUBLE) / (CAST(__c AS DOUBLE) "
                f"* {float(Q)!r}) AS __m")
        )
    paired = (
        hourly(series_a).withColumnRenamed("__m", "__ma")
        .join(hourly(series_b).withColumnRenamed("__m", "__mb"), "__h")
        .withColumn("__rn", F.row_number().over(Window.orderBy("__h")))
    )
    stats = paired.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.expr(f"CAST(round(__ma * {Q}) AS BIGINT)")).alias("__sa"),
        F.sum(F.expr(f"CAST(round(__mb * {Q}) AS BIGINT)")).alias("__sb"),
    )
    abar = f"CAST(__sa AS DOUBLE) / (CAST(__n AS DOUBLE) * {float(Q)!r})"
    bbar = f"CAST(__sb AS DOUBLE) / (CAST(__n AS DOUBLE) * {float(Q)!r})"
    dev = (
        paired.crossJoin(F.broadcast(stats))
        .withColumn("__da", F.expr(f"__ma - ({abar})"))
        .withColumn("__db", F.expr(f"__mb - ({bbar})"))
        .select("__rn", "__da", "__db")
    )
    ss = dev.agg(
        F.sum(F.expr(
            f"CAST(round(__da * __da * {Q2}) AS BIGINT)")).alias("__ssa"),
        F.sum(F.expr(
            f"CAST(round(__db * __db * {Q2}) AS BIGINT)")).alias("__ssb"),
    )
    lags = df.sparkSession.range(1).selectExpr(
        f"explode(sequence({-max_lag}, {max_lag})) AS lag")
    shifted = (
        dev.selectExpr("__rn", "__da")
        .crossJoin(F.broadcast(lags))
        .join(dev.selectExpr("__rn AS __rnb", "__db"),
              F.expr("__rnb = __rn + lag"))
        .groupBy("lag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
             F.sum(F.expr(
                 f"CAST(round(__da * __db * {Q2}) AS BIGINT)"
             )).alias("__num"))
    )
    return (
        shifted.crossJoin(F.broadcast(ss))
        .select(
            F.col("lag").cast("bigint").alias("lag"),
            "n_pairs",
            round_portable(F.expr(
                f"(CAST(__num AS DOUBLE) / {float(Q2)!r}) "
                f"/ sqrt((CAST(__ssa AS DOUBLE) / {float(Q2)!r}) "
                f"* (CAST(__ssb AS DOUBLE) / {float(Q2)!r}))"), 6
            ).alias("ccf"),
        )
    )


def top_trigrams(df: DataFrame, sym_col: str, keys: list[str],
                 order: list[str], k: int = TRIGRAM_TOP) -> DataFrame:
    """(t0, t1, t2, n): the k most frequent consecutive symbol
    trigrams across all key series (count DESC, symbols ASC) — the
    go-to first look at sequential behavior before fitting a Markov
    model."""
    w = Window.partitionBy(*keys).orderBy(*order)
    tri = (
        df.withColumn("__t2", F.col(sym_col))
        .withColumn("__t1", F.lag(sym_col, 1).over(w))
        .withColumn("__t0", F.lag(sym_col, 2).over(w))
        .filter(F.col("__t0").isNotNull())
        .groupBy("__t0", "__t1", "__t2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return (
        tri.orderBy(F.col("n").desc(), F.col("__t0").asc(),
                    F.col("__t1").asc(), F.col("__t2").asc())
        .limit(k)
        .select(F.col("__t0").alias("t0"), F.col("__t1").alias("t1"),
                F.col("__t2").alias("t2"), "n")
    )


def vocab_coverage(df: DataFrame, text_col: str = "text",
                   sizes: tuple[int, ...] = COVERAGE_SIZES) -> DataFrame:
    """(vocab_size, covered_tokens, total_tokens, share) per candidate
    vocabulary size: the corpus mass captured by the top-``size``
    tokens (rank by count DESC, token ASC) — the curve that sizes a
    tokenizer vocabulary."""
    counts = token_counts(df, text_col)
    ranked = counts.withColumn("__rn", F.row_number().over(
        Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))))
    sizes_df = df.sparkSession.range(1).selectExpr(
        "explode(array({}) ) AS vocab_size".format(
            ", ".join(f"CAST({s} AS BIGINT)" for s in sizes)))
    total = counts.agg(
        F.sum("n_occurrences").cast("bigint").alias("total_tokens"))
    return (
        ranked.crossJoin(F.broadcast(sizes_df))
        .filter(F.col("__rn") <= F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(F.sum("n_occurrences").cast("bigint")
             .alias("covered_tokens"))
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_size", "covered_tokens", "total_tokens",
            round_portable(F.expr(
                "CAST(covered_tokens AS DOUBLE) "
                "/ CAST(total_tokens AS DOUBLE)"), 6).alias("share"),
        )
    )


TREND_HALF = 12          # same centered 25h trend as analytics6
ANOM_TOP = 20


def seasonal_residual_anomalies(df: DataFrame, us_col: str,
                                value_col: str,
                                k: int = ANOM_TOP) -> DataFrame:
    """(hour, hour_of_day, residual, z): the ``k`` hours whose value
    deviates most from trend + hourly seasonality — the anomaly
    consumer of the classical decomposition in
    ``plans/analytics6.py::seasonal_decompose`` (same 25h centered
    trend, same exact-integer detrending; the residual subtracts the
    hour-of-day mean in exact integers before one float division).

    Plan: hourly hash aggregate collapses the corpus, everything
    after runs on the <=hours relation; top-k is orderBy+limit
    (TakeOrderedAndProject)."""
    win = 2 * TREND_HALF + 1
    hourly = (
        df.select(
            F.expr(f"{us_col} DIV {US_PER_HOUR}").alias("__h"),
            F.expr(f"CAST(round({value_col} * {Q}) AS BIGINT)")
            .alias("__q"),
        )
        .groupBy("__h")
        .agg(F.sum("__q").alias("__s"), F.count(F.lit(1)).alias("__c"))
        .withColumn("__yq", F.expr(
            "CAST(round(CAST(__s AS DOUBLE) / CAST(__c AS DOUBLE))"
            " AS BIGINT)"))
    )
    w = Window.orderBy("__h").rowsBetween(-TREND_HALF, TREND_HALF)
    whod = Window.partitionBy(F.col("__h") % 24)
    scale = float(win * Q)
    trended = (
        hourly.withColumn("__tsum", F.sum("__yq").over(w))
        .withColumn("__tn", F.count(F.lit(1)).over(w))
        .filter(F.col("__tn") == win)
        .withColumn("__det", F.col("__yq") * win - F.col("__tsum"))
        .withColumn("__nh", F.count(F.lit(1)).over(whod))
        .withColumn("__sd", F.sum("__det").over(whod))
        .withColumn("__r", F.expr(
            f"CAST(__det * __nh - __sd AS DOUBLE) "
            f"/ (CAST(__nh AS DOUBLE) * {scale!r})"))
    )
    moms = trended.agg(
        F.count(F.lit(1)).alias("__nb"),
        F.sum(F.expr(
            f"CAST(round(__r * {Q}) AS BIGINT)")).alias("__rs"),
        F.sum(F.expr(
            f"CAST(round(__r * __r * {Q2}) AS BIGINT)")).alias("__rss"),
    )
    rbar = f"CAST(__rs AS DOUBLE) / (CAST(__nb AS DOUBLE) * {float(Q)!r})"
    rsd = (
        f"sqrt(greatest(CAST(__rss AS DOUBLE) "
        f"/ (CAST(__nb AS DOUBLE) * {float(Q2)!r}) "
        f"- ({rbar}) * ({rbar}), CAST(0 AS DOUBLE)))"
    )
    return (
        trended.crossJoin(F.broadcast(moms))
        .withColumn("__z", F.expr(f"(__r - ({rbar})) / ({rsd})"))
        .orderBy(F.abs(F.col("__z")).desc(), F.col("__h").asc())
        .limit(k)
        .select(
            F.col("__h").cast("bigint").alias("hour"),
            (F.col("__h") % 24).cast("bigint").alias("hour_of_day"),
            round_portable(F.col("__r"), 6).alias("residual"),
            round_portable(F.col("__z"), 6).alias("z"),
        )
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does click activity lead purchase value (or vice versa)?"""
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return cross_correlation_hourly(ev, "__us", "value", "event_type",
                                    "click", "purchase")


def _ccf_hourly_duck(side: str) -> str:
    return f"""
  SELECT epoch_us(ts) // {US_PER_HOUR} AS h,
         CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS DOUBLE)
           / (CAST(count(*) AS DOUBLE) * {float(Q)!r}) AS m
  FROM events WHERE event_type = '{side}' GROUP BY 1
"""


_ORACLE_CCF = f"""
WITH ha AS ({_ccf_hourly_duck('click')}),
hb AS ({_ccf_hourly_duck('purchase')}),
paired AS (
  SELECT ha.h, ha.m AS ma, hb.m AS mb,
         row_number() OVER (ORDER BY ha.h) AS rn
  FROM ha JOIN hb ON ha.h = hb.h
), stats AS (
  SELECT count(*) AS n,
         sum(CAST(round(ma * {Q}) AS BIGINT)) AS sa,
         sum(CAST(round(mb * {Q}) AS BIGINT)) AS sb
  FROM paired
), dev AS (
  SELECT rn,
    ma - (CAST(sa AS DOUBLE) / (CAST(n AS DOUBLE) * {float(Q)!r}))
      AS da,
    mb - (CAST(sb AS DOUBLE) / (CAST(n AS DOUBLE) * {float(Q)!r}))
      AS db
  FROM paired CROSS JOIN stats
), ss AS (
  SELECT sum(CAST(round(da * da * {Q2}) AS BIGINT)) AS ssa,
         sum(CAST(round(db * db * {Q2}) AS BIGINT)) AS ssb
  FROM dev
), lags AS (
  SELECT unnest(range({-CCF_MAX_LAG}, {CCF_MAX_LAG + 1})) AS lag
), shifted AS (
  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
         sum(CAST(round(a.da * b.db * {Q2}) AS BIGINT)) AS num
  FROM dev a CROSS JOIN lags l
  JOIN dev b ON b.rn = a.rn + l.lag
  GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
  {round_portable_duck(
      f"(CAST(num AS DOUBLE) / {float(Q2)!r}) "
      f"/ sqrt((CAST(ssa AS DOUBLE) / {float(Q2)!r}) "
      f"* (CAST(ssb AS DOUBLE) / {float(Q2)!r}))", 6)} AS ccf
FROM shifted CROSS JOIN ss
"""


def _q_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_trigrams(load(spark, sf_dir, "events"), "event_type",
                        ["user_id"], ["ts", "event_id"])


_ORACLE_TRIGRAMS = f"""
WITH lagged AS (
  SELECT lag(event_type, 2) OVER w AS t0,
         lag(event_type, 1) OVER w AS t1,
         event_type AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tri AS (
  SELECT t0, t1, t2, CAST(count(*) AS BIGINT) AS n
  FROM lagged WHERE t0 IS NOT NULL GROUP BY 1, 2, 3
)
SELECT t0, t1, t2, n FROM tri
ORDER BY n DESC, t0, t1, t2 LIMIT {TRIGRAM_TOP}
"""


def _q_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_coverage(load(spark, sf_dir, "documents"))


_ORACLE_COVERAGE = f"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
), flat AS (
  SELECT u.token FROM toks, UNNEST(t) AS u(token) WHERE u.token != ''
), counts AS (
  SELECT token, count(*) AS n FROM flat GROUP BY token
), ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rn
  FROM counts
), sizes AS (
  SELECT unnest([{', '.join(
      f'CAST({s} AS BIGINT)' for s in COVERAGE_SIZES)}]) AS vocab_size
), total AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_tokens FROM counts
)
SELECT s.vocab_size,
  CAST(sum(r.n) AS BIGINT) AS covered_tokens,
  max(t.total_tokens) AS total_tokens,
  {round_portable_duck(
      "CAST(sum(r.n) AS DOUBLE) / CAST(max(t.total_tokens) AS DOUBLE)",
      6)} AS share
FROM ranked r CROSS JOIN sizes s CROSS JOIN total t
WHERE r.rn <= s.vocab_size
GROUP BY 1
"""


def _q_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return seasonal_residual_anomalies(ev, "__us", "value")


_RA_WIN = 2 * TREND_HALF + 1
_RA_SCALE = float(_RA_WIN * Q)
_RA_RBAR = f"CAST(rs AS DOUBLE) / (CAST(nb AS DOUBLE) * {float(Q)!r})"
_RA_RSD = (
    f"sqrt(greatest(CAST(rss AS DOUBLE) "
    f"/ (CAST(nb AS DOUBLE) * {float(Q2)!r}) "
    f"- ({_RA_RBAR}) * ({_RA_RBAR}), CAST(0 AS DOUBLE)))"
)

_ORACLE_RESIDUAL_ANOMALIES = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS h,
         CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS BIGINT) AS s,
         count(*) AS c
  FROM events GROUP BY 1
), yq AS (
  SELECT h,
         CAST(round(CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) AS BIGINT)
           AS yq
  FROM hourly
), tr AS (
  SELECT h, yq,
         CAST(sum(yq) OVER w AS BIGINT) AS tsum,
         count(*) OVER w AS tn
  FROM yq
  WINDOW w AS (ORDER BY h ROWS BETWEEN {TREND_HALF} PRECEDING
               AND {TREND_HALF} FOLLOWING)
), det AS (
  SELECT h, yq * {_RA_WIN} - tsum AS det
  FROM tr WHERE tn = {_RA_WIN}
), hod AS (
  SELECT h, det,
         CAST(count(*) OVER (PARTITION BY h % 24) AS BIGINT) AS nh,
         CAST(sum(det) OVER (PARTITION BY h % 24) AS BIGINT) AS sd
  FROM det
), resid AS (
  SELECT h,
         CAST(det * nh - sd AS DOUBLE)
           / (CAST(nh AS DOUBLE) * {_RA_SCALE!r}) AS r
  FROM hod
), moms AS (
  SELECT CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(CAST(round(r * {Q}) AS BIGINT)) AS BIGINT) AS rs,
         CAST(sum(CAST(round(r * r * {Q2}) AS BIGINT)) AS BIGINT)
           AS rss
  FROM resid
), scored AS (
  SELECT h, r, (r - ({_RA_RBAR})) / ({_RA_RSD}) AS z
  FROM resid CROSS JOIN moms
)
SELECT CAST(h AS BIGINT) AS hour, CAST(h % 24 AS BIGINT) AS hour_of_day,
  {round_portable_duck("r", 6)} AS residual,
  {round_portable_duck("z", 6)} AS z
FROM scored ORDER BY abs(z) DESC, h LIMIT {ANOM_TOP}
"""


QUERIES: dict = {
    "q_ccf_events": (_q_ccf, _ORACLE_CCF),
    "q_top_trigrams_events": (_q_trigrams, _ORACLE_TRIGRAMS),
    "vocab_coverage_documents": (_q_coverage, _ORACLE_COVERAGE),
    "q_seasonal_residual_anomalies_events": (
        _q_residual_anomalies, _ORACLE_RESIDUAL_ANOMALIES),
}

"""Statistical screens #2: Grubbs' extreme-outlier statistic, the
EWMA control chart, and mutual information between a category and a
time-of-day bucket — the three "is this slice behaving" monitors
that complement the MAD/CUSUM/burstiness family in ``outliers.py``.

Engine-exact (SCALING.md rules): means/variances come from 1e8/1e6
quantized BIGINT sums; the EWMA recursion reuses the EMA kernel whose
expression tree is bit-matched to the DuckDB ``list_reduce`` lambda;
control-limit constants are integer-ratio doubles (``1/9``), never
Python float literals; MI cell terms quantize to BIGINT before the
cross-cell sum.

Plan shapes at scale:
- Grubbs: one hash aggregate for the per-group moments (broadcast
  back), one keyed window for the arg-max row — two shuffles on the
  group key.
- EWMA chart: the one indicator shuffle (``with_indicators``) plus a
  per-key aggregate on the SAME key — exchange reuse applies.
- MI: contingency-table aggregation (map-side combinable) then
  window sums over the tiny cell relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import indicators as ind
from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["grubbs_stat", "ewma_control", "mutual_information"]

Q = 10 ** 8
QSQ = 10 ** 6
US_PER_HOUR = 3_600_000_000

# Sample mean/variance from exact quantized sums; identical text on
# both engines so the double math is bit-identical.
_MEAN = f"CAST(__s AS DOUBLE) / (CAST(__n AS DOUBLE) * {float(Q)!r})"
_VAR = (
    f"(CAST(__ss AS DOUBLE) / (CAST(__n AS DOUBLE) * {float(QSQ)!r})"
    f" - ({_MEAN}) * ({_MEAN}))"
    f" * CAST(__n AS DOUBLE) / CAST(__n - 1 AS DOUBLE)"
)
_SD = f"sqrt(greatest({_VAR}, CAST(0 AS DOUBLE)))"
_SD_DUCK = _SD.replace("__", "")  # DuckDB CTE uses unprefixed names


def _moments(df: DataFrame, value_col: str, *group_cols: str) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.expr(
            f"CAST(round({value_col} * {Q}) AS BIGINT)")).alias("__s"),
        F.sum(F.expr(
            f"CAST(round({value_col} * {value_col} * {QSQ}) AS BIGINT)"
        )).alias("__ss"),
    )


def grubbs_stat(df: DataFrame, value_col: str,
                group_col: str, id_col: str) -> DataFrame:
    """(group, n, grubbs_g, top_id, top_value): G = max|x - mean|/sd
    per group plus the arg-max row — the single-most-extreme-point
    screen (compare G against the t-based critical value for the
    chosen alpha downstream)."""
    stats = _moments(df, value_col, group_col)
    dev = df.join(F.broadcast(stats), group_col).withColumn(
        "__dev", F.expr(f"abs({value_col} - ({_MEAN}))"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("__dev").desc(), F.col(id_col).asc())
    return (
        dev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            group_col,
            F.col("__n").cast("bigint").alias("n"),
            round_portable(
                F.expr(f"__dev / ({_SD})"), 6).alias("grubbs_g"),
            F.col(id_col).alias("top_id"),
            round_portable(F.col(value_col)).alias("top_value"),
        )
    )


EWMA_WINDOW = 9   # alpha = 2/(9+1) = 0.2 exactly
EWMA_L = 3        # 3-sigma limits; var factor alpha/(2-alpha) = 1/9


def ewma_control(df: DataFrame, value_col: str, keys: list[str],
                 order: list[str], id_col: str) -> DataFrame:
    """(keys..., n, n_breaches, first_breach_id, max_score) per key:
    EWMA control chart — z from the EMA kernel (alpha = 0.2,
    first-value seed), centerline = series mean, limits
    ``L * sd * sqrt(alpha / (2 - alpha))`` (asymptotic). ``score`` =
    |z - mean| / limit; a breach is score > 1."""
    z = ind.with_indicators(
        df, value_col, order, keys, [ind.ema(EWMA_WINDOW, "__z")])
    stats = _moments(df, value_col, *keys)
    lim = (f"{EWMA_L} * ({_SD}) "
           f"* sqrt(CAST(1 AS DOUBLE) / 9)")
    scored = z.join(F.broadcast(stats), keys).withColumn(
        "__score", F.expr(f"abs(__z - ({_MEAN})) / ({lim})"))
    return (
        scored.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr(
                "CASE WHEN __score > 1 THEN 1 ELSE 0 END"
            )).cast("bigint").alias("n_breaches"),
            F.min(F.expr(
                f"CASE WHEN __score > 1 THEN {id_col} END"
            )).alias("first_breach_id"),
            round_portable(F.max("__score"), 6).alias("max_score"),
        )
    )


def mutual_information(df: DataFrame, x_expr: str,
                       y_expr: str) -> DataFrame:
    """One row (n, n_cells, mi_nats, h_x, h_y): mutual information
    and marginal entropies of the (x, y) contingency table, in nats.
    Per-cell terms quantize to BIGINT at 1e8 before summing."""
    cells = (
        df.selectExpr(f"{x_expr} AS __x", f"{y_expr} AS __y")
        .groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).alias("__nxy"))
    )
    wx = Window.partitionBy("__x")
    wy = Window.partitionBy("__y")
    wt = Window.partitionBy()
    term = (
        "CAST(round((CAST(__nxy AS DOUBLE) / CAST(__nt AS DOUBLE)) "
        "* ln((CAST(__nxy AS DOUBLE) * CAST(__nt AS DOUBLE)) "
        "/ (CAST(__nx AS DOUBLE) * CAST(__ny AS DOUBLE))) "
        f"* {Q}) AS BIGINT)"
    )
    # Marginal entropy terms: -(n_x/N) ln(n_x/N), summed over the
    # DISTINCT margin values (count each x once: tag the first cell).
    hterm = (
        "CAST(round(-(CAST({m} AS DOUBLE) / CAST(__nt AS DOUBLE)) "
        "* ln(CAST({m} AS DOUBLE) / CAST(__nt AS DOUBLE)) "
        f"* {Q}) AS BIGINT)"
    )
    staged = (
        cells
        .withColumn("__nx", F.sum("__nxy").over(wx))
        .withColumn("__ny", F.sum("__nxy").over(wy))
        .withColumn("__nt", F.sum("__nxy").over(wt))
        .withColumn("__rx", F.row_number().over(
            wx.orderBy("__y")))
        .withColumn("__ry", F.row_number().over(
            wy.orderBy("__x")))
        .withColumn("__mi_q", F.expr(term))
        .withColumn("__hx_q", F.expr(
            f"CASE WHEN __rx = 1 THEN {hterm.format(m='__nx')} "
            "ELSE 0 END"))
        .withColumn("__hy_q", F.expr(
            f"CASE WHEN __ry = 1 THEN {hterm.format(m='__ny')} "
            "ELSE 0 END"))
    )
    return staged.agg(
        F.max("__nt").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        round_portable(F.expr(
            f"CAST(sum(__mi_q) AS DOUBLE) / {float(Q)!r}"), 6
        ).alias("mi_nats"),
        round_portable(F.expr(
            f"CAST(sum(__hx_q) AS DOUBLE) / {float(Q)!r}"), 6
        ).alias("h_x"),
        round_portable(F.expr(
            f"CAST(sum(__hy_q) AS DOUBLE) / {float(Q)!r}"), 6
        ).alias("h_y"),
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grubbs_stat(load(spark, sf_dir, "events"), "value",
                       "event_type", "event_id")


_ORACLE_GRUBBS = f"""
WITH stats AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * value * {QSQ}) AS BIGINT))
           AS BIGINT) AS ss
  FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type, e.event_id, e.value, st.n, st.s, st.ss,
         abs(e.value - ({_MEAN.replace('__', '')})) AS d,
         row_number() OVER (PARTITION BY e.event_type ORDER BY
           abs(e.value - ({_MEAN.replace('__', '')})) DESC,
           e.event_id) AS rn
  FROM events e JOIN stats st ON e.event_type = st.event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
  {round_portable_duck(f"d / ({_SD_DUCK})", 6)} AS grubbs_g,
  event_id AS top_id,
  {round_portable_duck("value")} AS top_value
FROM dev WHERE rn = 1
"""


def _q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ewma_control(ev, "value", ["user_id"],
                        ["ts", "event_id"], "event_id")


_ORACLE_EWMA = f"""
WITH z AS (
  SELECT user_id, event_id, value,
    list_reduce(
      list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW),
      (acc, v) -> (2.0/10.0)*v + (1.0 - (2.0/10.0))*acc) AS zz
  FROM events
), stats AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(round(value * {Q}) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * value * {QSQ}) AS BIGINT))
           AS BIGINT) AS ss
  FROM events GROUP BY 1
), scored AS (
  SELECT z.user_id, z.event_id,
         abs(z.zz - ({_MEAN.replace('__', '')}))
           / ({EWMA_L} * ({_SD_DUCK})
              * sqrt(CAST(1 AS DOUBLE) / 9)) AS score
  FROM z JOIN stats st ON z.user_id = st.user_id
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN score > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_breaches,
  min(CASE WHEN score > 1 THEN event_id END) AS first_breach_id,
  {round_portable_duck("max(score)", 6)} AS max_score
FROM scored GROUP BY 1
"""


def _q_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does knowing the hour-of-day tell you about the event
    type? (Near zero = no diurnal type pattern.)"""
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return mutual_information(
        ev, f"(__us DIV {US_PER_HOUR}) % 24", "event_type")


_MI_TERM_DUCK = (
    "CAST(round((CAST(nxy AS DOUBLE) / CAST(nt AS DOUBLE)) "
    "* ln((CAST(nxy AS DOUBLE) * CAST(nt AS DOUBLE)) "
    "/ (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) "
    f"* {Q}) AS BIGINT)"
)
_H_TERM_DUCK = (
    "CAST(round(-(CAST({m} AS DOUBLE) / CAST(nt AS DOUBLE)) "
    "* ln(CAST({m} AS DOUBLE) / CAST(nt AS DOUBLE)) "
    f"* {Q}) AS BIGINT)"
)

_ORACLE_MI = f"""
WITH cells AS (
  SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS x,
         event_type AS y, count(*) AS nxy
  FROM events GROUP BY 1, 2
), staged AS (
  SELECT nxy,
         CAST(sum(nxy) OVER (PARTITION BY x) AS BIGINT) AS nx,
         CAST(sum(nxy) OVER (PARTITION BY y) AS BIGINT) AS ny,
         CAST(sum(nxy) OVER () AS BIGINT) AS nt,
         row_number() OVER (PARTITION BY x ORDER BY y) AS rx,
         row_number() OVER (PARTITION BY y ORDER BY x) AS ry
  FROM cells
)
SELECT CAST(max(nt) AS BIGINT) AS n,
  CAST(count(*) AS BIGINT) AS n_cells,
  {round_portable_duck(
      f"CAST(sum({_MI_TERM_DUCK}) AS DOUBLE) / {float(Q)!r}", 6)}
    AS mi_nats,
  {round_portable_duck(
      "CAST(sum(CASE WHEN rx = 1 THEN "
      + _H_TERM_DUCK.format(m='nx')
      + f" ELSE 0 END) AS DOUBLE) / {float(Q)!r}", 6)} AS h_x,
  {round_portable_duck(
      "CAST(sum(CASE WHEN ry = 1 THEN "
      + _H_TERM_DUCK.format(m='ny')
      + f" ELSE 0 END) AS DOUBLE) / {float(Q)!r}", 6)} AS h_y
FROM staged
"""


QUERIES: dict = {
    "q_grubbs_events": (_q_grubbs, _ORACLE_GRUBBS),
    "q_ewma_control_events": (_q_ewma, _ORACLE_EWMA),
    "q_mutual_info_events": (_q_mi, _ORACLE_MI),
}

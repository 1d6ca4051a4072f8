"""Spectral / long-memory diagnostics: a candidate-frequency
periodogram (single-bin DFT power, Goertzel-style), ordinal
permutation entropy, the rescaled-range (R/S) Hurst exponent, and
partial autocorrelation via the Durbin–Levinson closed forms — the
"what rhythm does this series have" family that complements the
seasonal decompose (``plans/analytics6.py``) and ACF
(``operators/robustfit.py``).

Engine-exact (SCALING.md rules): DFT angles reduce ``(k*t) % T`` in
exact BIGINT arithmetic before the one ``cos``/``sin`` call (the
argument stays in [0, 2π), where libm implementations agree);
every floating term quantizes to BIGINT before its cross-row sum;
the tiny per-size OLS for the Hurst slope sums QUANTIZED BIGINT
terms so the 3-row reduction is order-free; scalar chains
(Durbin–Levinson) use the same expression text on both engines.

Plan shapes at scale:
- periodogram: hourly pre-aggregation (map-side combinable) shrinks
  the data to one row per hour; the k-frequency fan-out is a
  broadcast cross join against a literal frame. No full-data sort.
- permutation entropy: one window pass per series key + a keyed
  hash aggregate — exchange reuse applies.
- Hurst: one window pass per (key, size, block); the block relation
  is data/64 rows and everything after it is tiny.
- PACF: one broadcast moment join + one window pass + one keyed
  aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = [
    "periodogram_hourly", "permutation_entropy", "hurst_rs", "pacf",
    "newey_west_se",
]

Q = 10 ** 8
Q2 = 10 ** 6
QT = 10 ** 6          # trig / log term quantization
US_PER_HOUR = 3_600_000_000
HURST_SIZES = (64, 128, 256)


# --------------------------------------------------------------------------
# Candidate-frequency periodogram over the hourly event-count series
# --------------------------------------------------------------------------


def periodogram_hourly(df: DataFrame, us_col: str) -> DataFrame:
    """One row per candidate frequency k (k, n_hours, period_hours,
    power): single-bin DFT power ``P_k = (S_c^2 + S_s^2) / T`` of the
    hourly event-count series x_t, with
    ``S_c = sum x_t cos(2π k t / T)`` (likewise sin). Candidates:
    the fundamental (k=1) and the bins nearest the daily, half-day
    and weekly periods. Absent hours carry x=0 and so contribute
    nothing to the sums — and because the mean leaks only into k=0
    for integer k, the uncentered sums equal the centered ones at
    every reported k."""
    hours = (
        df.selectExpr(f"({us_col}) DIV {US_PER_HOUR} AS __h")
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__x"))
    )
    span = hours.agg(
        F.min("__h").alias("__h0"),
        (F.max("__h") - F.min("__h") + 1).alias("__t"),
    )
    ks = span.selectExpr(
        "__t",
        "explode(array_distinct(array("
        "CAST(1 AS BIGINT), "
        "CAST(round(CAST(__t AS DOUBLE) / 24) AS BIGINT), "
        "CAST(round(CAST(__t AS DOUBLE) / 12) AS BIGINT), "
        "CAST(round(CAST(__t AS DOUBLE) / 168) AS BIGINT)"
        "))) AS __k",
    ).filter(F.col("__k") >= 1)
    theta = ("CAST(2 AS DOUBLE) * pi() "
             "* CAST((__k * (__h - __h0)) % __t AS DOUBLE) "
             "/ CAST(__t AS DOUBLE)")
    terms = (
        hours.crossJoin(F.broadcast(span.select("__h0")))
        .crossJoin(F.broadcast(ks))
        .select(
            "__k", "__t",
            F.expr(f"CAST(round(__x * cos({theta}) * {QT}) AS BIGINT)"
                   ).alias("__tc"),
            F.expr(f"CAST(round(__x * sin({theta}) * {QT}) AS BIGINT)"
                   ).alias("__ts"),
        )
    )
    power = (
        "(CAST(__sc AS DOUBLE) / {q} * (CAST(__sc AS DOUBLE) / {q}) "
        "+ CAST(__ss AS DOUBLE) / {q} * (CAST(__ss AS DOUBLE) / {q}))"
        " / CAST(__t AS DOUBLE)"
    ).format(q=float(QT).__repr__())
    return (
        terms.groupBy("__k", "__t")
        .agg(F.sum("__tc").alias("__sc"), F.sum("__ts").alias("__ss"))
        .select(
            F.col("__k").cast("bigint").alias("k"),
            F.col("__t").cast("bigint").alias("n_hours"),
            round_portable(F.expr(
                "CAST(__t AS DOUBLE) / CAST(__k AS DOUBLE)"), 6
            ).alias("period_hours"),
            round_portable(F.expr(power), 6).alias("power"),
        )
    )


# --------------------------------------------------------------------------
# Ordinal permutation entropy (order m=3, stable tie-break by time)
# --------------------------------------------------------------------------


def permutation_entropy(df: DataFrame, value_col: str,
                        keys: list[str], order: list[str]) -> DataFrame:
    """(keys..., n, n_patterns, h_nats, h_norm) per key: Shannon
    entropy of the order-3 ordinal-pattern distribution of the
    series (Bandt–Pompe), ties broken by time position (stable
    argsort). ``h_norm = h / ln(6)`` is in [0, 1]; low values mean
    the series' local shapes are predictable."""
    w = Window.partitionBy(*keys).orderBy(*order)
    pat = (
        df.withColumn("__v2", F.col(value_col))
        .withColumn("__v1", F.lag(value_col, 1).over(w))
        .withColumn("__v0", F.lag(value_col, 2).over(w))
        .filter(F.col("__v0").isNotNull())
        .withColumn("__pid", F.expr(
            "9 * ((CASE WHEN __v1 < __v0 THEN 1 ELSE 0 END) "
            "   + (CASE WHEN __v2 < __v0 THEN 1 ELSE 0 END)) "
            "+ 3 * ((CASE WHEN __v0 <= __v1 THEN 1 ELSE 0 END) "
            "   + (CASE WHEN __v2 < __v1 THEN 1 ELSE 0 END)) "
            "+ (CASE WHEN __v0 <= __v2 THEN 1 ELSE 0 END) "
            "   + (CASE WHEN __v1 <= __v2 THEN 1 ELSE 0 END)"))
    )
    cells = pat.groupBy(*keys, "__pid").agg(
        F.count(F.lit(1)).alias("__c"))
    wn = Window.partitionBy(*keys)
    hterm = (
        f"CAST(round(-(CAST(__c AS DOUBLE) / CAST(__n AS DOUBLE)) "
        f"* ln(CAST(__c AS DOUBLE) / CAST(__n AS DOUBLE)) * {Q}) "
        f"AS BIGINT)"
    )
    return (
        cells.withColumn("__n", F.sum("__c").over(wn))
        .withColumn("__hq", F.expr(hterm))
        .groupBy(*keys)
        .agg(
            F.max("__n").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
            F.sum("__hq").alias("__h"),
        )
        .select(
            *keys, "n", "n_patterns",
            round_portable(F.expr(
                f"CAST(__h AS DOUBLE) / {float(Q)!r}"), 6
            ).alias("h_nats"),
            round_portable(F.expr(
                f"CAST(__h AS DOUBLE) / {float(Q)!r} "
                f"/ ln(CAST(6 AS DOUBLE))"), 6).alias("h_norm"),
        )
    )


# --------------------------------------------------------------------------
# Rescaled-range Hurst exponent
# --------------------------------------------------------------------------


def hurst_rs(df: DataFrame, value_col: str, keys: list[str],
             order: list[str],
             sizes: tuple[int, ...] = HURST_SIZES) -> DataFrame:
    """(keys..., n_sizes, n_blocks, hurst) per key: R/S analysis —
    the series splits into non-overlapping blocks of each size, each
    full block contributes ``ln(R/S)`` (range of cumulative
    deviations over population sd), and the Hurst exponent is the
    OLS slope of mean ``ln(R/S)`` against ``ln(size)``. Blocks with
    zero variance are excluded. ~0.5 = random walk increments,
    >0.5 = persistent, <0.5 = mean-reverting."""
    okeys = ", ".join(keys)
    oorder = ", ".join(order)
    base = (
        df.withColumn("__rn", F.row_number().over(
            Window.partitionBy(*keys).orderBy(*order)))
        .withColumn("__q", F.expr(
            f"CAST(round({value_col} * {Q}) AS BIGINT)"))
        .withColumn("__qq", F.expr(
            f"CAST(round({value_col} * {value_col} * {Q2}) AS BIGINT)"))
    )
    sized = base.withColumn("__sz", F.explode(F.array(
        *[F.lit(s) for s in sizes]))).withColumn(
        "__blk", F.expr("(__rn - 1) DIV __sz")).withColumn(
        "__i", F.expr("(__rn - 1) % __sz + 1"))
    part = f"PARTITION BY {okeys}, __sz, __blk"
    cumdev = (
        "(CAST(__cumq AS DOUBLE) "
        "- CAST(__i AS DOUBLE) * CAST(__sumq AS DOUBLE) "
        "/ CAST(__sz AS DOUBLE)) " + f"/ {float(Q)!r}"
    )
    staged = (
        sized
        .withColumn("__cumq", F.expr(
            f"sum(__q) OVER ({part} ORDER BY {oorder} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
        .withColumn("__sumq", F.expr(f"sum(__q) OVER ({part})"))
        .withColumn("__ssq", F.expr(f"sum(__qq) OVER ({part})"))
        .withColumn("__cnt", F.expr(f"count(*) OVER ({part})"))
        .withColumn("__cd", F.expr(cumdev))
    )
    mean = f"(CAST(__sumq AS DOUBLE) / (CAST(__sz AS DOUBLE) * {float(Q)!r}))"
    s_pop = (
        f"sqrt(greatest(CAST(__ssq AS DOUBLE) "
        f"/ (CAST(__sz AS DOUBLE) * {float(Q2)!r}) "
        f"- ({mean}) * ({mean}), CAST(0 AS DOUBLE)))"
    )
    blocks = (
        staged.filter(F.col("__cnt") == F.col("__sz"))
        .groupBy(*keys, "__sz", "__blk")
        .agg(
            (F.max("__cd") - F.min("__cd")).alias("__r"),
            F.expr(f"max({s_pop})").alias("__s"),
        )
        .filter(F.col("__s") > 0)
        .withColumn("__lnrs", F.expr(
            f"CAST(round(ln(__r / __s) * {QT}) AS BIGINT)"))
    )
    per_size = blocks.groupBy(*keys, "__sz").agg(
        F.count(F.lit(1)).alias("__nb"),
        F.sum("__lnrs").alias("__slr"),
    ).select(
        *keys, "__nb",
        F.expr(f"CAST(round(ln(CAST(__sz AS DOUBLE)) * {QT}) AS BIGINT)"
               ).alias("__xq"),
        F.expr("CAST(round(CAST(__slr AS DOUBLE) "
               "/ CAST(__nb AS DOUBLE)) AS BIGINT)").alias("__yq"),
    )
    qd = float(QT) ** 2
    slope = (
        f"(CAST(__np AS DOUBLE) * CAST(__sxy AS DOUBLE) / {qd!r} "
        f"- (CAST(__sx AS DOUBLE) / {float(QT)!r}) "
        f"* (CAST(__sy AS DOUBLE) / {float(QT)!r})) "
        f"/ (CAST(__np AS DOUBLE) * CAST(__sxx AS DOUBLE) / {qd!r} "
        f"- (CAST(__sx AS DOUBLE) / {float(QT)!r}) "
        f"* (CAST(__sx AS DOUBLE) / {float(QT)!r}))"
    )
    return (
        per_size.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__np"),
            F.sum("__nb").cast("bigint").alias("n_blocks"),
            F.sum("__xq").alias("__sx"),
            F.sum("__yq").alias("__sy"),
            F.sum(F.expr("__xq * __yq")).alias("__sxy"),
            F.sum(F.expr("__xq * __xq")).alias("__sxx"),
        )
        .select(
            *keys,
            F.col("__np").alias("n_sizes"), "n_blocks",
            round_portable(F.expr(slope), 6).alias("hurst"),
        )
    )


# --------------------------------------------------------------------------
# Partial autocorrelation (Durbin–Levinson, lags 1-3)
# --------------------------------------------------------------------------

_R1 = "(CAST(__n1 AS DOUBLE) / CAST(__den AS DOUBLE))"
_R2 = "(CAST(__n2 AS DOUBLE) / CAST(__den AS DOUBLE))"
_R3 = "(CAST(__n3 AS DOUBLE) / CAST(__den AS DOUBLE))"
_P22 = f"(({_R2} - {_R1} * {_R1}) / (1 - {_R1} * {_R1}))"
_P21 = f"({_R1} - {_P22} * {_R1})"
_P33 = (
    f"(({_R3} - {_P21} * {_R2} - {_P22} * {_R1}) "
    f"/ (1 - {_P21} * {_R1} - {_P22} * {_R2}))"
)


def _lag_products(df: DataFrame, value_col: str, keys: list[str],
                  order: list[str]) -> DataFrame:
    """(keys..., n, __s, __den, __n1..3): quantized deviation
    auto-products at lags 0-3 — the shared aggregate behind ``pacf``
    and ``newey_west_se``. One broadcast moment join + one window
    pass + one keyed aggregate."""
    means = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.expr(
            f"CAST(round({value_col} * {Q}) AS BIGINT)")).alias("__s"),
    )
    mean = (f"CAST(__s AS DOUBLE) "
            f"/ (CAST(__n AS DOUBLE) * {float(Q)!r})")
    w = Window.partitionBy(*keys).orderBy(*order)
    dev = (
        df.join(F.broadcast(means), keys)
        .withColumn("__d", F.expr(f"{value_col} - ({mean})"))
        .withColumn("__d1", F.lag("__d", 1).over(w))
        .withColumn("__d2", F.lag("__d", 2).over(w))
        .withColumn("__d3", F.lag("__d", 3).over(w))
    )
    qp = f"* {Q2}) AS BIGINT)"
    return dev.groupBy(*keys).agg(
        F.max("__n").cast("bigint").alias("n"),
        F.max("__s").alias("__s"),
        F.sum(F.expr(
            f"CAST(round(__d * __d {qp}")).alias("__den"),
        F.sum(F.expr(
            f"CASE WHEN __d1 IS NOT NULL THEN "
            f"CAST(round(__d * __d1 {qp} END")).alias("__n1"),
        F.sum(F.expr(
            f"CASE WHEN __d2 IS NOT NULL THEN "
            f"CAST(round(__d * __d2 {qp} END")).alias("__n2"),
        F.sum(F.expr(
            f"CASE WHEN __d3 IS NOT NULL THEN "
            f"CAST(round(__d * __d3 {qp} END")).alias("__n3"),
    )


def pacf(df: DataFrame, value_col: str, keys: list[str],
         order: list[str]) -> DataFrame:
    """(keys..., n, acf_1..3, pacf_1..3) per key: autocorrelations at
    lags 1-3 (deviations from the exact quantized per-key mean;
    products quantized before the sum) and the Durbin–Levinson
    partial autocorrelations: phi_11 = r1,
    phi_22 = (r2 - r1^2)/(1 - r1^2),
    phi_33 = (r3 - phi_21 r2 - phi_22 r1)/(1 - phi_21 r1 - phi_22 r2)."""
    red = _lag_products(df, value_col, keys, order)
    return red.select(
        *keys, "n",
        round_portable(F.expr(_R1), 6).alias("acf_1"),
        round_portable(F.expr(_R2), 6).alias("acf_2"),
        round_portable(F.expr(_R3), 6).alias("acf_3"),
        round_portable(F.expr(_R1), 6).alias("pacf_1"),
        round_portable(F.expr(_P22), 6).alias("pacf_2"),
        round_portable(F.expr(_P33), 6).alias("pacf_3"),
    )


# --------------------------------------------------------------------------
# Newey–West (HAC) standard error of the mean, Bartlett lags 1-3
# --------------------------------------------------------------------------

_NW_NN = "CAST(n AS DOUBLE)"
# (1/n)(g0 + 2*sum w_k g_k) with w = 3/4, 1/2, 1/4 and
# g_k = numk / (n * Q2)  ==>  (4 den + 6 n1 + 4 n2 + 2 n3)/(4 n^2 Q2)
_NW_VAR = ("(CAST(4 * __den + 6 * __n1 + 4 * __n2 + 2 * __n3 "
           f"AS DOUBLE) / (4 * {_NW_NN} * {_NW_NN} * {float(Q2)!r}))")
_NW_SE = f"sqrt(greatest({_NW_VAR}, CAST(0 AS DOUBLE)))"
_NW_SE_IID = (f"sqrt(CAST(__den AS DOUBLE) "
              f"/ ({float(Q2)!r} * ({_NW_NN} - 1) * {_NW_NN}))")
_NW_MEAN = f"CAST(__s AS DOUBLE) / ({_NW_NN} * {float(Q)!r})"


def newey_west_se(df: DataFrame, value_col: str, keys: list[str],
                  order: list[str]) -> DataFrame:
    """(keys..., n, mean, se_iid, nw_se, se_ratio) per key: the
    autocorrelation-robust (HAC) standard error of the series mean —
    Bartlett kernel, lags 1-3. ``se_ratio = nw_se / se_iid`` > 1
    means the iid error bar understates the uncertainty (positively
    autocorrelated data); the honest sample size is
    ``n / se_ratio^2``."""
    red = _lag_products(df, value_col, keys, order)
    return red.select(
        *keys, "n",
        round_portable(F.expr(_NW_MEAN), 6).alias("mean"),
        round_portable(F.expr(_NW_SE_IID), 6).alias("se_iid"),
        round_portable(F.expr(_NW_SE), 6).alias("nw_se"),
        round_portable(F.expr(
            f"({_NW_SE}) / ({_NW_SE_IID})"), 6).alias("se_ratio"),
    )


# --------------------------------------------------------------------------
# Gate queries (events; series keyed by event_type, ordered ts, event_id)
# --------------------------------------------------------------------------


def _q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return periodogram_hourly(ev, "__us")


_PG_THETA = ("CAST(2 AS DOUBLE) * pi() "
             "* CAST((kf.k * (h - h0)) % kf.t AS DOUBLE) "
             "/ CAST(kf.t AS DOUBLE)")
_PG_POWER = (
    "(CAST(sc AS DOUBLE) / {q} * (CAST(sc AS DOUBLE) / {q}) "
    "+ CAST(ss AS DOUBLE) / {q} * (CAST(ss AS DOUBLE) / {q}))"
    " / CAST(t AS DOUBLE)"
).format(q=float(QT).__repr__())

_ORACLE_PERIODOGRAM = f"""
WITH hours AS (
  SELECT epoch_us(ts) // {US_PER_HOUR} AS h, count(*) AS x
  FROM events GROUP BY 1
), span AS (
  SELECT min(h) AS h0, max(h) - min(h) + 1 AS t FROM hours
), ks AS (
  SELECT DISTINCT t, unnest([
    CAST(1 AS BIGINT),
    CAST(round(CAST(t AS DOUBLE) / 24) AS BIGINT),
    CAST(round(CAST(t AS DOUBLE) / 12) AS BIGINT),
    CAST(round(CAST(t AS DOUBLE) / 168) AS BIGINT)]) AS k
  FROM span
), kf AS (
  SELECT * FROM ks WHERE k >= 1
), terms AS (
  SELECT kf.k, kf.t,
    CAST(round(hours.x * cos({_PG_THETA}) * {QT}) AS BIGINT) AS tcos,
    CAST(round(hours.x * sin({_PG_THETA}) * {QT}) AS BIGINT) AS tsin
  FROM hours CROSS JOIN span CROSS JOIN kf
), red AS (
  SELECT k, t, CAST(sum(tcos) AS BIGINT) AS sc,
         CAST(sum(tsin) AS BIGINT) AS ss
  FROM terms GROUP BY 1, 2
)
SELECT CAST(k AS BIGINT) AS k, CAST(t AS BIGINT) AS n_hours,
  {round_portable_duck("CAST(t AS DOUBLE) / CAST(k AS DOUBLE)", 6)}
    AS period_hours,
  {round_portable_duck(_PG_POWER, 6)} AS power
FROM red
"""


def _q_perm_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return permutation_entropy(load(spark, sf_dir, "events"), "value",
                               ["event_type"], ["ts", "event_id"])


_PE_HTERM = (
    f"CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) "
    f"* ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * {Q}) AS BIGINT)"
)

_ORACLE_PERM_ENTROPY = f"""
WITH lagged AS (
  SELECT event_type, value AS v2,
         lag(value, 1) OVER w AS v1,
         lag(value, 2) OVER w AS v0
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), pat AS (
  SELECT event_type,
    9 * ((CASE WHEN v1 < v0 THEN 1 ELSE 0 END)
       + (CASE WHEN v2 < v0 THEN 1 ELSE 0 END))
    + 3 * ((CASE WHEN v0 <= v1 THEN 1 ELSE 0 END)
       + (CASE WHEN v2 < v1 THEN 1 ELSE 0 END))
    + (CASE WHEN v0 <= v2 THEN 1 ELSE 0 END)
       + (CASE WHEN v1 <= v2 THEN 1 ELSE 0 END) AS pid
  FROM lagged WHERE v0 IS NOT NULL
), cells AS (
  SELECT event_type, pid, count(*) AS c FROM pat GROUP BY 1, 2
), staged AS (
  SELECT event_type, c,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM cells
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
  CAST(count(*) AS BIGINT) AS n_patterns,
  {round_portable_duck(
      f"CAST(sum({_PE_HTERM}) AS DOUBLE) / {float(Q)!r}", 6)}
    AS h_nats,
  {round_portable_duck(
      f"CAST(sum({_PE_HTERM}) AS DOUBLE) / {float(Q)!r} "
      f"/ ln(CAST(6 AS DOUBLE))", 6)} AS h_norm
FROM staged GROUP BY 1
"""


def _q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hurst_rs(load(spark, sf_dir, "events"), "value",
                    ["event_type"], ["ts", "event_id"])


_HS_MEAN = f"(CAST(sumq AS DOUBLE) / (CAST(sz AS DOUBLE) * {float(Q)!r}))"
_HS_S = (
    f"sqrt(greatest(CAST(ssq AS DOUBLE) "
    f"/ (CAST(sz AS DOUBLE) * {float(Q2)!r}) "
    f"- ({_HS_MEAN}) * ({_HS_MEAN}), CAST(0 AS DOUBLE)))"
)
_HS_CUMDEV = (
    "(CAST(cumq AS DOUBLE) "
    "- CAST(i AS DOUBLE) * CAST(sumq AS DOUBLE) / CAST(sz AS DOUBLE)) "
    f"/ {float(Q)!r}"
)
_HS_QD = float(QT) ** 2
_HS_SLOPE = (
    f"(CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) / {_HS_QD!r} "
    f"- (CAST(sx AS DOUBLE) / {float(QT)!r}) "
    f"* (CAST(sy AS DOUBLE) / {float(QT)!r})) "
    f"/ (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) / {_HS_QD!r} "
    f"- (CAST(sx AS DOUBLE) / {float(QT)!r}) "
    f"* (CAST(sx AS DOUBLE) / {float(QT)!r}))"
)

_ORACLE_HURST = f"""
WITH base AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn,
         ts, event_id,
         CAST(round(value * {Q}) AS BIGINT) AS q,
         CAST(round(value * value * {Q2}) AS BIGINT) AS qq
  FROM events
), sized AS (
  SELECT base.*, s.sz, (rn - 1) // s.sz AS blk,
         (rn - 1) % s.sz + 1 AS i
  FROM base CROSS JOIN
    (SELECT unnest([{', '.join(str(s) for s in HURST_SIZES)}]) AS sz) s
), staged AS (
  SELECT event_type, sz, blk, i,
    sum(q) OVER (PARTITION BY event_type, sz, blk ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cumq,
    sum(q) OVER (PARTITION BY event_type, sz, blk) AS sumq,
    sum(qq) OVER (PARTITION BY event_type, sz, blk) AS ssq,
    count(*) OVER (PARTITION BY event_type, sz, blk) AS cnt
  FROM sized
), blocks AS (
  SELECT event_type, sz, blk,
         max({_HS_CUMDEV}) - min({_HS_CUMDEV}) AS r,
         max({_HS_S}) AS s
  FROM staged WHERE cnt = sz
  GROUP BY 1, 2, 3
), lnrs AS (
  SELECT event_type, sz,
         CAST(round(ln(r / s) * {QT}) AS BIGINT) AS lq
  FROM blocks WHERE s > 0
), per_size AS (
  SELECT event_type, count(*) AS nb,
         CAST(round(ln(CAST(sz AS DOUBLE)) * {QT}) AS BIGINT) AS xq,
         CAST(round(CAST(sum(lq) AS DOUBLE) / CAST(count(*) AS DOUBLE))
           AS BIGINT) AS yq
  FROM lnrs GROUP BY event_type, sz
), red AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS np,
         CAST(sum(nb) AS BIGINT) AS n_blocks,
         CAST(sum(xq) AS BIGINT) AS sx,
         CAST(sum(yq) AS BIGINT) AS sy,
         CAST(sum(xq * yq) AS BIGINT) AS sxy,
         CAST(sum(xq * xq) AS BIGINT) AS sxx
  FROM per_size GROUP BY 1
)
SELECT event_type, np AS n_sizes, n_blocks,
  {round_portable_duck(_HS_SLOPE, 6)} AS hurst
FROM red
"""


def _q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pacf(load(spark, sf_dir, "events"), "value",
                ["event_type"], ["ts", "event_id"])


_DR1 = _R1.replace("__", "")
_DR2 = _R2.replace("__", "")
_DR3 = _R3.replace("__", "")
_DP22 = _P22.replace("__", "")
_DP33 = _P33.replace("__", "")

_ORACLE_PACF = f"""
WITH means AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(round(value * {Q}) AS BIGINT)) AS s
  FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type, m.n,
    e.value - (CAST(m.s AS DOUBLE)
               / (CAST(m.n AS DOUBLE) * {float(Q)!r})) AS d,
    e.ts, e.event_id
  FROM events e JOIN means m ON e.event_type = m.event_type
), lagged AS (
  SELECT event_type, n, d,
         lag(d, 1) OVER w AS dl1,
         lag(d, 2) OVER w AS dl2,
         lag(d, 3) OVER w AS dl3
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), red AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
    CAST(sum(CAST(round(d * d * {Q2}) AS BIGINT)) AS BIGINT) AS den,
    CAST(sum(CASE WHEN dl1 IS NOT NULL THEN
      CAST(round(d * dl1 * {Q2}) AS BIGINT) END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN dl2 IS NOT NULL THEN
      CAST(round(d * dl2 * {Q2}) AS BIGINT) END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN dl3 IS NOT NULL THEN
      CAST(round(d * dl3 * {Q2}) AS BIGINT) END) AS BIGINT) AS n3
  FROM lagged GROUP BY 1
)
SELECT event_type, n,
  {round_portable_duck(_DR1, 6)} AS acf_1,
  {round_portable_duck(_DR2, 6)} AS acf_2,
  {round_portable_duck(_DR3, 6)} AS acf_3,
  {round_portable_duck(_DR1, 6)} AS pacf_1,
  {round_portable_duck(_DP22, 6)} AS pacf_2,
  {round_portable_duck(_DP33, 6)} AS pacf_3
FROM red
"""


def _q_newey_west(spark: SparkSession, sf_dir: str) -> DataFrame:
    return newey_west_se(load(spark, sf_dir, "events"), "value",
                         ["event_type"], ["ts", "event_id"])


_DNW_NN = "CAST(n AS DOUBLE)"
_DNW_VAR = ("(CAST(4 * den + 6 * n1 + 4 * n2 + 2 * n3 "
            f"AS DOUBLE) / (4 * {_DNW_NN} * {_DNW_NN} * {float(Q2)!r}))")
_DNW_SE = f"sqrt(greatest({_DNW_VAR}, CAST(0 AS DOUBLE)))"
_DNW_SE_IID = (f"sqrt(CAST(den AS DOUBLE) "
               f"/ ({float(Q2)!r} * ({_DNW_NN} - 1) * {_DNW_NN}))")

_ORACLE_NEWEY_WEST = f"""
WITH means AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(round(value * {Q}) AS BIGINT)) AS s
  FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type, m.n, m.s,
    e.value - (CAST(m.s AS DOUBLE)
               / (CAST(m.n AS DOUBLE) * {float(Q)!r})) AS d,
    e.ts, e.event_id
  FROM events e JOIN means m ON e.event_type = m.event_type
), lagged AS (
  SELECT event_type, n, s, d,
         lag(d, 1) OVER w AS dl1,
         lag(d, 2) OVER w AS dl2,
         lag(d, 3) OVER w AS dl3
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), red AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
    CAST(max(s) AS BIGINT) AS s,
    CAST(sum(CAST(round(d * d * {Q2}) AS BIGINT)) AS BIGINT) AS den,
    CAST(sum(CASE WHEN dl1 IS NOT NULL THEN
      CAST(round(d * dl1 * {Q2}) AS BIGINT) END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN dl2 IS NOT NULL THEN
      CAST(round(d * dl2 * {Q2}) AS BIGINT) END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN dl3 IS NOT NULL THEN
      CAST(round(d * dl3 * {Q2}) AS BIGINT) END) AS BIGINT) AS n3
  FROM lagged GROUP BY 1
)
SELECT event_type, n,
  {round_portable_duck(
      f"CAST(s AS DOUBLE) / ({_DNW_NN} * {float(Q)!r})", 6)} AS mean,
  {round_portable_duck(_DNW_SE_IID, 6)} AS se_iid,
  {round_portable_duck(_DNW_SE, 6)} AS nw_se,
  {round_portable_duck(f"({_DNW_SE}) / ({_DNW_SE_IID})", 6)}
    AS se_ratio
FROM red
"""


QUERIES: dict = {
    "q_periodogram_events": (_q_periodogram, _ORACLE_PERIODOGRAM),
    "q_perm_entropy_events": (_q_perm_entropy, _ORACLE_PERM_ENTROPY),
    "q_hurst_events": (_q_hurst, _ORACLE_HURST),
    "q_pacf_events": (_q_pacf, _ORACLE_PACF),
    "q_newey_west_events": (_q_newey_west, _ORACLE_NEWEY_WEST),
}

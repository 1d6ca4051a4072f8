"""Classical hypothesis tests as distributed aggregates: chi-square
independence (+ Cramér's V), Welch's two-sample t, Mann–Whitney U,
Kruskal–Wallis, Jarque–Bera normality, and the Wald–Wolfowitz runs
test — the "is this slice statistically different" toolkit that sits
on top of the anomaly screens (``outliers.py`` / ``anomaly2.py``).

Engine-exact (SCALING.md rules): every cross-row floating term
quantizes to BIGINT before the sum (1e8 linear, 1e6 squares, 1e4
cubes, 1e2 fourth powers — events.value tops out near 600 so the
largest quantized fourth-power sum stays orders of magnitude under
BIGINT range at every tested SF); rank statistics use DOUBLED
midranks (``2*cum + cnt + 1``) so ties stay in exact integer
arithmetic; constants are integer-ratio doubles, never Python float
literals.

Plan shapes at scale:
- chi2 / Welch / JB: pure hash aggregates (map-side combinable) plus
  a broadcast of the tiny per-group moment frame — one shuffle on
  the group key.
- Mann–Whitney / Kruskal–Wallis: the rank windows run over the
  DISTINCT-VALUE relation (one row per distinct value), not the
  data, so the global sort is over a frame orders of magnitude
  smaller than the input; the heavy lifting is a map-side-combined
  groupBy(value).
- runs test: one window pass per series key then a keyed aggregate
  on the SAME key — exchange reuse applies; no joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = [
    "chi2_independence", "welch_ttest", "mann_whitney_u",
    "kruskal_wallis", "jarque_bera", "runs_test",
]

Q = 10 ** 8
Q2 = 10 ** 6
Q3 = 10 ** 4
Q4 = 10 ** 2
US_PER_DAY = 86_400_000_000

# Sample mean / variance from exact quantized sums (same text on both
# engines; see anomaly2.py for the derivation of the pattern).
_MEAN = f"CAST(__s AS DOUBLE) / (CAST(__n AS DOUBLE) * {float(Q)!r})"
_VAR = (
    f"(CAST(__ss AS DOUBLE) / (CAST(__n AS DOUBLE) * {float(Q2)!r})"
    f" - ({_MEAN}) * ({_MEAN}))"
    f" * CAST(__n AS DOUBLE) / CAST(__n - 1 AS DOUBLE)"
)


def _strip(expr: str) -> str:
    """The DuckDB CTEs use the same column names minus the ``__``."""
    return expr.replace("__", "")


# --------------------------------------------------------------------------
# Chi-square independence + Cramér's V
# --------------------------------------------------------------------------


def chi2_independence(df: DataFrame, x_expr: str,
                      y_expr: str) -> DataFrame:
    """One row (n, r, c, dof, chi2, cramers_v): Pearson chi-square of
    independence over the (x, y) contingency table, including
    zero-observed cells (expected > 0 whenever both margins are
    non-zero), plus Cramér's V = sqrt(chi2 / (n * min(r-1, c-1))).

    Plan: one hash aggregate for the observed cells, two tiny margin
    aggregates broadcast into a margin-grid cross join (r*c rows),
    then a single-row reduction — the data is touched once."""
    obs = (
        df.selectExpr(f"{x_expr} AS __x", f"{y_expr} AS __y")
        .groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).alias("__nxy"))
    )
    mx = obs.groupBy("__x").agg(F.sum("__nxy").alias("__nx"))
    my = obs.groupBy("__y").agg(F.sum("__nxy").alias("__ny"))
    grid = (
        F.broadcast(mx).crossJoin(F.broadcast(my))
        .join(obs, ["__x", "__y"], "left")
        .withColumn("__o", F.coalesce(F.col("__nxy"), F.lit(0)))
        .withColumn("__nt", F.sum("__o").over(Window.partitionBy()))
    )
    e = ("CAST(__nx AS DOUBLE) * CAST(__ny AS DOUBLE) "
         "/ CAST(__nt AS DOUBLE)")
    term = (
        f"CAST(round((CAST(__o AS DOUBLE) - ({e})) "
        f"* (CAST(__o AS DOUBLE) - ({e})) / ({e}) * {Q}) AS BIGINT)"
    )
    red = grid.agg(
        F.max("__nt").cast("bigint").alias("n"),
        F.countDistinct("__x").cast("bigint").alias("r"),
        F.countDistinct("__y").cast("bigint").alias("c"),
        F.sum(F.expr(term)).alias("__chi_q"),
    )
    chi2 = f"CAST(__chi_q AS DOUBLE) / {float(Q)!r}"
    return red.select(
        "n", "r", "c",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        round_portable(F.expr(chi2), 6).alias("chi2"),
        round_portable(F.expr(
            f"sqrt(({chi2}) / (CAST(n AS DOUBLE) "
            f"* CAST(least(r - 1, c - 1) AS DOUBLE)))"), 6
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# Welch's unequal-variance two-sample t
# --------------------------------------------------------------------------


def welch_ttest(df: DataFrame, value_col: str, group_expr: str,
                group_a: str, group_b: str,
                q_lin: int = Q, q_sq: int = Q2) -> DataFrame:
    """One row (n_a, n_b, mean_a, mean_b, t_stat, dof): Welch's t on
    ``value_col`` between the rows where ``group_expr`` equals
    ``group_a`` vs ``group_b`` (other rows ignored), with the
    Welch–Satterthwaite degrees of freedom. Single conditional hash
    aggregate — no join, no shuffle beyond the one-row reduction.

    ``q_lin`` / ``q_sq`` size the quantized BIGINT sums: pick them so
    ``max|v| * q_lin * n`` and ``max(v^2) * q_sq * n`` stay inside
    BIGINT range at the target SF (defaults fit events.value; the
    orders gate query uses 1e4 / 1 because o_totalprice reaches 5e5)."""
    flt = df.selectExpr(f"{group_expr} AS __g",
                        f"{value_col} AS __v").filter(
        F.col("__g").isin([group_a, group_b]))
    qs = F.expr(f"CAST(round(__v * {q_lin}) AS BIGINT)")
    qss = F.expr(f"CAST(round(__v * __v * {q_sq}) AS BIGINT)")
    # Typed F.when comparisons, not f-string SQL literals: a group
    # value containing a quote must not break the expression.
    is_a = F.col("__g") == F.lit(group_a)
    is_b = F.col("__g") == F.lit(group_b)
    zero = F.lit(0).cast("bigint")
    agg = flt.agg(
        F.sum(F.when(is_a, F.lit(1)).otherwise(0)).alias("__na"),
        F.sum(F.when(is_a, qs).otherwise(zero)).alias("__sa"),
        F.sum(F.when(is_a, qss).otherwise(zero)).alias("__ssa"),
        F.sum(F.when(is_b, F.lit(1)).otherwise(0)).alias("__nb"),
        F.sum(F.when(is_b, qs).otherwise(zero)).alias("__sb"),
        F.sum(F.when(is_b, qss).otherwise(zero)).alias("__ssb"),
    )

    def stats(n: str, s: str, ss: str) -> tuple[str, str]:
        mean = (f"CAST({s} AS DOUBLE) "
                f"/ (CAST({n} AS DOUBLE) * {float(q_lin)!r})")
        var = (
            f"(CAST({ss} AS DOUBLE) "
            f"/ (CAST({n} AS DOUBLE) * {float(q_sq)!r})"
            f" - ({mean}) * ({mean}))"
            f" * CAST({n} AS DOUBLE) / CAST({n} - 1 AS DOUBLE)"
        )
        return mean, var

    ma, va = stats("__na", "__sa", "__ssa")
    mb, vb = stats("__nb", "__sb", "__ssb")
    sea = f"(({va}) / CAST(__na AS DOUBLE))"
    seb = f"(({vb}) / CAST(__nb AS DOUBLE))"
    se2 = f"({sea} + {seb})"
    return agg.select(
        F.col("__na").cast("bigint").alias("n_a"),
        F.col("__nb").cast("bigint").alias("n_b"),
        round_portable(F.expr(ma), 6).alias("mean_a"),
        round_portable(F.expr(mb), 6).alias("mean_b"),
        round_portable(F.expr(
            f"(({ma}) - ({mb})) / sqrt({se2})"), 6).alias("t_stat"),
        round_portable(F.expr(
            f"({se2}) * ({se2}) / "
            f"(({sea}) * ({sea}) / CAST(__na - 1 AS DOUBLE) "
            f"+ ({seb}) * ({seb}) / CAST(__nb - 1 AS DOUBLE))"), 6
        ).alias("dof"),
    )


# --------------------------------------------------------------------------
# Rank statistics: Mann–Whitney U and Kruskal–Wallis H
# --------------------------------------------------------------------------
# Both run their windows over the DISTINCT-VALUE relation: group the
# data by value once (map-side combinable), then a cumulative window
# ordered by value assigns each distinct value its DOUBLED midrank
# ``2*cum_before + cnt + 1`` — an exact integer, so tied ranks never
# touch floating point until the final scalar formula.


def _midrank2(df_values: DataFrame) -> DataFrame:
    w = (Window.partitionBy().orderBy("__v")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        df_values
        .withColumn("__cum", F.coalesce(F.sum("__cnt").over(w),
                                        F.lit(0)))
        .withColumn("__mr2", 2 * F.col("__cum") + F.col("__cnt") + 1)
    )


_MR2_DUCK = """
  SELECT *,
    2 * COALESCE(sum(cnt) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + cnt + 1 AS mr2
  FROM vals
"""


def mann_whitney_u(df: DataFrame, value_col: str, group_expr: str,
                   group_a: str, group_b: str) -> DataFrame:
    """One row (n_a, n_b, u_a, z): Mann–Whitney U (group_a side) with
    midrank ties and the tie-corrected normal approximation
    ``var = na*nb/12 * ((n+1) - sum(t^3-t)/(n*(n-1)))``."""
    flt = df.selectExpr(f"{group_expr} AS __g",
                        f"{value_col} AS __v").filter(
        F.col("__g").isin([group_a, group_b]))
    vals = flt.groupBy("__v").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(
            F.when(F.col("__g") == F.lit(group_a), 1).otherwise(0)
        ).alias("__ca"),
    )
    ranked = _midrank2(vals)
    red = ranked.agg(
        F.sum("__ca").cast("bigint").alias("__na"),
        F.sum(F.expr("__cnt - __ca")).cast("bigint").alias("__nb"),
        F.sum(F.expr("__ca * __mr2")).alias("__ra2"),
        F.sum(F.expr(
            "__cnt * __cnt * __cnt - __cnt")).alias("__ties"),
    )
    n = "CAST(__na + __nb AS DOUBLE)"
    # U_a = R_a - na(na+1)/2; doubled: 2U = ra2 - na*(na+1) (exact).
    u2 = "CAST(__ra2 - __na * (__na + 1) AS DOUBLE)"
    mu2 = "CAST(__na AS DOUBLE) * CAST(__nb AS DOUBLE)"  # 2*mu
    var = (
        f"CAST(__na AS DOUBLE) * CAST(__nb AS DOUBLE) / 12 "
        f"* (({n} + 1) - CAST(__ties AS DOUBLE) "
        f"/ ({n} * ({n} - 1)))"
    )
    return red.select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        round_portable(F.expr(f"({u2}) / 2"), 6).alias("u_a"),
        round_portable(F.expr(
            f"(({u2}) - ({mu2})) / (2 * sqrt({var}))"), 6).alias("z"),
    )


def kruskal_wallis(df: DataFrame, value_col: str,
                   group_expr: str) -> DataFrame:
    """One row (n, k, h_stat): tie-corrected Kruskal–Wallis H across
    ALL groups of ``group_expr``. Per-(value, group) counts feed the
    distinct-value midrank window; the per-group doubled rank sums
    reduce to ``H = 12/(n(n+1)) * sum(R_g^2/n_g) - 3(n+1)`` divided
    by ``1 - sum(t^3-t)/(n^3-n)``."""
    cells = (
        df.selectExpr(f"{group_expr} AS __g", f"{value_col} AS __v")
        .groupBy("__v", "__g")
        .agg(F.count(F.lit(1)).alias("__cg"))
    )
    vals = cells.groupBy("__v").agg(F.sum("__cg").alias("__cnt"))
    ranked = _midrank2(vals)
    per_g = (
        cells.join(ranked.select("__v", "__mr2"), "__v")
        .groupBy("__g")
        .agg(F.sum("__cg").alias("__ng"),
             F.sum(F.expr("__cg * __mr2")).alias("__rg2"))
    )
    ties = ranked.agg(F.sum(F.expr(
        "__cnt * __cnt * __cnt - __cnt")).alias("__ties"))
    red = per_g.crossJoin(F.broadcast(ties)).agg(
        F.sum("__ng").cast("bigint").alias("__n"),
        F.count(F.lit(1)).cast("bigint").alias("__k"),
        # sum over groups of (R_g^2 / n_g), with R_g = rg2/2 — keep
        # the /4 outside the sum so each term is a ratio of exact
        # integers (deterministic double on both engines).
        F.sum(F.expr(
            "CAST(__rg2 AS DOUBLE) * CAST(__rg2 AS DOUBLE) "
            "/ CAST(__ng AS DOUBLE)")).alias("__r2n"),
        F.max("__ties").alias("__ties"),
    )
    n = "CAST(__n AS DOUBLE)"
    h = (
        f"(12 / ({n} * ({n} + 1)) * (__r2n / 4) - 3 * ({n} + 1)) "
        f"/ (1 - CAST(__ties AS DOUBLE) / ({n} * {n} * {n} - {n}))"
    )
    return red.select(
        F.col("__n").alias("n"),
        F.col("__k").alias("k"),
        round_portable(F.expr(h), 6).alias("h_stat"),
    )


# --------------------------------------------------------------------------
# Jarque–Bera normality (per group)
# --------------------------------------------------------------------------


def jarque_bera(df: DataFrame, value_col: str,
                group_col: str) -> DataFrame:
    """(group, n, skewness, kurtosis_excess, jb_stat) per group:
    moment-based normality test ``JB = n/6 * (S^2 + K^2/4)``.
    Two passes: exact quantized mean per group (broadcast back), then
    quantized central-moment sums — the deviation powers quantize at
    decreasing scales (1e6 / 1e4 / 1e2) so the fourth-power sums stay
    far inside BIGINT range."""
    means = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.expr(
            f"CAST(round({value_col} * {Q}) AS BIGINT)")).alias("__s"),
    )
    dev = df.join(F.broadcast(means), group_col).withColumn(
        "__d", F.expr(f"{value_col} - ({_MEAN})"))
    red = dev.groupBy(group_col).agg(
        F.max("__n").cast("bigint").alias("n"),
        F.sum(F.expr(
            f"CAST(round(__d * __d * {Q2}) AS BIGINT)")).alias("__m2"),
        F.sum(F.expr(
            f"CAST(round(__d * __d * __d * {Q3}) AS BIGINT)"
        )).alias("__m3"),
        F.sum(F.expr(
            f"CAST(round(__d * __d * __d * __d * {Q4}) AS BIGINT)"
        )).alias("__m4"),
    )
    nn = "CAST(n AS DOUBLE)"
    m2 = f"(CAST(__m2 AS DOUBLE) / ({nn} * {float(Q2)!r}))"
    m3 = f"(CAST(__m3 AS DOUBLE) / ({nn} * {float(Q3)!r}))"
    m4 = f"(CAST(__m4 AS DOUBLE) / ({nn} * {float(Q4)!r}))"
    skew = f"({m3} / sqrt({m2} * {m2} * {m2}))"
    kurt = f"({m4} / ({m2} * {m2}) - 3)"
    return red.select(
        group_col, "n",
        round_portable(F.expr(skew), 6).alias("skewness"),
        round_portable(F.expr(kurt), 6).alias("kurtosis_excess"),
        round_portable(F.expr(
            f"{nn} / 6 * ({skew} * {skew} + {kurt} * {kurt} / 4)"), 6
        ).alias("jb_stat"),
    )


# --------------------------------------------------------------------------
# Wald–Wolfowitz runs test on move direction
# --------------------------------------------------------------------------


def runs_test(df: DataFrame, value_col: str, keys: list[str],
              order: list[str]) -> DataFrame:
    """(keys..., n_up, n_down, runs, z) per key: runs test on the
    SIGN of consecutive differences (flat moves dropped) —
    ``mu = 2*n1*n2/n + 1``, ``var = (mu-1)(mu-2)/(n-1)``. A |z|
    far from 0 means up/down moves cluster (trend) or alternate
    (mean-revert) more than chance."""
    w = Window.partitionBy(*keys).orderBy(*order)
    signed = (
        df.withColumn("__d", F.col(value_col) - F.lag(value_col).over(w))
        .withColumn("__sgn", F.expr(
            "nullif(CAST(sign(__d) AS BIGINT), 0)"))
        .filter(F.col("__sgn").isNotNull())
    )
    runs = signed.withColumn(
        "__chg", F.expr(
            "CASE WHEN lag(__sgn) OVER "
            f"(PARTITION BY {', '.join(keys)} "
            f"ORDER BY {', '.join(order)}) IS NULL THEN 1 "
            "WHEN __sgn != lag(__sgn) OVER "
            f"(PARTITION BY {', '.join(keys)} "
            f"ORDER BY {', '.join(order)}) THEN 1 ELSE 0 END"))
    red = runs.groupBy(*keys).agg(
        F.sum(F.expr(
            "CASE WHEN __sgn = 1 THEN 1 ELSE 0 END"
        )).cast("bigint").alias("n_up"),
        F.sum(F.expr(
            "CASE WHEN __sgn = -1 THEN 1 ELSE 0 END"
        )).cast("bigint").alias("n_down"),
        F.sum("__chg").cast("bigint").alias("runs"),
    )
    n = "CAST(n_up + n_down AS DOUBLE)"
    mu = (f"(2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) "
          f"/ ({n}) + 1)")
    var = f"(({mu} - 1) * ({mu} - 2) / ({n} - 1))"
    return red.select(
        *keys, "n_up", "n_down", "runs",
        round_portable(F.expr(
            f"(CAST(runs AS DOUBLE) - {mu}) / sqrt({var})"), 6
        ).alias("z"),
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is event_type independent of day-of-week? Day index computed
    as epoch-day arithmetic on both engines (no tz/locale DOW)."""
    ev = load(spark, sf_dir, "events")
    return chi2_independence(
        ev, f"((ts DIV 1000) DIV {US_PER_DAY} + 4) % 7", "event_type")


_CHI2_E = ("CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) "
           "/ CAST(nt AS DOUBLE)")
_CHI2_TERM = (
    f"CAST(round((CAST(o AS DOUBLE) - ({_CHI2_E})) "
    f"* (CAST(o AS DOUBLE) - ({_CHI2_E})) / ({_CHI2_E}) * {Q}) "
    f"AS BIGINT)"
)
_CHI2_VAL = f"CAST(sum({_CHI2_TERM}) AS DOUBLE) / {float(Q)!r}"

_ORACLE_CHI2 = f"""
WITH obs AS (
  SELECT ((epoch_us(ts) // {US_PER_DAY}) + 4) % 7 AS x,
         event_type AS y, count(*) AS nxy
  FROM events GROUP BY 1, 2
), mx AS (SELECT x, sum(nxy) AS nx FROM obs GROUP BY 1),
my AS (SELECT y, sum(nxy) AS ny FROM obs GROUP BY 1),
grid AS (
  SELECT mx.x, my.y, mx.nx, my.ny, COALESCE(obs.nxy, 0) AS o,
         sum(COALESCE(obs.nxy, 0)) OVER () AS nt
  FROM mx CROSS JOIN my
  LEFT JOIN obs ON obs.x = mx.x AND obs.y = my.y
), red AS (
  SELECT CAST(max(nt) AS BIGINT) AS n,
         CAST(count(DISTINCT x) AS BIGINT) AS r,
         CAST(count(DISTINCT y) AS BIGINT) AS c,
         {_CHI2_VAL} AS chi2v
  FROM grid
)
SELECT n, r, c, CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
  {round_portable_duck("chi2v", 6)} AS chi2,
  {round_portable_duck(
      "sqrt(chi2v / (CAST(n AS DOUBLE) "
      "* CAST(least(r - 1, c - 1) AS DOUBLE)))", 6)} AS cramers_v
FROM red
"""


# o_totalprice reaches 5e5, so the squares sum would overflow BIGINT
# at 1e6 quantization — cents-exact linear (1e4) and unit squares (1)
# keep the sums inside range to SF 1000+.
WELCH_Q_LIN = 10 ** 4
WELCH_Q_SQ = 1


def _q_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do open ('O') and fulfilled ('F') orders price differently?"""
    return welch_ttest(load(spark, sf_dir, "orders"), "o_totalprice",
                       "o_orderstatus", "F", "O",
                       q_lin=WELCH_Q_LIN, q_sq=WELCH_Q_SQ)


def _welch_stats_duck(n: str, s: str, ss: str) -> tuple[str, str]:
    mean = (f"CAST({s} AS DOUBLE) "
            f"/ (CAST({n} AS DOUBLE) * {float(WELCH_Q_LIN)!r})")
    var = (
        f"(CAST({ss} AS DOUBLE) "
        f"/ (CAST({n} AS DOUBLE) * {float(WELCH_Q_SQ)!r})"
        f" - ({mean}) * ({mean}))"
        f" * CAST({n} AS DOUBLE) / CAST({n} - 1 AS DOUBLE)"
    )
    return mean, var


_WMA, _WVA = _welch_stats_duck("na", "sa", "ssa")
_WMB, _WVB = _welch_stats_duck("nb", "sb", "ssb")
_WSEA = f"(({_WVA}) / CAST(na AS DOUBLE))"
_WSEB = f"(({_WVB}) / CAST(nb AS DOUBLE))"
_WSE2 = f"({_WSEA} + {_WSEB})"

_ORACLE_WELCH = f"""
WITH agg AS (
  SELECT
    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS na,
    sum(CASE WHEN o_orderstatus = 'F' THEN
      CAST(round(o_totalprice * {WELCH_Q_LIN}) AS BIGINT)
      ELSE 0 END) AS sa,
    sum(CASE WHEN o_orderstatus = 'F' THEN
      CAST(round(o_totalprice * o_totalprice * {WELCH_Q_SQ}) AS BIGINT)
      ELSE 0 END) AS ssa,
    sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS nb,
    sum(CASE WHEN o_orderstatus = 'O' THEN
      CAST(round(o_totalprice * {WELCH_Q_LIN}) AS BIGINT)
      ELSE 0 END) AS sb,
    sum(CASE WHEN o_orderstatus = 'O' THEN
      CAST(round(o_totalprice * o_totalprice * {WELCH_Q_SQ}) AS BIGINT)
      ELSE 0 END) AS ssb
  FROM orders WHERE o_orderstatus IN ('F', 'O')
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  {round_portable_duck(_WMA, 6)} AS mean_a,
  {round_portable_duck(_WMB, 6)} AS mean_b,
  {round_portable_duck(
      f"(({_WMA}) - ({_WMB})) / sqrt({_WSE2})", 6)} AS t_stat,
  {round_portable_duck(
      f"({_WSE2}) * ({_WSE2}) / "
      f"(({_WSEA}) * ({_WSEA}) / CAST(na - 1 AS DOUBLE) "
      f"+ ({_WSEB}) * ({_WSEB}) / CAST(nb - 1 AS DOUBLE))", 6)} AS dof
FROM agg
"""


def _q_mwu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does 'purchase' event value stochastically dominate 'click'?"""
    return mann_whitney_u(load(spark, sf_dir, "events"), "value",
                          "event_type", "purchase", "click")


_ORACLE_MWU = f"""
WITH vals AS (
  SELECT value AS v, count(*) AS cnt,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS ca
  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1
), ranked AS ({_MR2_DUCK}
), red AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na,
         CAST(sum(cnt - ca) AS BIGINT) AS nb,
         sum(ca * mr2) AS ra2,
         sum(cnt * cnt * cnt - cnt) AS ties
  FROM ranked
)
SELECT na AS n_a, nb AS n_b,
  {round_portable_duck(
      "CAST(ra2 - na * (na + 1) AS DOUBLE) / 2", 6)} AS u_a,
  {round_portable_duck(
      "(CAST(ra2 - na * (na + 1) AS DOUBLE) "
      "- CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) "
      "/ (2 * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12 "
      "* ((CAST(na + nb AS DOUBLE) + 1) - CAST(ties AS DOUBLE) "
      "/ (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1)))))",
      6)} AS z
FROM red
"""


def _q_kw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the five event types draw value from the same distribution?"""
    return kruskal_wallis(load(spark, sf_dir, "events"), "value",
                          "event_type")


_KW_N = "CAST(n_ AS DOUBLE)"
_KW_H = (
    f"(12 / ({_KW_N} * ({_KW_N} + 1)) * (r2n / 4) - 3 * ({_KW_N} + 1)) "
    f"/ (1 - CAST(ties_ AS DOUBLE) "
    f"/ ({_KW_N} * {_KW_N} * {_KW_N} - {_KW_N}))"
)

_ORACLE_KW = f"""
WITH cells AS (
  SELECT value AS v, event_type AS g, count(*) AS cg
  FROM events GROUP BY 1, 2
), vals AS (
  SELECT v, sum(cg) AS cnt FROM cells GROUP BY 1
), ranked AS ({_MR2_DUCK}
), per_g AS (
  SELECT c.g, sum(c.cg) AS ng, sum(c.cg * r.mr2) AS rg2
  FROM cells c JOIN ranked r ON c.v = r.v
  GROUP BY 1
), ties AS (
  SELECT sum(cnt * cnt * cnt - cnt) AS t FROM ranked
), red AS (
  SELECT CAST(sum(ng) AS BIGINT) AS n_,
         CAST(count(*) AS BIGINT) AS k_,
         sum(CAST(rg2 AS DOUBLE) * CAST(rg2 AS DOUBLE)
             / CAST(ng AS DOUBLE)) AS r2n,
         max(t) AS ties_
  FROM per_g CROSS JOIN ties
)
SELECT n_ AS n, k_ AS k,
  {round_portable_duck(_KW_H, 6)} AS h_stat
FROM red
"""


def _q_jb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jarque_bera(load(spark, sf_dir, "events"), "value",
                       "event_type")


_JB_MEAN = _strip(_MEAN)
_JB_NN = "CAST(n_ AS DOUBLE)"
_JB_M2 = f"(CAST(m2 AS DOUBLE) / ({_JB_NN} * {float(Q2)!r}))"
_JB_M3 = f"(CAST(m3 AS DOUBLE) / ({_JB_NN} * {float(Q3)!r}))"
_JB_M4 = f"(CAST(m4 AS DOUBLE) / ({_JB_NN} * {float(Q4)!r}))"
_JB_SKEW = f"({_JB_M3} / sqrt({_JB_M2} * {_JB_M2} * {_JB_M2}))"
_JB_KURT = f"({_JB_M4} / ({_JB_M2} * {_JB_M2}) - 3)"

_ORACLE_JB = f"""
WITH means AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(round(value * {Q}) AS BIGINT)) AS s
  FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type, st.n, e.value - ({_JB_MEAN}) AS d
  FROM events e JOIN means st ON e.event_type = st.event_type
), red AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n_,
         sum(CAST(round(d * d * {Q2}) AS BIGINT)) AS m2,
         sum(CAST(round(d * d * d * {Q3}) AS BIGINT)) AS m3,
         sum(CAST(round(d * d * d * d * {Q4}) AS BIGINT)) AS m4
  FROM dev GROUP BY 1
)
SELECT event_type, n_ AS n,
  {round_portable_duck(_JB_SKEW, 6)} AS skewness,
  {round_portable_duck(_JB_KURT, 6)} AS kurtosis_excess,
  {round_portable_duck(
      f"{_JB_NN} / 6 * ({_JB_SKEW} * {_JB_SKEW} "
      f"+ {_JB_KURT} * {_JB_KURT} / 4)", 6)} AS jb_stat
FROM red
"""


def _q_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return runs_test(load(spark, sf_dir, "events"), "value",
                     ["event_type"], ["ts", "event_id"])


_RUNS_N = "CAST(n_up + n_down AS DOUBLE)"
_RUNS_MU = (f"(2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) "
            f"/ ({_RUNS_N}) + 1)")
_RUNS_VAR = f"(({_RUNS_MU} - 1) * ({_RUNS_MU} - 2) / ({_RUNS_N} - 1))"

_ORACLE_RUNS = f"""
WITH signed AS (
  SELECT event_type, ts, event_id,
         nullif(CAST(sign(value - lag(value) OVER
           (PARTITION BY event_type ORDER BY ts, event_id))
           AS BIGINT), 0) AS sgn
  FROM events
), flt AS (
  SELECT event_type, ts, event_id, sgn FROM signed
  WHERE sgn IS NOT NULL
), runs AS (
  SELECT event_type, sgn,
         CASE WHEN lag(sgn) OVER (PARTITION BY event_type
                ORDER BY ts, event_id) IS NULL THEN 1
              WHEN sgn != lag(sgn) OVER (PARTITION BY event_type
                ORDER BY ts, event_id) THEN 1 ELSE 0 END AS chg
  FROM flt
), red AS (
  SELECT event_type,
         CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_up,
         CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_down,
         CAST(sum(chg) AS BIGINT) AS runs
  FROM runs GROUP BY 1
)
SELECT event_type, n_up, n_down, runs,
  {round_portable_duck(
      f"(CAST(runs AS DOUBLE) - {_RUNS_MU}) / sqrt({_RUNS_VAR})",
      6)} AS z
FROM red
"""


QUERIES: dict = {
    "q_chi2_dow_events": (_q_chi2, _ORACLE_CHI2),
    "q_welch_ttest_orders": (_q_welch, _ORACLE_WELCH),
    "q_mannwhitney_events": (_q_mwu, _ORACLE_MWU),
    "q_kruskal_events": (_q_kw, _ORACLE_KW),
    "q_jarque_bera_events": (_q_jb, _ORACLE_JB),
    "q_runs_test_events": (_q_runs, _ORACLE_RUNS),
}

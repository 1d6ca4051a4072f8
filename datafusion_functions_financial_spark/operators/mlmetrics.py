"""Model-evaluation metrics at scale: exact rank-based ROC AUC,
calibration deciles, cumulative gains/lift, a threshold sweep of the
confusion matrix, and Benjamini-Hochberg FDR control over a family of
per-group uniformity tests.

The labeled relation is (score, label) — here ``events`` restricted
to two event types, label 1 = the positive type, score = ``value``.

Scale design — the distributed rank. Every metric here needs global
order statistics of the score column, and the naive expression of
that (``row_number() OVER (ORDER BY score)``) plans as a SINGLE
PARTITION window in Spark — the one-task sort that dies at 100 TB.
Instead the rank is computed with a bucketed prefix sum:

1. range-bucket scores into ``N_BUCKETS`` by the observed (min, max)
   (one tiny agg, broadcast crossJoin — no driver collect);
2. per-bucket totals (``N_BUCKETS`` rows) get cumulative offsets via
   a window over the bucket id — bounded by the bucket count, never
   the data;
3. each bucket ranks internally, PARTITIONed BY bucket, and adds its
   broadcast offset.

Step 3 is the only data-sized window and it is keyed, so the sort is
per-bucket and parallel — the plan survives a 100× scale-up. The
DuckDB oracles express the same integer arithmetic with the plain
global window (single-node, so the shape concern does not apply).

Everything reduces to BIGINT counts and rank sums; the only doubles
are the final closed forms, written as one shared expression tree per
engine, portably rounded. AUC ties are handled exactly via the
average-rank formulation on the distinct-score relation:
``AUC = (2*R_pos - n_pos*(n_pos+1)) / (2*n_pos*n_neg)`` where
``2*R_pos = sum over distinct scores of cp * (2*start + c - 1)``
(start = 1-based rank of the score's first row) — every term an
integer. At extreme scale (n_pos * n ~ 2^63) decompose the rank sum
per bucket before summing; the bucket machinery above already
provides the offsets.

BH-FDR: the hypothesis family is day-of-week uniformity per user
bucket — chi-square with df = 6, whose survival function has the
exact even-df closed form ``exp(-x/2) * (1 + x/2 + x^2/8)``, so
p-values need no incomplete-gamma library on either engine. The
chi-square itself is exact-integer: ``chi2 = 7 * sum(cnt^2) / n - n``.
The BH step ranks the (bounded, one-row-per-hypothesis) p relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["auc", "calibration_bins", "gains_lift", "threshold_metrics",
           "bh_fdr_dow", "woe_iv", "stump_split"]

Q = 10 ** 8
QF = float(Q)
N_BUCKETS = 1024
N_BINS = 10
BH_ALPHA = 0.05
BH_GROUPS = 40

_POS, _NEG = "purchase", "click"


def _labeled(df: DataFrame, score_col: str, label_expr: str) -> DataFrame:
    return (
        df.filter(F.col(score_col).isNotNull())
        .select(F.col(score_col).alias("__v"),
                F.expr(label_expr).cast("int").alias("__y"))
    )


def _bucketed(rel: DataFrame, count_col: str) -> DataFrame:
    """Adds ``__start`` (1-based global rank of the first row of each
    ``__v`` group) to a relation of distinct ``__v`` rows carrying a
    ``count_col`` — the bucketed prefix sum described in the module
    docstring. Constant-score degenerate inputs collapse to bucket 0."""
    rng = rel.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    b = (
        rel.crossJoin(F.broadcast(rng))
        .withColumn("__b", F.expr(
            f"CASE WHEN __hi <= __lo THEN CAST(0 AS BIGINT) ELSE "
            f"CAST(least(CAST({N_BUCKETS - 1} AS BIGINT), "
            f"CAST(floor((CAST(__v AS DOUBLE) - CAST(__lo AS DOUBLE)) "
            f"* {N_BUCKETS} / (CAST(__hi AS DOUBLE) "
            f"- CAST(__lo AS DOUBLE))) AS BIGINT)) AS BIGINT) END"))
        .drop("__lo", "__hi")
    )
    btot = b.groupBy("__b").agg(F.sum(count_col).alias("__bc"))
    # Window over the bucket-id relation: <= N_BUCKETS rows, bounded
    # by the bucket count — never the data.
    boff = btot.withColumn("__off", F.sum("__bc").over(
        Window.orderBy("__b").rowsBetween(
            Window.unboundedPreceding, 0)) - F.col("__bc")).drop("__bc")
    intra = Window.partitionBy("__b").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0)
    return (
        b.join(F.broadcast(boff), "__b")
        .withColumn("__start", F.col("__off")
                    + F.sum(count_col).over(intra)
                    - F.col(count_col) + 1)
        .drop("__off")
    )


def auc(df: DataFrame, score_col: str, label_expr: str) -> DataFrame:
    """One row (n_pos, n_neg, auc): exact tie-corrected ROC AUC
    (equivalently the normalized Mann-Whitney U of the positive
    class). Integer arithmetic end to end; one double division."""
    per_v = (
        _labeled(df, score_col, label_expr)
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"),
             F.sum("__y").cast("bigint").alias("__cp"))
    )
    ranked = _bucketed(per_v, "__c")
    s = ranked.agg(
        F.sum("__cp").cast("bigint").alias("__np"),
        F.sum(F.col("__c") - F.col("__cp")).cast("bigint").alias("__nn"),
        F.sum(F.col("__cp") * (2 * F.col("__start") + F.col("__c") - 1)
              ).cast("bigint").alias("__r2"),
    )
    return s.select(
        F.col("__np").alias("n_pos"),
        F.col("__nn").alias("n_neg"),
        round_portable(F.expr(
            "CAST(__r2 - __np * (__np + 1) AS DOUBLE) "
            "/ (2.0 * CAST(__np AS DOUBLE) * CAST(__nn AS DOUBLE))"), 6
        ).alias("auc"),
    )


def _binned(df: DataFrame, score_col: str, label_expr: str,
            id_col: str, n_bins: int = N_BINS) -> DataFrame:
    """(bin, n, sp, sq): per-decile row/positive counts and quantized
    score sums over the uniquely-ranked (score, id) relation."""
    rows = (
        df.filter(F.col(score_col).isNotNull())
        .select(F.col(score_col).alias("__v"),
                F.expr(label_expr).cast("int").alias("__y"),
                F.col(id_col).alias("__id"),
                F.lit(1).cast("bigint").alias("__one"))
    )
    # Unique rank: bucket offsets + within-bucket row_number over the
    # (score, id) total order.
    rng = rows.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    b = (
        rows.crossJoin(F.broadcast(rng))
        .withColumn("__b", F.expr(
            f"CASE WHEN __hi <= __lo THEN CAST(0 AS BIGINT) ELSE "
            f"CAST(least(CAST({N_BUCKETS - 1} AS BIGINT), "
            f"CAST(floor((CAST(__v AS DOUBLE) - CAST(__lo AS DOUBLE)) "
            f"* {N_BUCKETS} / (CAST(__hi AS DOUBLE) "
            f"- CAST(__lo AS DOUBLE))) AS BIGINT)) AS BIGINT) END"))
        .drop("__lo", "__hi")
    )
    btot = b.groupBy("__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__bc"))
    boff = btot.withColumn("__off", F.sum("__bc").over(
        Window.orderBy("__b").rowsBetween(
            Window.unboundedPreceding, 0)) - F.col("__bc"))
    n_total = btot.agg(F.sum("__bc").cast("bigint").alias("__n"))
    ranked = (
        b.join(F.broadcast(boff.select("__b", "__off")), "__b")
        .withColumn("__rk", F.col("__off") + F.row_number().over(
            Window.partitionBy("__b").orderBy("__v", "__id")
        ).cast("long"))
        .crossJoin(F.broadcast(n_total))
    )
    return (
        ranked
        .withColumn("bin", F.expr(
            f"CAST((__rk - 1) * {n_bins} DIV __n AS BIGINT)"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             F.sum("__y").cast("bigint").alias("sp"),
             F.sum(F.expr(
                 f"CAST(round(__v * {Q}) AS BIGINT)")).alias("sq"))
    )


def calibration_bins(df: DataFrame, score_col: str, label_expr: str,
                     id_col: str, n_bins: int = N_BINS) -> DataFrame:
    """(bin, n, mean_score, pos_rate): the reliability table — rows
    ranked by score into equal-count bins; a well-calibrated score has
    pos_rate tracking mean_score's order."""
    return _binned(df, score_col, label_expr, id_col, n_bins).select(
        "bin", "n",
        round_portable(F.expr(
            f"CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r})"), 6
        ).alias("mean_score"),
        round_portable(F.expr(
            "CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)"), 6
        ).alias("pos_rate"),
    )


def gains_lift(df: DataFrame, score_col: str, label_expr: str,
               id_col: str, n_bins: int = N_BINS) -> DataFrame:
    """(bin_rank, cum_n, cum_pos, gain, lift): cumulative gains table
    walking deciles from the highest scores down. ``gain`` = share of
    all positives captured; ``lift`` = positive-rate ratio vs base."""
    binned = _binned(df, score_col, label_expr, id_col, n_bins)
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0)  # n_bins rows: bounded window
    tot = Window.partitionBy()
    return (
        binned
        .withColumn("cum_n", F.sum("n").over(w).cast("bigint"))
        .withColumn("cum_pos", F.sum("sp").over(w).cast("bigint"))
        .withColumn("__tn", F.sum("n").over(tot).cast("bigint"))
        .withColumn("__tp", F.sum("sp").over(tot).cast("bigint"))
        .select(
            (F.lit(n_bins - 1) - F.col("bin")).cast("bigint")
            .alias("bin_rank"),
            "cum_n", "cum_pos",
            round_portable(F.expr(
                "CAST(cum_pos AS DOUBLE) / CAST(__tp AS DOUBLE)"), 6
            ).alias("gain"),
            round_portable(F.expr(
                "(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) "
                "/ (CAST(__tp AS DOUBLE) / CAST(__tn AS DOUBLE))"), 6
            ).alias("lift"),
        )
    )


def woe_iv(df: DataFrame, score_col: str, label_expr: str,
           id_col: str, n_bins: int = N_BINS) -> DataFrame:
    """(bin, n_pos, n_neg, woe, iv_term, iv_total): weight of
    evidence per score decile with Laplace(0.5) smoothing —
    ``woe = ln((pos_i + .5)/pos_tot / ((neg_i + .5)/neg_tot))`` —
    and the information value (sum of smoothed-share-difference x
    WoE terms; the credit-scoring predictiveness scale: < 0.02
    useless, > 0.3 strong). The IV window runs over the n_bins-row
    relation — bounded, never the data."""
    binned = _binned(df, score_col, label_expr, id_col, n_bins)
    tot = Window.partitionBy()
    ps = ("((CAST(n_pos AS DOUBLE) + 0.5) / CAST(__tp AS DOUBLE))")
    ns = ("((CAST(n_neg AS DOUBLE) + 0.5) / CAST(__tn AS DOUBLE))")
    woe = f"ln({ps} / {ns})"
    rel = (
        binned
        .select("bin", F.col("sp").alias("n_pos"),
                (F.col("n") - F.col("sp")).cast("bigint").alias("n_neg"))
        .withColumn("__tp", F.sum("n_pos").over(tot).cast("bigint"))
        .withColumn("__tn", F.sum("n_neg").over(tot).cast("bigint"))
        .withColumn("__woe", F.expr(woe))
        # IV terms quantize to BIGINT before the cross-row sum (the
        # SCALING.md rule): the total is add-order-free and exact.
        .withColumn("__ivq", F.expr(
            f"CAST(round((({ps}) - ({ns})) * ({woe}) * {Q}) "
            f"AS BIGINT)"))
    )
    return rel.select(
        "bin", "n_pos", "n_neg",
        round_portable(F.col("__woe"), 6).alias("woe"),
        round_portable(F.expr(
            f"CAST(__ivq AS DOUBLE) / {QF!r}"), 6).alias("iv_term"),
        round_portable(F.expr(
            f"CAST(sum(__ivq) OVER () AS DOUBLE) / {QF!r}"), 6
        ).alias("iv_total"),
    )


def threshold_metrics(df: DataFrame, score_col: str,
                      label_expr: str) -> DataFrame:
    """(i, thr, tp, fp, fn, tn, precision, recall, f1) at the nine
    decile thresholds of the score distribution. Thresholds are
    portably rounded BEFORE the comparison so both engines cut on the
    same double; one broadcast of the 9-row threshold relation, one
    pass over the data with map-side partial aggregation."""
    rows = _labeled(df, score_col, label_expr)
    ps = [i / 10 for i in range(1, 10)]
    thr = (
        rows.agg(F.expr(
            f"percentile(__v, array({', '.join(map(repr, ps))}))"
        ).alias("__qs"))
        .select(F.posexplode("__qs").alias("__p", "__q"))
        .select((F.col("__p") + 1).cast("bigint").alias("i"),
                round_portable(F.col("__q"), 6).alias("thr"))
    )
    m = (
        rows.crossJoin(F.broadcast(thr))
        .groupBy("i", "thr")
        .agg(
            F.sum(F.expr(
                "CASE WHEN __y = 1 AND __v >= thr THEN 1 ELSE 0 END"
            )).cast("bigint").alias("tp"),
            F.sum(F.expr(
                "CASE WHEN __y = 0 AND __v >= thr THEN 1 ELSE 0 END"
            )).cast("bigint").alias("fp"),
            F.sum(F.expr(
                "CASE WHEN __y = 1 AND __v < thr THEN 1 ELSE 0 END"
            )).cast("bigint").alias("fn"),
            F.sum(F.expr(
                "CASE WHEN __y = 0 AND __v < thr THEN 1 ELSE 0 END"
            )).cast("bigint").alias("tn"),
        )
    )
    prec = "(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))"
    rec = "(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))"
    return m.select(
        "i", "thr", "tp", "fp", "fn", "tn",
        round_portable(F.expr(
            f"CASE WHEN tp + fp > 0 THEN {prec} END"), 6
        ).alias("precision"),
        round_portable(F.expr(
            f"CASE WHEN tp + fn > 0 THEN {rec} END"), 6
        ).alias("recall"),
        round_portable(F.expr(
            f"CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tp > 0 THEN "
            f"2.0 * {prec} * {rec} / ({prec} + {rec}) "
            f"WHEN tp + fp > 0 AND tp + fn > 0 THEN 0.0 END"), 6
        ).alias("f1"),
    )


def stump_split(df: DataFrame, score_col: str,
                label_expr: str) -> DataFrame:
    """(i, thr, n_left, ig, is_best): information gain of the
    decision stump ``score >= thr`` at the nine decile thresholds —
    the single-feature split scorer (the inner loop of tree
    training, and the quick "is this feature predictive at all"
    check). ``ig = H(y) - [n_l/n H(y_l) + n_r/n H(y_r)]`` with the
    binary entropy computed from exact BIGINT counts in one shared
    expression; the best-split rank runs over the 9-row relation."""
    rows = _labeled(df, score_col, label_expr)
    ps = [i / 10 for i in range(1, 10)]
    thr = (
        rows.agg(F.expr(
            f"percentile(__v, array({', '.join(map(repr, ps))}))"
        ).alias("__qs"))
        .select(F.posexplode("__qs").alias("__p", "__q"))
        .select((F.col("__p") + 1).cast("bigint").alias("i"),
                round_portable(F.col("__q"), 6).alias("thr"))
    )
    m = (
        rows.crossJoin(F.broadcast(thr))
        .groupBy("i", "thr")
        .agg(
            F.sum(F.expr("CASE WHEN __v < thr THEN 1 ELSE 0 END"))
            .cast("bigint").alias("nl"),
            F.sum(F.expr(
                "CASE WHEN __v < thr AND __y = 1 THEN 1 ELSE 0 END"))
            .cast("bigint").alias("pl"),
            F.sum(F.expr("CASE WHEN __v >= thr THEN 1 ELSE 0 END"))
            .cast("bigint").alias("nr"),
            F.sum(F.expr(
                "CASE WHEN __v >= thr AND __y = 1 THEN 1 ELSE 0 END"))
            .cast("bigint").alias("pr"),
        )
    )

    def h(p_num: str, n_den: str) -> str:
        p = f"(CAST({p_num} AS DOUBLE) / CAST({n_den} AS DOUBLE))"
        return (f"(CASE WHEN {p} <= 0.0 OR {p} >= 1.0 THEN 0.0 ELSE "
                f"-({p}) * ln({p}) - (1.0 - {p}) * ln(1.0 - {p}) "
                f"END)")

    hp = h("pl + pr", "nl + nr")
    hl = f"(CASE WHEN nl > 0 THEN {h('pl', 'nl')} ELSE 0.0 END)"
    hr = f"(CASE WHEN nr > 0 THEN {h('pr', 'nr')} ELSE 0.0 END)"
    ig = (f"({hp} - (CAST(nl AS DOUBLE) * {hl} "
          f"+ CAST(nr AS DOUBLE) * {hr}) / CAST(nl + nr AS DOUBLE))")
    scored = m.select(
        "i", "thr", F.col("nl").alias("n_left"),
        round_portable(F.expr(ig), 6).alias("ig"),
    )
    return scored.withColumn("is_best", F.expr(
        "CAST(CASE WHEN CAST(row_number() OVER "
        "(ORDER BY ig DESC, i ASC) AS BIGINT) = 1 "
        "THEN 1 ELSE 0 END AS BIGINT)"))


def bh_fdr_dow(df: DataFrame, us_col: str, group_expr: str,
               alpha: float = BH_ALPHA) -> DataFrame:
    """(grp, n, chi2, p_value, rnk, bh_crit, significant): per-group
    chi-square test of day-of-week uniformity (df = 6) with
    Benjamini-Hochberg FDR control across the family. ``chi2 =
    7 * sum(cnt^2) / n - n`` — exact from BIGINT day-of-week counts;
    ``p = exp(-x/2) * (1 + x/2 + x^2/8)`` — the exact even-df
    survival closed form. The BH rank/threshold windows run over the
    one-row-per-hypothesis relation (bounded by the group cardinality,
    never the data)."""
    counts = (
        df.selectExpr(
            f"{group_expr} AS grp",
            f"dayofweek(timestamp_micros(CAST(({us_col}) AS BIGINT)))"
            f" - 1 AS __dow")
        .groupBy("grp", "__dow")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    per_g = counts.groupBy("grp").agg(
        F.sum("__c").cast("bigint").alias("n"),
        F.sum(F.col("__c") * F.col("__c")).cast("bigint").alias("__c2"),
    )
    chi2 = ("(7.0 * CAST(__c2 AS DOUBLE) / CAST(n AS DOUBLE) "
            "- CAST(n AS DOUBLE))")
    p = (f"(exp(-({chi2}) / 2.0) * (1.0 + ({chi2}) / 2.0 "
         f"+ ({chi2}) * ({chi2}) / 8.0))")
    hyp = per_g.select(
        "grp", "n",
        round_portable(F.expr(chi2), 6).alias("chi2"),
        F.expr(p).alias("__p"),
    )
    m = Window.partitionBy()
    ranked = (
        hyp
        .withColumn("rnk", F.row_number().over(
            Window.orderBy("__p", "grp")).cast("bigint"))
        .withColumn("__m", F.count(F.lit(1)).over(m))
        .withColumn("bh_crit", F.expr(
            f"CAST(rnk AS DOUBLE) * {alpha!r} / CAST(__m AS DOUBLE)"))
        .withColumn("__kstar", F.max(F.expr(
            "CASE WHEN __p <= bh_crit THEN rnk END")).over(m))
    )
    return ranked.select(
        "grp", "n", "chi2",
        round_portable(F.col("__p"), 6).alias("p_value"),
        "rnk",
        round_portable(F.col("bh_crit"), 6).alias("bh_crit"),
        F.expr("CAST(CASE WHEN __kstar IS NOT NULL AND rnk <= __kstar "
               "THEN 1 ELSE 0 END AS BIGINT)").alias("significant"),
    )


# --------------------------------------------------------------------------
# Gate queries — label: purchase vs click, score: value
# --------------------------------------------------------------------------

_LABEL = f"CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END"


def _two_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").filter(
        F.col("event_type").isin([_POS, _NEG]))


_DUCK_LABELED = f"""
v AS (
  SELECT value AS v,
         CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END AS y,
         event_id AS id
  FROM events
  WHERE event_type IN ('{_POS}', '{_NEG}') AND value IS NOT NULL
)"""


def _q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return auc(_two_class(spark, sf_dir), "value", _LABEL)


_ORACLE_AUC = f"""
WITH {_DUCK_LABELED}, pv AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS cp
  FROM v GROUP BY 1
), r AS (
  SELECT c, cp,
    sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) - c + 1 AS start
  FROM pv
), s AS (
  SELECT CAST(sum(cp) AS BIGINT) AS np,
         CAST(sum(c - cp) AS BIGINT) AS nn,
         CAST(sum(cp * (2 * start + c - 1)) AS BIGINT) AS r2
  FROM r
)
SELECT np AS n_pos, nn AS n_neg,
  {round_portable_duck(
      "CAST(r2 - np * (np + 1) AS DOUBLE) "
      "/ (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE))", 6)} AS auc
FROM s
"""


def _q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return calibration_bins(_two_class(spark, sf_dir), "value", _LABEL,
                            "event_id")


_DUCK_BINNED = f"""
{_DUCK_LABELED}, rk AS (
  SELECT v, y,
    row_number() OVER (ORDER BY v, id) AS rk,
    CAST(count(*) OVER () AS BIGINT) AS n
  FROM v
), binned AS (
  SELECT CAST((rk - 1) * {N_BINS} // n AS BIGINT) AS bin,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS sp,
    CAST(sum(CAST(round(v * {Q}) AS BIGINT)) AS BIGINT) AS sq
  FROM rk GROUP BY 1
)"""

_ORACLE_CALIBRATION = f"""
WITH {_DUCK_BINNED}
SELECT bin, n,
  {round_portable_duck(
      f"CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r})", 6)}
    AS mean_score,
  {round_portable_duck(
      "CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS pos_rate
FROM binned
"""


def _q_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gains_lift(_two_class(spark, sf_dir), "value", _LABEL,
                      "event_id")


_ORACLE_GAINS = f"""
WITH {_DUCK_BINNED}, cum AS (
  SELECT bin,
    CAST(sum(n) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED
      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
    CAST(sum(sp) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED
      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
    CAST(sum(n) OVER () AS BIGINT) AS tn,
    CAST(sum(sp) OVER () AS BIGINT) AS tp
  FROM binned
)
SELECT CAST({N_BINS - 1} - bin AS BIGINT) AS bin_rank, cum_n, cum_pos,
  {round_portable_duck(
      "CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE)", 6)} AS gain,
  {round_portable_duck(
      "(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) "
      "/ (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE))", 6)} AS lift
FROM cum
"""


def _q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return woe_iv(_two_class(spark, sf_dir), "value", _LABEL,
                  "event_id")


_WOE_PS = "((CAST(n_pos AS DOUBLE) + 0.5) / CAST(tp AS DOUBLE))"
_WOE_NS = "((CAST(n_neg AS DOUBLE) + 0.5) / CAST(tn AS DOUBLE))"
_WOE = f"ln({_WOE_PS} / {_WOE_NS})"

_ORACLE_WOE_IV = f"""
WITH {_DUCK_BINNED}, rel AS (
  SELECT bin, sp AS n_pos, CAST(n - sp AS BIGINT) AS n_neg,
    CAST(sum(sp) OVER () AS BIGINT) AS tp,
    CAST(sum(n - sp) OVER () AS BIGINT) AS tn
  FROM binned
), terms AS (
  SELECT bin, n_pos, n_neg, {_WOE} AS woe,
    CAST(round((({_WOE_PS}) - ({_WOE_NS})) * ({_WOE}) * {Q})
      AS BIGINT) AS ivq
  FROM rel
)
SELECT bin, n_pos, n_neg,
  {round_portable_duck("woe", 6)} AS woe,
  {round_portable_duck(f"CAST(ivq AS DOUBLE) / {QF!r}", 6)}
    AS iv_term,
  {round_portable_duck(
      f"CAST(sum(ivq) OVER () AS DOUBLE) / {QF!r}", 6)} AS iv_total
FROM terms
"""


def _q_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return threshold_metrics(_two_class(spark, sf_dir), "value", _LABEL)


def _thr_oracle() -> str:
    rows = "\n  UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS i, "
        f"{round_portable_duck(f'quantile_cont(v, {i / 10!r})', 6)}"
        f" AS thr FROM v"
        for i in range(1, 10))
    prec = "(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))"
    rec = "(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))"
    return f"""
WITH {_DUCK_LABELED}, thr AS (
  {rows}
), m AS (
  SELECT t.i, t.thr,
    CAST(sum(CASE WHEN y = 1 AND v >= t.thr THEN 1 ELSE 0 END)
      AS BIGINT) AS tp,
    CAST(sum(CASE WHEN y = 0 AND v >= t.thr THEN 1 ELSE 0 END)
      AS BIGINT) AS fp,
    CAST(sum(CASE WHEN y = 1 AND v < t.thr THEN 1 ELSE 0 END)
      AS BIGINT) AS fn,
    CAST(sum(CASE WHEN y = 0 AND v < t.thr THEN 1 ELSE 0 END)
      AS BIGINT) AS tn
  FROM v CROSS JOIN thr t GROUP BY 1, 2
)
SELECT i, thr, tp, fp, fn, tn,
  {round_portable_duck(
      f"CASE WHEN tp + fp > 0 THEN {prec} END", 6)} AS precision,
  {round_portable_duck(
      f"CASE WHEN tp + fn > 0 THEN {rec} END", 6)} AS recall,
  {round_portable_duck(
      f"CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tp > 0 THEN "
      f"2.0 * {prec} * {rec} / ({prec} + {rec}) "
      f"WHEN tp + fp > 0 AND tp + fn > 0 THEN 0.0 END", 6)} AS f1
FROM m
"""


def _q_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stump_split(_two_class(spark, sf_dir), "value", _LABEL)


def _stump_oracle() -> str:
    rows = "\n  UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS i, "
        f"{round_portable_duck(f'quantile_cont(v, {i / 10!r})', 6)}"
        f" AS thr FROM v"
        for i in range(1, 10))

    def h(p_num: str, n_den: str) -> str:
        p = f"(CAST({p_num} AS DOUBLE) / CAST({n_den} AS DOUBLE))"
        return (f"(CASE WHEN {p} <= 0.0 OR {p} >= 1.0 THEN 0.0 ELSE "
                f"-({p}) * ln({p}) - (1.0 - {p}) * ln(1.0 - {p}) "
                f"END)")

    hp = h("pl + pr", "nl + nr")
    hl = f"(CASE WHEN nl > 0 THEN {h('pl', 'nl')} ELSE 0.0 END)"
    hr = f"(CASE WHEN nr > 0 THEN {h('pr', 'nr')} ELSE 0.0 END)"
    ig = (f"({hp} - (CAST(nl AS DOUBLE) * {hl} "
          f"+ CAST(nr AS DOUBLE) * {hr}) / CAST(nl + nr AS DOUBLE))")
    return f"""
WITH {_DUCK_LABELED}, thr AS (
  {rows}
), m AS (
  SELECT t.i, t.thr,
    CAST(sum(CASE WHEN v < t.thr THEN 1 ELSE 0 END) AS BIGINT) AS nl,
    CAST(sum(CASE WHEN v < t.thr AND y = 1 THEN 1 ELSE 0 END)
      AS BIGINT) AS pl,
    CAST(sum(CASE WHEN v >= t.thr THEN 1 ELSE 0 END) AS BIGINT)
      AS nr,
    CAST(sum(CASE WHEN v >= t.thr AND y = 1 THEN 1 ELSE 0 END)
      AS BIGINT) AS pr
  FROM v CROSS JOIN thr t GROUP BY 1, 2
), scored AS (
  SELECT i, thr, nl AS n_left,
    {round_portable_duck(ig, 6)} AS ig
  FROM m
)
SELECT i, thr, n_left, ig,
  CAST(CASE WHEN CAST(row_number() OVER (ORDER BY ig DESC, i ASC)
    AS BIGINT) = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best
FROM scored
"""


def _q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return bh_fdr_dow(ev, "ts DIV 1000", f"user_id % {BH_GROUPS}")


_BH_CHI2 = ("(7.0 * CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE) "
            "- CAST(n AS DOUBLE))")
_BH_P = (f"(exp(-({_BH_CHI2}) / 2.0) * (1.0 + ({_BH_CHI2}) / 2.0 "
         f"+ ({_BH_CHI2}) * ({_BH_CHI2}) / 8.0))")

_ORACLE_BH_FDR = f"""
WITH counts AS (
  SELECT user_id % {BH_GROUPS} AS grp, dayofweek(ts) AS dow,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), per_g AS (
  SELECT grp, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * c) AS BIGINT) AS c2
  FROM counts GROUP BY 1
), hyp AS (
  SELECT grp, n, {round_portable_duck(_BH_CHI2, 6)} AS chi2,
         {_BH_P} AS p
  FROM per_g
), ranked AS (
  SELECT grp, n, chi2, p,
    CAST(row_number() OVER (ORDER BY p, grp) AS BIGINT) AS rnk,
    CAST(count(*) OVER () AS BIGINT) AS m
  FROM hyp
), crit AS (
  SELECT *, CAST(rnk AS DOUBLE) * {BH_ALPHA!r} / CAST(m AS DOUBLE)
    AS bh_crit FROM ranked
), kstar AS (
  SELECT *, max(CASE WHEN p <= bh_crit THEN rnk END) OVER () AS ks
  FROM crit
)
SELECT grp, n, chi2,
  {round_portable_duck("p", 6)} AS p_value,
  rnk,
  {round_portable_duck("bh_crit", 6)} AS bh_crit,
  CAST(CASE WHEN ks IS NOT NULL AND rnk <= ks THEN 1 ELSE 0 END
    AS BIGINT) AS significant
FROM kstar
"""


QUERIES: dict = {
    "q_auc_events": (_q_auc, _ORACLE_AUC),
    "q_calibration_events": (_q_calibration, _ORACLE_CALIBRATION),
    "q_gains_lift_events": (_q_gains, _ORACLE_GAINS),
    "q_threshold_metrics_events": (_q_thresholds, _thr_oracle()),
    "q_bh_fdr_events": (_q_bh_fdr, _ORACLE_BH_FDR),
    "q_woe_iv_events": (_q_woe_iv, _ORACLE_WOE_IV),
    "q_stump_split_events": (_q_stump, _stump_oracle()),
}

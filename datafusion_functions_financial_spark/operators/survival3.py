"""Survival tier #3: Harrell's concordance index — "does the risk
score actually order the survival times?" — the discrimination
metric the gated curve estimators (Kaplan-Meier, Nelson-Aalen,
log-rank) don't answer: a model can fit the marginal hazard
perfectly and still rank subjects randomly. C-index is the standard
acceptance number for any time-to-event ranking (churn, failure,
next-purchase models).

Computed WITHOUT row pairs: subjects reduce to the bounded
(time-minute x score-band) grid; a pair (i, j) is comparable when
t_i < t_j and subject i's event was observed, concordant when the
shorter-lived subject carries the HIGHER risk band (band ties count
half; same-minute pairs are incomparable by the banding contract).
Per death cell, the comparable survivors come from per-band SUFFIX
counts (total - running count), so the whole statistic is one
cumulative window over the grid plus one bounded equi-join on the
time key — never O(n^2).

Staging mirrors the gated Kaplan-Meier: per-subject inter-event
gaps in minutes, right-censored at the window end; the risk score is
the event's own value, banded to ``N_BANDS`` deciles of [0, 100).

Engine-exactness: pure integer counting end to end (2*concordance
numerator keeps half-weight ties integer); one final division.
Pair counts are inherently O(n^2) integers — the int64 budget holds
to ~3e9 subjects, the same envelope as the gated Mann-Whitney rank
sums.

Plan shape at 100 TB: one per-subject window (the KM shuffle), one
hash aggregate to the grid, windows over the grid relation only.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (survival tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["concordance_index"]

US_PER_MIN = 60_000_000
N_BANDS = 10
_BAND = "least({b} - 1, greatest(CAST(floor(({s}) / 10.0) AS BIGINT), 0))"


def concordance_index(df: DataFrame, us_col: str, subject_col: str,
                      score_col: str) -> DataFrame:
    """One row (n_subjects, n_comparable, conc, disc, tied_score,
    c_index): Harrell's C over minute-bucketed inter-event gaps with
    decile-banded scores (higher band = predicted shorter gap)."""
    part = f"PARTITION BY {subject_col} ORDER BY {us_col}"
    # NULL scores/timestamps contribute to no pair class yet would
    # inflate n_subjects and sit in the suffix counts (ADVICE r10):
    # drop them in staging, as every sibling stats module does.
    df = df.filter(f"({score_col}) IS NOT NULL AND ({us_col}) IS NOT NULL")
    end = df.agg(F.max(us_col).alias("__end"))
    staged = (
        df.crossJoin(F.broadcast(end))
        .withColumn("__nxt", F.expr(f"lead({us_col}) OVER ({part})"))
        .selectExpr(
            f"CASE WHEN __nxt IS NOT NULL "
            f"THEN (__nxt - ({us_col})) DIV {US_PER_MIN} "
            f"ELSE (__end - ({us_col})) DIV {US_PER_MIN} END AS __t",
            "CASE WHEN __nxt IS NOT NULL THEN 1 ELSE 0 END AS __obs",
            _BAND.format(b=N_BANDS, s=score_col) + " AS __band",
        )
    )
    # materialize once: the bounded (t, band) relation feeds the grid
    # build (twice), the per-band totals, the death list, AND the
    # subject count below — without the checkpoint each consumer
    # re-runs the per-subject window (the graph5 lesson; measured 11
    # exchanges at sf0.001)
    cells = staged.groupBy("__t", "__band").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__obs").cast("bigint").alias("__d")).localCheckpoint()
    # COMPLETE (t x band) grid: a death must see every band's suffix
    # at its minute, including bands with no subject at that minute
    grid = (
        cells.select("__t").distinct()
        .crossJoin(cells.select("__band").distinct())
        .join(cells.select("__t", "__band", "__n"),
              ["__t", "__band"], "left")
        .withColumn("__n", F.coalesce(F.col("__n"), F.lit(0))
                    .cast("bigint"))
    )
    wb = (Window.partitionBy("__band").orderBy("__t")
          .rowsBetween(Window.unboundedPreceding, 0))
    tot = cells.groupBy("__band").agg(
        F.sum("__n").cast("bigint").alias("__tot"))
    suffix = (
        grid
        .withColumn("__cum", F.sum("__n").over(wb))
        .join(F.broadcast(tot), "__band")
        .selectExpr("__t", "__band AS __b2",
                    "__tot - __cum AS __suf")
    )
    deaths = cells.filter("__d > 0").select("__t", "__band", "__d")
    # every (death cell, band) pair at the same minute key: suffix
    # holds the strictly-later subjects of that band
    j = deaths.join(suffix, "__t")
    red = j.agg(
        F.sum(F.expr(
            "CASE WHEN __band > __b2 THEN __d * __suf ELSE 0 END"))
        .cast("bigint").alias("conc"),
        F.sum(F.expr(
            "CASE WHEN __band < __b2 THEN __d * __suf ELSE 0 END"))
        .cast("bigint").alias("disc"),
        F.sum(F.expr(
            "CASE WHEN __band = __b2 THEN __d * __suf ELSE 0 END"))
        .cast("bigint").alias("tied_score"),
    )
    nsub = cells.agg(
        F.sum("__n").cast("bigint").alias("n_subjects"))
    return (
        red.crossJoin(F.broadcast(nsub))
        .select(
            "n_subjects",
            F.expr("conc + disc + tied_score").cast("bigint")
            .alias("n_comparable"),
            "conc", "disc", "tied_score",
            round_portable(F.expr(
                "CASE WHEN conc + disc + tied_score > 0 THEN "
                "CAST(2 * conc + tied_score AS DOUBLE) "
                "/ CAST(2 * (conc + disc + tied_score) AS DOUBLE) "
                "END"), 6).alias("c_index"),
        )
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (the KM staging: per-user gaps,
# value-decile risk bands)
# --------------------------------------------------------------------------


def _q_cindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    return concordance_index(ev, "__us", "user_id", "value")


_ORACLE_CINDEX = f"""
WITH base AS (
  SELECT epoch_us(ts) AS us, user_id, value FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
), endt AS (
  SELECT max(us) AS e FROM base
), staged AS (
  SELECT
    CASE WHEN nxt IS NOT NULL THEN (nxt - us) // {US_PER_MIN}
      ELSE (e - us) // {US_PER_MIN} END AS t,
    CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS obs,
    {_BAND.format(b=N_BANDS, s='value')} AS band
  FROM (
    SELECT us, value,
      lead(us) OVER (PARTITION BY user_id ORDER BY us) AS nxt
    FROM base
  ), endt
), cells AS (
  SELECT t, band, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(obs) AS BIGINT) AS d
  FROM staged GROUP BY 1, 2
), grid AS (
  SELECT tg.t, bg.band, CAST(coalesce(cells.n, 0) AS BIGINT) AS n
  FROM (SELECT DISTINCT t FROM cells) tg
  CROSS JOIN (SELECT DISTINCT band FROM cells) bg
  LEFT JOIN cells ON cells.t = tg.t AND cells.band = bg.band
), suffix AS (
  SELECT t, band AS b2,
    CAST(sum(n) OVER (PARTITION BY band) AS BIGINT)
    - CAST(sum(n) OVER (PARTITION BY band ORDER BY t
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS suf
  FROM grid
), deaths AS (
  SELECT t, band, d FROM cells WHERE d > 0
), red AS (
  SELECT
    CAST(sum(CASE WHEN deaths.band > s.b2 THEN d * suf ELSE 0 END)
      AS BIGINT) AS conc,
    CAST(sum(CASE WHEN deaths.band < s.b2 THEN d * suf ELSE 0 END)
      AS BIGINT) AS disc,
    CAST(sum(CASE WHEN deaths.band = s.b2 THEN d * suf ELSE 0 END)
      AS BIGINT) AS tied_score
  FROM deaths JOIN suffix s USING (t)
), nsub AS (
  SELECT CAST(count(*) AS BIGINT) AS n_subjects FROM staged
)
SELECT n_subjects,
  CAST(conc + disc + tied_score AS BIGINT) AS n_comparable,
  conc, disc, tied_score,
  {round_portable_duck(
      "CASE WHEN conc + disc + tied_score > 0 THEN "
      "CAST(2 * conc + tied_score AS DOUBLE) "
      "/ CAST(2 * (conc + disc + tied_score) AS DOUBLE) END", 6)}
    AS c_index
FROM red, nsub
"""


QUERIES: dict = {
    "q_cindex_events": (_q_cindex, _ORACLE_CINDEX),
}

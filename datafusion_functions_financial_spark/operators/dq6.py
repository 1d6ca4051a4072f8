"""Data-quality tier #6: the calendar-grid completeness audit —
"which (day-of-week x hour) cells of the collection calendar are
thin or missing?" — the two-dimensional upgrade of the gated daily
completeness scan (``dq_completeness_daily_events`` finds missing
DAYS; pipeline outages and timezone bugs show up as missing or
starved hour-of-week CELLS while every day still reports data).

The expected grid is the full 7 x 24 hour-of-week matrix; per cell:
observed events, distinct hours of the span that map to the cell,
and the occupancy ratio against a UNIFORM 1/168 share (ADVICE r10:
partial first/last weeks therefore skew edge cells slightly — the
audit reads occupancy as a relative density screen, not a
calendar-exact expectation). ``dow`` is the epoch-day index mod 7,
a stable 7-cycle phase (phase 0 = Thursday, since epoch day 0 was
a Thursday), NOT the ISO day-of-week; the gated
``validate_orders_weekend`` owns calendar-true DOW translation.
Cells with zero events still emit a row (an SF change must not
change the result-set shape).

Engine-exactness: pure integer counting; one double ratio per cell.

Plan shape at 100 TB: one (dow, hour) hash aggregate (168 groups,
map-side combinable), a 168-row grid cross join, broadcast scalars.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (data-quality tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["calendar_grid"]

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


def calendar_grid(df: DataFrame, us_expr: str) -> DataFrame:
    """(dow, hour, n_events, n_hours_present, occupancy): the
    hour-of-week completeness grid — ``dow`` is the epoch-day index
    mod 7 (a 7-cycle phase, 0 = Thursday), and occupancy is the
    cell's share of events over the uniform 1/168 share (1.0 =
    perfectly even; 0 = silent cell)."""
    base = df.selectExpr(
        f"(({us_expr}) DIV {US_PER_DAY}) % 7 AS __dow",
        f"(({us_expr}) DIV {US_PER_HOUR}) % 24 AS __hour",
        f"({us_expr}) DIV {US_PER_HOUR} AS __h")
    per = base.groupBy("__dow", "__hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.countDistinct("__h").cast("bigint").alias("__hp"))
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("__nt"))
    spark = df.sparkSession
    grid = (
        spark.range(7).selectExpr("id AS __dow")
        .crossJoin(spark.range(24).selectExpr("id AS __hour"))
    )
    return (
        grid.join(per, ["__dow", "__hour"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("__dow").cast("bigint").alias("dow"),
            F.col("__hour").cast("bigint").alias("hour"),
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint")
            .alias("n_events"),
            F.coalesce(F.col("__hp"), F.lit(0)).cast("bigint")
            .alias("n_hours_present"),
            round_portable(F.expr(
                "CASE WHEN __nt > 0 THEN "
                "CAST(coalesce(__n, 0) AS DOUBLE) "
                "/ CAST(__nt AS DOUBLE) * 168.0 "
                "ELSE 0.0 END"), 6).alias("occupancy"),
        )
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (events calendar)
# --------------------------------------------------------------------------


def _q_calgrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return calendar_grid(load(spark, sf_dir, "events"),
                         "(ts DIV 1000)")


_ORACLE_CALGRID = f"""
WITH base AS (
  SELECT (epoch_us(ts) // {US_PER_DAY}) % 7 AS dow,
    (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hour,
    epoch_us(ts) // {US_PER_HOUR} AS h
  FROM events
), per AS (
  SELECT dow, hour, CAST(count(*) AS BIGINT) AS n,
    CAST(count(DISTINCT h) AS BIGINT) AS hp
  FROM base GROUP BY 1, 2
), tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM base),
grid AS (
  SELECT d.range AS dow, h.range AS hour
  FROM range(0, 7) d, range(0, 24) h
)
SELECT CAST(grid.dow AS BIGINT) AS dow,
  CAST(grid.hour AS BIGINT) AS hour,
  CAST(coalesce(per.n, 0) AS BIGINT) AS n_events,
  CAST(coalesce(per.hp, 0) AS BIGINT) AS n_hours_present,
  {round_portable_duck(
      "CASE WHEN tot.nt > 0 THEN "
      "CAST(coalesce(per.n, 0) AS DOUBLE) "
      "/ CAST(tot.nt AS DOUBLE) * 168.0 ELSE 0.0 END", 6)}
    AS occupancy
FROM grid
LEFT JOIN per ON grid.dow = per.dow AND grid.hour = per.hour, tot
"""


QUERIES: dict = {
    "dq_calendar_grid_events": (_q_calgrid, _ORACLE_CALGRID),
}

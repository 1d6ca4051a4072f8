"""As-of (time-series) join — the classic operator Spark lacks.

For each left row, attach the most recent right row per key with
``right_on <= left_on`` (direction="backward"; "forward" matches the
earliest right row at-or-after). The reference engine family exposes
this for trades-vs-quotes alignment; here it is built as a pure
DataFrame composition — no join operator at all:

1. Union left and right on (keys, time) with a side marker, filling
   each side's missing columns with NULL (``unionByName(...,
   allowMissingColumns=True)``).
2. One window partitioned by the keys, ordered by (time, side) with
   right-before-left at equal timestamps, carries the latest right
   values forward via ``last(..., ignorenulls=True)``.
3. Keep the left rows; apply tolerance / inner-vs-left semantics.

Scale: ONE hash shuffle on the keys (the window), linear scan within
partitions — the same cost as sorting both inputs once. No cartesian,
no range-explosion, no per-row Python. Skewed keys behave like any
keyed window (salt or split the hot key upstream if needed).

Oracle parity: DuckDB implements ``ASOF JOIN`` natively, so gate
queries compare this composition against the real thing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_on: str,
    right_on: str,
    right_values: Sequence[str],
    direction: str = "backward",
    tolerance: int | float | None = None,
    how: str = "left",
    matched_on_col: str | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` per ``keys``.

    ``left_on`` / ``right_on`` must be numeric (e.g. epoch-us longs) and
    ``right_on`` must be unique per key (add a tiebreaker upstream
    otherwise — carry-forward over a non-unique order is
    nondeterministic). ``right_values`` are the columns pulled from the
    matched right row; names must not collide with left columns.
    ``tolerance`` (same unit as the time columns) unmatches rows whose
    time difference exceeds it. ``matched_on_col`` optionally exposes
    the matched right timestamp.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    keys = list(keys)
    right_values = list(right_values)
    collisions = set(right_values) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right_values collide with left columns: {sorted(collisions)}"
        )
    if direction == "nearest":
        return _asof_nearest(left, right, keys, left_on, right_on,
                             right_values, tolerance, how,
                             matched_on_col)

    # Forward = backward on the negated time axis.
    sign = F.lit(1) if direction == "backward" else F.lit(-1)
    l_t = (F.col(left_on) * sign).alias("__t")
    r_t = (F.col(right_on) * sign).alias("__t")

    l = left.select(
        "*", l_t, F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__rt"),
    )
    r = right.select(
        *keys, r_t, F.lit(0).alias("__side"),
        F.col(right_on).cast("long").alias("__rt"), *right_values,
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at equal time, so an exact-tie
    # right row is visible to the left row (<=/>= semantics).
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry ONE struct per right row rather than per-column lasts: a
    # per-column ``last(v, ignorenulls=True)`` would skip a NULL value
    # on the matched right row and silently pull that column from an
    # OLDER right row, mixing columns across rows (ADVICE r05, medium).
    # The struct is built only on right rows (NULL on left rows), so a
    # single ignorenulls-last lands on the matched right row wholesale
    # and its NULL value columns stay NULL.
    right_struct = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__rt").alias("__rt"),
            *[F.col(v).alias(v) for v in right_values],
        ),
    )
    carried = unioned.select(
        "*", F.last(right_struct, ignorenulls=True).over(w).alias("__m"),
    )
    out = carried.filter(F.col("__side") == 1)

    m_rt = F.col("__m").getField("__rt")
    matched = F.col("__m").isNotNull()
    if tolerance is not None:
        delta = (F.col(left_on) - m_rt) * sign
        matched = matched & (delta <= F.lit(tolerance))
    sel = [F.col(c) for c in left.columns]
    sel += [
        F.when(matched, F.col("__m").getField(v)).alias(v)
        for v in right_values
    ]
    if matched_on_col is not None:
        sel.append(F.when(matched, m_rt).alias(matched_on_col))
    sel.append(matched.alias("__matched"))
    out = out.select(*sel)
    if how == "inner":
        # Filter on the match marker, not a value column — a matched
        # right row may legitimately carry NULL values.
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")


def _asof_nearest(left, right, keys, left_on, right_on, right_values,
                  tolerance, how, matched_on_col):
    """Nearest-direction as-of: the closer of the most recent
    at-or-before and the earliest at-or-after right row (ties break
    backward, pandas ``merge_asof`` convention). STILL one exchange
    and one sort: the same (keys)-partitioned (time, side) window
    carries the backward struct with a preceding frame and the
    forward struct with a following frame."""
    l = left.select(
        "*", F.col(left_on).cast("long").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__rt"),
    )
    r = right.select(
        *keys, F.col(right_on).cast("long").alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_on).cast("long").alias("__rt"), *right_values,
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    right_struct = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__rt").alias("__rt"),
            *[F.col(v).alias(v) for v in right_values],
        ),
    )
    base = Window.partitionBy(*keys).orderBy("__t", "__side")
    wb = base.rowsBetween(Window.unboundedPreceding, 0)
    wf = base.rowsBetween(0, Window.unboundedFollowing)
    # An equal-time right row sorts before the left row, so it lands
    # in the BACKWARD frame with delta 0 — which nearest's min-delta
    # tie-break selects anyway.
    carried = unioned.select(
        "*",
        F.last(right_struct, ignorenulls=True).over(wb).alias("__mb"),
        F.first(right_struct, ignorenulls=True).over(wf).alias("__mf"),
    ).filter(F.col("__side") == 1)

    db = F.col(left_on).cast("long") - F.col("__mb").getField("__rt")
    df_ = F.col("__mf").getField("__rt") - F.col(left_on).cast("long")
    use_b = F.col("__mb").isNotNull() & (
        F.col("__mf").isNull() | (db <= df_))
    chosen = F.when(use_b, F.col("__mb")).otherwise(F.col("__mf"))
    delta = F.when(use_b, db).otherwise(df_)

    carried = carried.withColumn("__m", chosen).withColumn("__d", delta)
    matched = F.col("__m").isNotNull()
    if tolerance is not None:
        matched = matched & (F.col("__d") <= F.lit(tolerance))
    sel = [F.col(c) for c in left.columns]
    sel += [
        F.when(matched, F.col("__m").getField(v)).alias(v)
        for v in right_values
    ]
    if matched_on_col is not None:
        sel.append(F.when(matched, F.col("__m").getField("__rt"))
                   .alias(matched_on_col))
    sel.append(matched.alias("__matched"))
    out = carried.select(*sel)
    if how == "inner":
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")


# --------------------------------------------------------------------------
# Registry query/oracle pair
# --------------------------------------------------------------------------

US_DAY = 86_400_000_000


def _q_asof_events_snapshots(spark, sf_dir):
    """Each event joined as-of to its user's most recent daily-low
    snapshot, where snapshots exist only every 3rd day — events on
    other days must carry the last snapshot forward, and events before
    the first snapshot stay unmatched (left semantics)."""
    from ..plans.series import ROUND_DP
    from ..sources.tables import load

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("us"), "value"
    )
    snaps = (
        ev.withColumn("day", F.expr(f"us DIV {US_DAY}"))
        .groupBy("user_id", "day")
        .agg(F.min("value").alias("day_low"))
        .filter(F.col("day") % 3 == 0)
        .select(
            "user_id",
            (F.col("day") * US_DAY).alias("snap_us"),
            "day_low",
        )
    )
    out = asof_join(
        ev, snaps, ["user_id"], "us", "snap_us", ["day_low"],
        how="left", matched_on_col="snap_us",
    )
    return out.select(
        "user_id", "event_id", "us",
        F.round("day_low", ROUND_DP).alias("day_low"), "snap_us",
    )


_ORACLE_ASOF_EVENTS = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events
), snaps AS (
  SELECT user_id, day * 86400000000 AS snap_us, day_low
  FROM (
    SELECT user_id, us // 86400000000 AS day, min(value) AS day_low
    FROM ev GROUP BY 1, 2
  ) WHERE day % 3 = 0
)
SELECT e.user_id, e.event_id, e.us,
       round(s.day_low, 4) AS day_low, s.snap_us
FROM ev e ASOF LEFT JOIN snaps s
  ON e.user_id = s.user_id AND e.us >= s.snap_us
"""


def _q_asof_forward(spark, sf_dir):
    """Forward as-of: each event carries the NEXT upcoming snapshot
    (the "when is the next rebalance" direction) — exercises
    ``direction='forward'``, which the backward gate query doesn't."""
    from ..plans.series import ROUND_DP
    from ..sources.tables import load

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("us"), "value"
    )
    snaps = (
        ev.withColumn("day", F.expr(f"us DIV {US_DAY}"))
        .groupBy("user_id", "day")
        .agg(F.min("value").alias("day_low"))
        .filter(F.col("day") % 3 == 0)
        .select(
            "user_id",
            (F.col("day") * US_DAY).alias("snap_us"),
            "day_low",
        )
    )
    out = asof_join(
        ev, snaps, ["user_id"], "us", "snap_us", ["day_low"],
        direction="forward", how="left", matched_on_col="snap_us",
    )
    return out.select(
        "user_id", "event_id", "us",
        F.round("day_low", ROUND_DP).alias("day_low"), "snap_us",
    )


_ORACLE_ASOF_FORWARD = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events
), snaps AS (
  SELECT user_id, day * 86400000000 AS snap_us, day_low
  FROM (
    SELECT user_id, us // 86400000000 AS day, min(value) AS day_low
    FROM ev GROUP BY 1, 2
  ) WHERE day % 3 = 0
)
SELECT e.user_id, e.event_id, e.us,
       round(s.day_low, 4) AS day_low, s.snap_us
FROM ev e ASOF LEFT JOIN snaps s
  ON e.user_id = s.user_id AND e.us <= s.snap_us
"""


QUERIES: dict = {
    "asof_events_snapshots": (_q_asof_events_snapshots, _ORACLE_ASOF_EVENTS),
    "asof_events_snapshots_fwd": (_q_asof_forward, _ORACLE_ASOF_FORWARD),
}


def _q_asof_tolerance(spark, sf_dir):
    """Tolerance as-of: the carried snapshot goes STALE after one day
    — events more than US_DAY past their user's last snapshot unmatch
    (NULL), the max-staleness semantics every trades-vs-quotes
    pipeline needs. Exercises ``tolerance=``, which neither prior
    as-of gate query covers."""
    from ..plans.series import ROUND_DP
    from ..sources.tables import load

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("us"), "value"
    )
    snaps = (
        ev.withColumn("day", F.expr(f"us DIV {US_DAY}"))
        .groupBy("user_id", "day")
        .agg(F.min("value").alias("day_low"))
        .filter(F.col("day") % 3 == 0)
        .select(
            "user_id",
            (F.col("day") * US_DAY).alias("snap_us"),
            "day_low",
        )
    )
    out = asof_join(
        ev, snaps, ["user_id"], "us", "snap_us", ["day_low"],
        how="left", matched_on_col="snap_us", tolerance=US_DAY,
    )
    return out.select(
        "user_id", "event_id", "us",
        F.round("day_low", ROUND_DP).alias("day_low"), "snap_us",
    )


_ORACLE_ASOF_TOLERANCE = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events
), snaps AS (
  SELECT user_id, day * {US_DAY} AS snap_us, day_low
  FROM (
    SELECT user_id, us // {US_DAY} AS day, min(value) AS day_low
    FROM ev GROUP BY 1, 2
  ) WHERE day % 3 = 0
)
SELECT e.user_id, e.event_id, e.us,
       CASE WHEN e.us - s.snap_us <= {US_DAY}
            THEN round(s.day_low, 4) END AS day_low,
       CASE WHEN e.us - s.snap_us <= {US_DAY}
            THEN s.snap_us END AS snap_us
FROM ev e ASOF LEFT JOIN snaps s
  ON e.user_id = s.user_id AND e.us >= s.snap_us
"""


QUERIES["asof_events_snapshots_tol"] = (_q_asof_tolerance,
                                        _ORACLE_ASOF_TOLERANCE)


def _q_asof_nearest(spark, sf_dir):
    """Nearest as-of: each event carries whichever snapshot (last
    before OR next after) is closer in time, ties backward —
    exercises ``direction='nearest'``."""
    from ..plans.series import ROUND_DP
    from ..sources.tables import load

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("us"), "value"
    )
    snaps = (
        ev.withColumn("day", F.expr(f"us DIV {US_DAY}"))
        .groupBy("user_id", "day")
        .agg(F.min("value").alias("day_low"))
        .filter(F.col("day") % 3 == 0)
        .select(
            "user_id",
            (F.col("day") * US_DAY).alias("snap_us"),
            "day_low",
        )
    )
    out = asof_join(
        ev, snaps, ["user_id"], "us", "snap_us", ["day_low"],
        direction="nearest", how="left", matched_on_col="snap_us",
    )
    return out.select(
        "user_id", "event_id", "us",
        F.round("day_low", ROUND_DP).alias("day_low"), "snap_us",
    )


_ORACLE_ASOF_NEAREST = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events
), snaps AS (
  SELECT user_id, day * {US_DAY} AS snap_us, day_low
  FROM (
    SELECT user_id, us // {US_DAY} AS day, min(value) AS day_low
    FROM ev GROUP BY 1, 2
  ) WHERE day % 3 = 0
), b AS (
  SELECT e.user_id, e.event_id, e.us, s.day_low AS bl, s.snap_us AS bt
  FROM ev e ASOF LEFT JOIN snaps s
    ON e.user_id = s.user_id AND e.us >= s.snap_us
), f AS (
  SELECT e.user_id, e.event_id, s.day_low AS fl, s.snap_us AS ft
  FROM ev e ASOF LEFT JOIN snaps s
    ON e.user_id = s.user_id AND e.us <= s.snap_us
)
SELECT b.user_id, b.event_id, b.us,
  CASE WHEN bt IS NOT NULL AND (ft IS NULL OR (b.us - bt) <= (ft - b.us))
       THEN round(bl, 4) ELSE round(fl, 4) END AS day_low,
  CASE WHEN bt IS NOT NULL AND (ft IS NULL OR (b.us - bt) <= (ft - b.us))
       THEN bt ELSE ft END AS snap_us
FROM b JOIN f
  ON b.user_id = f.user_id AND b.event_id = f.event_id
"""


QUERIES["asof_events_snapshots_nearest"] = (_q_asof_nearest,
                                            _ORACLE_ASOF_NEAREST)

"""Sampling #4: balanced class downsampling — keep exactly
``min(class count)`` rows of EVERY class, chosen by the deterministic
hash rank (``sampling.sample_k_per_group``'s LCG order, so the output
is independent of partitioning, engine, and arrival order). The
standard rebalancing move before training a classifier on skewed
labels; the complement of ``mix_to_proportions`` (which targets
arbitrary proportions but needs a weights dict).

Engine-exactness: ranks are integer LCG hashes with an id tiebreak;
the gate query returns a per-class summary (count + id checksum)
rather than 60K sampled rows — same information content for the
value-hash, bounded output.

Plan shape at 100 TB: one count aggregate (map-side combinable), a
1-row broadcast of the min, then the keyed rank window; the usual
over-admitting hash pre-filter trick applies before the window when
classes are huge (see ``sample_k_per_group``'s note).

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (sampling tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .sampling import _A, _C, PRIME

__all__ = ["sample_balanced"]


def sample_balanced(df: DataFrame, class_col: str, id_col: str,
                    salt: int = 42) -> DataFrame:
    """Rows of ``df`` downsampled so every class keeps exactly
    ``min(class count)`` rows (deterministic hash-rank choice)."""
    counts = df.groupBy(class_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"))
    m = counts.agg(F.min("__n").alias("__m"))
    h = f"(({id_col} + 1) * {_A} + {_C} + {salt}) % {PRIME}"
    return (
        df.crossJoin(F.broadcast(m))
        .withColumn("__rk", F.expr(
            f"row_number() OVER (PARTITION BY {class_col} "
            f"ORDER BY {h} ASC, {id_col} ASC)"))
        .filter(F.col("__rk") <= F.col("__m"))
        .drop("__rk", "__m")
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (per-class summary: bounded output)
# --------------------------------------------------------------------------


def _q_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    kept = sample_balanced(ev, "event_type", "event_id")
    return (
        kept.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"),
             F.sum("event_id").cast("bigint").alias("id_sum"))
    )


_ORACLE_BALANCED = f"""
WITH m AS (
  SELECT CAST(min(n) AS BIGINT) AS mn FROM (
    SELECT count(*) AS n FROM events GROUP BY event_type)
), ranked AS (
  SELECT event_type, event_id,
    row_number() OVER (
      PARTITION BY event_type
      ORDER BY ((event_id + 1) * {_A} + {_C} + 42) % {PRIME} ASC,
               event_id ASC) AS rk
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
  CAST(sum(event_id) AS BIGINT) AS id_sum
FROM ranked, m WHERE rk <= m.mn
GROUP BY event_type
"""


QUERIES: dict = {
    "sample_balanced_events": (_q_balanced, _ORACLE_BALANCED),
}

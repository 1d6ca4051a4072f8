"""Percentile-threshold quality filtering: drop every document below
its group's q-th percentile of a quality metric.

The data-driven variant of fixed-threshold filtering (``pipeline``):
thresholds adapt per source/domain, so a verbose domain doesn't drown a
terse one. Scale shape: ONE small aggregation computes each group's
exact interpolated percentile (groups = sources/domains — thousands,
not billions), the threshold table is **broadcast** back, and the
corpus-side filter is a scan projection — the corpus never shuffles.

Determinism: both engines implement the same linear-interpolation
percentile (Spark ``percentile`` / DuckDB ``quantile_cont``); the
threshold is rounded with the portable 0-dp-scale trick BEFORE the
comparison so a last-ulp difference in interpolation can never flip a
boundary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable
from ..sources.tables import load

__all__ = ["percentile_filter"]


def percentile_filter(df: DataFrame, value_col: str, group_col: str,
                      q: float = 0.25) -> DataFrame:
    """Keep rows with ``value_col >= round4(percentile_q)`` of their
    group. Adds ``__thr`` is not exposed; output schema == input."""
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    thr = df.groupBy(group_col).agg(
        round_portable(F.expr(f"percentile({value_col}, {q!r})"))
        .alias("__thr")
    )
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(F.col(value_col) >= F.col("__thr"))
        .drop("__thr")
    )


# --------------------------------------------------------------------------
# Gate query: per-source p25 length filter on the documents table.
# --------------------------------------------------------------------------

_Q = 0.25


def _q_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = percentile_filter(load(spark, sf_dir, "documents"), "n_chars",
                            "source", q=_Q)
    return out.select("doc_id", "source", "n_chars")


_ORACLE_PERCENTILE_FILTER = f"""
WITH thr AS (
  SELECT source,
         round(quantile_cont(n_chars, {_Q!r}) * 10000.0) / 10000.0 AS t
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN thr USING (source)
WHERE d.n_chars >= thr.t
"""

QUERIES: dict = {
    "quality_percentile_filter_documents":
        (_q_percentile_filter, _ORACLE_PERCENTILE_FILTER),
}

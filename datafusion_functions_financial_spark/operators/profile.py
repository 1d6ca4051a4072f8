"""Column-level dataset profiler: the one-pass health report run
before any 100 TB pipeline touches a new corpus drop.

One aggregation computes every column's stats (row count, nulls,
distinct count, min/max) in a single scan; the wide result row is then
unpivoted to one row per column. COUNT(DISTINCT) over several columns
in one aggregate triggers Spark's Expand (one duplicated stream per
distinct column) — acceptable because profiling is a deliberate
full-scan diagnostic; for routine monitoring swap the distinct counts
for the deterministic HLL sketch (``operators/sketch.py``) and the
plan collapses to one pass with register-table state.

Min/max are emitted as strings so heterogeneous column types fit one
schema; numeric-to-string casts are locale-free integer/decimal
formatting, identical in both engines for the integer columns profiled
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, columns: list[str],
                    approx: bool = False) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_str, max_str) per column.

    ``approx=True`` is the 100 TB monitoring path: distinct counts come
    from ``approx_count_distinct`` (HLL++, ~2% standard error) so the
    plan is ONE pass with constant-memory register state — no Expand
    duplication of the scan stream per distinct column. Exact stays the
    oracle-gated default."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    # rsd 0.02: tighter than the 0.05 default — the sketch is still tiny
    # (~KBs per column) and profiling tolerances are usually a few %.
    nd = ((lambda c: F.approx_count_distinct(c, 0.02)) if approx
          else F.countDistinct)
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.expr(
            f"named_struct('column', '{c}', 'n_rows', __n, "
            f"'n_nulls', CAST(__nn_{c} AS BIGINT), "
            f"'n_distinct', __nd_{c}, "
            f"'min_str', __mn_{c}, 'max_str', __mx_{c})"
        )
        for c in columns
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.column", "r.n_rows", "r.n_nulls", "r.n_distinct",
        "r.min_str", "r.max_str",
    )


# --------------------------------------------------------------------------
# Gate query (r04 queue)
# --------------------------------------------------------------------------

_COLS = ["doc_id", "lang", "source", "n_chars"]


def _q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_columns(load(spark, sf_dir, "documents"), _COLS)


def _col_sql(c: str) -> str:
    return f"""
SELECT '{c}' AS column, count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_str,
       CAST(max({c}) AS VARCHAR) AS max_str
FROM documents"""


_ORACLE_PROFILE = "\nUNION ALL\n".join(_col_sql(c) for c in _COLS)

QUERIES: dict = {
    "profile_columns_documents": (_q_profile, _ORACLE_PROFILE),
}

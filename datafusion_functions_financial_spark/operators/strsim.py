"""String-similarity record matching via edit distance — the
complement of ``linkage.py``'s trigram-Jaccard linkage for SHORT keys
(names, codes, SKUs) where Levenshtein is the natural metric and both
engines ship the identical dynamic-programming builtin (integer
output — parity is structural).

Plan shape at scale: candidate pairs form INSIDE equi-join blocks
(here: nation), never all-pairs; a block of size m costs m²
levenshtein evaluations, each O(len²) on short strings. Block-size
skew is the same hazard as LSH hot buckets — cap with
``max_block_size`` (over-cap blocks contribute no pairs, the
``dedup._cap_hot_buckets`` recall argument).

Beyond-reference scope (SURVEY.md extension: entity resolution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["editdist_pairs"]

MAX_DIST = 2
DEFAULT_MAX_BLOCK = 10_000


def editdist_pairs(df: DataFrame, id_col: str, name_col: str,
                   block_col: str, max_dist: int = MAX_DIST,
                   max_block_size: int | None = DEFAULT_MAX_BLOCK
                   ) -> DataFrame:
    """(block, id_a, id_b, dist): within-block id pairs whose names
    sit within ``max_dist`` edits. Block occupancy above
    ``max_block_size`` is excluded (skew cap, window count over the
    block key — the same exchange the self-join shuffles on)."""
    b = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("__id"),
        F.lower(F.trim(F.col(name_col))).alias("__nm"),
    )
    if max_block_size is not None:
        w = Window.partitionBy("block")
        b = (
            b.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("__bsz") <= max_block_size)
            .drop("__bsz")
        )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, (F.col("l.block") == F.col("r.block"))
               & (F.col("l.__id") < F.col("r.__id")))
        .select(
            F.col("l.block").alias("block"),
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.levenshtein(F.col("l.__nm"), F.col("r.__nm"))
            .alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


# --------------------------------------------------------------------------
# Gate query: near-identical supplier names within a nation
# --------------------------------------------------------------------------


def _q_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = editdist_pairs(load(spark, sf_dir, "supplier"), "s_suppkey",
                         "s_name", "s_nationkey")
    return out.selectExpr("block", "id_a", "id_b",
                          "CAST(dist AS BIGINT) AS dist")


_ORACLE_EDITDIST = f"""
WITH b AS (
  SELECT s_nationkey AS block, s_suppkey AS id,
         lower(trim(s_name)) AS nm
  FROM supplier
)
SELECT l.block, l.id AS id_a, r.id AS id_b,
       CAST(levenshtein(l.nm, r.nm) AS BIGINT) AS dist
FROM b l JOIN b r ON l.block = r.block AND l.id < r.id
WHERE levenshtein(l.nm, r.nm) <= {MAX_DIST}
"""


QUERIES: dict = {
    "str_editdist_suppliers": (_q_editdist, _ORACLE_EDITDIST),
}

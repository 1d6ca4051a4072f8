"""Distribution alignment: quantile normalization across sources —
map each source's value distribution onto the POOLED distribution so
per-source scale/shape artifacts (one crawler measures bytes,
another characters; one corpus is boilerplate-heavy) stop leaking
into downstream thresholds. The batch-effect correction standard in
expression analysis, applied to corpus curation: after qnorm, a
"top-20%-length" filter selects the same per-source share everywhere
while preserving within-source order.

Rank machinery is the distributed-safe two-level shape — NOT a
global ntile (which drags every row through one sort partition):

- within-source rank: row_number partitioned by source (ordered by
  value with the id tiebreak), bucket b = (r-1)*B / N_s + 1;
- pooled boundaries: the distinct-value cumulative relation joined
  to the B bucket targets (rank ceil(b*N/B)) — an inequality join of
  a B-row broadcast against the bounded distinct-value relation,
  never a row-level sort.

Output: one row per input row with its bucket and the pooled
boundary value it normalizes to (monotone in the within-source
order by construction).

Engine-exactness: pure integer ranks, counts, and value boundaries
(the value column is integer n_chars); no doubles at all.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (curation/sampling tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["quantile_normalize"]

N_BUCKETS = 20


def quantile_normalize(df: DataFrame, id_col: str, group_col: str,
                       value_col: str,
                       n_buckets: int = N_BUCKETS) -> DataFrame:
    """(id, group, value, bucket, qnorm): each row's within-group
    quantile bucket (1..n_buckets) and the pooled distribution's
    boundary value for that bucket."""
    base = df.selectExpr(f"{id_col} AS __id",
                         f"{group_col} AS __g",
                         f"CAST({value_col} AS BIGINT) AS __v")
    wg = Window.partitionBy("__g").orderBy("__v", "__id")
    ns = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ns"))
    ranked = (
        base.withColumn("__r", F.row_number().over(wg).cast("bigint"))
        .join(F.broadcast(ns), "__g")
        .withColumn("__b", F.expr(
            f"(__r - 1) * {n_buckets} DIV __ns + 1"))
    )
    vals = base.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    wv = (Window.partitionBy().orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = vals.withColumn("__cum", F.sum("__cnt").over(wv))
    nt = base.agg(F.count(F.lit(1)).cast("bigint").alias("__nt"))
    targets = (
        base.sparkSession.range(1, n_buckets + 1)
        .selectExpr("id AS __b")
        .crossJoin(F.broadcast(nt))
        .withColumn("__target", F.expr(
            f"(__b * __nt + {n_buckets} - 1) DIV {n_buckets}"))
    )
    bounds = (
        F.broadcast(targets)
        .join(cum, F.col("__cum") >= F.col("__target"))
        .groupBy("__b")
        .agg(F.min("__v").alias("__qnorm"))
    )
    return (
        ranked.join(F.broadcast(bounds), "__b")
        .select(
            F.col("__id").alias("id"), F.col("__g").alias("grp"),
            F.col("__v").alias("value"),
            F.col("__b").cast("bigint").alias("bucket"),
            F.col("__qnorm").cast("bigint").alias("qnorm"),
        )
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (documents: n_chars per source onto
# the pooled length distribution)
# --------------------------------------------------------------------------


def _q_qnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantile_normalize(load(spark, sf_dir, "documents"),
                              "doc_id", "source", "n_chars")


_ORACLE_QNORM = f"""
WITH base AS (
  SELECT doc_id AS id, source AS g, CAST(n_chars AS BIGINT) AS v
  FROM documents
), ns AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ns FROM base GROUP BY 1
), ranked AS (
  SELECT base.id, base.g, base.v,
    (CAST(row_number() OVER (PARTITION BY base.g
       ORDER BY base.v, base.id) AS BIGINT) - 1)
      * {N_BUCKETS} // ns.ns + 1 AS b
  FROM base JOIN ns ON base.g = ns.g
), vals AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1
), cum AS (
  SELECT v, CAST(sum(cnt) OVER (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum
  FROM vals
), nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM base),
targets AS (
  SELECT CAST(r.range AS BIGINT) AS b,
    (CAST(r.range AS BIGINT) * nt.nt + {N_BUCKETS} - 1)
      // {N_BUCKETS} AS target
  FROM range(1, {N_BUCKETS} + 1) r, nt
), bounds AS (
  SELECT t.b, CAST(min(cum.v) AS BIGINT) AS qnorm
  FROM targets t JOIN cum ON cum.cum >= t.target
  GROUP BY 1
)
SELECT ranked.id, ranked.g AS grp, ranked.v AS value,
  CAST(ranked.b AS BIGINT) AS bucket, bounds.qnorm
FROM ranked JOIN bounds ON ranked.b = bounds.b
"""


QUERIES: dict = {
    "qnorm_doclen_documents": (_q_qnorm, _ORACLE_QNORM),
}

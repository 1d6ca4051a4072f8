"""Budgeted / temperature-weighted corpus sampling — the two
selection policies an LLM training-mix pipeline runs after quality
filtering:

- ``token_budget_sample``: "give me ~N tokens of corpus" — walk the
  docs in deterministic hashed order and keep rows while the running
  token total fits the budget. Stable under re-runs and corpus
  growth-at-the-tail (a doc's hash position never changes), unlike
  ``df.limit``.
- ``temperature_sample``: domain rebalancing with the standard
  ``n_s^(1/2)`` temperature weighting (upsamples small domains
  relative to proportional sampling) — per-source quotas from EXACT
  integer arithmetic, filled in hashed-id order.

Engine parity: selection is by the shared LCG bucket hash
(``sampling._bucket_expr`` — pure BIGINT arithmetic, identical in
DuckDB) plus integer quota math (``sq_s * K DIV total``) — no float
thresholds to drift.

Scale: the token-budget walk is a cumulative sum over a global hashed
order — one sort, same cost class as any exact global top-k; at 100 TB
shard the budget by hash bucket first (allocate budget/BUCKETS per
bucket, cumsum within buckets — embarrassingly parallel, error
bounded by one doc per bucket). The temperature quota needs one tiny
per-source aggregate (broadcast) and one keyed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .sampling import _bucket_expr

__all__ = ["token_budget_sample", "temperature_sample"]

Q = 10 ** 8

_NTOK_SPARK = ("CASE WHEN trim({t}) = '' THEN 0 "
               "ELSE size(split(trim({t}), '\\\\s+')) END")
_NTOK_DUCK = ("CASE WHEN trim({t}) = '' THEN 0 "
              "ELSE len(regexp_split_to_array(trim({t}), '\\s+')) END")


def token_budget_sample(df: DataFrame, text_col: str, id_col: str,
                        budget: int, salt: int = 42) -> DataFrame:
    """Keep documents, in hashed-id order, while the cumulative
    whitespace-token count stays within ``budget``. A document is
    kept iff the budget is not yet exhausted BEFORE it (so the
    selection overshoots by at most one document — the convention
    that keeps every prefix of the hashed order a valid sample)."""
    w = Window.orderBy("__b", id_col).rowsBetween(
        Window.unboundedPreceding, -1)
    return (
        df.withColumn("__b", F.expr(_bucket_expr(id_col, salt)))
        .withColumn("__nt",
                    F.expr(_NTOK_SPARK.format(t=text_col)).cast("long"))
        .withColumn("__cum_before",
                    F.coalesce(F.sum("__nt").over(w), F.lit(0)))
        .filter(F.col("__cum_before") < budget)
        .withColumn("cum_tokens", F.col("__cum_before") + F.col("__nt"))
        .drop("__b", "__cum_before")
        .withColumnRenamed("__nt", "n_tokens")
    )


def temperature_sample(df: DataFrame, group_col: str, id_col: str,
                       k: int, salt: int = 42) -> DataFrame:
    """Select ~``k`` documents with per-group quotas proportional to
    ``sqrt(n_group)`` (temperature 1/2): quota_g = sq_g * k DIV
    sum(sq) where ``sq_g = round(sqrt(n_g) * 1e8)`` — all-integer
    after the one sqrt, so quotas are engine-exact. Within a group,
    the quota fills in hashed-id order."""
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__sq", F.expr(
            f"CAST(round(sqrt(CAST(__n AS DOUBLE)) * {Q}) AS BIGINT)"))
    )
    tot = counts.agg(F.sum("__sq").alias("__tot"))
    quotas = counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        F.expr(f"__sq * {k} DIV __tot").alias("__quota"),
    )
    w = Window.partitionBy(group_col).orderBy("__b", id_col)
    return (
        df.withColumn("__b", F.expr(_bucket_expr(id_col, salt)))
        .withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(quotas), group_col)
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__b", "__rn", "__quota")
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------

BUDGET = 10_000
TEMP_K = 200


def _q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = token_budget_sample(
        load(spark, sf_dir, "documents"), "text", "doc_id", BUDGET)
    return out.select("doc_id", "source", "n_tokens", "cum_tokens")


_ORACLE_TOKEN_BUDGET = f"""
WITH t AS (
  SELECT doc_id, source,
         {_NTOK_DUCK.format(t='text')} AS n_tokens,
         (((doc_id + 1) * 1103515245 + 12345 + 42) % 2147483647)
           % 10000 AS b
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         coalesce(CAST(sum(n_tokens) OVER (ORDER BY b, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS BIGINT), 0) AS cum_before
  FROM t
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_before + n_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_before < {BUDGET}
"""


def _q_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = temperature_sample(
        load(spark, sf_dir, "documents"), "source", "doc_id", TEMP_K)
    return out.select("doc_id", "source")


_ORACLE_TEMPERATURE = f"""
WITH counts AS (
  SELECT source, count(*) AS n,
         CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * {Q}) AS BIGINT)
           AS sq
  FROM documents GROUP BY 1
), quotas AS (
  SELECT source, sq * {TEMP_K} // (SELECT sum(sq) FROM counts) AS quota
  FROM counts
), ranked AS (
  SELECT d.doc_id, d.source,
         row_number() OVER (PARTITION BY d.source ORDER BY
           (((d.doc_id + 1) * 1103515245 + 12345 + 42) % 2147483647)
             % 10000, d.doc_id) AS rn
  FROM documents d
)
SELECT r.doc_id, r.source
FROM ranked r JOIN quotas q ON r.source = q.source
WHERE r.rn <= q.quota
"""


QUERIES: dict = {
    "sample_token_budget_documents": (_q_token_budget,
                                      _ORACLE_TOKEN_BUDGET),
    "sample_temperature_documents": (_q_temperature, _ORACLE_TEMPERATURE),
}

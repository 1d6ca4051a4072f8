"""Ranking-quality tier #5: NDCG@k and mean reciprocal rank — the
RANKED-retrieval companions to the gated set-level metrics (AUC and
the gains/lift table score the full ordering; precision@threshold
scores a cutoff set): NDCG@k grades the ORDER of the top k with
logarithmic position discounting, MRR grades how early the first
relevant item appears — the two numbers a retrieval/recommendation
pipeline owner reads before trusting a ranker at serving depth k.

Staged on events as a per-user ranking task: the score is ``value``
(descending, event_id ascending as the deterministic tiebreak), an
item is relevant when ``event_type = 'purchase'``.

- ``ndcg_at_k``: DCG@k = sum_{r<=k} rel_r / log2(r + 1) against the
  ideal ordering's IDCG@k (relevant-first, same tiebreak); users
  with no relevant item report NULL (no ideal exists).
- ``mrr``: per user RR = 1 / rank of the first relevant item (0 by
  convention when none exists in the ranking), averaged.

Engine-exactness: ranks are row_numbers over a fully deterministic
order; each discounted-gain / reciprocal-rank term quantizes to
BIGINT at 1e8 before its sum (log2 written as ln(x)/ln(2) — libm
parity established by the entropy family).

Plan shape at 100 TB: one shuffle on the user key for the two
row_number windows (actual + ideal share the sort prefix), one hash
aggregate per user, one final reduction for MRR. No joins, no UDFs.

Reference anchor: beyond-reference pipeline operators per SURVEY.md
extension scope (model-eval tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["ndcg_at_k", "mrr"]

Q = 10 ** 8
QF = float(Q)
K = 10

_DISC = ("(1.0 / (ln(CAST({r} + 1 AS DOUBLE)) "
         "/ ln(CAST(2 AS DOUBLE))))")


def _ranked(df: DataFrame, key_col: str, score_col: str,
            rel_expr: str, tiebreak_col: str) -> DataFrame:
    kw = Window.partitionBy("__k")
    base = df.selectExpr(
        f"{key_col} AS __k", f"{score_col} AS __s",
        f"CAST(({rel_expr}) AS INT) AS __rel",
        f"{tiebreak_col} AS __tb")
    return (
        base
        .withColumn("__r", F.row_number().over(
            kw.orderBy(F.desc("__s"), F.asc("__tb"))).cast("bigint"))
        .withColumn("__ir", F.row_number().over(
            kw.orderBy(F.desc("__rel"), F.desc("__s"),
                       F.asc("__tb"))).cast("bigint"))
    )


def ndcg_at_k(df: DataFrame, key_col: str, score_col: str,
              rel_expr: str, tiebreak_col: str,
              k: int = K) -> DataFrame:
    """(key, n_items, n_rel, ndcg): NDCG@k per key (NULL when the
    key has no relevant item)."""
    r = _ranked(df, key_col, score_col, rel_expr, tiebreak_col)
    dcg = (f"CASE WHEN __r <= {k} AND __rel = 1 "
           f"THEN {_DISC.format(r='__r')} ELSE 0.0 END")
    idcg = (f"CASE WHEN __ir <= {k} AND __rel = 1 "
            f"THEN {_DISC.format(r='__ir')} ELSE 0.0 END")
    agg = r.groupBy("__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("__rel").cast("bigint").alias("n_rel"),
        F.sum(F.expr(
            f"CAST(round(({dcg}) * {Q}) AS BIGINT)")).alias("__dq"),
        F.sum(F.expr(
            f"CAST(round(({idcg}) * {Q}) AS BIGINT)")).alias("__iq"),
    )
    return agg.select(
        F.col("__k").alias("key"), "n_items", "n_rel",
        round_portable(F.expr(
            "CASE WHEN __iq > 0 THEN "
            "CAST(__dq AS DOUBLE) / CAST(__iq AS DOUBLE) END"), 6)
        .alias("ndcg"),
    )


def mrr(df: DataFrame, key_col: str, score_col: str, rel_expr: str,
        tiebreak_col: str) -> DataFrame:
    """One row (n_keys, n_with_rel, mrr): mean reciprocal rank over
    all keys (keys without a relevant item contribute 0)."""
    r = _ranked(df, key_col, score_col, rel_expr, tiebreak_col)
    first = r.groupBy("__k").agg(
        F.min(F.expr(
            "CASE WHEN __rel = 1 THEN __r END")).alias("__fr"))
    rr = ("CASE WHEN __fr IS NOT NULL THEN "
          "1.0 / CAST(__fr AS DOUBLE) ELSE 0.0 END")
    red = first.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.expr(
            "CASE WHEN __fr IS NOT NULL THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_with_rel"),
        F.sum(F.expr(
            f"CAST(round(({rr}) * {Q}) AS BIGINT)")).alias("__sq"),
    )
    return red.select(
        "n_keys", "n_with_rel",
        round_portable(F.expr(
            f"CAST(__sq AS DOUBLE) / {QF!r} "
            f"/ CAST(n_keys AS DOUBLE)"), 6).alias("mrr"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (events: per-user value ranking,
# purchases relevant)
# --------------------------------------------------------------------------

_REL = "event_type = 'purchase'"


def _q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ndcg_at_k(load(spark, sf_dir, "events"), "user_id",
                     "value", _REL, "event_id")


def _q_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mrr(load(spark, sf_dir, "events"), "user_id", "value",
               _REL, "event_id")


_RANKED_DUCK = f"""ranked AS (
  SELECT user_id AS k, value AS s,
    CAST(CASE WHEN {_REL} THEN 1 ELSE 0 END AS INT) AS rel,
    CAST(row_number() OVER (PARTITION BY user_id
      ORDER BY value DESC, event_id ASC) AS BIGINT) AS r,
    CAST(row_number() OVER (PARTITION BY user_id
      ORDER BY (CASE WHEN {_REL} THEN 1 ELSE 0 END) DESC,
                value DESC, event_id ASC) AS BIGINT) AS ir
  FROM events
)"""

_D_DISC = ("(1.0 / (ln(CAST({r} + 1 AS DOUBLE)) "
           "/ ln(CAST(2 AS DOUBLE))))")

_ORACLE_NDCG = f"""
WITH {_RANKED_DUCK}, agg AS (
  SELECT k,
    CAST(count(*) AS BIGINT) AS n_items,
    CAST(sum(rel) AS BIGINT) AS n_rel,
    CAST(sum(CAST(round((CASE WHEN r <= {K} AND rel = 1
      THEN {_D_DISC.format(r='r')} ELSE 0.0 END) * {Q}) AS BIGINT))
      AS BIGINT) AS dq,
    CAST(sum(CAST(round((CASE WHEN ir <= {K} AND rel = 1
      THEN {_D_DISC.format(r='ir')} ELSE 0.0 END) * {Q}) AS BIGINT))
      AS BIGINT) AS iq
  FROM ranked GROUP BY 1
)
SELECT k AS key, n_items, n_rel,
  {round_portable_duck(
      "CASE WHEN iq > 0 THEN "
      "CAST(dq AS DOUBLE) / CAST(iq AS DOUBLE) END", 6)} AS ndcg
FROM agg
"""

_ORACLE_MRR = f"""
WITH {_RANKED_DUCK}, first AS (
  SELECT k, min(CASE WHEN rel = 1 THEN r END) AS fr
  FROM ranked GROUP BY 1
), red AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
    CAST(sum(CASE WHEN fr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_with_rel,
    CAST(sum(CAST(round((CASE WHEN fr IS NOT NULL THEN
      1.0 / CAST(fr AS DOUBLE) ELSE 0.0 END) * {Q}) AS BIGINT))
      AS BIGINT) AS sq
  FROM first
)
SELECT n_keys, n_with_rel,
  {round_portable_duck(
      f"CAST(sq AS DOUBLE) / {QF!r} / CAST(n_keys AS DOUBLE)", 6)}
    AS mrr
FROM red
"""


QUERIES: dict = {
    "q_ndcg_events": (_q_ndcg, _ORACLE_NDCG),
    "q_mrr_events": (_q_mrr, _ORACLE_MRR),
}

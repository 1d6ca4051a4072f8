"""Vocabulary estimation #2: Good-Turing unseen mass and the
bias-corrected Chao1 richness estimator — "how much vocabulary does
this corpus still owe us?" The curation companions to the gated
Heaps'-law fit (``text_heaps_law_documents``): Heaps extrapolates
growth from the size-vocabulary curve; Good-Turing/Chao1 estimate it
from the frequency-of-frequencies spectrum in ONE pass.

  unseen_mass (Good-Turing P0) = n1 / N
  chao1 = V + n1 * (n1 - 1) / (2 * (n2 + 1))   (bias-corrected —
          defined even when no term occurs exactly twice)

with N total tokens, V distinct terms, n1/n2 the counts of terms
seen exactly once/twice. Everything is integer until the two final
divisions.

Plan shape at 100 TB: one (term) hash aggregate (map-side
combinable), then a frequency-of-frequencies aggregate over the
vocabulary relation — two shuffles total, no windows, no joins.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (text/curation tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .tfidf import _TOKENS, _TOKENS_DUCK

__all__ = ["vocab_richness"]


def vocab_richness(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row (n_tokens, v_distinct, n1, n2, unseen_mass, chao1)."""
    tc = (
        df.select(F.explode(F.expr(_TOKENS.format(col=text_col)))
                  .alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    red = tc.agg(
        F.sum("__c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("v_distinct"),
        F.sum(F.expr("CASE WHEN __c = 1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n1"),
        F.sum(F.expr("CASE WHEN __c = 2 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n2"),
    )
    return red.select(
        "n_tokens", "v_distinct", "n1", "n2",
        round_portable(F.expr(
            "CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)"), 6)
        .alias("unseen_mass"),
        round_portable(F.expr(
            "CAST(v_distinct AS DOUBLE) + CAST(n1 * (n1 - 1) "
            "AS DOUBLE) / (2.0 * CAST(n2 + 1 AS DOUBLE))"), 4)
        .alias("chao1"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle
# --------------------------------------------------------------------------


def _q_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_richness(load(spark, sf_dir, "documents"))


_ORACLE_RICHNESS = f"""
WITH tc AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest({_TOKENS_DUCK.format(col='text')}) AS t
    FROM documents
  ) GROUP BY 1
), red AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS v_distinct,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM tc
)
SELECT n_tokens, v_distinct, n1, n2,
  {round_portable_duck(
      "CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)", 6)}
    AS unseen_mass,
  {round_portable_duck(
      "CAST(v_distinct AS DOUBLE) + CAST(n1 * (n1 - 1) AS DOUBLE) "
      "/ (2.0 * CAST(n2 + 1 AS DOUBLE))", 4)} AS chao1
FROM red
"""


QUERIES: dict = {
    "vocab_richness_documents": (_q_richness, _ORACLE_RICHNESS),
}

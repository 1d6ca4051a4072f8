"""Lexical diversity profiling per corpus slice: type-token ratio,
Simpson concentration, and Shannon entropy over the token-frequency
distribution — the "is this source template spam or real language"
screen (near-duplicate boilerplate shows a collapsed TTR and a
Simpson index far above its peers).

Engine-exact: diversity indices reduce to integer count algebra
(``sum n_i (n_i - 1)``) plus one quantized ``n_i ln n_i`` sum
(per-term round to BIGINT at 1e6 BEFORE the cross-row sum — the
float-determinism rule), with doubles only in the final expression.

Scale: tokenize-explode then two hash aggregations ((slice, token),
then slice) — both map-side combinable, one shuffle each, no windows
over raw tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["lexical_diversity"]

QL = 10 ** 6

_TOKENS_SPARK = "split(trim(lower({t})), '\\\\s+')"
_TOKENS_DUCK = "regexp_split_to_array(trim(lower({t})), '\\s+')"


def lexical_diversity(df: DataFrame, text_col: str,
                      group_col: str) -> DataFrame:
    """(group, n_tokens, vocab_size, ttr, simpson, shannon) per group:

    - ``ttr`` = distinct / total tokens,
    - ``simpson`` = sum n_i(n_i-1) / (N(N-1)) — the probability two
      random tokens coincide (concentration; higher = spammier),
    - ``shannon`` = ln N - (sum n_i ln n_i) / N, in nats.
    """
    counts = (
        df.select(
            F.col(group_col).alias("__g"),
            F.explode(F.expr(_TOKENS_SPARK.format(t=text_col)))
            .alias("__t"),
        )
        .filter(F.col("__t") != "")
        .groupBy("__g", "__t")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    return (
        counts.groupBy(F.col("__g").alias(group_col))
        .agg(
            F.sum("__f").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            F.sum(F.expr("__f * (__f - 1)")).cast("bigint").alias("__coll"),
            F.sum(F.expr(
                f"CAST(round(CAST(__f AS DOUBLE) "
                f"* ln(CAST(__f AS DOUBLE)) * {QL}) AS BIGINT)"
            )).alias("__flnf"),
        )
        .select(
            group_col, "n_tokens", "vocab_size",
            round_portable(F.expr(
                "CAST(vocab_size AS DOUBLE) / CAST(n_tokens AS DOUBLE)"
            )).alias("ttr"),
            round_portable(F.expr(
                "CAST(__coll AS DOUBLE) / (CAST(n_tokens AS DOUBLE) "
                "* CAST(n_tokens - 1 AS DOUBLE))"
            ), 6).alias("simpson"),
            round_portable(F.expr(
                f"ln(CAST(n_tokens AS DOUBLE)) "
                f"- CAST(__flnf AS DOUBLE) "
                f"/ (CAST(n_tokens AS DOUBLE) * {float(QL)!r})"
            )).alias("shannon"),
        )
    )


def _q_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lexical_diversity(
        load(spark, sf_dir, "documents"), "text", "source")


_ORACLE_DIVERSITY = f"""
WITH toks AS (
  SELECT source AS g, unnest({_TOKENS_DUCK.format(t='text')}) AS t
  FROM documents
), counts AS (
  SELECT g, t, count(*) AS f FROM toks WHERE t <> '' GROUP BY 1, 2
), agg AS (
  SELECT g,
         CAST(sum(f) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab_size,
         CAST(sum(f * (f - 1)) AS BIGINT) AS coll,
         CAST(sum(CAST(round(CAST(f AS DOUBLE)
           * ln(CAST(f AS DOUBLE)) * {QL}) AS BIGINT)) AS BIGINT)
           AS flnf
  FROM counts GROUP BY 1
)
SELECT g AS source, n_tokens, vocab_size,
  {round_portable_duck(
      "CAST(vocab_size AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS ttr,
  {round_portable_duck(
      "CAST(coll AS DOUBLE) / (CAST(n_tokens AS DOUBLE) "
      "* CAST(n_tokens - 1 AS DOUBLE))", 6)} AS simpson,
  {round_portable_duck(
      f"ln(CAST(n_tokens AS DOUBLE)) - CAST(flnf AS DOUBLE) "
      f"/ (CAST(n_tokens AS DOUBLE) * {float(QL)!r})")} AS shannon
FROM agg
"""


QUERIES: dict = {
    "text_diversity_documents": (_q_diversity, _ORACLE_DIVERSITY),
}

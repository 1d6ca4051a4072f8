"""Text analysis #10: Burrows' Delta (stylometric distance between
sources) and pairwise source-vocabulary overlap — the SOURCE-pair
companions to the gated per-source tiers (``text9`` distributional
JS, ``text3`` lexical diversity): JS asks "how differently do two
sources use the SHARED vocabulary", overlap asks "how much vocabulary
do they even share", and Delta asks "do they read like different
authors" (Burrows, LLC 17:267, 2002).

- ``burrows_delta``: over the top-K corpus tokens, z-score each
  source's relative frequency against the across-source
  mean/population-std per token (sources missing a token contribute
  frequency 0 — the zero cells are materialized via a sources x
  top-tokens grid); Delta(s1, s2) = mean |z1 - z2|.
- ``vocab_overlap``: per source pair, distinct-shingle-set sizes,
  intersection, and Jaccard — exact integer counting.

Engine-exactness: relative frequencies quantize to BIGINT at 1e8
(so across-source moments are exact integer sums), z-scores divide
the SAME quantized integers on both engines, |z1 - z2| terms
re-quantize before the per-pair mean; overlap is integers until one
division.

Plan shape at 100 TB: token totals are map-side-combinable
aggregates; the top-K is TakeOrdered; every later relation is
bounded by (sources x K) or (sources^2) — tiny. Overlap joins the
per-source DISTINCT token relations on token, never materializing a
doc-level pair grid.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (text tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .tfidf import _TOKENS, _TOKENS_DUCK

__all__ = ["burrows_delta", "vocab_overlap"]

Q = 10 ** 8
QF = float(Q)
TOP_WORDS = 30


def burrows_delta(df: DataFrame, text_col: str = "text",
                  group_col: str = "source",
                  top_words: int = TOP_WORDS) -> DataFrame:
    """(source_a, source_b, n_words, delta): Burrows' Delta between
    every source pair (a < b)."""
    # ONE corpus scan: the (source, token) count relation feeds the
    # top-K selection, the per-source totals, and the grid counts
    # (localCheckpointed — the graph5 exchange-budget discipline; the
    # relation is vocabulary x sources, far smaller than the stream)
    st = (
        df.select(
            F.col(group_col).alias("__g"),
            F.explode(F.expr(_TOKENS.format(col=text_col)))
            .alias("__t"),
        )
        .groupBy("__g", "__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    ).localCheckpoint()
    top = (
        st.groupBy("__t")
        .agg(F.sum("__c").cast("bigint").alias("__ct"))
        .orderBy(F.col("__ct").desc(), F.col("__t").asc())
        .limit(top_words)
        .select("__t")
    ).localCheckpoint()
    totals = st.groupBy("__g").agg(
        F.sum("__c").cast("bigint").alias("__nt"))
    counts = st.join(F.broadcast(top), "__t").select(
        "__g", "__t", "__c")
    # sources x top-tokens grid with zero cells, freq quantized
    grid = (
        totals.crossJoin(F.broadcast(top))
        .join(counts, ["__g", "__t"], "left")
        .withColumn("__fq", F.expr(
            f"CAST(round(CAST(coalesce(__c, 0) AS DOUBLE) "
            f"/ CAST(__nt AS DOUBLE) * {Q}) AS BIGINT)"))
    )
    mom = grid.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__k"),
        F.sum("__fq").alias("__sf"),
        F.sum(F.expr("__fq * __fq")).alias("__sf2"),
    )
    mean = "(CAST(__sf AS DOUBLE) / CAST(__k AS DOUBLE))"
    var = (f"(CAST(__sf2 AS DOUBLE) / CAST(__k AS DOUBLE) "
           f"- {mean} * {mean})")
    # sources x K rows; checkpointed because BOTH sides of the pair
    # join consume it (otherwise the grid/moment lineage runs twice)
    z = (
        grid.join(F.broadcast(mom), "__t")
        .withColumn("__z", F.expr(
            f"CASE WHEN {var} > 0.0 THEN "
            f"(CAST(__fq AS DOUBLE) - {mean}) / sqrt({var}) "
            f"ELSE 0.0 END"))
        .select("__g", "__t", "__z")
    ).localCheckpoint()
    pairs = (
        z.selectExpr("__g AS source_a", "__t", "__z AS __za")
        .join(z.selectExpr("__g AS source_b", "__t", "__z AS __zb"),
              "__t")
        .filter("source_a < source_b")
        .withColumn("__dq", F.expr(
            f"CAST(round(abs(__za - __zb) * {Q}) AS BIGINT)"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_words"),
             F.sum("__dq").alias("__sd"))
    )
    return pairs.select(
        "source_a", "source_b", "n_words",
        round_portable(F.expr(
            f"CAST(__sd AS DOUBLE) / {QF!r} "
            f"/ CAST(n_words AS DOUBLE)"), 6).alias("delta"),
    ).orderBy("source_a", "source_b")


def vocab_overlap(df: DataFrame, text_col: str = "text",
                  group_col: str = "source") -> DataFrame:
    """(source_a, source_b, n_a, n_b, inter, jaccard): distinct-token
    overlap per source pair (a < b)."""
    # distinct (source, token) feeds sizes AND both sides of the
    # pair join — materialize once
    vocab = df.select(
        F.col(group_col).alias("__g"),
        F.explode(F.expr(_TOKENS.format(col=text_col))).alias("__t"),
    ).distinct().localCheckpoint()
    sizes = vocab.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"))
    inter = (
        vocab.selectExpr("__g AS source_a", "__t")
        .join(vocab.selectExpr("__g AS source_b", "__t"), "__t")
        .filter("source_a < source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    # disjoint-vocabulary pairs must still appear (inter = 0) — the
    # absence of overlap IS the signal for contamination checks, and
    # an inner join would silently drop it
    grid = (
        sizes.selectExpr("__g AS source_a", "__n AS n_a")
        .crossJoin(F.broadcast(
            sizes.selectExpr("__g AS source_b", "__n AS n_b")))
        .filter("source_a < source_b")
    )
    return (
        grid
        .join(inter, ["source_a", "source_b"], "left")
        .withColumn("inter",
                    F.coalesce(F.col("inter"), F.lit(0))
                    .cast("bigint"))
        .select(
            "source_a", "source_b", "n_a", "n_b", "inter",
            round_portable(F.expr(
                "CAST(inter AS DOUBLE) "
                "/ CAST(n_a + n_b - inter AS DOUBLE)"), 6)
            .alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles
# --------------------------------------------------------------------------


def _q_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return burrows_delta(load(spark, sf_dir, "documents"))


def _q_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_overlap(load(spark, sf_dir, "documents"))


_D_MEAN = "(CAST(sf AS DOUBLE) / CAST(k AS DOUBLE))"
_D_VAR = (f"(CAST(sf2 AS DOUBLE) / CAST(k AS DOUBLE) "
          f"- {_D_MEAN} * {_D_MEAN})")

_ORACLE_DELTA = f"""
WITH tok AS (
  SELECT source AS g, unnest({_TOKENS_DUCK.format(col='text')}) AS t
  FROM documents
), top AS (
  SELECT t FROM (
    SELECT t, CAST(count(*) AS BIGINT) AS ct FROM tok GROUP BY 1
  ) ORDER BY ct DESC, t ASC LIMIT {TOP_WORDS}
), totals AS (
  SELECT g, CAST(count(*) AS BIGINT) AS nt FROM tok GROUP BY 1
), counts AS (
  SELECT tok.g, tok.t, CAST(count(*) AS BIGINT) AS c
  FROM tok JOIN top ON tok.t = top.t
  GROUP BY 1, 2
), grid AS (
  SELECT totals.g, top.t,
    CAST(round(CAST(coalesce(counts.c, 0) AS DOUBLE)
      / CAST(totals.nt AS DOUBLE) * {Q}) AS BIGINT) AS fq
  FROM totals CROSS JOIN top
  LEFT JOIN counts ON counts.g = totals.g AND counts.t = top.t
), mom AS (
  SELECT t, CAST(count(*) AS BIGINT) AS k,
    CAST(sum(fq) AS BIGINT) AS sf,
    CAST(sum(fq * fq) AS BIGINT) AS sf2
  FROM grid GROUP BY 1
), z AS (
  SELECT grid.g, grid.t,
    CASE WHEN {_D_VAR} > 0.0 THEN
      (CAST(grid.fq AS DOUBLE) - {_D_MEAN}) / sqrt({_D_VAR})
    ELSE 0.0 END AS z
  FROM grid JOIN mom ON grid.t = mom.t
), pairs AS (
  SELECT a.g AS source_a, b.g AS source_b,
    CAST(count(*) AS BIGINT) AS n_words,
    CAST(sum(CAST(round(abs(a.z - b.z) * {Q}) AS BIGINT))
      AS BIGINT) AS sd
  FROM z a JOIN z b ON a.t = b.t AND a.g < b.g
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_words,
  {round_portable_duck(
      f"CAST(sd AS DOUBLE) / {QF!r} / CAST(n_words AS DOUBLE)", 6)}
    AS delta
FROM pairs ORDER BY 1, 2
"""

_ORACLE_OVERLAP = f"""
WITH vocab AS (
  SELECT DISTINCT source AS g,
    unnest({_TOKENS_DUCK.format(col='text')}) AS t
  FROM documents
), sizes AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n FROM vocab GROUP BY 1
), inter AS (
  SELECT a.g AS source_a, b.g AS source_b,
    CAST(count(*) AS BIGINT) AS inter
  FROM vocab a JOIN vocab b ON a.t = b.t AND a.g < b.g
  GROUP BY 1, 2
), grid AS (
  SELECT sa.g AS source_a, sa.n AS n_a, sb.g AS source_b,
    sb.n AS n_b
  FROM sizes sa CROSS JOIN sizes sb
  WHERE sa.g < sb.g
)
SELECT grid.source_a, grid.source_b, grid.n_a, grid.n_b,
  CAST(coalesce(inter.inter, 0) AS BIGINT) AS inter,
  {round_portable_duck(
      "CAST(coalesce(inter.inter, 0) AS DOUBLE) "
      "/ CAST(grid.n_a + grid.n_b - coalesce(inter.inter, 0) "
      "AS DOUBLE)", 6)} AS jaccard
FROM grid
LEFT JOIN inter ON grid.source_a = inter.source_a
  AND grid.source_b = inter.source_b
ORDER BY 1, 2
"""


QUERIES: dict = {
    "text_burrows_delta_documents": (_q_delta, _ORACLE_DELTA),
    "text_vocab_overlap_documents": (_q_overlap, _ORACLE_OVERLAP),
}

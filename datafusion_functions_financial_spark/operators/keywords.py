"""RAKE-style keyword / key-phrase extraction (Rose et al. 2010),
engine-deterministic.

Phrases are maximal runs of non-stopword tokens (the classic RAKE
delimiter rule, via the gap-and-islands trick: token_position −
row_number is constant within a run). Each word w gets
``score(w) = degree(w) / freq(w)`` where freq counts w's occurrences
and degree sums the lengths of the phrases those occurrences sit in;
a phrase scores the sum of its words' scores. Top-k phrases by score
are the corpus keywords.

Determinism: the per-word score is QUANTIZED to a BIGINT
(``round(score * 10^8)``) before any summation, so phrase scores are
integer sums — immune to add order (the SCALING.md rule). Ranking ties
break on the phrase string.

Scale shape: tokenization is scan-local (posexplode); islands need one
window over (doc, pos) — the same single key shuffle every per-doc
text op here pays; word stats are a vocabulary-sized aggregate joined
back by BROADCAST; the final top-k is a TakeOrdered. No step is
quadratic and nothing shuffles more than (doc_id, pos, token) rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["rake_phrases", "rake_keywords", "STOPWORDS"]

# Delimiter stopwords: a compact, public-domain English function-word
# list (extend per corpus; the synthetic corpus contains a/the).
STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "in", "is", "it", "of", "on", "or", "that", "the", "to", "with",
)

SCORE_SCALE = 100_000_000  # 1e8 fixed-point for word scores


def _stop_array_sql() -> str:
    return "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def rake_phrases(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, island, phrase, plen): maximal non-stopword token runs
    per document."""
    toks = df.selectExpr(
        f"{id_col} AS doc_id",
        f"posexplode(split(trim(lower({text_col})), '\\\\s+')) "
        f"AS (pos, token)",
    ).filter(
        (F.col("token") != "")
        & ~F.expr(f"array_contains({_stop_array_sql()}, token)")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = toks.withColumn(
        "island", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "island")
        .agg(
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(pos, token))), x -> x.token), ' ')"
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
    )


def rake_keywords(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 25) -> DataFrame:
    """Top-``k`` corpus key-phrases:
    (rank, phrase, score_q, n_occurrences) with ``score_q`` the
    1e8-fixed-point RAKE score (BIGINT)."""
    phrases = rake_phrases(df, text_col, id_col)
    # word occurrences tagged with their phrase's length
    words = phrases.select(
        "doc_id", "island", "plen",
        F.explode(F.split("phrase", " ")).alias("token"),
    )
    stats = words.groupBy("token").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").cast("bigint").alias("degree"),
    )
    scored = stats.selectExpr(
        "token",
        f"CAST(round(CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE) "
        f"* {SCORE_SCALE}) AS BIGINT) AS wq",
    )
    phrase_scores = (
        words.join(F.broadcast(scored), "token")
        .groupBy("doc_id", "island")
        .agg(F.sum("wq").cast("bigint").alias("score_q"))
        .join(phrases.select("doc_id", "island", "phrase"),
              ["doc_id", "island"])
    )
    agg = phrase_scores.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.max("score_q").alias("score_q"),  # identical per phrase text
    )
    top = (
        agg.orderBy(F.col("score_q").desc(), F.col("phrase"))
        .limit(k)
    )
    rank_w = Window.orderBy(F.col("score_q").desc(), F.col("phrase"))
    return top.withColumn(
        "rank", F.row_number().over(rank_w).cast("bigint")
    ).select("rank", "phrase", "score_q", "n_occurrences")


# ---------------------------------------------------------------------------
# Gate query (R05 queue)
# ---------------------------------------------------------------------------

_K = 25


def _q_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rake_keywords(load(spark, sf_dir, "documents"), k=_K)


_DUCK_STOPS = ", ".join(f"'{w}'" for w in STOPWORDS)

_ORACLE_RAKE = f"""
WITH arrs AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS arr
  FROM documents
), toks AS (
  SELECT doc_id, arr[i + 1] AS token, CAST(i AS BIGINT) AS pos
  FROM arrs, UNNEST(range(0, len(arr))) AS u(i)
), ns AS (
  SELECT doc_id, token, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS island
  FROM toks
  WHERE token != '' AND token NOT IN ({_DUCK_STOPS})
), phrases AS (
  SELECT doc_id, island,
         string_agg(token, ' ' ORDER BY pos) AS phrase,
         count(*) AS plen
  FROM ns GROUP BY doc_id, island
), words AS (
  SELECT doc_id, island, plen,
         unnest(string_split(phrase, ' ')) AS token
  FROM phrases
), stats AS (
  SELECT token,
         CAST(round(CAST(sum(plen) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE) * {SCORE_SCALE})
              AS BIGINT) AS wq
  FROM words GROUP BY token
), pscores AS (
  SELECT w.doc_id, w.island,
         CAST(sum(s.wq) AS BIGINT) AS score_q
  FROM words w JOIN stats s USING (token)
  GROUP BY w.doc_id, w.island
), agg AS (
  SELECT p.phrase,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(max(ps.score_q) AS BIGINT) AS score_q
  FROM pscores ps JOIN phrases p USING (doc_id, island)
  GROUP BY p.phrase
)
SELECT CAST(row_number() OVER (ORDER BY score_q DESC, phrase)
            AS BIGINT) AS rank,
       phrase, score_q, n_occurrences
FROM agg
ORDER BY score_q DESC, phrase
LIMIT {_K}
"""


QUERIES: dict = {
    "text_rake_keywords_documents": (_q_rake, _ORACLE_RAKE),
}

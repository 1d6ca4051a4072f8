"""BM25 full-text retrieval: inverted-index scoring + top-k per query.

The text-side counterpart of the embedding kNN operators
(``operators/similarity.py``): given a (small) query set and a (huge)
document corpus, return the top-k documents per query under BM25
(Robertson/Sparck-Jones idf, k1/b length normalization).

Plan shape at scale:

- the corpus "index" is the per-(doc, term) frequency table
  (``tfidf.term_counts``) plus the vocabulary df table — both computed
  with one shuffle each and reusable across query batches (persist
  them bucketed by term for repeated serving);
- query terms are few, so the terms side of the scoring join is
  BROADCAST: the corpus postings never shuffle for the probe — only
  postings matching a query term survive, which is exactly the
  inverted-index access path;
- per-(query, doc) score aggregation shuffles only the surviving
  postings; the final top-k is a rank window per query_id.

Determinism: ``ln`` may differ by an ulp across engines, so each
term's contribution is quantized to an exact BIGINT at ``_DP_TERM``
decimals (``round(c * 10^8)``) before the per-(query, doc) sum — the
reduction is then integer arithmetic, order-independent on any
partial-aggregation schedule in both engines (rounding to 8-dp
*doubles*, the previous scheme, still left the sum add-order dependent
— see operators/divergence.py for the observed sf0.1 boundary flip).
The summed score rounds portably at ROUND_DP before ranking, and rank
ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP, round_portable, round_portable_duck
from ..sources.tables import load
from .tfidf import document_frequency, term_counts

__all__ = ["bm25_topk", "doc_lengths"]

_DP_TERM = 8
_TERM_SCALE = float(10 ** _DP_TERM)
_TOKENS = "filter(split(trim(lower({col})), '\\\\s+'), t -> t != '')"


def doc_lengths(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, dl): whitespace token count per document."""
    return df.select(
        F.col(id_col),
        F.size(F.expr(_TOKENS.format(col=text_col))).cast("bigint")
        .alias("dl"),
    )


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 5,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id", query_id_col: str = "query_id",
              query_text_col: str = "query_text") -> DataFrame:
    """(query_id, rank, doc_id, score): top-k BM25 matches per query.

    Query terms are deduplicated (standard bag-of-words BM25 with
    query tf clamped to 1). Documents sharing no term with a query are
    never scored — the broadcast terms join IS the inverted-index
    probe.
    """
    tc = term_counts(docs, text_col, id_col)
    vocab = document_frequency(docs, text_col, id_col)
    dl = doc_lengths(docs, text_col, id_col)
    n_stats = docs.agg(F.count(F.lit(1)).alias("__n"))
    avg_stats = dl.agg(F.avg("dl").alias("__avgdl"))

    q_terms = queries.select(
        F.col(query_id_col),
        F.explode(F.expr(_TOKENS.format(col=query_text_col))).alias("term"),
    ).distinct()

    contrib = (
        tc.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(vocab), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_stats))
        .crossJoin(F.broadcast(avg_stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "__raw",
            F.col("__idf") * (F.col("tf") * F.lit(k1 + 1.0))
            / (F.col("tf")
               + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl")
                              / F.col("__avgdl"))),
        )
        .withColumn(
            "__c",
            F.expr(f"CAST(round(__raw * {_TERM_SCALE!r}) AS BIGINT)"),
        )
    )
    scored = contrib.groupBy(query_id_col, id_col).agg(
        round_portable(F.sum("__c") / F.lit(_TERM_SCALE), ROUND_DP)
        .alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, F.col("rank").cast("bigint").alias("rank"),
                id_col, "score")
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------

_GATE_K, _K1, _B = 5, 1.2, 0.75
_QMOD, _QLEN = 41, 5  # every 41st doc's first 5 tokens form a query


def _gate_queries(docs: DataFrame) -> DataFrame:
    toks = _TOKENS.format(col="text")
    return docs.filter(F.col("doc_id") % _QMOD == 0).select(
        F.col("doc_id").alias("query_id"),
        F.expr(f"array_join(slice({toks}, 1, {_QLEN}), ' ')")
        .alias("query_text"),
    )


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return bm25_topk(docs, _gate_queries(docs), k=_GATE_K, k1=_K1, b=_B)


_TOKS_D = ("list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
           "t -> t != '')")

_ORACLE_BM25 = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_D} AS t FROM documents
), tok AS (
  SELECT doc_id, unnest(t) AS term FROM toks
), tc AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), dl AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
), n AS (SELECT count(*) AS n_docs FROM documents
), avgdl AS (SELECT avg(dl) AS avgdl FROM dl
), q AS (
  SELECT DISTINCT doc_id AS query_id, unnest(list_slice(t, 1, {_QLEN}))
         AS term
  FROM toks WHERE doc_id % {_QMOD} = 0
), contrib AS (
  SELECT q.query_id, tc.doc_id,
         CAST(round((
           ln(1.0 + (n.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * (tc.tf * {_K1 + 1.0})
           / (tc.tf + {_K1} * ({1.0 - _B} + {_B} * dl.dl / avgdl.avgdl))
         ) * {_TERM_SCALE!r}) AS BIGINT) AS c
  FROM tc
  JOIN q USING (term)
  JOIN vocab USING (term)
  JOIN dl ON tc.doc_id = dl.doc_id
  CROSS JOIN n CROSS JOIN avgdl
), scored AS (
  SELECT query_id, doc_id,
         {round_portable_duck(
             f"CAST(sum(c) AS BIGINT) / {_TERM_SCALE!r}", ROUND_DP)}
           AS score
  FROM contrib GROUP BY 1, 2
), ranked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC) AS BIGINT)
           AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {_GATE_K}
"""

QUERIES: dict = {
    "bm25_topk_documents": (_q_bm25, _ORACLE_BM25),
}

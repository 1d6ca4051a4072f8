"""Corpus-level term statistics: document frequency, IDF, and per-doc
top-k distinctive terms (TF-IDF).

The workhorse for stopword discovery, boilerplate detection, and
keyword extraction over a training corpus. All pure Catalyst — no
Python in the hot path.

Plan shape at scale:

- ``term_counts``: explode tokens (narrow) -> groupBy(doc, term) —
  ONE shuffle, partial aggregation map-side;
- ``document_frequency``: groupBy(term) over per-doc distinct terms —
  map-side combine makes this linear in distinct (doc, term), and the
  result is VOCABULARY-sized (millions of rows, not corpus-sized), so
  downstream joins broadcast it;
- ``tfidf_topk``: term counts joined to the broadcast vocabulary,
  scored, then ranked per doc — the rank window repartitions on
  doc_id (second shuffle). Total: two shuffles + one broadcast,
  independent of corpus row width.

Determinism across engines: scores are ROUNDED to ``ROUND_DP``
**before** ranking so a 1-ulp ``ln`` difference between runtimes
cannot flip the rank order; remaining ties break on the term string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from ..plans.series import ROUND_DP

__all__ = ["document_frequency", "term_counts", "tfidf_topk"]

_TOKENS = "filter(split(trim(lower({col})), '\\\\s+'), t -> t != '')"
_TOKENS_DUCK = (
    "list_filter(regexp_split_to_array(trim(lower({col})), '\\s+'), "
    "t -> t != '')"
)


def term_counts(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, term, tf): whitespace-token frequencies per document."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.expr(_TOKENS.format(col=text_col))).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequency(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(term, df): number of documents containing each term.

    Distinct (doc, term) first (map-side combinable), then count per
    term — never a count-distinct over the raw token stream.
    """
    return (
        df.select(
            F.col(id_col),
            F.explode(F.expr(_TOKENS.format(col=text_col))).alias("term"),
        )
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def tfidf_topk(df: DataFrame, k: int = 3, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Top-k terms per doc by TF-IDF (tf * ln(N/df)), rank ascending.

    The vocabulary side is broadcast (it is vocabulary-sized); scores
    round to ROUND_DP before ranking for cross-engine determinism,
    ties break on the term string.
    """
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    tc = term_counts(df, text_col, id_col)
    vocab = document_frequency(df, text_col, id_col)
    scored = (
        tc.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf")
                    * F.log(F.col("__n") / F.col("df")), ROUND_DP),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "score")
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------

_GATE_K = 3


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tfidf_topk(load(spark, sf_dir, "documents"), k=_GATE_K)
    return out.selectExpr("doc_id", "CAST(rank AS BIGINT) AS rank",
                          "term", "score")


def _q_docfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Vocabulary with corpus-wide df — tiny output, full-corpus input.
    return document_frequency(load(spark, sf_dir, "documents"))


_TOKS_D = _TOKENS_DUCK.format(col="text")

_ORACLE_TFIDF = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_D}) AS term FROM documents
), tc AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tc.doc_id, tc.term,
         round(tc.tf * ln(CAST(n.n_docs AS DOUBLE) / vocab.df),
               {ROUND_DP}) AS score
  FROM tc JOIN vocab USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank, term, score FROM ranked WHERE rank <= {_GATE_K}
"""

_ORACLE_DOCFREQ = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_D}) AS term FROM documents
)
SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
"""

QUERIES: dict = {
    "text_tfidf_topk_documents": (_q_tfidf, _ORACLE_TFIDF),
    "text_docfreq_documents": (_q_docfreq, _ORACLE_DOCFREQ),
}

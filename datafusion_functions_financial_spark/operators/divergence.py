"""Distributional document scores: token entropy and KL divergence
against the corpus unigram distribution.

Two standard curation signals for pretraining data:

- ``token_entropy`` — Shannon entropy of a document's own token
  distribution. Near-zero entropy flags degenerate/repetitive docs
  (complements the surface repetition ratios in
  ``operators/text.py``);
- ``kl_vs_corpus`` — KL(doc || corpus) over unigrams, the
  importance-weighting / domain-shift score (high = far from the
  corpus average — either novel domain or junk).

Plan shape at scale:

- per-doc term counts: one shuffle on (doc, term)
  (``tfidf.term_counts`` reused);
- the corpus unigram distribution is VOCABULARY-sized and built with
  one map-side-combinable shuffle; it joins back by BROADCAST, so the
  corpus side never reshuffles for the probe;
- per-doc reduction is one groupBy(doc_id) shuffle.

Determinism: each term's contribution is a product/log of doubles —
quantized to an exact BIGINT at ``_DP_TERM`` decimals
(``round(c * 10^8)``) before the per-doc sum, so the reduction is
INTEGER arithmetic: order-independent on any partial-aggregation
schedule, in both engines. (Rounding each term to a *double* at 8 dp,
the previous scheme, still let a sum-order ulp flip the final 4 dp
rounding on boundary docs — observed once at sf0.1.) The final score
is ``sum/10^8`` rounded portably at ROUND_DP. Token-count ratios
(tf/dl, tf/total) are exact BIGINT-to-double conversions, identical
everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP, round_portable, round_portable_duck
from ..sources.tables import load
from .bm25 import doc_lengths
from .tfidf import term_counts

__all__ = ["token_entropy", "kl_vs_corpus"]

_DP_TERM = 8
_TERM_SCALE = float(10 ** _DP_TERM)


def token_entropy(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, entropy): Shannon entropy (nats) of each doc's tokens."""
    tc = term_counts(df, text_col, id_col)
    dl = doc_lengths(df, text_col, id_col)
    contrib = (
        tc.join(dl, id_col)
        .withColumn("__p", F.col("tf") / F.col("dl"))
        .withColumn(
            "__c",
            F.expr(f"CAST(round(-__p * ln(__p) * {_TERM_SCALE!r}) "
                   "AS BIGINT)"),
        )
    )
    return contrib.groupBy(id_col).agg(
        round_portable(F.sum("__c") / F.lit(_TERM_SCALE), ROUND_DP)
        .alias("entropy")
    )


def kl_vs_corpus(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, kl): KL(doc unigram dist || corpus unigram dist), nats.

    Every doc term exists in the corpus distribution by construction,
    so no zero-probability smoothing is needed.
    """
    tc = term_counts(df, text_col, id_col)
    dl = doc_lengths(df, text_col, id_col)
    corpus = tc.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = tc.agg(F.sum("tf").alias("__total"))
    contrib = (
        tc.join(dl, id_col)
        .join(F.broadcast(corpus), "term")
        .crossJoin(F.broadcast(total))
        .withColumn("__q", F.col("tf") / F.col("dl"))
        .withColumn("__p", F.col("ctf") / F.col("__total"))
        .withColumn(
            "__c",
            F.expr(f"CAST(round(__q * ln(__q / __p) * {_TERM_SCALE!r}) "
                   "AS BIGINT)"),
        )
    )
    return contrib.groupBy(id_col).agg(
        round_portable(F.sum("__c") / F.lit(_TERM_SCALE), ROUND_DP)
        .alias("kl")
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_entropy(load(spark, sf_dir, "documents"))


def _q_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kl_vs_corpus(load(spark, sf_dir, "documents"))


_TOK_CTE = """
  toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                       t -> t != '') AS t
    FROM documents
  ), tok AS (
    SELECT doc_id, unnest(t) AS term FROM toks
  ), tc AS (
    SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
  ), dl AS (
    SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
  )
"""

_ORACLE_ENTROPY = f"""
WITH {_TOK_CTE},
  contrib AS (
    SELECT tc.doc_id,
           CAST(round(-(tc.tf / CAST(dl.dl AS DOUBLE))
                 * ln(tc.tf / CAST(dl.dl AS DOUBLE))
                 * {_TERM_SCALE!r}) AS BIGINT) AS c
    FROM tc JOIN dl ON tc.doc_id = dl.doc_id
  )
SELECT doc_id,
  {round_portable_duck(
      f"CAST(sum(c) AS BIGINT) / {_TERM_SCALE!r}", ROUND_DP)} AS entropy
FROM contrib GROUP BY 1
"""

_ORACLE_KL = f"""
WITH {_TOK_CTE},
  corpus AS (
    SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tc GROUP BY 1
  ), total AS (
    SELECT CAST(sum(tf) AS BIGINT) AS total FROM tc
  ), contrib AS (
    SELECT tc.doc_id,
           CAST(round((tc.tf / CAST(dl.dl AS DOUBLE))
                 * ln((tc.tf / CAST(dl.dl AS DOUBLE))
                      / (corpus.ctf / CAST(total.total AS DOUBLE)))
                 * {_TERM_SCALE!r}) AS BIGINT) AS c
    FROM tc
    JOIN dl ON tc.doc_id = dl.doc_id
    JOIN corpus USING (term)
    CROSS JOIN total
  )
SELECT doc_id,
  {round_portable_duck(
      f"CAST(sum(c) AS BIGINT) / {_TERM_SCALE!r}", ROUND_DP)} AS kl
FROM contrib GROUP BY 1
"""

QUERIES: dict = {
    "text_entropy_documents": (_q_entropy, _ORACLE_ENTROPY),
    "text_kl_corpus_documents": (_q_kl, _ORACLE_KL),
}

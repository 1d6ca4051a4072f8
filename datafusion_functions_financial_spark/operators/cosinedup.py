"""Sparse TF-IDF cosine near-dup join with rare-token blocking — the
prefix-filtering (PPJoin-lite) member of the dedup family: MinHash
covers set Jaccard, SimHash covers Hamming-on-hyperplanes, embeddings
cover dense cosine; this covers SPARSE weighted cosine, the classic
bag-of-words duplicate detector.

Candidate generation never touches the pair space: each document
blocks on its R rarest qualifying terms (document frequency between 2
and DF_CAP — df = 1 terms match nothing, and the cap bounds every
join key's fan-out, the same hot-bucket discipline as the LSH and
co-purchase joins). Verification is exact: per-pair dot products and
per-doc norms are sums of per-term quantized BIGINTs over the shared
TF-IDF weight relation (term weights are one identical
``tf * ln(N/df)`` expression on both engines, so the quantized
products match bitwise; cosine is rounded BEFORE the threshold
compare so both engines cut identically).

Plan shape at scale: token explode -> two vocabulary-sized aggregates
(term counts, document frequency — both map-combinable), a broadcast
of the DF relation, a df-capped equi-join on the blocking term
(fan-out ≤ DF_CAP per key by construction), then keyed equi-joins on
(doc, term) for verification. No window, sort, or join ever grows
faster than candidates x doc-length.

Recall contract: a pair is found iff the two docs SHARE one of their
R rarest in-band terms — the standard blocking trade; raise R or
DF_CAP to trade cost for recall (the candidate histogram operator in
dedup.py tells you where the threshold should sit).

Corpus caveat (same pathology the bench notes for simhash pairs):
the driver's synthetic corpus has a ~31-term vocabulary, so at sf0.1
even the rarest term's df is ~3.8k and NO term is block-eligible —
the gate result is honestly empty there (both engines agree on the
empty relation), while sf0.001/sf0.01 exercise ~300 verified pairs
and the unit tests cover realistic vocabularies. On a real corpus
(Zipf vocabulary) the rare tail is exactly where near-dup signal
lives, which is why DF-capped prefix blocking is the standard
technique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .tfidf import _TOKENS, _TOKENS_DUCK, document_frequency, term_counts

__all__ = ["tfidf_cosine_pairs"]

Q2 = 10 ** 6
Q2F = float(Q2)
R_BLOCK = 2
DF_CAP = 30
COS_THRESHOLD = 0.3


def tfidf_cosine_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       threshold: float = COS_THRESHOLD,
                       r_block: int = R_BLOCK,
                       df_cap: int = DF_CAP) -> DataFrame:
    """(id_a, id_b, cosine): document pairs whose TF-IDF cosine meets
    ``threshold``, candidates blocked on each doc's ``r_block``
    rarest terms with df in [2, df_cap]."""
    tc = term_counts(df, text_col, id_col)
    dfreq = document_frequency(df, text_col, id_col)
    n_docs = df.select(id_col).distinct().count()
    w = (
        tc.join(F.broadcast(dfreq), "term")
        .withColumn("__w", F.expr(
            f"CAST(tf AS DOUBLE) "
            f"* ln(CAST({n_docs} AS DOUBLE) / CAST(df AS DOUBLE))"))
    )
    norms = w.groupBy(id_col).agg(
        F.sum(F.expr(
            f"CAST(round(__w * __w * {Q2}) AS BIGINT)")).alias("__n2"))
    block = (
        w.filter(F.expr(f"df >= 2 AND df <= {df_cap}"))
        .withColumn("__rk", F.row_number().over(
            Window.partitionBy(id_col).orderBy("df", "term")))
        .filter(F.col("__rk") <= r_block)
        .select(F.col(id_col).alias("__doc"), "term")
    )
    cand = (
        block.alias("a")
        .join(block.alias("b"),
              (F.col("a.term") == F.col("b.term"))
              & (F.col("a.__doc") < F.col("b.__doc")))
        .select(F.col("a.__doc").alias("id_a"),
                F.col("b.__doc").alias("id_b"))
        .distinct()
    )
    wa = w.select(F.col(id_col).alias("id_a"), "term",
                  F.col("__w").alias("__wa"))
    wb = w.select(F.col(id_col).alias("id_b"), "term",
                  F.col("__w").alias("__wb"))
    dots = (
        cand.join(wa, "id_a").join(wb, ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.expr(
            f"CAST(round(__wa * __wb * {Q2}) AS BIGINT)")).alias("__d"))
    )
    na = norms.select(F.col(id_col).alias("id_a"),
                      F.col("__n2").alias("__na"))
    nb = norms.select(F.col(id_col).alias("id_b"),
                      F.col("__n2").alias("__nb"))
    cos = (f"(CAST(__d AS DOUBLE) / {Q2F!r}) "
           f"/ sqrt((CAST(__na AS DOUBLE) / {Q2F!r}) "
           f"* (CAST(__nb AS DOUBLE) / {Q2F!r}))")
    return (
        dots.join(na, "id_a").join(nb, "id_b")
        .select("id_a", "id_b",
                round_portable(F.expr(cos), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_cosine_pairs(load(spark, sf_dir, "documents"))


def _oracle(threshold: float = COS_THRESHOLD, r_block: int = R_BLOCK,
            df_cap: int = DF_CAP) -> str:
    toks = _TOKENS_DUCK.format(col="text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
), tc AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks) t GROUP BY 1
), nd AS (
  SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents
), w AS (
  SELECT tc.doc_id, tc.term, dfreq.df,
    CAST(tc.tf AS DOUBLE) * ln(nd.n / CAST(dfreq.df AS DOUBLE)) AS w
  FROM tc JOIN dfreq ON tc.term = dfreq.term CROSS JOIN nd
), norms AS (
  SELECT doc_id,
    CAST(sum(CAST(round(w * w * {Q2}) AS BIGINT)) AS BIGINT) AS n2
  FROM w GROUP BY 1
), block AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, term,
      row_number() OVER (PARTITION BY doc_id ORDER BY df, term) AS rk
    FROM w WHERE df >= 2 AND df <= {df_cap}) t
  WHERE rk <= {r_block}
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM block a JOIN block b
    ON a.term = b.term AND a.doc_id < b.doc_id
), dots AS (
  SELECT c.id_a, c.id_b,
    CAST(sum(CAST(round(wa.w * wb.w * {Q2}) AS BIGINT)) AS BIGINT)
      AS d
  FROM cand c
  JOIN w wa ON wa.doc_id = c.id_a
  JOIN w wb ON wb.doc_id = c.id_b AND wb.term = wa.term
  GROUP BY 1, 2
), scored AS (
  SELECT d.id_a, d.id_b,
    {round_portable_duck(
        f"(CAST(d.d AS DOUBLE) / {Q2F!r}) "
        f"/ sqrt((CAST(na.n2 AS DOUBLE) / {Q2F!r}) "
        f"* (CAST(nb.n2 AS DOUBLE) / {Q2F!r}))", 6)} AS cosine
  FROM dots d
  JOIN norms na ON na.doc_id = d.id_a
  JOIN norms nb ON nb.doc_id = d.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold!r}
"""


QUERIES: dict = {
    "dedup_tfidf_cosine_documents": (_q_cosine_pairs, _oracle()),
}

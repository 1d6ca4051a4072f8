"""Text analysis #6: readability scoring (Flesch reading ease +
Flesch-Kincaid grade with a deterministic vowel-group syllable
heuristic), per-doc cross-entropy under the corpus BIGRAM language
model, and the per-source hapax-legomena profile.

Rounds out the text family: ``text.py`` has length/quality stats,
``text2.py`` the unigram cross-entropy and PMI collocations,
``robustfit.zipf_slope`` the frequency curve. Readability is the
classic document-quality prior in pretraining-corpus filters; the
bigram cross-entropy is a sharper fluency/perplexity proxy than the
unigram one (it penalizes improbable transitions, not just rare
words); hapax share measures vocabulary freshness per source.

Determinism: syllable and sentence counts are integer
vowel-group / punctuation-group counts via ``split`` — verified to
produce identical arrays on Spark and DuckDB (both keep leading and
trailing empties at limit -1); per-doc ratios are scalar double
expressions with identical trees; the bigram log terms quantize to
BIGINT before the per-doc sum (SCALING.md partial-agg rule).

Plan shapes at scale: readability is a single narrow projection (no
shuffle at all — per-row arithmetic on the text column). The bigram
xent is two hash aggregates (doc-bigram counts, corpus-bigram
counts) joined on the bigram key — the corpus side is
vocabulary²-bounded, not data-sized — plus a broadcastable
first-token marginal. Hapax is two nested hash aggregates on
(source, term). No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP, round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["readability", "bigram_cross_entropy", "hapax_profile"]

_SCALE = float(10 ** 7)

# Syllables per word ~= vowel groups (>=1); both engines keep
# leading/trailing empties when splitting, so groups = len(parts)-1.
_SYL = ("aggregate(transform({toks}, "
        "w -> greatest(size(split(w, '[aeiouy]+')) - 1, 1)), "
        "0L, (a, x) -> a + x)")
_TOKS = "filter(split(trim(lower({col})), '\\\\s+'), t -> t != '')"


def readability(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, n_words, n_sentences, n_syllables, flesch, fk_grade):
    Flesch reading ease ``206.835 - 1.015 w/s - 84.6 y/w`` and the
    Flesch-Kincaid grade ``0.39 w/s + 11.8 y/w - 15.59`` with
    sentences = [.!?]+ runs (>= 1) and syllables = vowel groups.
    Docs with zero words are dropped."""
    toks = _TOKS.format(col=text_col)
    staged = df.select(
        F.col(id_col),
        F.expr(f"size({toks})").cast("bigint").alias("n_words"),
        F.expr(
            f"greatest(size(split({text_col}, '[.!?]+')) - 1, 1)"
        ).cast("bigint").alias("n_sentences"),
        F.expr(_SYL.format(toks=toks)).cast("bigint")
        .alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    ws = "(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))"
    yw = "(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))"
    return staged.select(
        id_col, "n_words", "n_sentences", "n_syllables",
        round_portable(F.expr(
            f"206.835 - 1.015 * {ws} - 84.6 * {yw}"), ROUND_DP
        ).alias("flesch"),
        round_portable(F.expr(
            f"0.39 * {ws} + 11.8 * {yw} - 15.59"), ROUND_DP
        ).alias("fk_grade"),
    )


def bigram_cross_entropy(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, n_bigrams, bigram_xent): ``-(1/n) Σ ln(c_ab / c_a•)``
    over the doc's adjacent token pairs, where ``c_ab`` is the
    corpus bigram count and ``c_a•`` the corpus count of ``a`` as a
    bigram head. Every doc bigram occurs in the corpus by
    construction, so the MLE model needs no smoothing. Docs with
    < 2 tokens are dropped."""
    toks = df.select(
        F.col(id_col), F.expr(_TOKS.format(col=text_col)).alias("__t"))
    big = (
        toks.filter(F.expr("size(__t) >= 2"))
        .select(F.col(id_col), F.explode(F.expr(
            "zip_with(slice(__t, 1, size(__t) - 1), "
            "slice(__t, 2, size(__t) - 1), "
            "(x, y) -> struct(x AS a, y AS b))")).alias("bg"))
        .select(id_col, "bg.a", "bg.b")
    )
    doc_ab = big.groupBy(id_col, "a", "b").agg(
        F.count(F.lit(1)).alias("tf"))
    corpus_ab = big.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("c_ab"))
    head = big.groupBy("a").agg(F.count(F.lit(1)).alias("c_a"))
    dl = big.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"))
    contrib = (
        doc_ab.join(corpus_ab, ["a", "b"])
        .join(F.broadcast(head), "a")
        .withColumn("__c", F.expr(
            f"CAST(round(-tf * ln(c_ab / CAST(c_a AS DOUBLE)) "
            f"* {_SCALE!r}) AS BIGINT)"))
    )
    return (
        contrib.groupBy(id_col).agg(F.sum("__c").alias("__s"))
        .join(dl, id_col)
        .select(
            id_col, "n_bigrams",
            round_portable(F.expr(
                f"CAST(__s AS DOUBLE) / ({_SCALE!r} "
                f"* CAST(n_bigrams AS DOUBLE))"), ROUND_DP
            ).alias("bigram_xent"),
        )
    )


def hapax_profile(df: DataFrame, group_col: str = "source",
                  text_col: str = "text") -> DataFrame:
    """(group, vocab_size, n_hapax, hapax_share): per-group
    vocabulary size and the share of it occurring exactly once in
    that group — vocabulary freshness / contamination screen."""
    term = df.select(
        F.col(group_col).alias("__g"),
        F.explode(F.expr(_TOKS.format(col=text_col))).alias("__term"),
    )
    tc = term.groupBy("__g", "__term").agg(
        F.count(F.lit(1)).alias("__c"))
    agg = tc.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.expr(
            "CASE WHEN __c = 1 THEN 1 ELSE 0 END"
        )).cast("bigint").alias("n_hapax"),
    )
    return agg.select(
        F.col("__g").alias(group_col), "vocab_size", "n_hapax",
        round_portable(F.expr(
            "CAST(n_hapax AS DOUBLE) / CAST(vocab_size AS DOUBLE)"),
            ROUND_DP).alias("hapax_share"),
    )


def _q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return readability(load(spark, sf_dir, "documents"))


def _q_bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_cross_entropy(load(spark, sf_dir, "documents"))


def _q_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hapax_profile(load(spark, sf_dir, "documents"))


_ORACLE_READABILITY = f"""
WITH staged AS (
  SELECT doc_id,
    CAST(len(list_filter(regexp_split_to_array(trim(lower(text)),
      '\\s+'), t -> t != '')) AS BIGINT) AS n_words,
    CAST(greatest(len(regexp_split_to_array(text, '[.!?]+')) - 1, 1)
      AS BIGINT) AS n_sentences,
    CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
      list_transform(list_filter(regexp_split_to_array(trim(
        lower(text)), '\\s+'), t -> t != ''),
        w -> CAST(greatest(len(regexp_split_to_array(w,
          '[aeiouy]+')) - 1, 1) AS BIGINT))),
      (a, x) -> a + x) AS BIGINT) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
  {round_portable_duck(
      "206.835 - 1.015 * (CAST(n_words AS DOUBLE) "
      "/ CAST(n_sentences AS DOUBLE)) - 84.6 "
      "* (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))",
      ROUND_DP)} AS flesch,
  {round_portable_duck(
      "0.39 * (CAST(n_words AS DOUBLE) "
      "/ CAST(n_sentences AS DOUBLE)) + 11.8 "
      "* (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) "
      "- 15.59", ROUND_DP)} AS fk_grade
FROM staged WHERE n_words > 0
"""

_BIGRAM_CTE = """
toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                t -> t != '') AS t
  FROM documents
), bigl AS (
  SELECT doc_id,
    unnest(list_transform(t[2:],
      (x, i) -> struct_pack(a := t[i], b := x))) AS bg
  FROM toks WHERE len(t) >= 2
), big AS (
  SELECT doc_id, bg.a AS a, bg.b AS b FROM bigl
)"""

_ORACLE_BIGRAM_XENT = f"""
WITH {_BIGRAM_CTE}
, doc_ab AS (
  SELECT doc_id, a, b, count(*) AS tf FROM big GROUP BY 1, 2, 3
), corpus_ab AS (
  SELECT a, b, count(*) AS c_ab FROM big GROUP BY 1, 2
), head AS (
  SELECT a, count(*) AS c_a FROM big GROUP BY 1
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams
  FROM big GROUP BY 1
), contrib AS (
  SELECT d.doc_id,
    CAST(round(-d.tf * ln(c.c_ab / CAST(h.c_a AS DOUBLE))
      * {_SCALE!r}) AS BIGINT) AS t
  FROM doc_ab d
  JOIN corpus_ab c ON d.a = c.a AND d.b = c.b
  JOIN head h ON d.a = h.a
), summed AS (
  SELECT doc_id, CAST(sum(t) AS BIGINT) AS s
  FROM contrib GROUP BY 1
)
SELECT s.doc_id, dl.n_bigrams,
  {round_portable_duck(
      f"CAST(s.s AS DOUBLE) / ({_SCALE!r} "
      f"* CAST(dl.n_bigrams AS DOUBLE))", ROUND_DP)} AS bigram_xent
FROM summed s JOIN dl ON s.doc_id = dl.doc_id
"""

_ORACLE_HAPAX = f"""
WITH term AS (
  SELECT source AS g,
    unnest(list_filter(regexp_split_to_array(trim(lower(text)),
      '\\s+'), t -> t != '')) AS term
  FROM documents
), tc AS (
  SELECT g, term, count(*) AS c FROM term GROUP BY 1, 2
), agg AS (
  SELECT g,
    CAST(count(*) AS BIGINT) AS vocab_size,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_hapax
  FROM tc GROUP BY 1
)
SELECT g AS source, vocab_size, n_hapax,
  {round_portable_duck(
      "CAST(n_hapax AS DOUBLE) / CAST(vocab_size AS DOUBLE)",
      ROUND_DP)} AS hapax_share
FROM agg
"""


QUERIES: dict = {
    "text_readability_documents": (_q_readability, _ORACLE_READABILITY),
    "text_bigram_xent_documents": (_q_bigram_xent, _ORACLE_BIGRAM_XENT),
    "text_hapax_documents": (_q_hapax, _ORACLE_HAPAX),
}

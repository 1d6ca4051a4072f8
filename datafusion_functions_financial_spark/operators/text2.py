"""Second tier of text-curation signals: per-document lexical quality
(type-token ratio, stop-word ratio, mean word length), corpus-LM
cross-entropy (the perplexity-proxy quality score), and OOV rate
against a frequency-truncated vocabulary.

These are the remaining per-doc scores a pretraining curation stack
filters on (alongside ``text.py``'s surface stats, ``divergence.py``'s
entropy/KL, and ``quality.py``'s percentile gates):

- ``lexical_stats`` — TTR flags low-diversity docs; the stop-word
  ratio separates prose from keyword-stuffed junk; mean word length
  is a cheap script/garbage signal;
- ``unigram_cross_entropy`` — −Σ_t (tf_t/dl)·ln(ctf_t/total): the
  doc's cross-entropy under the corpus unigram LM. Low = templated/
  common, high = rare-token junk or novel domain. The standard cheap
  stand-in for model-based perplexity filtering;
- ``oov_rate`` — fraction of tokens outside the top-``k`` corpus
  vocabulary: the tokenizer-coverage signal for vocab truncation.

Plan shape at scale (the ``divergence.py`` template): per-doc term
counts are ONE (doc, term) shuffle; corpus statistics are
VOCABULARY-sized and rejoin by BROADCAST; the per-doc reduction is one
groupBy(doc) shuffle. Float sums follow the integer-quantized
contribution rule (SCALING.md): each term's double contribution is
quantized to BIGINT at ``_DP_TERM`` decimals before the order-free
sum, so partial-aggregation schedules can never flip a bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP, round_portable, round_portable_duck
from ..sources.tables import load
from .bm25 import doc_lengths
from .tfidf import term_counts

__all__ = ["lexical_stats", "unigram_cross_entropy", "oov_rate",
           "pmi_bigrams", "stats_by_group", "composite_quality"]

_DP_TERM = 8
_TERM_SCALE = float(10 ** _DP_TERM)

# Fixed function-word list: articles/conjunctions/prepositions that mark
# natural prose. Deliberately tiny and hard-coded (NOT corpus-derived —
# that's ``vocab.remove_stopwords``) so the ratio means the same thing
# on every corpus.
STOPWORDS = ("a", "an", "the", "and", "or", "of", "to", "in", "is",
             "it", "on", "for", "with", "as", "at", "by", "be")

_OOV_TOPK = 20


def lexical_stats(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, ttr, stopword_ratio, mean_word_len) per doc.

    TTR = distinct/total tokens. One (doc, term) shuffle + one
    groupBy(doc) reduction; all ratios are exact BIGINT-to-double
    divisions (no float sums), so no quantization is needed."""
    tc = term_counts(df, text_col, id_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    per_doc = tc.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("__n"),
        F.count(F.lit(1)).cast("bigint").alias("__types"),
        F.sum(F.when(F.array_contains(stop_arr, F.col("term")),
                     F.col("tf")).otherwise(F.lit(0)))
        .cast("bigint").alias("__stop"),
        F.sum(F.length("term") * F.col("tf")).cast("bigint")
        .alias("__chars"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("__n").alias("n_tokens"),
        round_portable(F.col("__types") / F.col("__n")).alias("ttr"),
        round_portable(F.col("__stop") / F.col("__n")).alias(
            "stopword_ratio"),
        round_portable(F.col("__chars") / F.col("__n")).alias(
            "mean_word_len"),
    )


def unigram_cross_entropy(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(id, xent): −Σ_t (tf/dl)·ln(ctf/total), nats — the doc's
    cross-entropy under the corpus unigram distribution. Every doc
    term is in the corpus by construction (no smoothing needed)."""
    tc = term_counts(df, text_col, id_col)
    dl = doc_lengths(df, text_col, id_col)
    corpus = tc.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = tc.agg(F.sum("tf").alias("__total"))
    contrib = (
        tc.join(dl, id_col)
        .join(F.broadcast(corpus), "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__c",
            F.expr(f"CAST(round(-(tf / CAST(dl AS DOUBLE)) "
                   f"* ln(ctf / CAST(__total AS DOUBLE)) "
                   f"* {_TERM_SCALE!r}) AS BIGINT)"),
        )
    )
    return contrib.groupBy(id_col).agg(
        round_portable(F.sum("__c") / F.lit(_TERM_SCALE), ROUND_DP)
        .alias("xent")
    )


def oov_rate(df: DataFrame, k: int = _OOV_TOPK, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, oov_rate): fraction of tokens outside the top-``k``
    corpus vocabulary (by total frequency, ties to the smaller term).

    The vocabulary is k rows — broadcast; in-vocab token counts come
    from a broadcast INNER join of per-doc term counts, and
    ``oov = dl − in_vocab`` (cheaper than an anti join: one pass,
    exact integers)."""
    tc = term_counts(df, text_col, id_col)
    dl = doc_lengths(df, text_col, id_col)
    vocab = (
        tc.groupBy("term").agg(F.sum("tf").alias("ctf"))
        .orderBy(F.col("ctf").desc(), F.col("term").asc())
        .limit(k)
        .select("term")
    )
    in_vocab = (
        tc.join(F.broadcast(vocab), "term")
        .groupBy(id_col)
        .agg(F.sum("tf").cast("bigint").alias("__iv"))
    )
    return (
        dl.join(in_vocab, id_col, "left")
        .select(
            F.col(id_col),
            F.col("dl").cast("bigint").alias("n_tokens"),
            round_portable(
                (F.col("dl") - F.coalesce(F.col("__iv"), F.lit(0)))
                / F.col("dl")
            ).alias("oov_rate"),
        )
    )


PMI_MIN_COUNT = 5
PMI_TOPK = 25

_TOKS = "filter(split(trim(lower({col})), '\\\\s+'), t -> t != '')"


def pmi_bigrams(df: DataFrame, k: int = PMI_TOPK,
                min_count: int = PMI_MIN_COUNT, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information:
    ``PMI(a,b) = ln( (c_ab/N_b) / ((c_a/N)(c_b/N)) )`` over adjacent
    token pairs, keeping bigrams seen at least ``min_count`` times.
    The standard phrase-mining / tokenizer-merge-candidate statistic.

    Plan: bigram explode (narrow) → one groupBy((a,b)) shuffle; the
    two unigram join sides are VOCABULARY-sized broadcasts; the top-k
    is a TakeOrdered (no global sort). PMI is rounded BEFORE ranking
    (the ``tfidf`` convention) so an ulp can never flip rank order;
    ties break on the bigram strings."""
    toks = df.select(
        F.col(id_col), F.expr(_TOKS.format(col=text_col)).alias("__t"))
    big = (
        toks.filter(F.expr("size(__t) >= 2"))
        .select(F.explode(F.expr(
            "zip_with(slice(__t, 1, size(__t) - 1), "
            "slice(__t, 2, size(__t) - 1), "
            "(x, y) -> struct(x AS a, y AS b))")).alias("bg"))
        .select("bg.a", "bg.b")
    )
    c_ab = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    uni = (
        toks.select(F.explode("__t").alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    )
    nb = big.agg(F.count(F.lit(1)).alias("__nb"))
    n = uni.agg(F.sum("c").alias("__n"))
    scored = (
        c_ab.filter(F.col("c_ab") >= min_count)
        .join(F.broadcast(uni.selectExpr("term AS a", "c AS c_a")), "a")
        .join(F.broadcast(uni.selectExpr("term AS b", "c AS c_b")), "b")
        .crossJoin(F.broadcast(nb)).crossJoin(F.broadcast(n))
        .withColumn(
            "pmi",
            round_portable(F.expr(
                "ln((c_ab / CAST(__nb AS DOUBLE)) "
                "/ ((c_a / CAST(__n AS DOUBLE)) "
                "* (c_b / CAST(__n AS DOUBLE))))")),
        )
    )
    return (
        scored.select("a", "b", "c_ab", "pmi")
        .orderBy(F.col("pmi").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(k)
    )


_DP_G = 4
_G_SCALE = float(10 ** _DP_G)


def stats_by_group(df: DataFrame, group_cols=("lang", "source"),
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Corpus monitoring rollup: per (lang, source) — doc count, token
    totals, mean tokens/doc, mean TTR. Per-doc ratios are rounded to
    ``_DP_G`` decimals (exact 1e-4 grid) then quantized to BIGINT for
    the group mean, so the unordered group sum is integer-exact."""
    lex = lexical_stats(df, text_col, id_col)
    joined = df.select(F.col(id_col), *group_cols).join(lex, id_col)
    qttr = F.expr(f"CAST(round(ttr * {_G_SCALE!r}) AS BIGINT)")
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            round_portable(
                F.sum("n_tokens") / F.count(F.lit(1)).cast("double")
            ).alias("mean_tokens"),
            round_portable(
                F.sum(qttr) / F.lit(_G_SCALE)
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_ttr"),
        )
    )


# Composite-quality weights: lexical diversity dominates; stop-word
# presence signals prose; longer mean words signal real vocabulary
# (capped so outliers don't saturate the score).
QW_TTR, QW_STOP, QW_WLEN = 0.5, 0.3, 0.2
WLEN_CAP = 8.0


def composite_quality(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, quality_score, decile): one blended per-doc quality score
    — ``0.5·TTR + 0.3·(1 − stopword_ratio) + 0.2·min(wlen/8, 1)`` —
    plus its corpus decile (NTILE over the scored docs; the global
    window sorts one row per DOC with only the score column, after
    aggregation). The single-number gate a curation pipeline
    thresholds on."""
    lex = lexical_stats(df, text_col, id_col)
    score = round_portable(
        F.lit(QW_TTR) * F.col("ttr")
        + F.lit(QW_STOP) * (F.lit(1.0) - F.col("stopword_ratio"))
        + F.lit(QW_WLEN) * F.least(
            F.col("mean_word_len") / F.lit(WLEN_CAP), F.lit(1.0))
    )
    from pyspark.sql import Window
    w = Window.orderBy(F.col("quality_score").desc(),
                       F.col(id_col).asc())
    return (
        lex.select(F.col(id_col), score.alias("quality_score"))
        .withColumn("decile", F.ntile(10).over(w).cast("bigint"))
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------

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


def _q_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lexical_stats(load(spark, sf_dir, "documents"))


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

_ORACLE_LEXICAL = f"""
WITH {_TOK_CTE},
  agg AS (
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS types,
           CAST(sum(CASE WHEN term IN ({_STOP_SQL}) THEN tf
                         ELSE 0 END) AS BIGINT) AS stop,
           CAST(sum(len(term) * tf) AS BIGINT) AS chars
    FROM tc GROUP BY 1
  )
SELECT doc_id, n AS n_tokens,
  {round_portable_duck("types / CAST(n AS DOUBLE)")} AS ttr,
  {round_portable_duck("stop / CAST(n AS DOUBLE)")} AS stopword_ratio,
  {round_portable_duck("chars / CAST(n AS DOUBLE)")} AS mean_word_len
FROM agg
"""


def _q_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_cross_entropy(load(spark, sf_dir, "documents"))


_ORACLE_XENT = f"""
WITH {_TOK_CTE},
  corpus AS (
    SELECT term, sum(tf) AS ctf FROM tc GROUP BY 1
  ), total AS (
    SELECT sum(tf) AS tot FROM tc
  ), contrib AS (
    SELECT tc.doc_id,
           CAST(round(-(tc.tf / CAST(dl.dl AS DOUBLE))
                 * ln(corpus.ctf / CAST(total.tot AS DOUBLE))
                 * {_TERM_SCALE!r}) AS BIGINT) AS c
    FROM tc
    JOIN dl ON tc.doc_id = dl.doc_id
    JOIN corpus ON tc.term = corpus.term
    CROSS JOIN total
  )
SELECT doc_id,
  {round_portable_duck(
      f"CAST(sum(c) AS BIGINT) / {_TERM_SCALE!r}", ROUND_DP)} AS xent
FROM contrib GROUP BY 1
"""


def _q_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    return oov_rate(load(spark, sf_dir, "documents"))


_ORACLE_OOV = f"""
WITH {_TOK_CTE},
  vocab AS (
    SELECT term FROM (
      SELECT term, sum(tf) AS ctf FROM tc GROUP BY 1
    ) ORDER BY ctf DESC, term ASC LIMIT {_OOV_TOPK}
  ), iv AS (
    SELECT tc.doc_id, CAST(sum(tc.tf) AS BIGINT) AS n_in
    FROM tc JOIN vocab ON tc.term = vocab.term
    GROUP BY 1
  )
SELECT dl.doc_id, dl.dl AS n_tokens,
  {round_portable_duck(
      "(dl.dl - coalesce(iv.n_in, 0)) / CAST(dl.dl AS DOUBLE)")}
    AS oov_rate
FROM dl LEFT JOIN iv ON dl.doc_id = iv.doc_id
"""


def _q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pmi_bigrams(load(spark, sf_dir, "documents"))


_ORACLE_PMI = f"""
WITH {_TOK_CTE},
  big AS (
    SELECT t[i] AS a, t[i + 1] AS b
    FROM toks, UNNEST(range(1, len(t))) AS u(i)
    WHERE len(t) >= 2
  ), cab AS (
    SELECT a, b, count(*) AS c_ab FROM big GROUP BY 1, 2
  ), uni AS (
    SELECT term, count(*) AS c FROM tok GROUP BY 1
  ), nb AS (SELECT count(*) AS nbig FROM big),
  nt AS (SELECT CAST(sum(c) AS BIGINT) AS ntot FROM uni),
  scored AS (
    SELECT cab.a, cab.b, cab.c_ab,
      {round_portable_duck(
          "ln((c_ab / CAST(nbig AS DOUBLE)) "
          "/ ((ua.c / CAST(ntot AS DOUBLE)) "
          "* (ub.c / CAST(ntot AS DOUBLE))))")} AS pmi
    FROM cab
    JOIN uni ua ON cab.a = ua.term
    JOIN uni ub ON cab.b = ub.term
    CROSS JOIN nb CROSS JOIN nt
    WHERE cab.c_ab >= {PMI_MIN_COUNT}
  )
SELECT a, b, c_ab, pmi FROM scored
ORDER BY pmi DESC, a ASC, b ASC LIMIT {PMI_TOPK}
"""


def _q_stats_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stats_by_group(load(spark, sf_dir, "documents"))


_ORACLE_STATS_BY_GROUP = f"""
WITH {_TOK_CTE},
  agg AS (
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS types
    FROM tc GROUP BY 1
  ), lex AS (
    SELECT d.doc_id, d.lang, d.source, agg.n,
           CAST(round((round((types / CAST(n AS DOUBLE))
                             * {_G_SCALE!r}) / {_G_SCALE!r} + 0.0)
                      * {_G_SCALE!r}) AS BIGINT) AS qttr
    FROM documents d JOIN agg ON d.doc_id = agg.doc_id
  )
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
  {round_portable_duck(
      "CAST(sum(n) AS BIGINT) / CAST(count(*) AS DOUBLE)")}
    AS mean_tokens,
  {round_portable_duck(
      f"CAST(sum(qttr) AS BIGINT) / {_G_SCALE!r} "
      f"/ CAST(count(*) AS DOUBLE)")} AS mean_ttr
FROM lex GROUP BY 1, 2
"""


def _q_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return composite_quality(load(spark, sf_dir, "documents"))


_ORACLE_COMPOSITE = f"""
WITH {_TOK_CTE},
  agg AS (
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS types,
           CAST(sum(CASE WHEN term IN ({{stop}}) THEN tf
                         ELSE 0 END) AS BIGINT) AS stop,
           CAST(sum(len(term) * tf) AS BIGINT) AS chars
    FROM tc GROUP BY 1
  ), lex AS (
    SELECT doc_id,
           round((types / CAST(n AS DOUBLE)) * {_G_SCALE!r})
             / {_G_SCALE!r} + 0.0 AS ttr,
           round((stop / CAST(n AS DOUBLE)) * {_G_SCALE!r})
             / {_G_SCALE!r} + 0.0 AS sr,
           round((chars / CAST(n AS DOUBLE)) * {_G_SCALE!r})
             / {_G_SCALE!r} + 0.0 AS wl
    FROM agg
  ), scored AS (
    SELECT doc_id,
      {round_portable_duck(
          f"{QW_TTR!r} * ttr + {QW_STOP!r} * (1.0 - sr) "
          f"+ {QW_WLEN!r} * least(wl / {WLEN_CAP!r}, 1.0)")}
        AS quality_score
    FROM lex
  )
SELECT doc_id, quality_score,
       CAST(ntile(10) OVER (ORDER BY quality_score DESC, doc_id ASC)
            AS BIGINT) AS decile
FROM scored
""".replace("{stop}", _STOP_SQL)


TOP_TERMS_PER_GROUP = 3


def top_terms_per_group(df: DataFrame, k: int = TOP_TERMS_PER_GROUP,
                        group_col: str = "source",
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` terms by frequency within each group (source/domain)
    — the per-domain vocabulary fingerprint. Ties break toward the
    smaller term. Counts are one (group, term) shuffle with map-side
    combine; the rank window partitions on the group (vocabulary-sized
    input, not corpus-sized)."""
    counts = (
        df.select(F.col(group_col).alias("grp"),
                  F.explode(F.expr(_TOKS.format(col=text_col)))
                  .alias("term"))
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window
    w = Window.partitionBy("grp").orderBy(
        F.col("cnt").desc(), F.col("term").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "term", "cnt", "rank")
    )


def _q_top_terms_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_terms_per_group(load(spark, sf_dir, "documents"))


_ORACLE_TOP_TERMS_GROUP = f"""
WITH toks AS (
  SELECT source,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     t -> t != '') AS t
  FROM documents
), counts AS (
  SELECT source, unnest(t) AS term FROM toks
), c AS (
  SELECT source, term, count(*) AS cnt FROM counts GROUP BY 1, 2
)
SELECT source, term, cnt, rank FROM (
  SELECT source, term, cnt,
         CAST(row_number() OVER (PARTITION BY source
              ORDER BY cnt DESC, term ASC) AS BIGINT) AS rank
  FROM c
) WHERE rank <= {TOP_TERMS_PER_GROUP}
"""


QUERIES: dict = {
    "text_lexical_stats_documents": (_q_lexical, _ORACLE_LEXICAL),
    "text_unigram_xent_documents": (_q_xent, _ORACLE_XENT),
    "text_oov_rate_documents": (_q_oov, _ORACLE_OOV),
    "text_pmi_bigrams_documents": (_q_pmi, _ORACLE_PMI),
    "text_stats_by_group_documents": (_q_stats_by_group,
                                      _ORACLE_STATS_BY_GROUP),
    "text_composite_quality_documents": (_q_composite, _ORACLE_COMPOSITE),
    "text_top_terms_per_source_documents": (_q_top_terms_group,
                                            _ORACLE_TOP_TERMS_GROUP),
}

"""Text-analysis operators for large-scale training-data pipelines.

Every operator is scan -> project with no shuffle, so they parallelize
embarrassingly over a 100 TB document corpus. Language ID, BPE token
counting, and fingerprinting are pure Catalyst expressions
(whole-stage codegen); the multi-count text_stats pass uses one
Arrow-batched UDF (see fasthash.make_text_stats_udf) because five
separate interpreted regex/lambda expressions are slower than a single
Python pass.

Portability: everything has an exactly-equivalent DuckDB oracle (same
integer counts and hash arithmetic, same regex semantics with explicit
global flags), so results are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from ..plans.series import ROUND_DP

MOD = 1_000_000_007

STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "it", "on", "for")

LANG_MARKERS = {
    "en": ("the", "and", "is", "of", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "nicht"),
    "es": ("el", "los", "y", "las", "que"),
}

# Spark <-> DuckDB expression fragments ------------------------------------

_TOKENS_SPARK = "split(trim(text), '\\\\s+')"
_TOKENS_DUCK = "regexp_split_to_array(trim(text), '\\s+')"
_NOSPACE_SPARK = "length(regexp_replace(text, '\\\\s+', ''))"
_NOSPACE_DUCK = "length(regexp_replace(text, '\\s+', '', 'g'))"
_PUNCT_SPARK = "length(text) - length(regexp_replace(text, '[.,!?;:]', ''))"
_PUNCT_DUCK = (
    "length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))"
)


def _inlist(items) -> str:
    return ", ".join(f"'{w}'" for w in items)


def poly_hash_spark(str_expr: str) -> str:
    """Polynomial rolling hash over code points, mod 1e9+7 (Spark SQL)."""
    return (
        f"aggregate(transform(split({str_expr}, ''), "
        f"c -> CAST(ascii(c) AS LONG)), 0L, (h, c) -> (h*31 + c) % {MOD})"
    )


def poly_hash_duck(str_expr: str) -> str:
    """Same hash in DuckDB SQL (unicode() == Spark's ascii code point).

    Empty-string guard: DuckDB's string_split('', '') yields [''] and
    unicode('') is -1, which would hash '' to -1; the engine folds an
    empty string to the seed 0, so the oracle must too."""
    fold = (
        f"list_reduce(list_concat([CAST(0 AS BIGINT)], "
        f"list_transform(string_split({str_expr}, ''), "
        f"c -> CAST(unicode(c) AS BIGINT))), (h, c) -> (h*31 + c) % {MOD})"
    )
    return (
        f"CASE WHEN length({str_expr}) = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE {fold} END"
    )


# --------------------------------------------------------------------------
# text_stats
# --------------------------------------------------------------------------


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token/char/punct/stopword statistics + a quality score per doc.

    Counting runs in one Arrow-batched pass (fasthash.make_text_stats_udf
    — Catalyst's interpreted regex/lambda evaluation is ~5x slower for
    five separate expressions); ratio/score arithmetic stays in
    Catalyst. Results match the pure-SQL oracle exactly (integer counts,
    identical double division)."""
    from pyspark.sql import functions as F
    from . import fasthash

    counts = fasthash.make_text_stats_udf(STOPWORDS)
    df = df.withColumn("__c", counts(F.col(text_col)))
    return df.selectExpr(
        "*",
        "__c.n_tokens AS n_tokens",
        "__c.chars_nospace AS chars_nospace",
        "__c.punct_count AS punct_count",
        "__c.stopword_count AS stopword_count",
    ).drop("__c").selectExpr(
        "*",
        "chars_nospace / n_tokens AS avg_token_len",
        f"punct_count / length({text_col}) AS punct_ratio",
        "stopword_count / n_tokens AS stopword_ratio",
    ).selectExpr(
        "*",
        # quality = 0.4*min(nt/100,1) + 0.3*(1-min(10*punct/len,1))
        #         + 0.3*min(5*stop/nt,1), computed as ONE exact-BIGINT
        # numerator over ONE denominator with a single double division.
        # Summing the three float terms is engine-divergent (FMA /
        # association differ by an ulp — observed vs DuckDB), and the
        # curation pipeline thresholds on the UNROUNDED score.
        f"CAST(4*least(n_tokens, 100)*length({text_col})*n_tokens"
        f" + 300*(length({text_col})"
        f"        - least(10*punct_count, length({text_col})))*n_tokens"
        f" + 300*least(5*stopword_count, n_tokens)*length({text_col})"
        f" AS DOUBLE)"
        f" / CAST(1000*length({text_col})*n_tokens AS DOUBLE)"
        f" AS quality_score",
    )


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Portable two-step rounding: the ratio columns are division
    # results that can land near .00005 boundaries where round(x, 4)
    # legitimately differs between engines (observed at sf0.1).
    df = text_stats(load(spark, sf_dir, "documents"))
    return df.selectExpr(
        "doc_id", "n_tokens", "chars_nospace", "punct_count",
        "stopword_count",
        "round(avg_token_len * 10000.0) / 10000.0 AS avg_token_len",
        "round(punct_ratio * 10000.0) / 10000.0 AS punct_ratio",
        "round(stopword_ratio * 10000.0) / 10000.0 AS stopword_ratio",
        "round(quality_score * 10000.0) / 10000.0 AS quality_score",
    )


_ORACLE_TEXT_STATS = f"""
WITH s AS (
  SELECT doc_id,
    len({_TOKENS_DUCK}) AS n_tokens,
    {_NOSPACE_DUCK} AS chars_nospace,
    {_PUNCT_DUCK} AS punct_count,
    len(list_filter({_TOKENS_DUCK},
        x -> list_contains([{_inlist(STOPWORDS)}], lower(x)))) AS stopword_count,
    length(text) AS n_len
  FROM documents
), r AS (
  SELECT *, chars_nospace / n_tokens AS avg_token_len,
    punct_count / n_len AS punct_ratio,
    stopword_count / n_tokens AS stopword_ratio
  FROM s
)
SELECT doc_id, n_tokens, chars_nospace, punct_count, stopword_count,
  round(avg_token_len * 10000.0) / 10000.0 AS avg_token_len,
  round(punct_ratio * 10000.0) / 10000.0 AS punct_ratio,
  round(stopword_ratio * 10000.0) / 10000.0 AS stopword_ratio,
  round((CAST(4*least(n_tokens, 100)*n_len*n_tokens
         + 300*(n_len - least(10*punct_count, n_len))*n_tokens
         + 300*least(5*stopword_count, n_tokens)*n_len AS DOUBLE)
        / CAST(1000*n_len*n_tokens AS DOUBLE)) * 10000.0) / 10000.0
    AS quality_score
FROM r
"""


# --------------------------------------------------------------------------
# language ID (marker n-gram/stopword heuristic + CJK char detection)
# --------------------------------------------------------------------------

_CJK = "一-鿿"


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = text_col
    toks = f"split(trim(lower({t})), '\\\\s+')"
    scores = [
        f"size(filter({toks}, x -> array_contains("
        f"array({_inlist(ws)}), x))) AS s_{lang}"
        for lang, ws in LANG_MARKERS.items()
    ]
    cjk = (
        f"length({t}) - length(regexp_replace({t}, '[{_CJK}]', '')) AS s_zh"
    )
    # s_zh = #CJK chars: strip the CJK range and count what vanished.
    return df.selectExpr("*", *scores, cjk).selectExpr(
        "*",
        "CASE WHEN s_zh > 0 THEN 'zh' "
        "WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en > 0 "
        "THEN 'en' "
        "WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr > 0 THEN 'fr' "
        "WHEN s_de >= s_es AND s_de > 0 THEN 'de' "
        "WHEN s_es > 0 THEN 'es' ELSE 'unknown' END AS lang_pred",
    )


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = lang_id(load(spark, sf_dir, "documents"))
    return df.selectExpr(
        "doc_id", "lang", "s_en", "s_fr", "s_de", "s_es", "s_zh",
        "lang_pred", "CAST(lang_pred = lang AS BOOLEAN) AS is_correct",
    )


_ORACLE_LANG_ID = f"""
WITH s AS (
  SELECT doc_id, lang,
    {', '.join(
        "len(list_filter(regexp_split_to_array(trim(lower(text)), '" + chr(92) + "s+'), "
        f"x -> list_contains([{_inlist(ws)}], x))) AS s_{lang}"
        for lang, ws in LANG_MARKERS.items()
    )},
    length(text) - length(regexp_replace(text, '[{_CJK}]', '', 'g')) AS s_zh
  FROM documents
)
SELECT doc_id, lang, s_en, s_fr, s_de, s_es, s_zh,
  CASE WHEN s_zh > 0 THEN 'zh'
    WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
    WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr > 0 THEN 'fr'
    WHEN s_de >= s_es AND s_de > 0 THEN 'de'
    WHEN s_es > 0 THEN 'es' ELSE 'unknown' END AS lang_pred,
  (CASE WHEN s_zh > 0 THEN 'zh'
    WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
    WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr > 0 THEN 'fr'
    WHEN s_de >= s_es AND s_de > 0 THEN 'de'
    WHEN s_es > 0 THEN 'es' ELSE 'unknown' END) = lang AS is_correct
FROM s
"""


def lang_confusion(df: DataFrame, text_col: str = "text",
                   label_col: str = "lang") -> DataFrame:
    """Confusion matrix of declared vs detected language:
    (lang, lang_pred, n) — the label-quality audit a corpus ingest
    runs on its metadata. One map-side-combinable groupBy over the
    scan-local ``lang_id`` scores."""
    pred = lang_id(df, text_col)
    return (
        pred.groupBy(label_col, "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_confusion(load(spark, sf_dir, "documents"))


_ORACLE_LANG_CONFUSION = f"""
WITH pred AS ({_ORACLE_LANG_ID})
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY lang, lang_pred
"""


# --------------------------------------------------------------------------
# document fingerprint (rolling polynomial hash)
# --------------------------------------------------------------------------

_NORM_SPARK = (
    "regexp_replace(regexp_replace(lower(text), '\\\\s+', ' '), '[^ -~]', '')"
)
_NORM_DUCK = (
    "regexp_replace(regexp_replace(lower(text), '\\s+', ' ', 'g'),"
    " '[^ -~]', '', 'g')"
)


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Deterministic 31-bit polynomial fingerprint of normalized text."""
    norm = _NORM_SPARK.replace("text", text_col)
    return df.selectExpr("*", f"{poly_hash_spark(norm)} AS {out_col}")


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = fingerprint(load(spark, sf_dir, "documents"))
    return df.selectExpr("doc_id", "fingerprint")


_ORACLE_FINGERPRINT = f"""
SELECT doc_id, {poly_hash_duck(_NORM_DUCK)} AS fingerprint
FROM documents
"""


# --------------------------------------------------------------------------
# BPE-ish token counting (regex pre-tokenizer, portable alternation)
# --------------------------------------------------------------------------

# GPT-2-style pre-tokenization simplified to an RE2/Java-portable
# alternation: letter runs, single digits, punctuation runs.
_BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\\\t\\\\n]+"
_BPE_PATTERN_DUCK = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n]+"


def token_count_bpe(df: DataFrame, text_col: str = "text",
                    out_col: str = "bpe_token_count") -> DataFrame:
    return df.selectExpr(
        "*",
        f"size(regexp_extract_all({text_col}, '{_BPE_PATTERN}', 0)) "
        f"AS {out_col}",
    )


def _q_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = token_count_bpe(load(spark, sf_dir, "documents"))
    return df.selectExpr("doc_id", "bpe_token_count")


_ORACLE_TOKEN_BPE = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_PATTERN_DUCK}', 0))
         AS bpe_token_count
FROM documents
"""


# --------------------------------------------------------------------------
# repetition metrics (Gopher-style quality filters)
# --------------------------------------------------------------------------


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Word-level repetition signals per document: distinct-word ratio,
    most-frequent-word fraction, mean word length.

    The Gopher/C4-style repetition filters (top n-gram fraction,
    duplicate-line fraction) reduce to per-(doc, unit) counting; the
    word-level variant here is the distributed pattern for all of them:
    explode -> two-stage integer count aggregation -> per-doc ratios.
    All reductions are exact integer sums; each ratio is one IEEE
    division, so output is bit-deterministic at any parallelism. At
    100 TB the explode shuffles (doc_id, word) pairs — partial
    map-side counting keeps the shuffle proportional to per-partition
    DISTINCT pairs, and no stage materializes a full document.

    Documents with no words (empty text) are dropped, matching a
    GROUP-BY oracle's inner aggregation semantics.
    """
    words = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"filter(split({text_col}, ' '), w -> w <> '')")
        ).alias("__w"),
    )
    per_word = words.groupBy(id_col, "__w").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return per_word.groupBy(id_col).agg(
        F.sum("__c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("__c").alias("top_word_count"),
        F.sum(F.length("__w") * F.col("__c")).alias("word_chars"),
    ).selectExpr(
        id_col, "n_words", "n_distinct_words", "top_word_count",
        "n_distinct_words / CAST(n_words AS DOUBLE) AS distinct_ratio",
        "top_word_count / CAST(n_words AS DOUBLE) AS top_word_frac",
        "word_chars / CAST(n_words AS DOUBLE) AS mean_word_len",
    )


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load(spark, sf_dir, "documents"))


_ORACLE_REPETITION = """
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
), wc AS (
  SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       count(*) AS n_distinct_words,
       max(c) AS top_word_count,
       count(*) / CAST(sum(c) AS DOUBLE) AS distinct_ratio,
       max(c) / CAST(sum(c) AS DOUBLE) AS top_word_frac,
       CAST(sum(length(w) * c) AS BIGINT) / CAST(sum(c) AS DOUBLE)
         AS mean_word_len
FROM wc
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# PII-style redaction (regex scrub, RE2/Java-portable patterns)
# --------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}"
_EMAIL_RE_DUCK = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_NUM_RE = "[0-9]{7,}"


def redact(df: DataFrame, text_col: str = "text",
           out_col: str = "redacted") -> DataFrame:
    """Scrub email addresses and long digit runs (account/phone-style
    numbers), counting redactions. Pure Catalyst regexp_replace —
    scan-local, zero shuffle, trivially linear at 100 TB."""
    return df.selectExpr(
        "*",
        f"size(regexp_extract_all({text_col}, '{_EMAIL_RE}', 0)) "
        f"AS n_emails",
        f"regexp_replace({text_col}, '{_EMAIL_RE}', '<EMAIL>') AS __t1",
    ).selectExpr(
        "*",
        f"size(regexp_extract_all(__t1, '{_NUM_RE}', 0)) AS n_numbers",
        f"regexp_replace(__t1, '{_NUM_RE}', '<NUM>') AS {out_col}",
    ).drop("__t1")


def _q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The synthetic corpus has no PII; append a deterministic
    # contact-info tail per doc so the scrub is actually exercised.
    docs = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "concat(text, ' contact user', CAST(doc_id AS STRING),"
        " '@example.com or call ',"
        " CAST(1000000 + doc_id * 9973 AS STRING)) AS text",
    )
    out = redact(docs)
    # BIGINT casts: Spark size()/length() yield int32, DuckDB's len()/
    # length() yield int64 — match the oracle dtype exactly.
    return out.selectExpr(
        "doc_id",
        "CAST(n_emails AS BIGINT) AS n_emails",
        "CAST(n_numbers AS BIGINT) AS n_numbers",
        "CAST(length(redacted) AS BIGINT) AS redacted_len",
        "md5(redacted) AS redacted_md5",
    )


_ORACLE_REDACT = f"""
WITH d AS (
  SELECT doc_id,
         concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                '@example.com or call ',
                CAST(1000000 + doc_id * 9973 AS VARCHAR)) AS text
  FROM documents
), r AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_EMAIL_RE_DUCK}')) AS n_emails,
         regexp_replace(text, '{_EMAIL_RE_DUCK}', '<EMAIL>', 'g') AS t1
  FROM d
)
SELECT doc_id,
       n_emails,
       len(regexp_extract_all(t1, '{_NUM_RE}')) AS n_numbers,
       length(regexp_replace(t1, '{_NUM_RE}', '<NUM>', 'g'))
         AS redacted_len,
       md5(regexp_replace(t1, '{_NUM_RE}', '<NUM>', 'g')) AS redacted_md5
FROM r
"""


QUERIES: dict = {
    "text_stats_documents": (_q_text_stats, _ORACLE_TEXT_STATS),
    "text_token_bpe_documents": (_q_token_bpe, _ORACLE_TOKEN_BPE),
    "text_langid_documents": (_q_lang_id, _ORACLE_LANG_ID),
    "text_lang_confusion_documents": (
        _q_lang_confusion, _ORACLE_LANG_CONFUSION),
    "text_fingerprint_documents": (_q_fingerprint, _ORACLE_FINGERPRINT),
    "text_repetition_documents": (_q_repetition, _ORACLE_REPETITION),
    "text_redact_documents": (_q_redact, _ORACLE_REDACT),
}

"""Composed training-data curation pipeline (the 100 TB flagship).

``clean_corpus`` chains the individual operators exactly the way a
large-scale LLM data pipeline does:

    documents
      -> text_stats        (token/char/punct counts, quality score)
      -> lang_id           (marker-ngram language prediction)
      -> FILTER            (language + min tokens + min quality)
      -> exact dedup       (md5 of normalized text, keep smallest id)
      -> MinHash LSH       (near-dup pairs over the survivors)
      -> clusters          (connected components, canonical keep flag)

Everything stays one DataFrame program: stats+langid are a single scan
(no join — lang_id composes over the stats output), exact dedup is a
window-min over the text hash, and the near-dup stage reuses the
banded LSH candidate path (no all-pairs scan anywhere). The gate query
has a SINGLE end-to-end DuckDB oracle — the whole pipeline, filters
through recursive cluster labels, is declared once in each engine and
must agree bit-for-bit.

Scale notes: filters run before any hashing (predicate pushdown
drops disqualified docs at the scan); the only shuffles are the
text-hash window, the LSH band groupBy, and the per-round cluster
joins over the (tiny) near-dup edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP
from ..sources.tables import load
from . import dedup, text

DEFAULT_LANG = "en"
MIN_TOKENS = 10
MIN_QUALITY = 0.5


def clean_corpus(
    docs: DataFrame,
    lang: str = DEFAULT_LANG,
    min_tokens: int = MIN_TOKENS,
    min_quality: float = MIN_QUALITY,
    max_bucket_size: int | None = dedup.DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Run the full curation pipeline; returns one row per document
    that survives language/quality filtering and exact dedup, labeled
    with its near-dup cluster and the canonical ``is_kept`` flag.

    ``max_bucket_size`` forwards to the LSH stage (hot-bucket cap).
    """
    enriched = text.lang_id(text.text_stats(docs))  # one scan, no join
    kept0 = enriched.filter(
        (F.col("lang_pred") == lang)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("quality_score") >= min_quality)
    )
    norm = dedup._NORM_SPARK.format(t="text")
    w = Window.partitionBy("__h")
    kept1 = (
        kept0.withColumn("__h", F.expr(f"md5({norm})"))
        .withColumn("__keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__keep"))
        .drop("__h", "__keep")
    )
    pairs = dedup.minhash_lsh_pairs(
        kept1, max_bucket_size=max_bucket_size
    ).select("id_a", "id_b")
    clusters = dedup.dedup_clusters(kept1, pairs)
    return kept1.join(clusters, "doc_id").select(
        "doc_id", "cluster_id", "is_kept", "n_tokens", "quality_score"
    )


def _q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = clean_corpus(load(spark, sf_dir, "documents"),
                       max_bucket_size=dedup.GATE_BUCKET_CAP)
    # Portable two-step rounding (see text._q_text_stats).
    return out.selectExpr(
        "doc_id", "cluster_id", "is_kept", "n_tokens",
        "round(quality_score * 10000.0) / 10000.0 AS quality_score",
    )


def _duck_lang_pred() -> str:
    case = (
        "CASE WHEN s_zh > 0 THEN 'zh' "
        "WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en > 0 "
        "THEN 'en' "
        "WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr > 0 THEN 'fr' "
        "WHEN s_de >= s_es AND s_de > 0 THEN 'de' "
        "WHEN s_es > 0 THEN 'es' ELSE 'unknown' END"
    )
    return case


def _build_oracle() -> str:
    t = text
    lang_scores = ", ".join(
        "len(list_filter(regexp_split_to_array(trim(lower(text)), "
        "'\\s+'), "
        f"x -> list_contains([{t._inlist(ws)}], x))) AS s_{lang}"
        for lang, ws in t.LANG_MARKERS.items()
    )
    cjk = (
        f"length(text) - length(regexp_replace(text, '[{t._CJK}]', '', "
        f"'g')) AS s_zh"
    )
    norm = dedup._NORM_DUCK.format(t="text")
    # Exact-integer rational form — must match text.text_stats exactly
    # (the threshold below compares the UNROUNDED score).
    quality = (
        "CAST(4*least(n_tokens, 100)*n_len*n_tokens"
        " + 300*(n_len - least(10*punct_count, n_len))*n_tokens"
        " + 300*least(5*stopword_count, n_tokens)*n_len AS DOUBLE)"
        " / CAST(1000*n_len*n_tokens AS DOUBLE)"
    )
    return f"""
WITH RECURSIVE st AS (
  SELECT doc_id, text,
    len({t._TOKENS_DUCK}) AS n_tokens,
    {t._PUNCT_DUCK} AS punct_count,
    len(list_filter({t._TOKENS_DUCK},
        x -> list_contains([{t._inlist(t.STOPWORDS)}], lower(x))))
      AS stopword_count,
    length(text) AS n_len,
    {lang_scores},
    {cjk}
  FROM documents
), scored AS (
  SELECT doc_id, text, n_tokens, {quality} AS quality_score,
         {_duck_lang_pred()} AS lang_pred
  FROM st
), kept0 AS (
  SELECT doc_id, text, n_tokens, quality_score FROM scored
  WHERE lang_pred = '{DEFAULT_LANG}' AND n_tokens >= {MIN_TOKENS}
    AND quality_score >= {MIN_QUALITY}
), ex AS (
  SELECT *, min(doc_id) OVER (PARTITION BY md5({norm})) AS keep_id
  FROM kept0
), kept1 AS (
  SELECT doc_id, text, n_tokens, quality_score FROM ex
  WHERE doc_id = keep_id
), {dedup.duck_lsh_pairs_ctes('kept1')}, edges AS (
  SELECT id_a AS src, id_b AS dst FROM lshpairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM lshpairs
), reach AS (
  SELECT doc_id AS id, doc_id AS r FROM kept1
  UNION
  SELECT e.src AS id, reach.r
  FROM edges e JOIN reach ON reach.id = e.dst
), cl AS (
  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
)
SELECT k.doc_id, cl.cluster_id, (k.doc_id = cl.cluster_id) AS is_kept,
       k.n_tokens,
       round(k.quality_score * 10000.0) / 10000.0 AS quality_score
FROM kept1 k JOIN cl ON cl.doc_id = k.doc_id
"""


QUERIES: dict = {
    "pipeline_clean_corpus_documents": (_q_clean_corpus, _build_oracle()),
}

"""Text analysis #4: winnowing document fingerprints (Schleimer-
Wilkerson-Aiken, SIGMOD 2003 — the MOSS algorithm), fingerprint-
overlap pair detection, and n-gram novelty (the share of a doc's
word n-grams never seen in any earlier document — the
memorization/freshness signal used when ordering training corpora).

Portability: k-gram hashes are the package's polynomial fold mod
1e9+7 (``text.poly_hash_spark`` / ``poly_hash_duck``); winnowing's
"min hash in window, ties -> rightmost position" rule is encoded in
ONE integer key ``h * 2^20 + (2^20 - 1 - pos)`` so a plain windowed
``min`` implements it identically on both engines (positions are
bounded by 2^20 per document — asserted by the length filter).

Plan shapes at scale:
- winnowing is per-document work: explode positions, one window over
  (doc, pos) — a single shuffle on doc_id; the fingerprint SET is
  ~2/(w+1) of positions, the index you persist.
- pair detection joins the fingerprint index on the hash ONLY
  (bucketed candidates, never all-pairs) with the standard hot-key
  cap, then TakeOrdered top-k — the LSH-shaped plan.
- novelty is explode -> first-occurrence aggregate (min doc_id per
  gram, map-side combinable) -> broadcast-sized join back per gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from . import fasthash
from .text import (
    _NORM_DUCK, _NORM_SPARK, poly_hash_duck, poly_hash_spark,
)

__all__ = ["winnow_fingerprints", "winnow_pairs", "ngram_novelty"]

WINNOW_K = 8          # char k-gram length
WINNOW_W = 16         # winnowing window (guarantee: gap <= w+k-1)
POS_M = 1 << 20       # position packing base (doc len < 2^20)
NOVELTY_N = 5         # word n-gram size
PAIR_TOP = 100
MAX_DOCS_PER_FP = 40
MIN_SHARED = 2


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """(id, __p, __h): the selected winnowing fingerprints — in every
    window of ``w`` consecutive k-gram hashes, the minimum hash
    (rightmost on ties). Distinct (position, hash) selections."""
    norm = _NORM_SPARK.replace("text", text_col)
    # Repartition on the doc id BEFORE hashing: a small corpus file
    # scans as one partition, which would serialize the CPU-heavy
    # hash/explode onto one core — and the min-window below needs
    # hashpartitioning(__id) anyway, so this moves the one required
    # exchange ahead of the expensive work (tiny pre-explode rows)
    # instead of adding one. The partition count is EXPLICIT: the
    # pre-explode rows are a few MB, and AQE would coalesce an
    # unpinned shuffle of them back to one partition — exactly the
    # serialization this exists to break (bytes are the wrong
    # proxy for the post-explode × per-char-hash CPU downstream).
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    base = (
        df.selectExpr(f"{id_col} AS __id", f"{text_col} AS __raw")
        .repartition(n_parts, F.col("__id"))
        .selectExpr("__id", f"{norm.replace(text_col, '__raw')} AS __t")
        .filter(F.expr(f"length(__t) >= {k + w - 1}"))
        .filter(F.expr(f"length(__t) < {POS_M}"))
    )
    # Positional k-gram hashes from the vectorized rolling pass
    # (fasthash.make_kgram_hashes_udf) — identical values to the
    # unrolled element_at polynomial it replaces (which itself
    # measured ~5 s -> ~1 s vs per-position substrings); the
    # interpreted k-term fold still cost k x positions expression
    # evaluations per doc (guide §4).
    hashed = (
        base.select(
            "__id",
            F.posexplode(fasthash.make_kgram_hashes_udf(k)(
                F.col("__t"))).alias("__p0", "__h"))
        .selectExpr("__id", "__p0 + 1 AS __p", "__h")
    )
    keyed = hashed.withColumn(
        "__key", F.expr(f"__h * {POS_M} + ({POS_M - 1} - __p)"))
    winged = keyed.withColumn("__mk", F.min("__key").over(
        Window.partitionBy("__id").orderBy("__p")
        .rowsBetween(-(w - 1), 0)))
    return (
        winged.filter(F.col("__p") >= w)
        .select("__id", "__mk").distinct()
        .selectExpr(
            "__id",
            f"({POS_M - 1} - __mk % {POS_M}) AS __p",
            f"__mk DIV {POS_M} AS __h",
        )
    )


def _duck_winnow_cte(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    """DuckDB CTE chain ending in ``sel(__id, __p, __h)`` — the
    mirror of ``winnow_fingerprints`` over ``documents``."""
    return f"""
base AS (
  SELECT doc_id AS id, {_NORM_DUCK} AS t FROM documents
), flt AS (
  SELECT * FROM base
  WHERE length(t) >= {k + w - 1} AND length(t) < {POS_M}
), pos AS (
  SELECT id, t, unnest(range(1, length(t) - {k} + 2)) AS p FROM flt
), hashed AS (
  SELECT id, p,
    {poly_hash_duck(f"substr(t, CAST(p AS INTEGER), {k})")} AS h
  FROM pos
), keyed AS (
  SELECT id, p, h * {POS_M} + ({POS_M - 1} - p) AS key FROM hashed
), winged AS (
  SELECT id, p,
    min(key) OVER (PARTITION BY id ORDER BY p
                   ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)
      AS mk
  FROM keyed
), sel AS (
  SELECT DISTINCT id, ({POS_M - 1} - mk % {POS_M}) AS p,
         mk // {POS_M} AS h
  FROM winged WHERE p >= {w}
)"""


def _q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = winnow_fingerprints(load(spark, sf_dir, "documents"))
    return fp.groupBy("__id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.countDistinct("__h").cast("bigint").alias("n_fingerprints"),
    ).select(F.col("__id").alias("doc_id"), "n_selected",
             "n_fingerprints")


_ORACLE_WINNOW = f"""
WITH {_duck_winnow_cte()}
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_selected,
       CAST(count(DISTINCT h) AS BIGINT) AS n_fingerprints
FROM sel GROUP BY 1
"""


def winnow_pairs(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 max_docs_per_fp: int = MAX_DOCS_PER_FP,
                 min_shared: int = MIN_SHARED,
                 top_n: int = PAIR_TOP) -> DataFrame:
    """(doc_a, doc_b, n_shared, containment): top pairs by shared
    winnowing fingerprints; ``containment = n_shared /
    min(|A|, |B|)`` over distinct fingerprint hashes. Candidates come
    only from the fingerprint equi-join; hashes present in more than
    ``max_docs_per_fp`` docs are dropped first (hot-key cap)."""
    # Materialize the fingerprint relation ONCE: it feeds four
    # consumers (sizes, hot-hash counts, both self-join sides) and
    # the explode+window fingerprint subtree dominates the cost —
    # without this the plan recomputes it 4x (measured 5.6 s -> ~2 s
    # at sf0.1). At 100 TB this is the persisted fingerprint index.
    fp = (winnow_fingerprints(df, id_col, text_col)
          .select("__id", "__h").distinct().localCheckpoint())
    sizes = fp.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    hot = fp.groupBy("__h").agg(F.count(F.lit(1)).alias("__d"))
    capped = fp.join(
        hot.filter(F.col("__d") <= max_docs_per_fp), "__h")
    pairs = (
        capped.alias("l")
        .join(capped.alias("r"),
              (F.col("l.__h") == F.col("r.__h"))
              & (F.col("l.__id") < F.col("r.__id")))
        .selectExpr("l.__id AS __a", "r.__id AS __b")
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_shared)
    )
    scored = (
        pairs
        .join(sizes.selectExpr("__id AS __a", "__sz AS __sa"), "__a")
        .join(sizes.selectExpr("__id AS __b", "__sz AS __sb"), "__b")
        .withColumn("__cont", F.expr(
            "CAST(__c AS DOUBLE) / CAST(least(__sa, __sb) AS DOUBLE)"))
    )
    return (
        scored.orderBy(F.col("__cont").desc(), F.col("__c").desc(),
                       F.col("__a").asc(), F.col("__b").asc())
        .limit(top_n)
        .select(
            F.col("__a").alias("doc_a"), F.col("__b").alias("doc_b"),
            F.col("__c").cast("bigint").alias("n_shared"),
            round_portable(F.col("__cont"), 6).alias("containment"),
        )
    )


def _q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_pairs(load(spark, sf_dir, "documents"))


_ORACLE_WINNOW_PAIRS = f"""
WITH {_duck_winnow_cte()}
, fp AS (
  SELECT DISTINCT id, h FROM sel
), sizes AS (
  SELECT id, count(*) AS sz FROM fp GROUP BY 1
), hot AS (
  SELECT h FROM fp GROUP BY h HAVING count(*) <= {MAX_DOCS_PER_FP}
), capped AS (
  SELECT fp.id, fp.h FROM fp JOIN hot ON fp.h = hot.h
), pairs AS (
  SELECT l.id AS a, r.id AS b, count(*) AS c
  FROM capped l JOIN capped r ON l.h = r.h AND l.id < r.id
  GROUP BY 1, 2 HAVING count(*) >= {MIN_SHARED}
), scored AS (
  SELECT p.a, p.b, p.c,
    CAST(p.c AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS cont
  FROM pairs p
  JOIN sizes sa ON sa.id = p.a
  JOIN sizes sb ON sb.id = p.b
)
SELECT a AS doc_a, b AS doc_b, CAST(c AS BIGINT) AS n_shared,
  {round_portable_duck("cont", 6)} AS containment
FROM scored
ORDER BY cont DESC, c DESC, a ASC, b ASC
LIMIT {PAIR_TOP}
"""


def ngram_novelty(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  n: int = NOVELTY_N) -> DataFrame:
    """(id, n_grams, n_novel, novelty): over documents ordered by
    id, the share of each doc's DISTINCT word n-grams whose first
    corpus occurrence is this doc. Early docs score ~1, late
    near-duplicates score ~0."""
    norm = _NORM_SPARK.replace("text", text_col)
    toks = (
        df.selectExpr(f"{id_col} AS __id",
                      f"split({norm}, ' ') AS __tk")
        .filter(F.expr(f"size(__tk) >= {n}"))
    )
    grams = toks.selectExpr(
        "__id",
        f"explode(transform(sequence(1, size(__tk) - {n} + 1), "
        f"i -> concat_ws(' ', slice(__tk, i, {n})))) AS __g"
    ).distinct()
    first = grams.groupBy("__g").agg(F.min("__id").alias("__first"))
    return (
        grams.join(first, "__g")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.expr(
                "CASE WHEN __first = __id THEN 1 ELSE 0 END"
            )).cast("bigint").alias("n_novel"),
        )
        .select(
            F.col("__id").alias("doc_id"), "n_grams", "n_novel",
            round_portable(F.expr(
                "CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE)"), 6
            ).alias("novelty"),
        )
    )


def _q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_novelty(load(spark, sf_dir, "documents"))


_ORACLE_NOVELTY = f"""
WITH base AS (
  SELECT doc_id AS id, string_split({_NORM_DUCK}, ' ') AS tk
  FROM documents
), flt AS (
  SELECT * FROM base WHERE len(tk) >= {NOVELTY_N}
), grams AS (
  SELECT DISTINCT id,
    array_to_string(tk[i:i + {NOVELTY_N - 1}], ' ') AS g
  FROM flt, LATERAL (
    SELECT unnest(range(1, len(tk) - {NOVELTY_N} + 2)) AS i) u
), first AS (
  SELECT g, min(id) AS f FROM grams GROUP BY 1
)
SELECT grams.id AS doc_id,
  CAST(count(*) AS BIGINT) AS n_grams,
  CAST(sum(CASE WHEN first.f = grams.id THEN 1 ELSE 0 END) AS BIGINT)
    AS n_novel,
  {round_portable_duck(
      "CAST(sum(CASE WHEN first.f = grams.id THEN 1 ELSE 0 END) "
      "AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS novelty
FROM grams JOIN first ON grams.g = first.g
GROUP BY 1
"""


QUERIES: dict = {
    "text_winnow_documents": (_q_winnow, _ORACLE_WINNOW),
    "text_winnow_pairs_documents": (
        _q_winnow_pairs, _ORACLE_WINNOW_PAIRS),
    "text_ngram_novelty_documents": (_q_novelty, _ORACLE_NOVELTY),
}

"""Incremental dedup: screen a NEW shard of documents against an
already-deduplicated corpus without re-pairing the corpus with itself.

The 100 TB operating mode for dedup is never "all-pairs over
everything each day" — it is: the corpus carries a persisted **dedup
index** (exact content hashes + MinHash signatures + shingle-hash
sets, all computed once when each doc was admitted), and every
incoming crawl shard is screened against that index plus itself:

1. ``content_hash_index`` / ``exact_dup_shard_docs`` — verbatim dups
   via an equi-join on md5(text). The shard side is hash-partitioned
   on the digest; the index side would be bucketed on the digest on
   disk at scale, so the join co-locates without shuffling the index.
2. ``build_minhash_index`` — the persistable near-dup index: one
   fused hashing pass per admitted doc (signature for banding +
   distinct shingle-hash set for exact-Jaccard verification).
3. ``incremental_neardup_pairs`` — LSH-banded candidates between
   shard and index (equi-join on (band, bucket) — linear, never
   pair-space), signature-agreement pre-filter, exact-Jaccard verify
   restricted to candidates. Identical thresholds/permutations to the
   batch path in ``operators.dedup``, so a doc admitted incrementally
   matches exactly what a full recompute would decide.

Work per shard is O(|shard| + collisions), independent of corpus
size; the index grows by appending the admitted docs' rows (no
rebuild). Hot-bucket capping (``dedup._cap_hot_buckets``) applies to
the banded join the same way as in the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from ..plans.series import ROUND_DP
from . import fasthash
from .dedup import (
    BAND_SIZE,
    DEFAULT_MAX_BUCKET_SIZE,
    EST_MIN_MATCHES,
    GATE_BUCKET_CAP,
    JACCARD_THRESHOLD,
    N_PERMS,
    PERMS,
    _band_key_expr,
    _cap_hot_buckets,
    _minhash_from_hashes_duck,
    duck_hashes_cte,
)

__all__ = [
    "build_minhash_index",
    "content_hash_index",
    "exact_dup_shard_docs",
    "incremental_neardup_pairs",
    "new_shard_docs",
]


# --------------------------------------------------------------------------
# Exact (verbatim) screening
# --------------------------------------------------------------------------


def content_hash_index(corpus: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(content_md5, doc_id) for every corpus doc — the persisted
    exact-dup index. At scale, write bucketed by content_md5 so shard
    screens are co-located joins."""
    return corpus.select(
        F.md5(F.col(text_col)).alias("content_md5"),
        F.col(id_col).alias("corpus_id"),
    )


def exact_dup_shard_docs(shard: DataFrame, index: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Shard docs whose text already exists verbatim in the corpus:
    (shard_id, corpus_id). Equi-join on the digest; min corpus_id per
    shard doc keeps the output deterministic when the corpus retains
    several verbatim copies."""
    hashed = shard.select(
        F.col(id_col).alias("shard_id"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )
    return (
        hashed.join(index, "content_md5")
        .groupBy("shard_id")
        .agg(F.min("corpus_id").alias("corpus_id"))
    )


def new_shard_docs(shard: DataFrame, index: DataFrame,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Shard rows whose content digest is NOT in the corpus index
    (left anti on the digest) — the candidates for near-dup screening
    and eventual admission."""
    return (
        shard.withColumn("content_md5", F.md5(F.col(text_col)))
        .join(index.select("content_md5"), "content_md5", "left_anti")
        .drop("content_md5")
    )


# --------------------------------------------------------------------------
# Near-dup screening against a MinHash index
# --------------------------------------------------------------------------


def build_minhash_index(corpus: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """The persistable near-dup index: (doc_id, mh_0..mh_{N-1},
    hashes array<long>) from ONE fused normalize+shingle+hash pass.

    Persist as parquet partitioned/bucketed however the screen joins
    need; appending admitted docs keeps it current — no rebuilds.
    """
    base = corpus.select(
        F.col(id_col).alias("doc_id"),
        fasthash.make_minhash_with_hashes_udf(PERMS)(
            F.col(text_col)
        ).alias("__mh"),
    )
    return base.selectExpr(
        "doc_id",
        *[f"__mh.sig[{j}] AS mh_{j}" for j in range(N_PERMS)],
        "__mh.hashes AS hashes",
    )


def _bands(sig: DataFrame, id_alias: str,
           max_bucket_size: int | None) -> DataFrame:
    band_exprs = [
        f"named_struct('band', {b}, 'key', {_band_key_expr(b)})"
        for b in range(N_PERMS // BAND_SIZE)
    ]
    out = sig.selectExpr(
        f"doc_id AS {id_alias}",
        f"explode(array({', '.join(band_exprs)})) AS bk",
    ).selectExpr(id_alias, "bk.band AS band", "bk.key AS band_key")
    if max_bucket_size is not None:
        out = _cap_hot_buckets(out, ["band", "band_key"], max_bucket_size)
    return out


def incremental_neardup_pairs(
    shard: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = JACCARD_THRESHOLD,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """(shard_id, corpus_id, jaccard) for shard docs near-duplicating
    an indexed corpus doc — same permutations, banding, 8/16
    signature pre-filter, and exact-Jaccard threshold as the batch
    path (``dedup.minhash_lsh_pairs``), so incremental admission is
    order-insensitive w.r.t. a full recompute.

    Plan: shard hashed once (fused UDF, checkpointed); band equi-join
    shard x index (shuffles on (band, key) — at scale pre-bucket the
    index on the band key); candidates distinct; pre-filter on 16 int
    equalities; explode-join hash sets of candidates only. Shard docs
    that also appear in the index under the same id are skipped.
    """
    base = shard.select(
        F.col(id_col).alias("doc_id"),
        fasthash.make_minhash_with_hashes_udf(PERMS)(
            F.col(text_col)
        ).alias("__mh"),
    ).localCheckpoint()
    s_sig = base.selectExpr(
        "doc_id",
        *[f"__mh.sig[{j}] AS mh_{j}" for j in range(N_PERMS)],
        "__mh.hashes AS hashes",
    )
    idx = index.localCheckpoint()

    cand = (
        _bands(s_sig, "shard_id", max_bucket_size)
        .join(_bands(idx, "corpus_id", max_bucket_size),
              ["band", "band_key"])
        .filter(F.col("shard_id") != F.col("corpus_id"))
        .select("shard_id", "corpus_id")
        .distinct()
    )
    matches = sum(
        F.when(F.col(f"sa.mh_{j}") == F.col(f"sb.mh_{j}"), 1).otherwise(0)
        for j in range(N_PERMS)
    )
    cand = (
        cand.join(s_sig.alias("sa"),
                  F.col("shard_id") == F.col("sa.doc_id"))
        .join(idx.alias("sb"), F.col("corpus_id") == F.col("sb.doc_id"))
        .filter(matches >= EST_MIN_MATCHES)
        .select("shard_id", "corpus_id")
    )

    # In-row array intersection over the candidate pairs (the hash
    # arrays are distinct sets) — the explode-join formulation shuffled
    # shard+index shingle rows (linear in corpus); this moves only the
    # candidate docs' arrays, like ``dedup.minhash_lsh_pairs``.
    inter = (
        cand.join(s_sig.selectExpr("doc_id AS shard_id",
                                   "hashes AS __h_a"), "shard_id")
        .join(idx.selectExpr("doc_id AS corpus_id", "hashes AS __h_b"),
              "corpus_id")
        .select(
            "shard_id", "corpus_id",
            F.expr("size(array_intersect(__h_a, __h_b))").alias("inter"),
            F.expr("size(__h_a)").alias("n_a"),
            F.expr("size(__h_b)").alias("n_b"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b")
                              - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("shard_id", "corpus_id", "jaccard")
    )


# --------------------------------------------------------------------------
# Gate queries. Shard = every 5th doc; corpus = the rest. The exact
# gate synthesizes verbatim copies (the generator seeds near-dups but
# no cross-split exact dups): every 3rd shard doc keeps corpus text
# verbatim under a shifted id, the others get a unique tail.
# --------------------------------------------------------------------------

_SHARD_PRED = "doc_id % 5 = 0"


def _q_incr_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    shard = d.filter(_SHARD_PRED)
    idx = build_minhash_index(d.filter(f"NOT ({_SHARD_PRED})"))
    out = incremental_neardup_pairs(shard, idx,
                                    max_bucket_size=GATE_BUCKET_CAP)
    return out.selectExpr(
        "shard_id", "corpus_id", f"round(jaccard, {ROUND_DP}) AS jaccard"
    )


def _q_incr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    shard = d.filter(_SHARD_PRED).selectExpr(
        "doc_id + 100000 AS doc_id",
        "CASE WHEN doc_id % 3 = 0 THEN text "
        "ELSE concat(text, ' tail ', CAST(doc_id AS STRING)) END AS text",
    )
    idx = content_hash_index(d)
    dups = exact_dup_shard_docs(shard, idx)
    fresh = new_shard_docs(shard, idx).select(
        F.col("doc_id").alias("shard_id"),
        F.lit(None).cast("long").alias("corpus_id"),
    )
    return dups.unionByName(fresh)


_DUCK_SIG_FROM_HASHES = ", ".join(_minhash_from_hashes_duck())


def _duck_band_key(band: int) -> str:
    cols = [f"mh_{band * BAND_SIZE + i}" for i in range(BAND_SIZE)]
    return f"concat_ws('-', {', '.join(cols)})"


_ORACLE_INCR_NEARDUP = f"""
WITH hashed AS ({duck_hashes_cte('documents')}
), sig AS (
  SELECT doc_id, {_DUCK_SIG_FROM_HASHES} FROM hashed
), bands AS (
  {' UNION ALL '.join(
      f"SELECT doc_id, {b} AS band, {_duck_band_key(b)} AS band_key FROM sig"
      for b in range(N_PERMS // BAND_SIZE)
  )}
), cand0 AS (
  SELECT DISTINCT a.doc_id AS shard_id, b.doc_id AS corpus_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0
), cand AS (
  SELECT c.shard_id, c.corpus_id
  FROM cand0 c
  JOIN sig sa ON sa.doc_id = c.shard_id
  JOIN sig sb ON sb.doc_id = c.corpus_id
  WHERE {' + '.join(
      f"CASE WHEN sa.mh_{j} = sb.mh_{j} THEN 1 ELSE 0 END"
      for j in range(N_PERMS)
  )} >= {EST_MIN_MATCHES}
), sh AS (
  SELECT doc_id, unnest(list_distinct(__hashes)) AS h FROM hashed
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), inter AS (
  SELECT c.shard_id, c.corpus_id, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.shard_id
  JOIN sh b ON b.doc_id = c.corpus_id AND b.h = a.h
  GROUP BY 1, 2
)
SELECT i.shard_id, i.corpus_id,
       round(i.inter / (sa.n + sb.n - i.inter), {ROUND_DP}) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.shard_id
JOIN sizes sb ON sb.doc_id = i.corpus_id
WHERE i.inter / (sa.n + sb.n - i.inter) >= {JACCARD_THRESHOLD}
"""

_ORACLE_INCR_EXACT = """
WITH shard AS (
  SELECT doc_id + 100000 AS doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text
              ELSE concat(text, ' tail ', CAST(doc_id AS VARCHAR)) END
           AS text
  FROM documents WHERE doc_id % 5 = 0
), idx AS (
  SELECT md5(text) AS content_md5, doc_id AS corpus_id FROM documents
), hashed AS (
  SELECT doc_id AS shard_id, md5(text) AS content_md5 FROM shard
)
SELECT h.shard_id, min(i.corpus_id) AS corpus_id
FROM hashed h JOIN idx i USING (content_md5)
GROUP BY h.shard_id
UNION ALL
SELECT h.shard_id, CAST(NULL AS BIGINT) AS corpus_id
FROM hashed h
WHERE h.content_md5 NOT IN (SELECT content_md5 FROM idx)
"""

QUERIES: dict = {
    "dedup_incremental_neardup_documents": (
        _q_incr_neardup, _ORACLE_INCR_NEARDUP),
    "dedup_incremental_exact_documents": (
        _q_incr_exact, _ORACLE_INCR_EXACT),
}

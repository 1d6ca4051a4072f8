"""Near-dup detector agreement audit: MinHash-LSH (char-shingle
Jaccard) vs SimHash (token Hamming) over the same corpus — which
pairs do the two blocking families agree on, and how much of the
pair space does each prune? The tuning dashboard for choosing
thresholds before a 100-TB dedup run, without ever computing the
quadratic exact ground truth (the known trap: the ungated shingle
self-join is ~360M rows at sf0.1 — SCALING.md "Dedup").

Both pair generators are the gated bucketed paths (band equi-joins,
hot-bucket caps, lossless SimHash bit-banding); the agreement join
is pair-keyed. ``reduction_ratio = 1 - pairs / (n choose 2)`` —
how much of the all-pairs space the detector refuses to touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .dedup import GATE_BUCKET_CAP, minhash_lsh_pairs, simhash_pairs

__all__ = ["detector_agreement"]


def detector_agreement(docs: DataFrame) -> DataFrame:
    """One row (n_docs, n_lsh, n_simhash, n_both, pair_jaccard,
    lsh_in_simhash, simhash_in_lsh, rr_lsh, rr_simhash)."""
    lsh = minhash_lsh_pairs(
        docs, max_bucket_size=GATE_BUCKET_CAP
    ).select("id_a", "id_b").withColumn("__l", F.lit(1))
    sim = simhash_pairs(docs).select("id_a", "id_b").withColumn(
        "__s", F.lit(1))
    both = lsh.join(sim, ["id_a", "id_b"], "full_outer")
    counts = both.agg(
        F.sum(F.expr("CASE WHEN __l = 1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_lsh"),
        F.sum(F.expr("CASE WHEN __s = 1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_simhash"),
        F.sum(F.expr(
            "CASE WHEN __l = 1 AND __s = 1 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_both"),
    )
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    allp = ("(CAST(n_docs AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE) "
            "/ 2.0)")
    return (
        counts.crossJoin(F.broadcast(nd))
        .select(
            "n_docs", "n_lsh", "n_simhash", "n_both",
            round_portable(F.expr(
                "CASE WHEN n_lsh + n_simhash - n_both > 0 THEN "
                "CAST(n_both AS DOUBLE) "
                "/ CAST(n_lsh + n_simhash - n_both AS DOUBLE) END"), 6
            ).alias("pair_jaccard"),
            round_portable(F.expr(
                "CASE WHEN n_lsh > 0 THEN CAST(n_both AS DOUBLE) "
                "/ CAST(n_lsh AS DOUBLE) END"), 6
            ).alias("lsh_in_simhash"),
            round_portable(F.expr(
                "CASE WHEN n_simhash > 0 THEN CAST(n_both AS DOUBLE) "
                "/ CAST(n_simhash AS DOUBLE) END"), 6
            ).alias("simhash_in_lsh"),
            round_portable(F.expr(
                f"1.0 - CAST(n_lsh AS DOUBLE) / {allp}"), 6
            ).alias("rr_lsh"),
            round_portable(F.expr(
                f"1.0 - CAST(n_simhash AS DOUBLE) / {allp}"), 6
            ).alias("rr_simhash"),
        )
    )


def _q_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    return detector_agreement(load(spark, sf_dir, "documents"))


def _oracle() -> str:
    from .dedup import (HAMMING_THRESHOLD, _DUCK_TOKEN_HASHES_CTE,
                        _simhash_from_hashes_duck, duck_lsh_pairs_ctes)
    return f"""
WITH {duck_lsh_pairs_ctes()}, shashed AS (
  {_DUCK_TOKEN_HASHES_CTE}
), sfp AS (
  SELECT doc_id, {_simhash_from_hashes_duck()} AS simhash
  FROM shashed
), simpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sfp a JOIN sfp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_THRESHOLD}
), joined AS (
  SELECT COALESCE(l.id_a, s.id_a) AS id_a,
         COALESCE(l.id_b, s.id_b) AS id_b,
         CASE WHEN l.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_l,
         CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_s
  FROM lshpairs l FULL OUTER JOIN simpairs s
    ON l.id_a = s.id_a AND l.id_b = s.id_b
), counts AS (
  SELECT CAST(sum(is_l) AS BIGINT) AS n_lsh,
         CAST(sum(is_s) AS BIGINT) AS n_simhash,
         CAST(sum(is_l * is_s) AS BIGINT) AS n_both
  FROM joined
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
)
SELECT n_docs, n_lsh, n_simhash, n_both,
  {round_portable_duck(
      "CASE WHEN n_lsh + n_simhash - n_both > 0 THEN "
      "CAST(n_both AS DOUBLE) "
      "/ CAST(n_lsh + n_simhash - n_both AS DOUBLE) END", 6)}
    AS pair_jaccard,
  {round_portable_duck(
      "CASE WHEN n_lsh > 0 THEN CAST(n_both AS DOUBLE) "
      "/ CAST(n_lsh AS DOUBLE) END", 6)} AS lsh_in_simhash,
  {round_portable_duck(
      "CASE WHEN n_simhash > 0 THEN CAST(n_both AS DOUBLE) "
      "/ CAST(n_simhash AS DOUBLE) END", 6)} AS simhash_in_lsh,
  {round_portable_duck(
      "1.0 - CAST(n_lsh AS DOUBLE) / (CAST(n_docs AS DOUBLE) "
      "* CAST(n_docs - 1 AS DOUBLE) / 2.0)", 6)} AS rr_lsh,
  {round_portable_duck(
      "1.0 - CAST(n_simhash AS DOUBLE) / (CAST(n_docs AS DOUBLE) "
      "* CAST(n_docs - 1 AS DOUBLE) / 2.0)", 6)} AS rr_simhash
FROM counts, nd
"""


QUERIES: dict = {
    "dedup_detector_agreement_documents": (_q_agreement, _oracle()),
}

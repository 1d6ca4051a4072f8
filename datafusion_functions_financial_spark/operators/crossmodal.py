"""Cross-modal near-dup verification: embedding-space candidates,
text-space confirmation.

Semantic (embedding-cosine) near-dup detection recalls paraphrases
that shingle methods miss, but embeddings also collide on merely
TOPICAL pairs; a curation pipeline therefore scores every semantic
candidate pair against the lexical evidence before acting on it. This
operator joins the two spaces:

1. candidates: ``similarity.embedding_neardup_pairs`` — banded SRP
   LSH over the vectors, verified in-bucket (no pair-space shuffle);
2. confirmation: exact shingle-hash Jaccard over the paired DOCUMENT
   texts, computed in-row on the per-doc distinct hash-set arrays
   (the ``dedup`` late-r04 idiom — only candidate docs' arrays move).

Output: (id_a, id_b, cos_sim, jaccard) — downstream policy splits
"same text" (high jaccard: dedup it) from "same meaning, different
words" (low jaccard: keep one for diversity or both for paraphrase
training pairs).

Scale: inherits both parents' shapes — one banded shuffle of the
vectors, one hash pass over the corpus, candidate-bounded verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP, round_portable, round_portable_duck
from ..sources.tables import load
from . import dedup, fasthash, similarity

__all__ = ["semantic_neardup_verified"]


def semantic_neardup_verified(
    docs: DataFrame,
    vectors: DataFrame,
    cos_threshold: float = similarity.NEARDUP_COS,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = dedup.DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """(id_a, id_b, cos_sim, jaccard) for embedding near-dup pairs,
    with exact text-shingle Jaccard appended (vec ids must equal doc
    ids — document embeddings)."""
    pairs = similarity.embedding_neardup_pairs(
        vectors, cos_threshold, vec_id_col, vec_col,
        max_bucket_size=max_bucket_size)
    harr = docs.select(
        F.col(doc_id_col).alias("__did"),
        fasthash.shingle_hashes_udf(F.col(text_col)).alias("__h"),
    )
    joined = (
        pairs
        .join(harr.selectExpr("__did AS id_a", "__h AS __h_a"), "id_a")
        .join(harr.selectExpr("__did AS id_b", "__h AS __h_b"), "id_b")
    )
    jac = (
        F.expr("size(array_intersect(__h_a, __h_b))")
        / (F.expr("size(__h_a)") + F.expr("size(__h_b)")
           - F.expr("size(array_intersect(__h_a, __h_b))"))
    )
    return joined.select(
        "id_a", "id_b", "cos_sim",
        round_portable(jac).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Gate query (R05 queue)
# ---------------------------------------------------------------------------


def _q_semantic_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    out = semantic_neardup_verified(
        docs, emb, max_bucket_size=dedup.GATE_BUCKET_CAP)
    return out.selectExpr(
        "id_a", "id_b",
        f"round(cos_sim, {ROUND_DP}) AS cos_sim", "jaccard")


_ORACLE_SEMANTIC = f"""
WITH sem AS (
  {similarity._ORACLE_NEARDUP}
), hashed AS (
  {dedup.duck_hashes_cte()}
)
SELECT s.id_a, s.id_b, round(s.cos_sim, {ROUND_DP}) AS cos_sim,
  {round_portable_duck(
      "CAST(len(list_intersect(ha.__hashes, hb.__hashes)) AS DOUBLE)"
      " / CAST(len(ha.__hashes) + len(hb.__hashes)"
      " - len(list_intersect(ha.__hashes, hb.__hashes)) AS DOUBLE)"
  )} AS jaccard
FROM sem s
JOIN hashed ha ON ha.doc_id = s.id_a
JOIN hashed hb ON hb.doc_id = s.id_b
"""


QUERIES: dict = {
    "semantic_neardup_verified": (_q_semantic_verified, _ORACLE_SEMANTIC),
}

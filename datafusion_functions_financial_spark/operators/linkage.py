"""Fuzzy record linkage (entity resolution): block, then verify by
character-trigram Jaccard.

The registry-reconciliation task every data platform eventually runs:
two entity tables whose join key is a NAME that typos/truncations have
mangled. Same architecture as the document near-dup path scaled down
to short strings:

1. **Trigram sets**: each name folds to its distinct character-trigram
   hash set — the hash is the closed-form 3-char polynomial
   ``c1*961 + c2*31 + c3`` (exact integers < 2^21, identical SQL on
   both engines; the 31-base matches ``text.poly_hash``).
2. **Blocking** on the MINIMUM trigram hash — a 1-permutation MinHash
   band: names sharing their rarest-hashing trigram collide, local
   edits that don't touch the min-trigram don't move the block. This
   is the recall/cost dial: production linkage stacks B independent
   permutations exactly like ``dedup.minhash_lsh_candidates`` — one
   band here keeps the gate query's pair space visible end to end.
3. **Verify**: in-row ``array_intersect`` Jaccard over the candidate
   pairs (the ``dedup`` late-r04 idiom — shuffle volume scales with
   candidates, not names).

Determinism: hashes, set sizes, and intersections are exact integers;
only the final Jaccard ratio is a double (rounded portably).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import ROUND_DP, round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["trigram_sets", "link_records"]

LINK_THRESHOLD = 0.55


def _trigrams_sql(name_expr: str, spark: bool) -> str:
    """Distinct trigram-hash array of ``lower(name)`` (names shorter
    than 3 chars hash their padded prefix once)."""
    s = f"lower({name_expr})"
    ch = "ascii" if spark else "unicode"
    sub = "substring" if spark else "substr"
    tri = (f"{ch}({sub}({s}, i, 1)) * 961 "
           f"+ {ch}({sub}({s}, i + 1, 1)) * 31 "
           f"+ {ch}({sub}({s}, i + 2, 1))")
    if spark:
        seq = f"sequence(1, greatest(length({s}) - 2, 1))"
        return (f"array_distinct(transform({seq}, i -> {tri}))")
    seq = f"range(1, greatest(len({s}) - 2, 1) + 1)"
    return (f"list_distinct(list_transform({seq}, i -> {tri}))")


DEFAULT_MAX_BLOCK_SIZE = 1000


def trigram_sets(df: DataFrame, id_col: str, name_col: str,
                 block_expr: str | None = None) -> DataFrame:
    """(id, name, grams, block): trigram-hash set plus the block key
    (default: min trigram hash; pass ``block_expr`` — any SQL over the
    SOURCE columns plus ``grams`` — when the name distribution defeats
    min-trigram blocking, e.g. registries of near-identical prefixed
    names where a shared prefix trigram wins the min for every row)."""
    blk = block_expr or "array_min(grams)"
    base = df.selectExpr(
        "*", f"{_trigrams_sql(name_col, True)} AS grams")
    return base.selectExpr(
        f"{id_col} AS id", f"{name_col} AS name", "grams",
        f"{blk} AS block")


def _cap_blocks(sides, max_block_size: int):
    """Drop over-cap blocks from BOTH sides (broadcast anti, like
    ``dedup._cap_hot_buckets``): a degenerate block of B_a x B_b pairs
    is the quadratic blow-up at scale; production linkage stacks more
    bands instead of probing a mega-block."""
    ga, gb = sides
    counts = (
        ga.select("block").unionByName(gb.select("block"))
        .groupBy("block").agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_block_size)
        .select("block")
    )
    return (ga.join(F.broadcast(counts), "block", "left_anti"),
            gb.join(F.broadcast(counts), "block", "left_anti"))


def link_records(a: DataFrame, b: DataFrame, id_col: str,
                 name_col: str,
                 threshold: float = LINK_THRESHOLD,
                 block_expr: str | None = None,
                 max_block_size: int | None = DEFAULT_MAX_BLOCK_SIZE,
                 ) -> DataFrame:
    """(id_a, id_b, jaccard) candidate links between two entity tables
    (a x b within blocks, trigram Jaccard >= threshold). Blocks larger
    than ``max_block_size`` are excluded (None opts out)."""
    ga = trigram_sets(a, id_col, name_col, block_expr).selectExpr(
        "id AS id_a", "grams AS g_a", "block")
    gb = trigram_sets(b, id_col, name_col, block_expr).selectExpr(
        "id AS id_b", "grams AS g_b", "block")
    if max_block_size is not None:
        ga, gb = _cap_blocks((ga, gb), max_block_size)
    pairs = ga.join(gb, "block").select(
        "id_a", "id_b",
        F.expr("size(array_intersect(g_a, g_b))").alias("inter"),
        F.expr("size(g_a)").alias("n_a"),
        F.expr("size(g_b)").alias("n_b"),
    )
    jac = (F.col("inter")
           / (F.col("n_a") + F.col("n_b") - F.col("inter")))
    return (
        pairs.withColumn("jaccard", round_portable(jac))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Gate query (R05 queue): link the customer registry against a
# deterministically-mangled copy of itself (every 2nd name loses its
# 4th character, every 3rd swaps case — both engines build the same
# dirty table), then count how many dirty rows link back to their own
# clean row vs elsewhere. The synthetic names share a long constant
# prefix, which defeats min-trigram blocking (every row's min is a
# prefix trigram — ONE quadratic block), so the gate blocks on the
# distinguishing 4-char suffix; the mangles never touch it.
# ---------------------------------------------------------------------------

_GATE_BLOCK = ("substring(lower(c_name), "
               "greatest(length(c_name) - 3, 1), 4)")


def _dirty_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    mangled = (
        "CASE WHEN c_custkey % 2 = 0 THEN "
        "concat(substring(c_name, 1, 3), substring(c_name, 5)) "
        "WHEN c_custkey % 3 = 0 THEN upper(c_name) "
        "ELSE c_name END"
    )
    return c.selectExpr("c_custkey", f"{mangled} AS c_name")


def _q_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    clean = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    dirty = _dirty_names(spark, sf_dir)
    links = link_records(clean, dirty, "c_custkey", "c_name",
                         block_expr=_GATE_BLOCK)
    # sum of 4dp-rounded jaccards as an exact integer (a float avg
    # would be partial-agg-order dependent — the SCALING.md rule)
    return links.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_links"),
        F.sum(F.expr("CAST(id_a = id_b AS BIGINT)")).cast("bigint")
        .alias("n_self"),
        F.sum(F.expr("CAST(round(jaccard * 10000) AS BIGINT)"))
        .cast("bigint").alias("sum_jaccard_q"),
    )


_DIRTY_DUCK = (
    "CASE WHEN c_custkey % 2 = 0 THEN "
    "concat(substr(c_name, 1, 3), substr(c_name, 5)) "
    "WHEN c_custkey % 3 = 0 THEN upper(c_name) "
    "ELSE c_name END"
)

_ORACLE_LINK = f"""
WITH clean AS (
  SELECT c_custkey AS id, c_name AS name,
         {_trigrams_sql('c_name', False)} AS grams
  FROM customer
), dirty_src AS (
  SELECT c_custkey, {_DIRTY_DUCK} AS c_name FROM customer
), dirty AS (
  SELECT c_custkey AS id, c_name AS name,
         {_trigrams_sql('c_name', False)} AS grams
  FROM dirty_src
), ga AS (
  SELECT id AS id_a, grams AS g_a,
         substr(lower(name), greatest(len(name) - 3, 1), 4) AS block
  FROM clean
), gb AS (
  SELECT id AS id_b, grams AS g_b,
         substr(lower(name), greatest(len(name) - 3, 1), 4) AS block
  FROM dirty
), pairs AS (
  SELECT id_a, id_b,
         len(list_intersect(g_a, g_b)) AS inter,
         len(g_a) AS n_a, len(g_b) AS n_b
  FROM ga JOIN gb USING (block)
), links AS (
  SELECT id_a, id_b,
         {round_portable_duck(
             "CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE)"
         )} AS jaccard
  FROM pairs
)
SELECT CAST(count(*) AS BIGINT) AS n_links,
       CAST(sum(CAST(id_a = id_b AS BIGINT)) AS BIGINT) AS n_self,
       CAST(sum(CAST(round(jaccard * 10000) AS BIGINT)) AS BIGINT)
         AS sum_jaccard_q
FROM links WHERE jaccard >= {LINK_THRESHOLD!r}
"""


QUERIES: dict = {
    "link_customers_fuzzy": (_q_link, _ORACLE_LINK),
}

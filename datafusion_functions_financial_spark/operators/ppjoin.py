"""Exact threshold set-similarity join via prefix filtering (the
PPJoin family's core pruning rule, Xiao et al., WWW'08 — prefix
filter only, no positional/suffix refinements).

Complements the approximate dedup tiers: MinHash-LSH finds MOST
pairs above a threshold (probabilistic), SimHash finds near-hamming
fingerprints; this operator returns EXACTLY the pairs with
``jaccard(shingles(a), shingles(b)) >= t`` — no false negatives, no
verification sampling — while never materializing the all-pairs
grid.

The pruning rule: order every document's shingle set by the GLOBAL
(df ASC, token ASC) rarity order and keep only its first
``m - ceil(t*m) + 1`` tokens (the "prefix"). Two sets with Jaccard
>= t must overlap in >= ceil(t*max(m_a, m_b)) tokens, and a standard
pigeonhole argument shows their prefixes must share at least one
token — so the candidate set is the equi-join of PREFIXES on the
token, and exact Jaccard is evaluated only for candidates.

Engine-exactness: everything until the final output is integer
arithmetic — prefix lengths use ``(N*m + D - 1) DIV D`` for
``ceil(N*m/D)`` (never float ceil: ``0.6*5`` is not 3.0 in
binary), the threshold test is the cross-multiplication
``(D+N)*inter >= N*(m_a+m_b)``, and the Jaccard value is one
division of exact BIGINTs, portably rounded.

Plan shape at 100 TB: token df is one map-side-combinable aggregate;
the per-doc prefix selection is a doc-partitioned window (doc-sized
state); candidates are an equi-join of the SMALL prefix relations
(~(1-t) of token mass, biased toward the rarest tokens — rare-first
ordering is what makes the hot-token problem self-limiting);
intersection counting joins candidates back to the two token sets by
doc key. For adversarial corpora where even prefixes share hot
tokens, run MinHash-LSH first and this join on the survivors.
MEASURED (r13 ``dedup_scale``): on 50K-vocab zipf text the prefix
filter's candidate count fits exponent ~2.0 in corpus size (zipf head
tokens land in prefixes), reaching the 25M-pair audit budget at ~9.5K
docs — the quantified form of the routing rule above: this tier is
for SMALL-to-medium exact-threshold joins (decontamination against a
bounded benchmark set), not open-web-scale dedup.

Completeness is the CONTRACT (no hot-bucket caps here — a cap would
reintroduce false negatives); it is proven against the naive
all-pairs ground truth in ``tests/test_ppjoin.py`` and the oracle
mirrors the construction term-for-term.

Honesty note on THIS corpus: the synthetic documents draw from a
~31-word vocabulary, so even the rarest shingles are shared by ~6%
of documents and the prefix filter prunes poorly (candidate_share
~0.86 at 500 docs — the `dedup_ppjoin_stats` gate query measures it
rather than hiding it). That is precisely the adversarial case the
paragraph above routes to LSH-first; on natural-text corpora the
rare-token prefix is what makes this join practical — measured
candidate_share 0.046 on a zipf-sampled 5000-word corpus with
completeness intact (``tests/test_ppjoin.py::
test_ppjoin_prunes_on_zipfian_vocabulary``). The GATE
queries therefore run on the deterministic ``doc_id % GATE_MOD = 0``
subsample so the mirrored all-candidate oracle stays tractable at
sf0.1; the completeness pytest runs the operator on the FULL corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from . import fasthash
from .dedup import _shingles_duck

__all__ = ["ppjoin_pairs", "ppjoin_candidate_stats",
           "ppjoin_candidate_count"]

# Jaccard threshold t = T_NUM / T_DEN (exact rational).
T_NUM, T_DEN = 3, 5
# Gate-query subsample (see the honesty note in the module docstring).
GATE_MOD = 4


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, w): each document's DISTINCT shingle set, exploded.

    Shingling runs through the vectorized Arrow UDF
    (``fasthash.shingles_udf``) rather than the Catalyst
    transform/substring lambda: higher-order-function lambdas are
    interpreted per element (guide §4 — this pass alone measured
    2.5 s for 5K docs / 1.2M shingles at r13), and the UDF's
    normalize+shingle is the same construction the oracle-gated
    ngram-Jaccard query already runs bit-identically."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(fasthash.shingles_udf(F.col(text_col))).alias("w"))


def _sized_tokens(docs: DataFrame, id_col: str,
                  text_col: str) -> DataFrame:
    """(doc_id, m, w): exploded distinct shingles with the per-doc
    distinct count ``m`` carried from the pre-explode array size —
    the count is known before the explode, so computing it with a
    window over the exploded relation (the r12 shape) paid an
    exchange + full sort for a value ``size()`` gives for free."""
    arr = docs.select(
        F.col(id_col).alias("doc_id"),
        fasthash.shingles_udf(F.col(text_col)).alias("__arr"))
    return arr.select(
        "doc_id",
        F.size("__arr").cast("bigint").alias("m"),
        F.explode("__arr").alias("w"))


def _prefixes(docs: DataFrame, id_col: str, text_col: str,
              t_num: int, t_den: int) -> DataFrame:
    """(doc_id, w, m): the prefix-filter tokens per document — the
    first ``m - ceil(t*m) + 1`` of its tokens in the global
    (df ASC, w ASC) rarity order."""
    tok = _sized_tokens(docs, id_col, text_col)
    df_rel = tok.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("__df"))
    sized = tok.join(df_rel, "w")
    pos = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("__df", "w")).cast("bigint")
    return (
        sized.withColumn("__pos", pos)
        .filter(F.expr(
            f"__pos <= m - (({t_num} * m + {t_den} - 1) DIV {t_den}) + 1"
        ))
        .select("doc_id", "w", "m")
    )


def _scored_candidates(docs: DataFrame, id_col: str, text_col: str,
                       t_num: int, t_den: int) -> DataFrame:
    """(id_a, id_b, m_a, m_b, inter): exact intersection sizes for
    every prefix-sharing candidate pair."""
    tok = _tokens(docs, id_col, text_col)
    pref = _prefixes(docs, id_col, text_col, t_num, t_den)
    cand = (
        pref.selectExpr("doc_id AS id_a", "w", "m AS m_a")
        .join(pref.selectExpr("doc_id AS id_b", "w", "m AS m_b"), "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "m_a", "m_b")
        .distinct()
    )
    ta = tok.selectExpr("doc_id AS id_a", "w")
    tb = tok.selectExpr("doc_id AS id_b", "w")
    return (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "w"])
        .groupBy("id_a", "id_b", "m_a", "m_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )


def ppjoin_pairs(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 t_num: int = T_NUM, t_den: int = T_DEN) -> DataFrame:
    """(id_a, id_b, inter, union_sz, jaccard): EXACTLY the pairs with
    shingle-set Jaccard >= t_num/t_den."""
    scored = _scored_candidates(docs, id_col, text_col, t_num, t_den)
    return (
        scored
        .filter(F.expr(
            f"({t_den} + {t_num}) * inter >= {t_num} * (m_a + m_b)"))
        .select(
            "id_a", "id_b", "inter",
            F.expr("m_a + m_b - inter").alias("union_sz"),
            round_portable(F.expr(
                "CAST(inter AS DOUBLE) "
                "/ CAST(m_a + m_b - inter AS DOUBLE)"), 6
            ).alias("jaccard"),
        )
    )


def ppjoin_candidate_count(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           t_num: int = T_NUM,
                           t_den: int = T_DEN) -> DataFrame:
    """One row (n_candidates): the prefix-filter candidate-pair count
    WITHOUT the exact intersection join.

    :func:`ppjoin_candidate_stats` scores every candidate (the
    token-set join) before counting — right for a correctness gate,
    but a scale audit only needs the blocking stage's output size,
    and scoring costs ~linear in candidates (~1M candidates/minute
    measured). This is the prefix equi-join + distinct alone, so
    candidate growth can be measured at sizes where scoring would be
    the bottleneck (bench.py ``dedup_scale``)."""
    pref = _prefixes(docs, id_col, text_col, t_num, t_den)
    return (
        pref.selectExpr("doc_id AS id_a", "w")
        .join(pref.selectExpr("doc_id AS id_b", "w"), "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    )


def ppjoin_candidate_stats(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           t_num: int = T_NUM,
                           t_den: int = T_DEN) -> DataFrame:
    """One row (n_docs, n_candidates, n_pairs, candidate_share): the
    honesty meter for the prefix filter — what fraction of the
    all-pairs grid was actually scored."""
    spark = docs.sparkSession
    scored = _scored_candidates(docs, id_col, text_col, t_num, t_den)
    scored = scored.localCheckpoint()
    n_docs = docs.select(F.col(id_col)).distinct().count()
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.coalesce(F.sum(F.expr(
            f"CASE WHEN ({t_den} + {t_num}) * inter "
            f">= {t_num} * (m_a + m_b) THEN 1 ELSE 0 END"
        )), F.lit(0)).cast("bigint").alias("n_pairs"),
    )
    total = n_docs * (n_docs - 1) // 2
    return agg.select(
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        "n_candidates", "n_pairs",
        round_portable(F.expr(
            f"CAST(n_candidates AS DOUBLE) / CAST({total} AS DOUBLE)"),
            6).alias("candidate_share"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles
# --------------------------------------------------------------------------


def _gate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % GATE_MOD == 0)


def _q_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ppjoin_pairs(_gate_docs(spark, sf_dir))


def _q_ppjoin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ppjoin_candidate_stats(_gate_docs(spark, sf_dir))


def _duck_scored(t_num: int, t_den: int) -> str:
    """Shared CTE chain mirroring _scored_candidates term-for-term."""
    return f"""docs AS (
  SELECT * FROM documents WHERE doc_id % {GATE_MOD} = 0
), tok AS (
  SELECT doc_id, unnest({_shingles_duck('text')}) AS w FROM docs
), dfr AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1
), sized AS (
  SELECT t.doc_id, t.w, d.df,
    CAST(count(*) OVER (PARTITION BY t.doc_id) AS BIGINT) AS m
  FROM tok t JOIN dfr d ON t.w = d.w
), pref AS (
  SELECT doc_id, w, m FROM (
    SELECT doc_id, w, m,
      CAST(row_number() OVER (PARTITION BY doc_id ORDER BY df, w)
        AS BIGINT) AS pos
    FROM sized
  ) WHERE pos <= m - (({t_num} * m + {t_den} - 1) // {t_den}) + 1
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
    a.m AS m_a, b.m AS m_b
  FROM pref a JOIN pref b ON a.w = b.w AND a.doc_id < b.doc_id
), scored AS (
  SELECT c.id_a, c.id_b, c.m_a, c.m_b,
    CAST(count(*) AS BIGINT) AS inter
  FROM cand c
  JOIN tok ta ON ta.doc_id = c.id_a
  JOIN tok tb ON tb.doc_id = c.id_b AND tb.w = ta.w
  GROUP BY 1, 2, 3, 4
)"""


_ORACLE_PPJOIN_PAIRS = f"""
WITH {_duck_scored(T_NUM, T_DEN)}
SELECT id_a, id_b, inter,
  CAST(m_a + m_b - inter AS BIGINT) AS union_sz,
  {round_portable_duck(
      "CAST(inter AS DOUBLE) / CAST(m_a + m_b - inter AS DOUBLE)", 6)}
    AS jaccard
FROM scored
WHERE ({T_DEN} + {T_NUM}) * inter >= {T_NUM} * (m_a + m_b)
"""

_ORACLE_PPJOIN_STATS = f"""
WITH {_duck_scored(T_NUM, T_DEN)}, nd AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM docs
), agg AS (
  -- global agg FIRST (always exactly 1 row, even on a degenerate
  -- corpus with zero candidates — the Spark side's .agg() likewise),
  -- then the 1x1 cross join to nd
  SELECT CAST(count(*) AS BIGINT) AS n_candidates,
    CAST(coalesce(sum(CASE WHEN ({T_DEN} + {T_NUM}) * inter
      >= {T_NUM} * (m_a + m_b) THEN 1 ELSE 0 END), 0) AS BIGINT)
      AS n_pairs
  FROM scored
)
SELECT nd.n_docs, agg.n_candidates, agg.n_pairs,
  {round_portable_duck(
      "CAST(agg.n_candidates AS DOUBLE) "
      "/ CAST(nd.n_docs * (nd.n_docs - 1) // 2 AS DOUBLE)", 6)}
    AS candidate_share
FROM agg, nd
"""


QUERIES: dict = {
    "dedup_ppjoin_pairs_documents": (_q_ppjoin_pairs,
                                     _ORACLE_PPJOIN_PAIRS),
    "dedup_ppjoin_stats_documents": (_q_ppjoin_stats,
                                     _ORACLE_PPJOIN_STATS),
}

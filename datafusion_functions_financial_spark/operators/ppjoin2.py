"""Cross-corpus (R x S) exact threshold set-similarity join — the
probe-vs-corpus variant of ``ppjoin.py`` (prefix filtering, Xiao et
al., WWW'08), completing the exact tier for contamination / linkage
workloads (VERDICT r09 item 5): ``decontam.py`` covers benchmark
n-gram SEMI-joins (is this doc contaminated at all?) and
``incremental.py`` covers shard-vs-corpus MinHash (approximate); this
operator returns EXACTLY the (probe, corpus) pairs with
``jaccard(shingles(r), shingles(s)) >= t`` — no false negatives —
without materializing the |R| x |S| grid.

The pruning rule is the self-join's, applied across two relations:
order every document's shingle set by ONE global rarity order — the
CORPUS document frequency, ``(df_S ASC, token ASC)``, probe-only
tokens taking ``df_S = 0`` so they sort first (rarest) — and keep
each side's first ``m - ceil(t*m) + 1`` tokens. Any (r, s) with
Jaccard >= t overlaps in >= ceil(t * max(m_r, m_s)) tokens, and the
pigeonhole argument holds verbatim for two relations UNDER THE SAME
TOTAL ORDER: the candidate set is the equi-join of the two prefix
relations on the token.

Engine-exactness: prefix lengths via ``(N*m + D - 1) DIV D``
integer-ceil, threshold as the cross-multiplication
``(D+N)*inter >= N*(m_r + m_s)``, Jaccard as one division of exact
BIGINTs, portably rounded — the ppjoin.py conventions.

Plan shape at 100 TB: corpus df is one map-side-combinable aggregate;
each side's prefix selection is a doc-partitioned window (doc-sized
state); candidates are an equi-join of two SMALL prefix relations
(rare-first ordering self-limits hot tokens); intersection counting
joins candidates back to the two token relations by doc key. The
probe side is typically a shard orders of magnitude smaller than the
corpus — the candidate relation scales with |R|, not |R| x |S|.
Completeness is the CONTRACT (no hot-bucket caps); proven against the
all-pairs ground truth on both a zipfian and the adversarial corpus
in ``tests/test_ppjoin2.py``.

Reference anchor: beyond-reference pipeline operator (SURVEY.md
extension scope); the reference has no similarity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from . import fasthash
from .dedup import _shingles_duck
from .ppjoin import T_DEN, T_NUM

__all__ = ["ppjoin_rs_pairs", "ppjoin_rs_candidate_stats"]

# Gate-query split: corpus = doc_id % GATE_MOD == 0 (the self-join
# gate's subsample), probe = doc_id % GATE_MOD == 1 — disjoint id
# spaces, near-dup structure crossing them (the synthetic corpus
# scatters template reuse over ids). Subsampled for the same honesty
# reason as ppjoin.py: this 31-word vocabulary is the documented
# adversarial case, so the mirrored all-candidate oracle must stay
# tractable at sf0.1.
GATE_MOD = 4


def _tok(docs: DataFrame, id_col: str, text_col: str,
         out_id: str) -> DataFrame:
    # Vectorized Arrow shingling (same construction, bit-identical
    # sets) instead of the interpreted Catalyst lambda — see
    # ppjoin._tokens for the r13 measurement.
    return docs.select(
        F.col(id_col).alias(out_id),
        F.explode(fasthash.shingles_udf(F.col(text_col))).alias("w"))


def _sized_tok(docs: DataFrame, id_col: str, text_col: str,
               out_id: str) -> DataFrame:
    """(id, m, w): exploded distinct shingles with the per-doc count
    ``m`` taken from the pre-explode array size (no window)."""
    arr = docs.select(
        F.col(id_col).alias(out_id),
        fasthash.shingles_udf(F.col(text_col)).alias("__arr"))
    return arr.select(
        out_id,
        F.size("__arr").cast("bigint").alias("m"),
        F.explode("__arr").alias("w"))


def _prefix(tok: DataFrame, id_col: str, df_rel: DataFrame,
            t_num: int, t_den: int) -> DataFrame:
    """(id, w, m): the first ``m - ceil(t*m) + 1`` tokens of each doc
    under the shared (corpus-df ASC, w ASC) order; unseen tokens take
    df = 0. ``tok`` must be a ``_sized_tok`` relation (carries m)."""
    sized = (
        tok.join(df_rel, "w", "left")
        .withColumn("__df", F.coalesce(F.col("__df"), F.lit(0)))
    )
    pos = F.row_number().over(
        Window.partitionBy(id_col).orderBy("__df", "w")).cast("bigint")
    return (
        sized.withColumn("__pos", pos)
        .filter(F.expr(
            f"__pos <= m - (({t_num} * m + {t_den} - 1) DIV {t_den}) + 1"
        ))
        .select(id_col, "w", "m")
    )


def _scored(probe: DataFrame, corpus: DataFrame, id_col: str,
            text_col: str, t_num: int, t_den: int) -> DataFrame:
    """(id_r, id_s, m_r, m_s, inter): exact intersection sizes for
    every prefix-sharing (probe, corpus) candidate pair."""
    tok_r = _tok(probe, id_col, text_col, "id_r")
    tok_s = _tok(corpus, id_col, text_col, "id_s")
    df_rel = tok_s.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("__df"))
    pref_r = _prefix(_sized_tok(probe, id_col, text_col, "id_r"),
                     "id_r", df_rel, t_num, t_den)
    pref_s = _prefix(_sized_tok(corpus, id_col, text_col, "id_s"),
                     "id_s", df_rel, t_num, t_den)
    cand = (
        pref_r.selectExpr("id_r", "w", "m AS m_r")
        .join(pref_s.selectExpr("id_s", "w", "m AS m_s"), "w")
        .select("id_r", "id_s", "m_r", "m_s")
        .distinct()
    )
    return (
        cand.join(tok_r, "id_r")
        .join(tok_s, ["id_s", "w"])
        .groupBy("id_r", "id_s", "m_r", "m_s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )


def ppjoin_rs_pairs(probe: DataFrame, corpus: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    t_num: int = T_NUM,
                    t_den: int = T_DEN) -> DataFrame:
    """(id_r, id_s, inter, union_sz, jaccard): EXACTLY the
    (probe, corpus) pairs with shingle-set Jaccard >= t_num/t_den."""
    scored = _scored(probe, corpus, id_col, text_col, t_num, t_den)
    return (
        scored
        .filter(F.expr(
            f"({t_den} + {t_num}) * inter >= {t_num} * (m_r + m_s)"))
        .select(
            "id_r", "id_s", "inter",
            F.expr("m_r + m_s - inter").alias("union_sz"),
            round_portable(F.expr(
                "CAST(inter AS DOUBLE) "
                "/ CAST(m_r + m_s - inter AS DOUBLE)"), 6
            ).alias("jaccard"),
        )
    )


def ppjoin_rs_candidate_stats(probe: DataFrame, corpus: DataFrame,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              t_num: int = T_NUM,
                              t_den: int = T_DEN) -> DataFrame:
    """One row (n_probe, n_corpus, n_candidates, n_pairs,
    candidate_share): the honesty meter — what fraction of the
    |R| x |S| grid was actually scored."""
    scored = _scored(probe, corpus, id_col, text_col, t_num, t_den)
    scored = scored.localCheckpoint()
    n_r = probe.select(F.col(id_col)).distinct().count()
    n_s = corpus.select(F.col(id_col)).distinct().count()
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.coalesce(F.sum(F.expr(
            f"CASE WHEN ({t_den} + {t_num}) * inter "
            f">= {t_num} * (m_r + m_s) THEN 1 ELSE 0 END"
        )), F.lit(0)).cast("bigint").alias("n_pairs"),
    )
    return agg.select(
        F.lit(n_r).cast("bigint").alias("n_probe"),
        F.lit(n_s).cast("bigint").alias("n_corpus"),
        "n_candidates", "n_pairs",
        round_portable(F.expr(
            f"CAST(n_candidates AS DOUBLE) "
            f"/ CAST({n_r} AS DOUBLE) / CAST({n_s} AS DOUBLE)"),
            6).alias("candidate_share"),
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles
# --------------------------------------------------------------------------


def _split(spark: SparkSession, sf_dir: str):
    docs = load(spark, sf_dir, "documents")
    return (docs.filter(F.col("doc_id") % GATE_MOD == 1),
            docs.filter(F.col("doc_id") % GATE_MOD == 0))


def _q_rs_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    probe, corpus = _split(spark, sf_dir)
    return ppjoin_rs_pairs(probe, corpus)


def _q_rs_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    probe, corpus = _split(spark, sf_dir)
    return ppjoin_rs_candidate_stats(probe, corpus)


def _duck_scored(t_num: int, t_den: int) -> str:
    """Shared CTE chain mirroring _scored term-for-term."""
    return f"""probe AS (
  SELECT * FROM documents WHERE doc_id % {GATE_MOD} = 1
), corpus AS (
  SELECT * FROM documents WHERE doc_id % {GATE_MOD} = 0
), tok_r AS (
  SELECT doc_id AS id_r, unnest({_shingles_duck('text')}) AS w
  FROM probe
), tok_s AS (
  SELECT doc_id AS id_s, unnest({_shingles_duck('text')}) AS w
  FROM corpus
), dfr AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tok_s GROUP BY 1
), sized_r AS (
  SELECT t.id_r, t.w, coalesce(d.df, 0) AS df,
    CAST(count(*) OVER (PARTITION BY t.id_r) AS BIGINT) AS m
  FROM tok_r t LEFT JOIN dfr d ON t.w = d.w
), pref_r AS (
  SELECT id_r, w, m FROM (
    SELECT id_r, w, m,
      CAST(row_number() OVER (PARTITION BY id_r ORDER BY df, w)
        AS BIGINT) AS pos
    FROM sized_r
  ) WHERE pos <= m - (({t_num} * m + {t_den} - 1) // {t_den}) + 1
), sized_s AS (
  SELECT t.id_s, t.w, coalesce(d.df, 0) AS df,
    CAST(count(*) OVER (PARTITION BY t.id_s) AS BIGINT) AS m
  FROM tok_s t LEFT JOIN dfr d ON t.w = d.w
), pref_s AS (
  SELECT id_s, w, m FROM (
    SELECT id_s, w, m,
      CAST(row_number() OVER (PARTITION BY id_s ORDER BY df, w)
        AS BIGINT) AS pos
    FROM sized_s
  ) WHERE pos <= m - (({t_num} * m + {t_den} - 1) // {t_den}) + 1
), cand AS (
  SELECT DISTINCT r.id_r, s.id_s, r.m AS m_r, s.m AS m_s
  FROM pref_r r JOIN pref_s s ON r.w = s.w
), scored AS (
  SELECT c.id_r, c.id_s, c.m_r, c.m_s,
    CAST(count(*) AS BIGINT) AS inter
  FROM cand c
  JOIN tok_r tr ON tr.id_r = c.id_r
  JOIN tok_s ts ON ts.id_s = c.id_s AND ts.w = tr.w
  GROUP BY 1, 2, 3, 4
)"""


_ORACLE_RS_PAIRS = f"""
WITH {_duck_scored(T_NUM, T_DEN)}
SELECT id_r, id_s, inter,
  CAST(m_r + m_s - inter AS BIGINT) AS union_sz,
  {round_portable_duck(
      "CAST(inter AS DOUBLE) / CAST(m_r + m_s - inter AS DOUBLE)", 6)}
    AS jaccard
FROM scored
WHERE ({T_DEN} + {T_NUM}) * inter >= {T_NUM} * (m_r + m_s)
"""

_ORACLE_RS_STATS = f"""
WITH {_duck_scored(T_NUM, T_DEN)}, nr AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_probe FROM probe
), ns AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_corpus
  FROM corpus
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_candidates,
    CAST(coalesce(sum(CASE WHEN ({T_DEN} + {T_NUM}) * inter
      >= {T_NUM} * (m_r + m_s) THEN 1 ELSE 0 END), 0) AS BIGINT)
      AS n_pairs
  FROM scored
)
SELECT nr.n_probe, ns.n_corpus, agg.n_candidates, agg.n_pairs,
  {round_portable_duck(
      "CAST(agg.n_candidates AS DOUBLE) "
      "/ CAST(nr.n_probe AS DOUBLE) / CAST(ns.n_corpus AS DOUBLE)",
      6)}
    AS candidate_share
FROM agg, nr, ns
"""


QUERIES: dict = {
    "decontam_ppjoin_pairs_documents": (_q_rs_pairs, _ORACLE_RS_PAIRS),
    "decontam_ppjoin_stats_documents": (_q_rs_stats, _ORACLE_RS_STATS),
}

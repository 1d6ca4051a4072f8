"""Corpus divergence #9: per-source Jensen-Shannon divergence — how
far each source's unigram distribution sits from the REST of the
corpus. The symmetric, bounded ([0, ln 2]) companion to the gated
``kl_vs_corpus`` doc score: KL explodes on source-exclusive terms
and is asymmetric; JS is the standard domain-shift meter for corpus
mixing decisions (which sources to up/down-weight).

The absent-term mass needs NO (source x vocabulary) grid: for terms
the source never uses, p = 0 and the JS integrand collapses to
``0.5 * q * ln 2``, so

  JS(s) = 0.5 * sum_{t in s} [p ln(p/m) + q ln(q/m)]
        + 0.5 * ln(2) * (1 - sum_{t in s} q),      m = (p + q)/2

with p = c_st / N_s and q = (C_t - c_st) / (N - N_s) — only the
PRESENT (source, term) pairs are ever materialized.

Engine-exactness: p, q, m derive from exact BIGINT counts (identical
doubles both engines); each present-pair contribution AND the q-mass
term quantize to BIGINT at 1e8 before their per-source sums (the
SCALING.md rule).

Plan shape at 100 TB: one (source, term) hash aggregate, one term-
total aggregate joined back BY TERM (equi-join, map-side combinable
partials), one per-source reduction. No vocabulary-sized broadcast,
no grids, no windows.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (text/curation tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .tfidf import _TOKENS, _TOKENS_DUCK

__all__ = ["js_by_source"]

Q = 10 ** 8
QF = float(Q)
LN2 = 0.6931471805599453


def js_by_source(df: DataFrame, text_col: str = "text",
                 group_col: str = "source") -> DataFrame:
    """(source, n_tokens, js): Jensen-Shannon divergence of each
    source's token distribution vs the rest of the corpus."""
    st = (
        df.select(F.col(group_col).alias("__g"),
                  F.explode(F.expr(_TOKENS.format(col=text_col)))
                  .alias("__t"))
        .groupBy("__g", "__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    tt = st.groupBy("__t").agg(F.sum("__c").alias("__ct"))
    gt = st.groupBy("__g").agg(F.sum("__c").alias("__ns"))
    nt = st.agg(F.sum("__c").alias("__nt"))
    j = (
        st.join(tt, "__t")
        .join(F.broadcast(gt), "__g")
        .crossJoin(F.broadcast(nt))
    )
    p = "(CAST(__c AS DOUBLE) / CAST(__ns AS DOUBLE))"
    q = ("(CAST(__ct - __c AS DOUBLE) "
         "/ CAST(__nt - __ns AS DOUBLE))")
    m = f"(({p} + {q}) / 2.0)"
    # q = 0 (source-exclusive term) zeroes the q-side integrand; the
    # __nt > __ns guard short-circuits the single-source corpus (one
    # source holds ALL tokens -> the "rest" distribution is empty and
    # q divides by zero): such a source gets js = 0 by contract — the
    # rich_club empty-club convention. Unreachable on the gate corpus
    # but the function is public.
    pair = (f"(CASE WHEN __nt > __ns THEN {p} * ln({p} / {m}) "
            f"+ CASE WHEN __ct > __c "
            f"THEN {q} * ln({q} / {m}) ELSE 0.0 END "
            f"ELSE 0.0 END)")
    qterm = f"(CASE WHEN __nt > __ns THEN {q} ELSE 0.0 END)"
    red = j.groupBy("__g").agg(
        F.max("__ns").alias("__n"),
        F.max("__nt").alias("__ntot"),
        F.sum(F.expr(
            f"CAST(round(({pair}) * {Q}) AS BIGINT)")).alias("__sp"),
        F.sum(F.expr(
            f"CAST(round(({qterm}) * {Q}) AS BIGINT)")).alias("__sq"),
    )
    return red.select(
        F.col("__g").alias(group_col),
        F.col("__n").cast("bigint").alias("n_tokens"),
        round_portable(F.expr(
            f"CASE WHEN __ntot > __n THEN "
            f"0.5 * CAST(__sp AS DOUBLE) / {QF!r} "
            f"+ 0.5 * {LN2!r} "
            f"* (1.0 - CAST(__sq AS DOUBLE) / {QF!r}) "
            f"ELSE 0.0 END"), 6)
        .alias("js"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle
# --------------------------------------------------------------------------


def _q_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    return js_by_source(load(spark, sf_dir, "documents"))


_D_P = "(CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))"
_D_Q = "(CAST(ct - c AS DOUBLE) / CAST(nt - ns AS DOUBLE))"
_D_M = f"(({_D_P} + {_D_Q}) / 2.0)"
_D_PAIR = (f"(CASE WHEN nt > ns THEN {_D_P} * ln({_D_P} / {_D_M}) "
           f"+ CASE WHEN ct > c "
           f"THEN {_D_Q} * ln({_D_Q} / {_D_M}) ELSE 0.0 END "
           f"ELSE 0.0 END)")
_D_QTERM = f"(CASE WHEN nt > ns THEN {_D_Q} ELSE 0.0 END)"

_ORACLE_JS = f"""
WITH st AS (
  SELECT source AS g, unnest({_TOKENS_DUCK.format(col='text')}) AS t
  FROM documents
), stc AS (
  SELECT g, t, CAST(count(*) AS BIGINT) AS c FROM st GROUP BY 1, 2
), tt AS (SELECT t, CAST(sum(c) AS BIGINT) AS ct FROM stc GROUP BY 1),
gt AS (SELECT g, CAST(sum(c) AS BIGINT) AS ns FROM stc GROUP BY 1),
nt AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM stc),
j AS (
  SELECT stc.g, stc.c, tt.ct, gt.ns, nt.nt
  FROM stc JOIN tt ON stc.t = tt.t JOIN gt ON stc.g = gt.g, nt
), red AS (
  SELECT g, CAST(max(ns) AS BIGINT) AS n_tokens,
    CAST(max(nt) AS BIGINT) AS ntot,
    CAST(sum(CAST(round(({_D_PAIR}) * {Q}) AS BIGINT)) AS BIGINT)
      AS sp,
    CAST(sum(CAST(round(({_D_QTERM}) * {Q}) AS BIGINT)) AS BIGINT)
      AS sq
  FROM j GROUP BY 1
)
SELECT g AS source, n_tokens,
  {round_portable_duck(
      f"CASE WHEN ntot > n_tokens THEN "
      f"0.5 * CAST(sp AS DOUBLE) / {QF!r} + 0.5 * {LN2!r} "
      f"* (1.0 - CAST(sq AS DOUBLE) / {QF!r}) ELSE 0.0 END", 6)} AS js
FROM red
"""


QUERIES: dict = {
    "text_js_sources_documents": (_q_js, _ORACLE_JS),
}

"""Text analysis #8: the Heaps'-law fit — the corpus scaling law
``V(n) ≈ K n^beta`` relating vocabulary size to tokens read, fitted
by log-log OLS over the document-ordered prefix curve. The tokenizer-
planning companion to the vocabulary coverage curve (analytics7):
beta tells you how fast NEW tokens keep arriving as the corpus grows
— the number that decides whether a fixed vocab will hold at 100 TB.

Exact construction of the prefix curve with NO quadratic work:
- tokens per doc: one hash aggregate;
- vocabulary growth: each term charges +1 to its FIRST document
  (min doc_id per term — vocabulary-sized aggregate), so the
  cumulative vocab after each doc is a keyed prefix sum over the
  doc-ordered relation (bounded by #docs);
- the OLS over (ln tokens_cum, ln vocab_cum) uses quantized-BIGINT
  sums (the stats3 convention) — identical fit on both engines.

Plan shape at scale: two vocabulary/doc-sized aggregates, one prefix
window over the per-doc relation, one one-row reduction. The prefix
window is doc-count-sized — at gate SFs it is one cheap sort, but a
billion-document corpus needs either (a) the mlmetrics bucketed
prefix sum keyed on doc-id ranges, or (b) the statistically
sufficient variant: evaluate the curve only at ~100 log-spaced
prefix checkpoints (the OLS needs points, not every doc) — both keep
the estimator unchanged. The per-doc window here mirrors the oracle
exactly for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .tfidf import _TOKENS, _TOKENS_DUCK

__all__ = ["heaps_law"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)


def heaps_law(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """One row (n_docs, n_tokens, vocab, beta, k): the fitted Heaps
    exponent and constant (k = exp(intercept)) over the doc-ordered
    prefix curve."""
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.expr(_TOKENS.format(col=text_col))).alias("term"))
    per_doc = toks.groupBy("__doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nt"))
    firsts = (
        toks.groupBy("term").agg(F.min("__doc").alias("__doc"))
        .groupBy("__doc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__nv"))
    )
    w = Window.orderBy("__doc").rowsBetween(
        Window.unboundedPreceding, 0)
    curve = (
        per_doc.join(firsts, "__doc", "left")
        .withColumn("__nv", F.expr(
            "coalesce(__nv, CAST(0 AS BIGINT))"))
        .withColumn("__ct", F.sum("__nt").over(w))
        .withColumn("__cv", F.sum("__nv").over(w))
        .selectExpr("ln(CAST(__ct AS DOUBLE)) AS __x",
                    "ln(CAST(__cv AS DOUBLE)) AS __y",
                    "__ct", "__cv")
    )
    s = curve.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max("__ct").alias("n_tokens"),
        F.max("__cv").alias("vocab"),
        F.sum(F.expr(f"CAST(round(__x * {Q}) AS BIGINT)")).alias("sx"),
        F.sum(F.expr(f"CAST(round(__y * {Q}) AS BIGINT)")).alias("sy"),
        F.sum(F.expr(
            f"CAST(round(__x * __x * {Q2}) AS BIGINT)")).alias("sxx"),
        F.sum(F.expr(
            f"CAST(round(__x * __y * {Q2}) AS BIGINT)")).alias("sxy"),
    )
    n = "CAST(n_docs AS DOUBLE)"
    mx = f"(CAST(sx AS DOUBLE) / ({n} * {QF!r}))"
    my = f"(CAST(sy AS DOUBLE) / ({n} * {QF!r}))"
    sxx = f"(CAST(sxx AS DOUBLE) / {Q2F!r} - {n} * {mx} * {mx})"
    sxy = f"(CAST(sxy AS DOUBLE) / {Q2F!r} - {n} * {mx} * {my})"
    beta = f"(({sxy}) / ({sxx}))"
    return s.select(
        "n_docs", "n_tokens", "vocab",
        round_portable(F.expr(beta), 6).alias("beta"),
        round_portable(F.expr(
            f"exp({my} - {beta} * {mx})"), 6).alias("k"),
    )


def _q_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heaps_law(load(spark, sf_dir, "documents"))


def _heaps_oracle() -> str:
    n = "CAST(n_docs AS DOUBLE)"
    mx = f"(CAST(sx AS DOUBLE) / ({n} * {QF!r}))"
    my = f"(CAST(sy AS DOUBLE) / ({n} * {QF!r}))"
    sxx = f"(CAST(sxx AS DOUBLE) / {Q2F!r} - {n} * {mx} * {mx})"
    sxy = f"(CAST(sxy AS DOUBLE) / {Q2F!r} - {n} * {mx} * {my})"
    beta = f"(({sxy}) / ({sxx}))"
    return f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest({_TOKENS_DUCK.format(col="text")})
    AS term
  FROM documents
), per_doc AS (
  SELECT doc, CAST(count(*) AS BIGINT) AS nt FROM toks GROUP BY 1
), firsts AS (
  SELECT doc, CAST(count(*) AS BIGINT) AS nv FROM (
    SELECT term, min(doc) AS doc FROM toks GROUP BY 1) t
  GROUP BY 1
), curve AS (
  SELECT ln(CAST(sum(p.nt) OVER (ORDER BY p.doc ROWS BETWEEN
      UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) AS x,
    ln(CAST(sum(coalesce(f.nv, 0)) OVER (ORDER BY p.doc ROWS BETWEEN
      UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) AS y,
    CAST(sum(p.nt) OVER (ORDER BY p.doc ROWS BETWEEN UNBOUNDED
      PRECEDING AND CURRENT ROW) AS BIGINT) AS ct,
    CAST(sum(coalesce(f.nv, 0)) OVER (ORDER BY p.doc ROWS BETWEEN
      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cv
  FROM per_doc p LEFT JOIN firsts f ON f.doc = p.doc
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
    CAST(max(ct) AS BIGINT) AS n_tokens,
    CAST(max(cv) AS BIGINT) AS vocab,
    CAST(sum(CAST(round(x * {Q}) AS BIGINT)) AS BIGINT) AS sx,
    CAST(sum(CAST(round(y * {Q}) AS BIGINT)) AS BIGINT) AS sy,
    CAST(sum(CAST(round(x * x * {Q2}) AS BIGINT)) AS BIGINT) AS sxx,
    CAST(sum(CAST(round(x * y * {Q2}) AS BIGINT)) AS BIGINT) AS sxy
  FROM curve
)
SELECT n_docs, n_tokens, vocab,
  {round_portable_duck(beta, 6)} AS beta,
  {round_portable_duck(f"exp({my} - {beta} * {mx})", 6)} AS k
FROM s
"""


QUERIES: dict = {
    "text_heaps_law_documents": (_q_heaps, _heaps_oracle()),
}

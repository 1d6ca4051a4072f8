"""Text analysis #7: corpus-linguistics statistics — term burstiness
(Church-Gale: collection frequency over document frequency; bursty
terms cluster in few docs — topical signal; flat terms spread evenly
— function words) and Dunning's log-likelihood keyness (G²), THE
standard statistic for "which terms characterize subcorpus A vs the
rest" (robust for sparse counts where chi-square breaks).

Both are vocabulary-sized aggregates over the whitespace-token
relation (the tfidf module's tokenizer, so all term statistics in
the package agree on tokenization). G² per term is a closed form of
the four 2x2-table BIGINT counts — ``2 Σ O ln(O/E)`` with 0·ln0 = 0
guards — computed as one shared expression and portably rounded
BEFORE the top-k rank so a 1-ulp ln difference can never flip an
ordering.

Plan shapes at scale: token explode -> (term[, side]) hash
aggregates (map-combinable, vocabulary-sized output) -> TakeOrdered
top-k. Nothing pairwise, nothing data-sized after the first
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .tfidf import _TOKENS, _TOKENS_DUCK

__all__ = ["term_burstiness", "keyness_g2"]

MIN_DF = 5
TOP_K = 20


def term_burstiness(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_df: int = MIN_DF,
                    k: int = TOP_K) -> DataFrame:
    """(term, df, cf, burstiness): the k burstiest terms with
    document frequency >= min_df — burstiness = cf/df, the mean
    within-document repetition of the term where it appears at all.
    Ordered output (burstiness desc, term asc)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.expr(_TOKENS.format(col=text_col))).alias("term"))
    stats = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cf"),
             F.countDistinct(id_col).cast("bigint").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    scored = stats.select(
        "term", "df", "cf",
        round_portable(F.expr(
            "CAST(cf AS DOUBLE) / CAST(df AS DOUBLE)"), 6
        ).alias("burstiness"),
    )
    return scored.orderBy(F.col("burstiness").desc(),
                          F.col("term").asc()).limit(k)


def keyness_g2(df: DataFrame, side_expr: str, text_col: str = "text",
               id_col: str = "doc_id", k: int = TOP_K) -> DataFrame:
    """(term, n_focus, n_rest, g2, overused): the k terms most
    distinctive of the focus subcorpus (``side_expr`` true) vs the
    rest, by Dunning's G². ``overused`` = 1 when the term is
    relatively MORE frequent in the focus side. Ordered by
    (g2 desc, term asc)."""
    toks = df.select(
        F.expr(side_expr).cast("int").alias("__s"),
        F.explode(F.expr(_TOKENS.format(col=text_col))).alias("term"))
    per_side = (
        toks.groupBy("term")
        .agg(F.sum("__s").cast("bigint").alias("a"),
             F.sum(F.expr("1 - __s")).cast("bigint").alias("b"))
    )
    tot = toks.agg(
        F.sum("__s").cast("bigint").alias("ta"),
        F.sum(F.expr("1 - __s")).cast("bigint").alias("tb"))
    j = per_side.crossJoin(F.broadcast(tot))

    def term_ll(o: str, row: str, col: str, n: str) -> str:
        e = (f"(CAST({row} AS DOUBLE) * CAST({col} AS DOUBLE) "
             f"/ CAST({n} AS DOUBLE))")
        return (f"(CASE WHEN {o} > 0 THEN CAST({o} AS DOUBLE) "
                f"* ln(CAST({o} AS DOUBLE) / ({e})) ELSE 0.0 END)")

    n = "(ta + tb)"
    g2 = ("(2.0 * ("
          + " + ".join([
              term_ll("a", "(a + b)", "ta", n),
              term_ll("b", "(a + b)", "tb", n),
              term_ll("(ta - a)", f"({n} - a - b)", "ta", n),
              term_ll("(tb - b)", f"({n} - a - b)", "tb", n),
          ]) + "))")
    over = ("CAST(CASE WHEN CAST(a AS DOUBLE) * CAST(tb AS DOUBLE) "
            "> CAST(b AS DOUBLE) * CAST(ta AS DOUBLE) "
            "THEN 1 ELSE 0 END AS BIGINT)")
    scored = j.select(
        "term",
        F.col("a").alias("n_focus"),
        F.col("b").alias("n_rest"),
        round_portable(F.expr(g2), 6).alias("g2"),
        F.expr(over).alias("overused"),
    )
    return scored.orderBy(F.col("g2").desc(),
                          F.col("term").asc()).limit(k)


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------


def _q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return term_burstiness(load(spark, sf_dir, "documents"))


_ORACLE_BURSTINESS = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_DUCK.format(col="text")}) AS term
  FROM documents
), stats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf,
    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY 1
)
SELECT term, df, cf,
  {round_portable_duck(
      "CAST(cf AS DOUBLE) / CAST(df AS DOUBLE)", 6)} AS burstiness
FROM stats WHERE df >= {MIN_DF}
ORDER BY burstiness DESC, term ASC LIMIT {TOP_K}
"""


def _q_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return keyness_g2(docs, "lang = 'en'")


def _keyness_oracle() -> str:
    def term_ll(o: str, row: str, col: str, n: str) -> str:
        e = (f"(CAST({row} AS DOUBLE) * CAST({col} AS DOUBLE) "
             f"/ CAST({n} AS DOUBLE))")
        return (f"(CASE WHEN {o} > 0 THEN CAST({o} AS DOUBLE) "
                f"* ln(CAST({o} AS DOUBLE) / ({e})) ELSE 0.0 END)")

    n = "(ta + tb)"
    g2 = ("(2.0 * ("
          + " + ".join([
              term_ll("a", "(a + b)", "ta", n),
              term_ll("b", "(a + b)", "tb", n),
              term_ll("(ta - a)", f"({n} - a - b)", "ta", n),
              term_ll("(tb - b)", f"({n} - a - b)", "tb", n),
          ]) + "))")
    return f"""
WITH toks AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS s,
    unnest({_TOKENS_DUCK.format(col="text")}) AS term
  FROM documents
), per_side AS (
  SELECT term, CAST(sum(s) AS BIGINT) AS a,
    CAST(sum(1 - s) AS BIGINT) AS b
  FROM toks GROUP BY 1
), tot AS (
  SELECT CAST(sum(s) AS BIGINT) AS ta,
    CAST(sum(1 - s) AS BIGINT) AS tb
  FROM toks
)
SELECT term, a AS n_focus, b AS n_rest,
  {round_portable_duck(g2, 6)} AS g2,
  CAST(CASE WHEN CAST(a AS DOUBLE) * CAST(tb AS DOUBLE)
    > CAST(b AS DOUBLE) * CAST(ta AS DOUBLE) THEN 1 ELSE 0 END
    AS BIGINT) AS overused
FROM per_side CROSS JOIN tot
ORDER BY g2 DESC, term ASC LIMIT {TOP_K}
"""


QUERIES: dict = {
    "text_burstiness_documents": (_q_burstiness, _ORACLE_BURSTINESS),
    "text_keyness_documents": (_q_keyness, _keyness_oracle()),
}

"""Text analysis #5: TextRank keyword extraction (Mihalcea & Tarau,
EMNLP 2004) — PageRank over the word co-occurrence graph, the
unsupervised keyword ranker that beats raw frequency by rewarding
words that co-occur with many OTHER well-connected words. Complements
RAKE (``keywords.py``, degree/frequency heuristic) with the iterative
centrality view.

Formulation: the ORIGINAL TextRank update ``TR(w) = 0.15 + 0.85 *
sum_in (w_e / out_w) * TR(src)`` (flat 0.15, not 0.15/N — so the
iteration needs no vocabulary count at plan time), weighted
undirected co-occurrence edges within a +-2 token window, 3 unrolled
power iterations from TR_0 = 1.

Determinism (the pagerank_edges rules, analytics6.py): damping as
exact-integer-ratio doubles, per-iteration incoming sums quantized to
BIGINT before aggregation, stopword/short-token filter identical on
both engines.

Plan shape at scale: the heavy work is the ONE corpus pass building
(doc, pos, token) and the windowed self-join into weighted edges
(equi-join on doc, band |dpos| <= 2); the vocabulary-sized edge and
rank relations then iterate via broadcast joins — the driver loop
grows only the logical plan, nothing is collected. Hot-token skew is
bounded by the stopword filter (the graph's would-be hubs) and the
window cap (each position emits <= 2 pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .text import _NORM_DUCK, _NORM_SPARK

__all__ = ["cooccurrence_edges", "textrank_keywords"]

Q = 10 ** 8
QF = float(Q)
TR_WINDOW = 2
TR_ITERS = 3
TR_TOP = 20
MIN_TOKEN_LEN = 3
STOPWORDS = ("the", "and", "for", "with", "that", "this", "are",
             "was", "has", "have", "not", "but")


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    """(doc, pos, tok): normalized tokens of >= MIN_TOKEN_LEN chars,
    stopwords dropped, ORIGINAL positions kept (so adjacency means
    textual adjacency, with filtered tokens leaving gaps)."""
    norm = _NORM_SPARK.replace("text", text_col)
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        df.selectExpr("doc_id AS __doc",
                      f"split({norm}, ' ') AS __tk")
        .selectExpr("__doc",
                    "posexplode(__tk) AS (__pos, __tok)")
        .filter(F.expr(
            f"length(__tok) >= {MIN_TOKEN_LEN} "
            f"AND __tok NOT IN ({stop})"))
    )


def cooccurrence_edges(df: DataFrame, text_col: str = "text",
                       window: int = TR_WINDOW) -> DataFrame:
    """(src, dst, w): symmetric weighted co-occurrence edges — token
    pairs within ``window`` original positions in a document,
    weighted by corpus pair count."""
    t = _tokens(df, text_col)
    a = t.selectExpr("__doc", "__pos AS __pa", "__tok AS __ta")
    b = t.selectExpr("__doc", "__pos AS __pb", "__tok AS __tb")
    undirected = (
        a.join(b, "__doc")
        .filter(F.expr(
            f"__pb > __pa AND __pb - __pa <= {window} "
            f"AND __ta != __tb"))
        .selectExpr("least(__ta, __tb) AS __u",
                    "greatest(__ta, __tb) AS __v")
        .groupBy("__u", "__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    return undirected.selectExpr("__u AS src", "__v AS dst", "w") \
        .unionAll(undirected.selectExpr("__v AS src", "__u AS dst",
                                        "w"))


def textrank_keywords(df: DataFrame, text_col: str = "text",
                      window: int = TR_WINDOW, iters: int = TR_ITERS,
                      top_n: int = TR_TOP) -> DataFrame:
    """(token, textrank): the ``top_n`` keywords by TextRank score
    (ties broken by token)."""
    edges = cooccurrence_edges(df, text_col, window)
    # Materialize once: the corpus tokenize + windowed self-join is
    # the heavy subtree, and the unrolled iterations would otherwise
    # re-execute it per reference (the cc/embgeo checkpoint rule).
    edges = edges.localCheckpoint()
    out_w = edges.groupBy("src").agg(F.sum("w").alias("__ow"))
    e = edges.join(out_w, "src")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    rank = nodes.select("node", F.expr(
        "CAST(1 AS DOUBLE)").alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(F.broadcast(rank), e["src"] == rank["node"])
            .select(
                F.col("dst"),
                F.expr(
                    f"CAST(round(pr * (CAST(w AS DOUBLE) "
                    f"/ CAST(__ow AS DOUBLE)) * {Q}) AS BIGINT)"
                ).alias("__cq"),
            )
            .groupBy("dst")
            .agg(F.sum("__cq").alias("__in"))
        )
        rank = nodes.join(
            F.broadcast(contrib), nodes["node"] == contrib["dst"],
            "left"
        ).select(
            F.col("node"),
            F.expr(
                f"CAST(15 AS DOUBLE) / 100 + CAST(85 AS DOUBLE) / 100"
                f" * (CAST(coalesce(__in, 0) AS DOUBLE) / {QF!r})"
            ).alias("pr"),
        )
    return (
        rank.orderBy(F.col("pr").desc(), F.col("node").asc())
        .limit(top_n)
        .select(F.col("node").alias("token"),
                round_portable(F.col("pr"), 6).alias("textrank"))
    )


def _q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textrank_keywords(load(spark, sf_dir, "documents"))


def _tr_iter_sql(prev: str, it: int) -> str:
    return f"""contrib{it} AS (
  SELECT e.dst,
         CAST(sum(CAST(round(r.pr * (CAST(e.w AS DOUBLE)
           / CAST(e.ow AS DOUBLE)) * {Q}) AS BIGINT)) AS BIGINT) AS cin
  FROM e JOIN {prev} r ON e.src = r.node GROUP BY 1
), rank{it} AS (
  SELECT n.node,
         CAST(15 AS DOUBLE) / 100 + CAST(85 AS DOUBLE) / 100
           * (CAST(coalesce(c.cin, 0) AS DOUBLE) / {QF!r}) AS pr
  FROM nodes n LEFT JOIN contrib{it} c ON n.node = c.dst
)"""


def _oracle_textrank() -> str:
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id AS doc,
         generate_subscripts(string_split({_NORM_DUCK}, ' '), 1) - 1
           AS pos,
         unnest(string_split({_NORM_DUCK}, ' ')) AS tok
  FROM documents
), flt AS (
  SELECT * FROM toks
  WHERE length(tok) >= {MIN_TOKEN_LEN} AND tok NOT IN ({stop})
), und AS (
  SELECT least(a.tok, b.tok) AS u, greatest(a.tok, b.tok) AS v,
         CAST(count(*) AS BIGINT) AS w
  FROM flt a JOIN flt b
    ON a.doc = b.doc AND b.pos > a.pos
   AND b.pos - a.pos <= {TR_WINDOW} AND a.tok != b.tok
  GROUP BY 1, 2
), edges AS (
  SELECT u AS src, v AS dst, w FROM und
  UNION ALL
  SELECT v AS src, u AS dst, w FROM und
), ow AS (
  SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY 1
), e AS (
  SELECT edges.src, edges.dst, edges.w, ow.ow
  FROM edges JOIN ow ON edges.src = ow.src
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), rank0 AS (
  SELECT node, CAST(1 AS DOUBLE) AS pr FROM nodes
), {_tr_iter_sql('rank0', 1)},
{_tr_iter_sql('rank1', 2)},
{_tr_iter_sql('rank2', 3)}
SELECT node AS token, {round_portable_duck("pr", 6)} AS textrank
FROM rank{TR_ITERS}
ORDER BY pr DESC, node ASC
LIMIT {TR_TOP}
"""


QUERIES: dict = {
    "text_textrank_documents": (_q_textrank, _oracle_textrank()),
}

"""Benchmark decontamination: flag / drop training documents that
share word n-grams with an evaluation (benchmark) set.

The standard pre-training hygiene step: any document containing a
contiguous n-gram that also appears in a held-out benchmark is
"contaminated" and must be reported or removed before training.

Scale design (the benchmark side is always tiny relative to the
corpus — thousands of eval prompts vs billions of documents):

- the benchmark's distinct n-grams are built once and **broadcast**;
  the 100 TB corpus side is never shuffled for the membership test;
- ``decontaminate`` is a broadcast LEFT ANTI join after an in-task
  ``exists()`` pre-filter on the exploded grams — clean docs stream
  straight through, zero shuffles end-to-end;
- ``contamination_report`` needs per-doc hit counts, so it explodes
  corpus n-grams (flatMap, narrow), broadcast-inner-joins the
  benchmark grams, and pays exactly ONE shuffle for the final
  groupBy(doc_id);
- n-grams are joined as strings for auditability; at extreme scale
  swap the join key for ``xxhash64(gram)`` (8 bytes vs ~n words) —
  the plan shape is identical.

Reference scope: the reference engine has no corpus operators; this
extends the pipeline surface mandated by the driver (SURVEY §2.C
notes dedup/text ops as extension phases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = [
    "benchmark_ngrams",
    "contamination_report",
    "decontaminate",
    "doc_ngrams",
]

DEFAULT_N = 8  # production default; the gate uses 3 (tiny synthetic vocab)

_TOKENS = "split(trim(lower({col})), '\\\\s+')"


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    """Materialize the token array ONCE as a ``__toks`` column.

    The gram transform references the token array 3 times (two sizes +
    one slice per gram); inlining the ``split`` expression there makes
    Catalyst re-evaluate the split for EVERY gram index — O(L^2) work
    per document (this was the 4.2 s outlier in BENCH_r02). Referencing
    a materialized attribute instead is safe from re-inlining:
    CollapseProject only merges projections whose outputs are cheap or
    consumed once, and ``__toks`` is consumed three times.
    """
    return df.withColumn("__toks", F.expr(_TOKENS.format(col=text_col)))


def _grams_from_toks(n: int) -> str:
    """Spark SQL: array of word n-grams (space-joined) over ``__toks``.

    ``sequence(1, size-n+1)`` would count DOWN for short docs (Spark
    infers step -1), so short docs are guarded to an empty array.
    """
    return (
        f"CASE WHEN size(__toks) >= {n} THEN "
        f"transform(sequence(1, size(__toks) - {n} + 1), "
        f"i -> concat_ws(' ', slice(__toks, i, {n}))) "
        f"ELSE array() END"
    )


def doc_ngrams(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", n: int = DEFAULT_N) -> DataFrame:
    """Explode each document into its word n-grams: (id, gram) rows.

    Narrow (flatMap) — no shuffle; tokenization is pure Catalyst
    (whole-stage codegen), no Python; the token split runs once per doc
    (see ``_with_tokens``).
    """
    return _with_tokens(df, text_col).select(
        F.col(id_col),
        F.explode(F.expr(_grams_from_toks(n))).alias("gram"),
    )


def benchmark_ngrams(bench: DataFrame, text_col: str = "text",
                     n: int = DEFAULT_N) -> DataFrame:
    """Distinct n-grams of the benchmark set (the broadcast side)."""
    return (
        _with_tokens(bench, text_col)
        .select(F.explode(F.expr(_grams_from_toks(n))).alias("gram"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Per-document contamination counts, contaminated docs only.

    Returns (id_col, n_hit_grams, n_hits): distinct benchmark n-grams
    found in the doc, and total occurrences. One shuffle (the groupBy);
    the membership join is broadcast.
    """
    grams = doc_ngrams(docs, text_col, id_col, n)
    hits = grams.join(F.broadcast(benchmark_ngrams(bench, text_col, n)),
                      "gram")
    return hits.groupBy(id_col).agg(
        F.countDistinct("gram").alias("n_hit_grams"),
        F.count(F.lit(1)).alias("n_hits"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Drop every document sharing >= 1 n-gram with the benchmark.

    Broadcast LEFT ANTI join on ``exists(grams, g -> ...)`` semantics:
    the doc side stays un-exploded (one row per doc), the join key is
    the exploded gram array via ``arrays_overlap`` against nothing —
    implemented as anti-join of doc gram-arrays exploded lazily. Plan:
    scan -> generate -> broadcast anti join -> no shuffle.
    """
    exploded = doc_ngrams(docs, text_col, id_col, n).select(
        F.col(id_col).alias("__cid"), "gram"
    )
    contaminated = (
        exploded.join(F.broadcast(benchmark_ngrams(bench, text_col, n)),
                      "gram")
        .select(F.col("__cid").alias(id_col))
        .distinct()
    )
    return (
        docs.join(F.broadcast(contaminated), id_col, "left_anti")
    )


# --------------------------------------------------------------------------
# Gate queries. The synthetic corpus draws from a ~30-word vocabulary,
# so 3-grams collide at a realistic "contaminated" rate; the benchmark
# slice is every 37th doc (same split both engines).
# --------------------------------------------------------------------------

_GATE_N = 3
_BENCH_PRED = "doc_id % 37 = 0"


def _split(spark: SparkSession, sf_dir: str):
    d = load(spark, sf_dir, "documents")
    return (d.filter(f"NOT ({_BENCH_PRED})"), d.filter(_BENCH_PRED))


def _q_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, bench = _split(spark, sf_dir)
    return contamination_report(docs, bench, n=_GATE_N)


def _q_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, bench = _split(spark, sf_dir)
    return decontaminate(docs, bench, n=_GATE_N).select("doc_id")


_DUCK_GRAMS = f"""
  toks AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
    FROM documents
  ), grams AS (
    SELECT doc_id, array_to_string(list_slice(t, i, i + {_GATE_N - 1}), ' ')
           AS gram
    FROM toks, UNNEST(range(1, len(t) - {_GATE_N - 2})) AS u(i)
  ), bench AS (
    SELECT DISTINCT gram FROM grams WHERE {_BENCH_PRED}
  )
"""

_ORACLE_REPORT = f"""
WITH {_DUCK_GRAMS}
SELECT doc_id,
       count(DISTINCT gram) AS n_hit_grams,
       count(*) AS n_hits
FROM grams JOIN bench USING (gram)
WHERE NOT ({_BENCH_PRED})
GROUP BY doc_id
"""

_ORACLE_CLEAN = f"""
WITH {_DUCK_GRAMS}
SELECT doc_id FROM documents
WHERE NOT ({_BENCH_PRED})
  AND doc_id NOT IN (
    SELECT doc_id FROM grams JOIN bench USING (gram)
    WHERE NOT ({_BENCH_PRED})
  )
"""

QUERIES: dict = {
    "decontam_report_documents": (_q_report, _ORACLE_REPORT),
    "decontam_clean_documents": (_q_clean, _ORACLE_CLEAN),
}

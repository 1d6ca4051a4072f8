"""Corpus-level boilerplate removal (CCNet-style line dedup).

Web corpora carry headers, cookie banners, and navigation text repeated
across thousands of pages. The CCNet/RefinedWeb recipe: segment every
document, hash each segment, count how many *distinct* documents each
segment appears in corpus-wide, and strip segments above a document
threshold, rebuilding the text in original order.

Segmentation is pluggable:

- ``delim`` — split on a delimiter (newline for real web text);
- ``chunk`` — fixed ``n``-token windows (used by the gate queries:
  the synthetic corpus is single-line).

Plan shape at scale (100 TB corpus):

1. segments explode narrowly (no shuffle);
2. per-segment doc counts: distinct (segment, doc) pairs are reduced
   map-side, then one shuffle on the segment key produces a
   VOCABULARY-sized count table;
3. the boilerplate set (counts >= threshold) is tiny by construction
   — repeated-everywhere text — so it BROADCASTS, and the corpus-side
   anti-join never shuffles;
4. text rebuild is one groupBy(doc_id) shuffle; segment order is
   restored with ``array_sort`` over (pos, segment) structs, so the
   result is deterministic regardless of shuffle arrival order.

Total: two shuffles + one broadcast, independent of corpus width.
At extreme vocabulary, swap the segment string key for
``xxhash64(segment)`` — same shape, 8-byte keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

__all__ = ["segment", "boilerplate_segments", "remove_boilerplate"]

_TOKENS = "filter(split(trim(lower({col})), '\\\\s+'), t -> t != '')"


def _segments_expr(text_col: str, mode: str, n: int, delim: str) -> str:
    if mode == "delim":
        return (
            f"filter(transform(split({text_col}, '{delim}'), "
            "s -> trim(s)), s -> s != '')"
        )
    if mode == "chunk":
        toks = _TOKENS.format(col=text_col)
        return (
            f"filter(transform("
            f"sequence(0, greatest(cast(ceil(size({toks}) / {n}.0) as int)"
            f" - 1, 0)), "
            f"i -> array_join(slice({toks}, i * {n} + 1, {n}), ' ')), "
            "s -> s != '')"
        )
    raise ValueError(f"unknown segmentation mode: {mode}")


def segment(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            mode: str = "chunk", n: int = 3,
            delim: str = "\\n") -> DataFrame:
    """(id, pos, seg): ordered segments of each document."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(_segments_expr(text_col, mode, n, delim))
        ).alias("pos", "seg"),
    )


def boilerplate_segments(df: DataFrame, min_docs: int | None = 3,
                         text_col: str = "text", id_col: str = "doc_id",
                         mode: str = "chunk", n: int = 3,
                         delim: str = "\\n",
                         min_share_den: int = 250) -> DataFrame:
    """(seg, n_docs): segments appearing in >= ``min_docs`` distinct
    docs — or, with ``min_docs=None``, in >= max(3, corpus_docs /
    min_share_den) docs (a SHARE-based threshold).

    The r10 shape sweep caught the fixed-absolute default as a
    Q11-style degenerate gate: at 10x the corpus, "appears in >= 3
    docs" stops meaning boilerplate (17,082 qualifying segments at
    sf0.1 vs 231 at sf0.01). Boilerplate is a share-of-corpus
    property; the share threshold keeps the result set scale-stable.

    Distinct (seg, doc) first — map-side combinable — then one count
    per segment; never a count-distinct over the raw segment stream.
    """
    counted = (
        segment(df, text_col, id_col, mode, n, delim)
        .select("seg", id_col)
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    if min_docs is not None:
        return counted.filter(F.col("n_docs") >= min_docs)
    tot = df.select(id_col).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("__nd"))
    return (
        counted.crossJoin(F.broadcast(tot))
        .filter(F.expr(
            f"n_docs >= greatest(3, __nd DIV {min_share_den})"))
        .drop("__nd")
    )


def remove_boilerplate(df: DataFrame, min_docs: int | None = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       mode: str = "chunk", n: int = 3,
                       delim: str = "\\n") -> DataFrame:
    """(id, clean_text, n_kept): documents with boilerplate stripped.

    Every input document survives (possibly with empty text). The
    boilerplate set is broadcast for the anti-join; the rebuild sorts
    segments by original position inside the aggregate, so the output
    is insensitive to shuffle order.
    """
    segs = segment(df, text_col, id_col, mode, n, delim)
    common = boilerplate_segments(df, min_docs, text_col, id_col,
                                  mode, n, delim).select("seg")
    joiner = " " if mode == "chunk" else delim.replace("\\n", "\n")
    kept = segs.join(F.broadcast(common), "seg", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            joiner,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# Gate queries
# --------------------------------------------------------------------------

_CHUNK = 3
# share-based threshold (r10 shape sweep): max(3, n_docs / 250) —
# measured multiplicity spectrum: >=3 covers 248/231 segments at
# 500 docs, n/250 = 20 covers 31 at 5000 docs (nonzero and
# boilerplate-meaning-preserving at every SF)
_MIN_DOCS_DUCK = ("greatest(3, (SELECT count(DISTINCT doc_id) "
                  "FROM documents) // 250)")


def _q_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_segments(load(spark, sf_dir, "documents"),
                                min_docs=None, n=_CHUNK)


def _q_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return remove_boilerplate(load(spark, sf_dir, "documents"),
                              min_docs=None, n=_CHUNK)


_SEGS_DUCK = f"""
  toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                       t -> t != '') AS t
    FROM documents
  ), segs AS (
    SELECT doc_id, i AS pos,
           array_to_string(list_slice(t, i * {_CHUNK} + 1,
                                      i * {_CHUNK} + {_CHUNK}), ' ') AS seg
    FROM toks,
         UNNEST(range(0, greatest(CAST(ceil(len(t) / {_CHUNK}.0) AS INT),
                                  1))) AS u(i)
    WHERE array_to_string(list_slice(t, i * {_CHUNK} + 1,
                                     i * {_CHUNK} + {_CHUNK}), ' ') != ''
  ), common AS (
    SELECT seg FROM (
      SELECT seg, count(DISTINCT doc_id) AS n_docs FROM segs GROUP BY 1
    ) WHERE n_docs >= {_MIN_DOCS_DUCK}
  )
"""

_ORACLE_SEGMENTS = f"""
WITH {_SEGS_DUCK}
SELECT seg, n_docs FROM (
  SELECT seg, count(DISTINCT doc_id) AS n_docs FROM segs GROUP BY 1
) WHERE n_docs >= {_MIN_DOCS_DUCK}
"""

_ORACLE_CLEAN = f"""
WITH {_SEGS_DUCK},
  kept AS (
    SELECT doc_id, pos, seg FROM segs
    WHERE seg NOT IN (SELECT seg FROM common)
  ), rebuilt AS (
    SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
           count(*) AS n_kept
    FROM kept GROUP BY 1
  )
SELECT d.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
FROM documents d LEFT JOIN rebuilt r USING (doc_id)
"""

QUERIES: dict = {
    "text_boilerplate_segments_documents": (_q_segments, _ORACLE_SEGMENTS),
    "text_boilerplate_clean_documents": (_q_clean, _ORACLE_CLEAN),
}

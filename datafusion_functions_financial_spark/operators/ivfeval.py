"""IVF index quality: per-cell label purity — "do the coarse
quantizer's inverted lists respect the label structure?" — the
index-health companion to the answer-quality recall audits
(``tests/test_ann_recall.py``, the bench recall curve): recall
measures retrieval of individual neighbors; purity measures whether
a cell-restricted search (the IVF scale path) stays within the right
semantic neighborhood at all — the number a labeled-corpus owner
checks before trusting cell-local sampling/dedup shortcuts.

Reuses ``ivf_index``'s engine-exact construction verbatim (the
``knn_ivf_embeddings`` oracle chain mirrors it bit-for-bit: modulo
seeds, one Lloyd round over integer-quantized component sums,
cosine reassignment with deterministic ties). Purity per cell =
majority-label count / cell size; the headline row weights by cell
size (equals overall fraction of vectors whose cell majority matches
their label).

Plan shape at 100 TB: the index build is the documented IVF shape
(broadcast centroids, no row-pair joins); purity adds one hash
aggregate to (cell, label), one argmax per cell, one reduction.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (embedding tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .ivf import IVF_SEED_MOD, QUANT, ivf_index
from .similarity import DIM, _cos_duck

__all__ = ["cell_label_purity"]


def cell_label_purity(df: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      label_col: str = "label",
                      seed_mod: int = IVF_SEED_MOD) -> DataFrame:
    """One row (n_cells, n_vectors, weighted_purity, macro_purity):
    majority-label purity of the IVF cells, size-weighted and
    unweighted."""
    _cents, cells = ivf_index(df, id_col=id_col, vec_col=vec_col,
                              seed_mod=seed_mod)
    labeled = cells.join(
        df.selectExpr(f"{id_col} AS vec_id",
                      f"{label_col} AS __lab"), "vec_id")
    cl = labeled.groupBy("cell_id", "__lab").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"))
    per_cell = cl.groupBy("cell_id").agg(
        F.sum("__n").cast("bigint").alias("__sz"),
        F.max("__n").cast("bigint").alias("__maj"),
    )
    red = per_cell.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("__sz").cast("bigint").alias("n_vectors"),
        F.sum("__maj").cast("bigint").alias("__tmaj"),
        F.sum(F.expr(
            "CAST(round(CAST(__maj AS DOUBLE) "
            "/ CAST(__sz AS DOUBLE) * 100000000) AS BIGINT)"))
        .alias("__pq"),
    )
    return red.select(
        "n_cells", "n_vectors",
        round_portable(F.expr(
            "CAST(__tmaj AS DOUBLE) / CAST(n_vectors AS DOUBLE)"), 6)
        .alias("weighted_purity"),
        round_portable(F.expr(
            "CAST(__pq AS DOUBLE) / 100000000.0 "
            "/ CAST(n_cells AS DOUBLE)"), 6).alias("macro_purity"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (the knn_ivf construction chain)
# --------------------------------------------------------------------------


def _q_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cell_label_purity(load(spark, sf_dir, "embeddings"))


# Shared oracle prefix: the full engine-exact IVF construction chain
# ending at the (cell_id, label, n) contingency ``cl`` — reused by the
# clustering-agreement metrics in ``embeval2`` so the two gate oracles
# can never drift from the ``knn_ivf_embeddings`` assignment.
ORACLE_CL_PREFIX = f"""
WITH v AS (
  SELECT vec_id, embedding, label FROM embeddings
), seeds AS (
  SELECT vec_id AS seed_id, embedding AS seed_vec
  FROM v WHERE vec_id % {IVF_SEED_MOD} = 0
), a1 AS (
  SELECT v.vec_id, v.embedding, s.seed_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_cos_duck('v.embedding', 's.seed_vec')} DESC,
                    s.seed_id ASC) AS rn
  FROM v, seeds s
), m1 AS (
  SELECT vec_id, embedding, seed_id AS cell_id FROM a1 WHERE rn = 1
), comp AS (
  SELECT cell_id, r.range AS pos,
         sum(CAST(floor(CAST(embedding[r.range] AS DOUBLE)
                  * {QUANT}.0) AS BIGINT)) AS s,
         count(*) AS c
  FROM m1, range(1, {DIM} + 1) r
  GROUP BY 1, 2
), cent AS (
  SELECT cell_id,
         list(CAST(s AS DOUBLE) / ({QUANT}.0 * CAST(c AS DOUBLE))
              ORDER BY pos) AS centroid
  FROM comp GROUP BY 1
), a2 AS (
  SELECT v.vec_id, v.label, c.cell_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_cos_duck('v.embedding', 'c.centroid')} DESC,
                    c.cell_id ASC) AS rn
  FROM v, cent c
), cells AS (
  SELECT vec_id, label, cell_id FROM a2 WHERE rn = 1
), cl AS (
  SELECT cell_id, label, CAST(count(*) AS BIGINT) AS n
  FROM cells GROUP BY 1, 2
)"""

_ORACLE_PURITY = ORACLE_CL_PREFIX + f""", per_cell AS (
  SELECT cell_id, CAST(sum(n) AS BIGINT) AS sz,
    CAST(max(n) AS BIGINT) AS maj
  FROM cl GROUP BY 1
), red AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
    CAST(sum(sz) AS BIGINT) AS n_vectors,
    CAST(sum(maj) AS BIGINT) AS tmaj,
    CAST(sum(CAST(round(CAST(maj AS DOUBLE) / CAST(sz AS DOUBLE)
      * 100000000) AS BIGINT)) AS BIGINT) AS pq
  FROM per_cell
)
SELECT n_cells, n_vectors,
  {round_portable_duck(
      "CAST(tmaj AS DOUBLE) / CAST(n_vectors AS DOUBLE)", 6)}
    AS weighted_purity,
  {round_portable_duck(
      "CAST(pq AS DOUBLE) / 100000000.0 / CAST(n_cells AS DOUBLE)",
      6)} AS macro_purity
FROM red
"""


QUERIES: dict = {
    "emb_cell_purity_embeddings": (_q_purity, _ORACLE_PURITY),
}

"""Clustering-agreement metrics #2: Adjusted Rand Index and
Normalized Mutual Information between the IVF coarse-quantizer cells
and the corpus labels — the PARTITION-level companions to the gated
per-cell majority purity (``emb_cell_purity_embeddings``): purity
rewards many tiny clusters (it is 1.0 for singletons), while ARI is
chance-corrected (0 expected under random assignment) and NMI
penalizes over-segmentation through the cluster entropy term. These
are the standard pair a labeled-corpus owner reads together before
trusting cell-local shortcuts (sampling, dedup, stratification) at
100 TB.

Both metrics derive entirely from the (cell, label) contingency
table built on the ``knn_ivf_embeddings`` engine-exact construction
(modulo seeds, one Lloyd round over integer-quantized component
sums, cosine reassignment with deterministic ties — reused verbatim
via ``ivf_index``; the oracle reuses ``ivfeval.ORACLE_CL_PREFIX`` so
the two chains cannot drift).

- ``ari``: with n_ij the contingency counts, a_i / b_j the margins
  and N the total, using the pair counts kept DOUBLED to stay
  integer (x*(x-1) instead of C(x,2) — the common factor cancels):
  ARI = (ti2 - ta2*tb2/tn2) / ((ta2 + tb2)/2 - ta2*tb2/tn2).
- ``nmi``: MI = sum_ij (n_ij/N) ln((n_ij/N)/((a_i/N)(b_j/N))),
  normalized by sqrt(H_cells * H_labels) (the sklearn 'geometric'
  convention).

Engine-exactness: the contingency and all margins are exact BIGINTs,
so every p/q double is bit-identical on both engines; each MI /
entropy term quantizes to BIGINT at 1e8 before its sum (the
SCALING.md associativity rule); cross products that could pass 2^53
at real scale (ta2 * tb2) cast to DOUBLE one factor at a time.

Plan shape at 100 TB: the index build is the documented IVF shape
(broadcast centroids, no row-pair joins); the metrics add one hash
aggregate to the (cell, label) grid, two margin aggregates (tiny,
broadcast), and constant-row reductions. No windows, no row pairs.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (embedding tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load
from .ivf import IVF_SEED_MOD, ivf_index
from .ivfeval import ORACLE_CL_PREFIX

__all__ = ["cluster_ari", "cluster_nmi", "cluster_vmeasure"]

Q = 10 ** 8
QF = float(Q)


def _contingency(df: DataFrame, id_col: str, vec_col: str,
                 label_col: str, seed_mod: int) -> DataFrame:
    """(cell_id, label, n): the IVF-cell x label contingency table."""
    _cents, cells = ivf_index(df, id_col=id_col, vec_col=vec_col,
                              seed_mod=seed_mod)
    labeled = cells.join(
        df.selectExpr(f"{id_col} AS vec_id",
                      f"{label_col} AS __lab"), "vec_id")
    return labeled.groupBy("cell_id", "__lab").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"))


def cluster_ari(df: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding", label_col: str = "label",
                seed_mod: int = IVF_SEED_MOD) -> DataFrame:
    """One row (n_vectors, n_cells, n_labels, ari): Adjusted Rand
    Index between the IVF cell partition and the label partition
    (1 = identical partitions, ~0 = chance; a degenerate table whose
    max equals its expectation reports ari = 1.0 by the sklearn
    convention — both partitions trivially identical)."""
    cl = _contingency(df, id_col, vec_col, label_col, seed_mod)
    ti = cl.agg(
        F.sum(F.expr("__n * (__n - 1)")).cast("bigint").alias("__ti2"))
    ra = cl.groupBy("cell_id").agg(F.sum("__n").alias("__a"))
    rb = cl.groupBy("__lab").agg(F.sum("__n").alias("__b"))
    ta = ra.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.expr("__a * (__a - 1)")).cast("bigint").alias("__ta2"),
        F.sum("__a").cast("bigint").alias("n_vectors"))
    tb = rb.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_labels"),
        F.sum(F.expr("__b * (__b - 1)")).cast("bigint").alias("__tb2"))
    exp = ("(CAST(__ta2 AS DOUBLE) / (CAST(n_vectors AS DOUBLE) "
           "* (CAST(n_vectors AS DOUBLE) - 1.0)) "
           "* CAST(__tb2 AS DOUBLE))")
    mx = "((CAST(__ta2 AS DOUBLE) + CAST(__tb2 AS DOUBLE)) / 2.0)"
    return (
        ti.crossJoin(F.broadcast(ta)).crossJoin(F.broadcast(tb))
        .select(
            "n_vectors", "n_cells", "n_labels",
            round_portable(F.expr(
                f"CASE WHEN {mx} - {exp} = 0.0 THEN 1.0 "
                f"ELSE (CAST(__ti2 AS DOUBLE) - {exp}) "
                f"/ ({mx} - {exp}) END"), 6).alias("ari"),
        )
    )


def cluster_nmi(df: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding", label_col: str = "label",
                seed_mod: int = IVF_SEED_MOD) -> DataFrame:
    """One row (n_vectors, mi, h_cells, h_labels, nmi): mutual
    information of the IVF-cell and label partitions in nats, the two
    marginal entropies, and NMI = MI / sqrt(H_cells * H_labels)
    (0 by contract when either partition is a single block)."""
    cl = _contingency(df, id_col, vec_col, label_col, seed_mod)
    ra = cl.groupBy("cell_id").agg(F.sum("__n").alias("__a"))
    rb = cl.groupBy("__lab").agg(F.sum("__n").alias("__b"))
    nt = cl.agg(F.sum("__n").cast("bigint").alias("__nt"))
    j = (
        cl.join(F.broadcast(ra), "cell_id")
        .join(F.broadcast(rb), "__lab")
        .crossJoin(F.broadcast(nt))
    )
    p = "(CAST(__n AS DOUBLE) / CAST(__nt AS DOUBLE))"
    pa = "(CAST(__a AS DOUBLE) / CAST(__nt AS DOUBLE))"
    pb = "(CAST(__b AS DOUBLE) / CAST(__nt AS DOUBLE))"
    term = f"({p} * ln({p} / ({pa} * {pb})))"
    mi_q = j.agg(
        F.max("__nt").cast("bigint").alias("n_vectors"),
        F.sum(F.expr(
            f"CAST(round(({term}) * {Q}) AS BIGINT)")).alias("__smi"))
    ha = "(CAST(__a AS DOUBLE) / CAST(__nt AS DOUBLE))"
    ha_q = ra.crossJoin(F.broadcast(nt)).agg(F.sum(F.expr(
        f"CAST(round((-{ha} * ln({ha})) * {Q}) AS BIGINT)"))
        .alias("__sha"))
    hb = "(CAST(__b AS DOUBLE) / CAST(__nt AS DOUBLE))"
    hb_q = rb.crossJoin(F.broadcast(nt)).agg(F.sum(F.expr(
        f"CAST(round((-{hb} * ln({hb})) * {Q}) AS BIGINT)"))
        .alias("__shb"))
    mi = f"(CAST(__smi AS DOUBLE) / {QF!r})"
    hc = f"(CAST(__sha AS DOUBLE) / {QF!r})"
    hl = f"(CAST(__shb AS DOUBLE) / {QF!r})"
    return (
        mi_q.crossJoin(F.broadcast(ha_q)).crossJoin(F.broadcast(hb_q))
        .select(
            "n_vectors",
            round_portable(F.expr(mi), 6).alias("mi"),
            round_portable(F.expr(hc), 6).alias("h_cells"),
            round_portable(F.expr(hl), 6).alias("h_labels"),
            round_portable(F.expr(
                f"CASE WHEN {hc} * {hl} > 0.0 "
                f"THEN {mi} / sqrt({hc} * {hl}) ELSE 0.0 END"), 6)
            .alias("nmi"),
        )
    )


def cluster_vmeasure(df: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     label_col: str = "label",
                     seed_mod: int = IVF_SEED_MOD) -> DataFrame:
    """One row (n_vectors, homogeneity, completeness, v_measure):
    the Rosenberg-Hirschberg pair and their harmonic mean —
    homogeneity = 1 - H(labels|cells)/H(labels) (each cell holds one
    label), completeness = 1 - H(cells|labels)/H(cells) (each label
    sits in one cell). Degenerate entropies follow the sklearn
    conventions (a zero marginal entropy scores its side 1; v = 0
    when h + c = 0)."""
    cl = _contingency(df, id_col, vec_col, label_col, seed_mod)
    ra = cl.groupBy("cell_id").agg(F.sum("__n").alias("__a"))
    rb = cl.groupBy("__lab").agg(F.sum("__n").alias("__b"))
    nt = cl.agg(F.sum("__n").cast("bigint").alias("__nt"))
    j = (
        cl.join(F.broadcast(ra), "cell_id")
        .join(F.broadcast(rb), "__lab")
        .crossJoin(F.broadcast(nt))
    )
    p = "(CAST(__n AS DOUBLE) / CAST(__nt AS DOUBLE))"
    # H(L|C) term: -(n/N) ln(n/a); H(C|L) term: -(n/N) ln(n/b)
    hlc = f"(-{p} * ln(CAST(__n AS DOUBLE) / CAST(__a AS DOUBLE)))"
    hcl = f"(-{p} * ln(CAST(__n AS DOUBLE) / CAST(__b AS DOUBLE)))"
    cond = j.agg(
        F.max("__nt").cast("bigint").alias("n_vectors"),
        F.sum(F.expr(
            f"CAST(round(({hlc}) * {Q}) AS BIGINT)")).alias("__shlc"),
        F.sum(F.expr(
            f"CAST(round(({hcl}) * {Q}) AS BIGINT)")).alias("__shcl"))
    ha = "(CAST(__a AS DOUBLE) / CAST(__nt AS DOUBLE))"
    ha_q = ra.crossJoin(F.broadcast(nt)).agg(F.sum(F.expr(
        f"CAST(round((-{ha} * ln({ha})) * {Q}) AS BIGINT)"))
        .alias("__sha"))
    hb = "(CAST(__b AS DOUBLE) / CAST(__nt AS DOUBLE))"
    hb_q = rb.crossJoin(F.broadcast(nt)).agg(F.sum(F.expr(
        f"CAST(round((-{hb} * ln({hb})) * {Q}) AS BIGINT)"))
        .alias("__shb"))
    h = (f"(CASE WHEN __shb > 0 THEN 1.0 - CAST(__shlc AS DOUBLE) "
         f"/ CAST(__shb AS DOUBLE) ELSE 1.0 END)")
    c = (f"(CASE WHEN __sha > 0 THEN 1.0 - CAST(__shcl AS DOUBLE) "
         f"/ CAST(__sha AS DOUBLE) ELSE 1.0 END)")
    return (
        cond.crossJoin(F.broadcast(ha_q)).crossJoin(F.broadcast(hb_q))
        .select(
            "n_vectors",
            round_portable(F.expr(h), 6).alias("homogeneity"),
            round_portable(F.expr(c), 6).alias("completeness"),
            round_portable(F.expr(
                f"CASE WHEN ({h}) + ({c}) > 0.0 THEN "
                f"2.0 * ({h}) * ({c}) / (({h}) + ({c})) "
                f"ELSE 0.0 END"), 6).alias("v_measure"),
        )
    )


# --------------------------------------------------------------------------
# Gate queries + mirrored oracles (the knn_ivf construction chain —
# the oracle contingency comes verbatim from ivfeval.ORACLE_CL_PREFIX)
# --------------------------------------------------------------------------


def _q_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_ari(load(spark, sf_dir, "embeddings"))


def _q_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_nmi(load(spark, sf_dir, "embeddings"))


def _q_vmeasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_vmeasure(load(spark, sf_dir, "embeddings"))


_EXP = ("(CAST(ta2 AS DOUBLE) / (CAST(nv AS DOUBLE) "
        "* (CAST(nv AS DOUBLE) - 1.0)) * CAST(tb2 AS DOUBLE))")
_MX = "((CAST(ta2 AS DOUBLE) + CAST(tb2 AS DOUBLE)) / 2.0)"

_ORACLE_ARI = ORACLE_CL_PREFIX + f""", ti AS (
  SELECT CAST(sum(n * (n - 1)) AS BIGINT) AS ti2 FROM cl
), ra AS (
  SELECT cell_id, CAST(sum(n) AS BIGINT) AS a FROM cl GROUP BY 1
), rb AS (
  SELECT label, CAST(sum(n) AS BIGINT) AS b FROM cl GROUP BY 1
), ta AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
    CAST(sum(a * (a - 1)) AS BIGINT) AS ta2,
    CAST(sum(a) AS BIGINT) AS nv
  FROM ra
), tb AS (
  SELECT CAST(count(*) AS BIGINT) AS n_labels,
    CAST(sum(b * (b - 1)) AS BIGINT) AS tb2
  FROM rb
)
SELECT nv AS n_vectors, n_cells, n_labels,
  {round_portable_duck(
      f"CASE WHEN {_MX} - {_EXP} = 0.0 THEN 1.0 "
      f"ELSE (CAST(ti2 AS DOUBLE) - {_EXP}) / ({_MX} - {_EXP}) END",
      6)} AS ari
FROM ti, ta, tb
"""

_D_P = "(CAST(cl.n AS DOUBLE) / CAST(nt.nt AS DOUBLE))"
_D_PA = "(CAST(ra.a AS DOUBLE) / CAST(nt.nt AS DOUBLE))"
_D_PB = "(CAST(rb.b AS DOUBLE) / CAST(nt.nt AS DOUBLE))"
_D_TERM = f"({_D_P} * ln({_D_P} / ({_D_PA} * {_D_PB})))"
_D_HA = "(CAST(a AS DOUBLE) / CAST(nt AS DOUBLE))"
_D_HB = "(CAST(b AS DOUBLE) / CAST(nt AS DOUBLE))"
_D_MI = f"(CAST(smi AS DOUBLE) / {QF!r})"
_D_HC = f"(CAST(sha AS DOUBLE) / {QF!r})"
_D_HL = f"(CAST(shb AS DOUBLE) / {QF!r})"

_ORACLE_NMI = ORACLE_CL_PREFIX + f""", ra AS (
  SELECT cell_id, CAST(sum(n) AS BIGINT) AS a FROM cl GROUP BY 1
), rb AS (
  SELECT label, CAST(sum(n) AS BIGINT) AS b FROM cl GROUP BY 1
), nt AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt FROM cl
), mi_q AS (
  SELECT CAST(max(nt.nt) AS BIGINT) AS nv,
    CAST(sum(CAST(round(({_D_TERM}) * {Q}) AS BIGINT)) AS BIGINT)
      AS smi
  FROM cl
  JOIN ra ON cl.cell_id = ra.cell_id
  JOIN rb ON cl.label = rb.label, nt
), ha_q AS (
  SELECT CAST(sum(CAST(round((-{_D_HA} * ln({_D_HA})) * {Q})
    AS BIGINT)) AS BIGINT) AS sha
  FROM ra, nt
), hb_q AS (
  SELECT CAST(sum(CAST(round((-{_D_HB} * ln({_D_HB})) * {Q})
    AS BIGINT)) AS BIGINT) AS shb
  FROM rb, nt
)
SELECT nv AS n_vectors,
  {round_portable_duck(_D_MI, 6)} AS mi,
  {round_portable_duck(_D_HC, 6)} AS h_cells,
  {round_portable_duck(_D_HL, 6)} AS h_labels,
  {round_portable_duck(
      f"CASE WHEN {_D_HC} * {_D_HL} > 0.0 "
      f"THEN {_D_MI} / sqrt({_D_HC} * {_D_HL}) ELSE 0.0 END", 6)}
    AS nmi
FROM mi_q, ha_q, hb_q
"""


_D_VP = "(CAST(cl.n AS DOUBLE) / CAST(nt.nt AS DOUBLE))"
_D_HLC = (f"(-{_D_VP} * ln(CAST(cl.n AS DOUBLE) "
          f"/ CAST(ra.a AS DOUBLE)))")
_D_HCL = (f"(-{_D_VP} * ln(CAST(cl.n AS DOUBLE) "
          f"/ CAST(rb.b AS DOUBLE)))")
_D_H = ("(CASE WHEN shb > 0 THEN 1.0 - CAST(shlc AS DOUBLE) "
        "/ CAST(shb AS DOUBLE) ELSE 1.0 END)")
_D_C = ("(CASE WHEN sha > 0 THEN 1.0 - CAST(shcl AS DOUBLE) "
        "/ CAST(sha AS DOUBLE) ELSE 1.0 END)")

_ORACLE_VMEASURE = ORACLE_CL_PREFIX + f""", ra AS (
  SELECT cell_id, CAST(sum(n) AS BIGINT) AS a FROM cl GROUP BY 1
), rb AS (
  SELECT label, CAST(sum(n) AS BIGINT) AS b FROM cl GROUP BY 1
), nt AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt FROM cl
), cond AS (
  SELECT CAST(max(nt.nt) AS BIGINT) AS nv,
    CAST(sum(CAST(round(({_D_HLC}) * {Q}) AS BIGINT)) AS BIGINT)
      AS shlc,
    CAST(sum(CAST(round(({_D_HCL}) * {Q}) AS BIGINT)) AS BIGINT)
      AS shcl
  FROM cl
  JOIN ra ON cl.cell_id = ra.cell_id
  JOIN rb ON cl.label = rb.label, nt
), ha_q AS (
  SELECT CAST(sum(CAST(round((-{_D_HA} * ln({_D_HA})) * {Q})
    AS BIGINT)) AS BIGINT) AS sha
  FROM ra, nt
), hb_q AS (
  SELECT CAST(sum(CAST(round((-{_D_HB} * ln({_D_HB})) * {Q})
    AS BIGINT)) AS BIGINT) AS shb
  FROM rb, nt
)
SELECT nv AS n_vectors,
  {round_portable_duck(_D_H, 6)} AS homogeneity,
  {round_portable_duck(_D_C, 6)} AS completeness,
  {round_portable_duck(
      f"CASE WHEN ({_D_H}) + ({_D_C}) > 0.0 THEN "
      f"2.0 * ({_D_H}) * ({_D_C}) / (({_D_H}) + ({_D_C})) "
      f"ELSE 0.0 END", 6)} AS v_measure
FROM cond, ha_q, hb_q
"""


QUERIES: dict = {
    "emb_ari_embeddings": (_q_ari, _ORACLE_ARI),
    "emb_nmi_embeddings": (_q_nmi, _ORACLE_NMI),
    "emb_vmeasure_embeddings": (_q_vmeasure, _ORACLE_VMEASURE),
}

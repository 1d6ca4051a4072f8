"""Deterministic sampling / dataset splitting for training pipelines.

Random sampling (``df.sample``) is nondeterministic across runs,
partitionings, and engines — useless for reproducible train/val/test
splits or for sampling the SAME documents on re-runs over a grown
corpus. These operators assign by an integer LCG hash of the id:

- stable: a document keeps its split forever, independent of corpus
  size, partitioning, row order, or engine;
- disjoint and exhaustive: every row lands in exactly one split;
- engine-portable: pure BIGINT arithmetic, identical in the DuckDB
  oracle.

Scale: scan -> project, zero shuffles, trivially parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

PRIME = 2_147_483_647
_A, _C = 1103515245, 12345
BUCKETS = 10_000


def _bucket_expr(id_col: str, salt: int) -> str:
    """Deterministic bucket in [0, BUCKETS): LCG over the id. The +1
    keeps id 0 from mapping to the salt-only constant chain."""
    return (
        f"((({id_col} + 1) * {_A} + {_C} + {salt}) % {PRIME}) % {BUCKETS}"
    )


def hash_split(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    salt: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashed-id bucket ranges.

    ``splits`` maps name -> fraction; fractions must sum to 1 (within
    1/BUCKETS). Assignment is by cumulative bucket thresholds in the
    given insertion order, so the mapping is fully reproducible from
    (splits, salt).
    """
    fracs = list(splits.items())
    total = sum(f for _, f in fracs)
    if abs(total - 1.0) > 1.0 / BUCKETS:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bounds, acc = [], 0.0
    for name, f in fracs:
        acc += f
        bounds.append((name, int(round(acc * BUCKETS))))
    bounds[-1] = (bounds[-1][0], BUCKETS)  # close rounding gaps
    case = "CASE "
    for name, ub in bounds[:-1]:
        case += f"WHEN __b < {ub} THEN '{name}' "
    case += f"ELSE '{bounds[-1][0]}' END"
    return (
        df.withColumn("__b", F.expr(_bucket_expr(id_col, salt)))
        .withColumn(out_col, F.expr(case))
        .drop("__b")
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: int = 42,
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by hashed id —
    stable under re-runs and corpus growth (a kept id stays kept)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thresh = int(round(fraction * BUCKETS))
    return df.filter(F.expr(f"{_bucket_expr(id_col, salt)} < {thresh}"))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: int = 42,
) -> DataFrame:
    """Deterministic per-stratum downsampling: each stratum keeps its
    own hashed-id fraction (the standard corpus-rebalancing move —
    e.g. keep 100% of a rare language, 10% of English). Rows in strata
    absent from ``fractions`` keep ``default_fraction``.

    Same properties as hash_sample: stable under re-runs, corpus
    growth, partitioning, and engine; scan -> filter, zero shuffles.
    """
    for name, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    case = f"CASE {strata_col} "
    for name, f in sorted(fractions.items()):
        case += f"WHEN '{name}' THEN {int(round(f * BUCKETS))} "
    case += f"ELSE {int(round(default_fraction * BUCKETS))} END"
    return df.filter(F.expr(f"{_bucket_expr(id_col, salt)} < ({case})"))


def sample_k_per_group(
    df: DataFrame,
    k: int,
    group_col: str,
    id_col: str = "doc_id",
    salt: int = 42,
) -> DataFrame:
    """Deterministic "k rows per group": rank rows inside each group by
    hashed id (ties broken by the id itself) and keep the first k —
    a reproducible alternative to reservoir sampling whose output is
    independent of partitioning, engine, and arrival order.

    One shuffle (the rank window on ``group_col``); at 100 TB the
    usual trick applies: pre-filter with an over-admitting hash
    threshold before the window so the sort touches ~k*fudge rows per
    group, not the whole group.
    """
    h = f"(({id_col} + 1) * {_A} + {_C} + {salt}) % {PRIME}"
    return (
        df.withColumn(
            "__rk",
            F.expr(f"row_number() OVER (PARTITION BY {group_col} "
                   f"ORDER BY {h} ASC, {id_col} ASC)"),
        )
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def mix_to_proportions(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: int = 42,
) -> DataFrame:
    """Resample so strata appear in target proportions (domain mixing:
    "the training mix is 50% en, 20% fr, ..."), keeping as many rows
    as possible: the binding stratum (smallest n/w) is kept at 100%
    and every other stratum downsamples to match. Strata not named in
    ``weights`` are dropped.

    The per-stratum counts are a vocabulary-sized aggregate collected
    to the driver (strata are languages/sources — thousands at most);
    the data pass itself is scan -> hash filter, zero shuffles.
    Thresholds use floor(x + 0.5) so the oracle can reproduce the
    arithmetic exactly (Python's round() half-evens).
    """
    import math

    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {name!r} must be >= 0")
    if not any(w > 0 for w in weights.values()):
        raise ValueError("at least one weight must be positive")
    counts = {
        r[0]: r[1]
        for r in df.filter(
            F.col(strata_col).isin(list(weights))
        ).groupBy(strata_col).count().collect()
    }
    missing = [s for s, w in weights.items() if w > 0 and s not in counts]
    if missing:
        raise ValueError(f"strata absent from the data: {missing}")
    t = min(counts[s] / w for s, w in weights.items() if w > 0)
    case = f"CASE {strata_col} "
    for name in sorted(w_ for w_ in weights if weights[w_] > 0):
        th = int(math.floor(weights[name] * t / counts[name]
                            * BUCKETS + 0.5))
        case += f"WHEN '{name}' THEN {th} "
    case += "ELSE 0 END"
    return df.filter(F.expr(f"{_bucket_expr(id_col, salt)} < ({case})"))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling without replacement, k rows:
    the Efraimidis–Spirakis A-ES scheme with the LCG hash as the
    uniform draw. Each row gets priority ``ln(u) / w`` (monotone in
    ``u^(1/w)``); the k largest priorities win, so inclusion odds are
    proportional to weight, reproducible from (salt, id), and stable
    under partitioning/corpus growth.

    Scale: priority is a scan-side projection; top-k goes through
    ``orderBy().limit(k)`` = TakeOrderedAndProject (per-partition heap,
    no global sort). Weights must be strictly positive.
    """
    h = f"((({id_col} + 1) * {_A} + {_C} + {salt}) % {PRIME})"
    u = f"((CAST({h} AS DOUBLE) + 0.5) / {PRIME})"
    pr = f"(ln({u}) / CAST({weight_col} AS DOUBLE))"
    scored = df.withColumn("__pr", F.expr(pr))
    return (
        scored.orderBy(F.col("__pr").desc(), F.col(id_col))
        .limit(k)
        .drop("__pr")
    )


# --------------------------------------------------------------------------
# Registry queries + oracles
# --------------------------------------------------------------------------

_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def _q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = hash_split(docs, _SPLITS)
    return out.select("doc_id", "split")


def _duck_split_case() -> str:
    b = _bucket_expr("doc_id", 42)
    return (
        f"CASE WHEN ({b}) < 9000 THEN 'train' "
        f"WHEN ({b}) < 9500 THEN 'val' ELSE 'test' END"
    )


_ORACLE_HASH_SPLIT = f"""
SELECT doc_id, {_duck_split_case()} AS split
FROM documents
"""


_STRATA_FRACS = {"en": 0.1, "zh": 1.0, "es": 0.5}


def _q_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, _STRATA_FRACS, strata_col="lang", default_fraction=0.25
    )
    return out.select("doc_id", "lang", "source")


def _duck_strata_case() -> str:
    case = "CASE lang "
    for name, f in sorted(_STRATA_FRACS.items()):
        case += f"WHEN '{name}' THEN {int(round(f * BUCKETS))} "
    case += f"ELSE {int(round(0.25 * BUCKETS))} END"
    return case


_ORACLE_STRATIFIED = f"""
SELECT doc_id, lang, source
FROM documents
WHERE ({_bucket_expr('doc_id', 42)}) < ({_duck_strata_case()})
"""


_MIX_WEIGHTS = {"en": 0.5, "fr": 0.2, "de": 0.2, "es": 0.1}


def _q_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return mix_to_proportions(docs, _MIX_WEIGHTS, strata_col="lang") \
        .select("doc_id", "lang")


def _q_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return sample_k_per_group(docs, 7, group_col="source") \
        .select("doc_id", "source")


_MIX_VALUES = ", ".join(
    f"('{s}', CAST({w!r} AS DOUBLE))" for s, w in _MIX_WEIGHTS.items()
)

# Mirrors mix_to_proportions' driver arithmetic: t = min(n/w); each
# stratum's bucket threshold = floor(w*t/n*BUCKETS + 0.5) — identical
# left-assoc double ops, so thresholds agree bit-for-bit.
_ORACLE_MIX = f"""
WITH w(lang, wt) AS (VALUES {_MIX_VALUES}),
counts AS (
  SELECT lang, count(*) AS n FROM documents
  WHERE lang IN (SELECT lang FROM w) GROUP BY 1
),
t AS (
  SELECT min(CAST(n AS DOUBLE) / wt) AS t
  FROM counts JOIN w USING (lang) WHERE wt > 0
),
thr AS (
  SELECT c.lang, CAST(floor(w.wt * t.t / c.n * {BUCKETS} + 0.5) AS BIGINT)
         AS th
  FROM counts c JOIN w USING (lang) CROSS JOIN t
  WHERE w.wt > 0
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr USING (lang)
WHERE ({_bucket_expr('doc_id', 42)}) < th
"""

_ORACLE_K_PER_GROUP = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ((doc_id + 1) * {_A} + {_C} + 42) % {PRIME} ASC,
                    doc_id ASC) AS rk
  FROM documents
)
SELECT doc_id, source FROM ranked WHERE rk <= 7
"""

_WEIGHTED_K = 40


def _q_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return weighted_sample(docs, _WEIGHTED_K, weight_col="n_chars") \
        .select("doc_id", "n_chars")


_ORACLE_WEIGHTED = f"""
WITH scored AS (
  SELECT doc_id, n_chars,
         row_number() OVER (
           ORDER BY ln((CAST(((doc_id + 1) * {_A} + {_C} + 42) % {PRIME}
                        AS DOUBLE) + 0.5) / {PRIME})
                    / CAST(n_chars AS DOUBLE) DESC,
                    doc_id ASC) AS rk
  FROM documents
)
SELECT doc_id, n_chars FROM scored WHERE rk <= {_WEIGHTED_K}
"""

QUERIES: dict = {
    "sample_hash_split_documents": (_q_hash_split, _ORACLE_HASH_SPLIT),
    "sample_stratified_documents": (_q_stratified, _ORACLE_STRATIFIED),
    "sample_mix_proportions_documents": (_q_mix, _ORACLE_MIX),
    "sample_k_per_group_documents": (_q_k_per_group, _ORACLE_K_PER_GROUP),
    "sample_weighted_documents": (_q_weighted, _ORACLE_WEIGHTED),
}

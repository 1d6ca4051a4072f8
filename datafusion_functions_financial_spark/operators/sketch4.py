"""Bottom-k distinct sketch: the mergeable order-statistic sampler —
per key, keep the k smallest portable-hash values of the tracked
column. Two things fall out of that one structure:

- a **distinct-count estimate**: if fewer than k distinct hashes
  exist the count is exact; otherwise ``(k - 1) * P / h_k`` (the
  k-th smallest hash locates the sampling fraction in hash space) —
  the classic KMV/bottom-k estimator (Bar-Yossef et al. 2002,
  Beyer et al. 2007), relative error ~ 1/sqrt(k - 2);
- a **deterministic uniform sample** of the distinct values (the
  kept ids), reproducible from (salt, k) alone.

Unlike HLL registers (sketch.py) the bottom-k keeps actual ids — it
supports set operations (intersect the kept sets to estimate Jaccard)
and is EXACTLY mergeable: bottom-k of a union is the bottom-k of the
concatenated sketches, an identity the tests assert. The hash is the
repo's LCG over int64 — pure arithmetic, so Spark and the SQL oracle
agree bitwise.

Plan shape at scale: one DISTINCT on (key, hash) — a map-side
combinable shuffle on narrow rows — then a per-key top-k rank over
the distinct-hash relation. The rank window sorts per key; at 100 TB
pre-filter with a broadcast per-key hash threshold from a first
sampling pass (the k-per-group trick used by hill_tail) so the sort
touches ~k rows per key. The merge query never re-reads data: it
unions two sketch relations and re-ranks ≤ 2k rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["bottomk_sketch", "bottomk_estimate", "bottomk_merge"]

P = 2_147_483_647
A = 1_103_515_245
C = 12_345
K = 256


def _hash_expr(id_expr: str, salt: int) -> str:
    return (f"((((CAST(({id_expr}) AS BIGINT) + 1) * {A} + {C} "
            f"+ {salt}) % {P}) + {P}) % {P}")


def bottomk_sketch(df: DataFrame, key_col: str, id_expr: str,
                   k: int = K, salt: int = 7) -> DataFrame:
    """(key, __rk, __h): the k smallest distinct hashes per key."""
    return (
        df.selectExpr(f"{key_col} AS __key",
                      f"{_hash_expr(id_expr, salt)} AS __h")
        .distinct()
        .withColumn("__rk", F.row_number().over(
            Window.partitionBy("__key").orderBy("__h")).cast("long"))
        .filter(F.col("__rk") <= k)
    )


def bottomk_estimate(sketch: DataFrame, k: int = K) -> DataFrame:
    """(key, n_kept, kth_hash, est_distinct) from a sketch relation.
    Saturated keys estimate ``(k-1) * P / h_k``; unsaturated keys are
    exact (the sketch holds every distinct hash)."""
    agg = sketch.groupBy("__key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max(F.expr(f"CASE WHEN __rk = {k} THEN __h END"))
        .alias("kth_hash"),
    )
    return agg.select(
        F.col("__key").alias("key"), "n_kept", "kth_hash",
        round_portable(F.expr(
            f"CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE) "
            f"ELSE CAST({k - 1} AS DOUBLE) * {float(P)!r} "
            f"/ CAST(kth_hash AS DOUBLE) END"), 4
        ).alias("est_distinct"),
    )


def bottomk_merge(*sketches: DataFrame, k: int = K) -> DataFrame:
    """Union sketch relations and re-rank: the exact bottom-k of the
    union of the sketched sets — no data re-read, ≤ len(sketches)*k
    rows per key enter the re-rank."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return (
        u.select("__key", "__h").distinct()
        .withColumn("__rk", F.row_number().over(
            Window.partitionBy("__key").orderBy("__h")).cast("long"))
        .filter(F.col("__rk") <= k)
    )


# --------------------------------------------------------------------------
# Gate queries: distinct users per event_type — estimate vs truth,
# and the month-sharded merge reproducing the direct sketch
# --------------------------------------------------------------------------


def _q_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    est = bottomk_estimate(bottomk_sketch(ev, "event_type", "user_id"))
    truth = ev.groupBy(F.col("event_type").alias("key")).agg(
        F.countDistinct("user_id").cast("bigint").alias("true_distinct"))
    return (
        est.join(truth, "key")
        .select("key", "n_kept", "kth_hash", "est_distinct",
                "true_distinct",
                round_portable(F.expr(
                    "abs(est_distinct - CAST(true_distinct AS DOUBLE))"
                    " / CAST(true_distinct AS DOUBLE)"), 4
                ).alias("rel_err"))
    )


_ORACLE_BOTTOMK = f"""
WITH hashed AS (
  SELECT DISTINCT event_type AS key,
    {_hash_expr("user_id", 7)} AS h
  FROM events
), ranked AS (
  SELECT key, h,
    row_number() OVER (PARTITION BY key ORDER BY h) AS rk
  FROM hashed
), sk AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n_kept,
    max(CASE WHEN rk = {K} THEN h END) AS kth_hash
  FROM ranked WHERE rk <= {K} GROUP BY 1
), est AS (
  SELECT key, n_kept, kth_hash,
    {round_portable_duck(
        f"CASE WHEN n_kept < {K} THEN CAST(n_kept AS DOUBLE) "
        f"ELSE CAST({K - 1} AS DOUBLE) * {float(P)!r} "
        f"/ CAST(kth_hash AS DOUBLE) END", 4)} AS est_distinct
  FROM sk
), truth AS (
  SELECT event_type AS key,
    CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct
  FROM events GROUP BY 1
)
SELECT e.key, e.n_kept, e.kth_hash, e.est_distinct, t.true_distinct,
  {round_portable_duck(
      "abs(e.est_distinct - CAST(t.true_distinct AS DOUBLE)) "
      "/ CAST(t.true_distinct AS DOUBLE)", 4)} AS rel_err
FROM est e JOIN truth t ON e.key = t.key
"""


def _q_bottomk_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard events by month, sketch each shard, merge — the merged
    estimate (which must equal the direct sketch's, an identity the
    tests assert) keyed by event_type."""
    ev = load(spark, sf_dir, "events").withColumn(
        "__m", F.expr("(ts DIV 1000) DIV 2592000000000"))
    shard = bottomk_sketch(
        ev.withColumn("__key", F.concat_ws(
            "|", F.col("event_type"), F.col("__m"))),
        "__key", "user_id")
    # restore the real key, then merge across months
    restored = shard.select(
        F.expr("substring_index(__key, '|', 1)").alias("__key"), "__h")
    return bottomk_estimate(bottomk_merge(restored))


_ORACLE_BOTTOMK_MERGE = f"""
WITH sharded AS (
  SELECT DISTINCT
    event_type || '|' ||
      CAST((epoch_us(ts) // 2592000000000) AS VARCHAR) AS skey,
    event_type AS key,
    {_hash_expr("user_id", 7)} AS h
  FROM events
), ranked AS (
  SELECT key, h,
    row_number() OVER (PARTITION BY skey ORDER BY h) AS rk
  FROM sharded
), merged AS (
  SELECT DISTINCT key, h FROM ranked WHERE rk <= {K}
), reranked AS (
  SELECT key, h,
    row_number() OVER (PARTITION BY key ORDER BY h) AS rk
  FROM merged
), sk AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n_kept,
    max(CASE WHEN rk = {K} THEN h END) AS kth_hash
  FROM reranked WHERE rk <= {K} GROUP BY 1
)
SELECT key, n_kept, kth_hash,
  {round_portable_duck(
      f"CASE WHEN n_kept < {K} THEN CAST(n_kept AS DOUBLE) "
      f"ELSE CAST({K - 1} AS DOUBLE) * {float(P)!r} "
      f"/ CAST(kth_hash AS DOUBLE) END", 4)} AS est_distinct
FROM sk
"""


QUERIES: dict = {
    "sketch_bottomk_users_events": (_q_bottomk, _ORACLE_BOTTOMK),
    "sketch_bottomk_merge_events": (_q_bottomk_merge,
                                    _ORACLE_BOTTOMK_MERGE),
}

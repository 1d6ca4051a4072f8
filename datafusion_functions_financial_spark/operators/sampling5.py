"""Sampling #5: unequal-probability (size-banded) hash sampling with
the Horvitz-Thompson total estimator and its exactness audit — the
estimation-side companion to the gated drawing tiers (hash split,
stratified, Neyman, systematic, balanced): those verify WHO gets
drawn; this verifies that a weighted sample ESTIMATES the population
total correctly, the property a 100 TB pipeline actually relies on
when it reports metrics from a 0.1% sample.

Design: rows fall into size bands (small/medium/large by value);
each band b samples deterministically at rate 1/m_b by key
(large rows sampled densest — the classic size-biased design); the
HT estimator of the population total is sum over sampled rows of
value / pi_i = value * m_b — EXACT integer arithmetic in cents,
since every weight is an integer. The audit row reports the
estimate, the true total, and the relative error.

Engine-exactness: membership is ``id % m_b = 0`` — engine-portable
modular arithmetic (the gated sampling queries' convention; real
deployments would swap in a salted hash of the key, which only
changes WHICH rows land in the sample, not the estimator algebra);
cents sums and integer-weighted estimates are exact BIGINT.

Plan shape at 100 TB: one pass, no shuffle beyond the final scalar
aggregate (map-side combinable); the sample itself never
materializes driver-side.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (sampling tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["ht_total_estimate"]

# band -> sampling modulus (inclusion probability 1/m): large rows
# sampled densest
BANDS = ((0, 16), (1, 4), (2, 1))


def ht_total_estimate(df: DataFrame, id_col: str, value_expr: str,
                      band_expr: str,
                      bands: tuple = BANDS) -> DataFrame:
    """One row (n_pop, n_sampled, est_total, true_total, rel_err):
    the Horvitz-Thompson estimate of sum(value) from the size-banded
    ``id % m_b = 0`` sample vs the true total.

    ``band_expr`` must yield the band index (0, 1, 2, ...); each
    band's modulus comes from ``bands``."""
    mod_case = " ".join(
        f"WHEN __band = {b} THEN {m}" for b, m in bands)
    rows = df.select(
        F.expr(id_col).alias("__id"),
        F.expr(f"CAST(round(({value_expr}) * 100) AS BIGINT)")
        .alias("__cents"),
        F.expr(band_expr).alias("__band"),
    ).filter("__cents IS NOT NULL").withColumn(
        "__m", F.expr(f"CASE {mod_case} END"))
    red = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum("__cents").alias("__true"),
        F.sum(F.expr(
            "CASE WHEN __id % __m = 0 THEN 1 ELSE 0 END"))
        .cast("bigint").alias("n_sampled"),
        F.sum(F.expr(
            "CASE WHEN __id % __m = 0 THEN __cents * __m "
            "ELSE 0 END")).alias("__est"),
    )
    return red.select(
        "n_pop", "n_sampled",
        round_portable(F.expr(
            "CAST(__est AS DOUBLE) / 100.0"), 2).alias("est_total"),
        round_portable(F.expr(
            "CAST(__true AS DOUBLE) / 100.0"), 2).alias("true_total"),
        round_portable(F.expr(
            "abs(CAST(__est - __true AS DOUBLE)) "
            "/ CAST(__true AS DOUBLE)"), 6).alias("rel_err"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle (orders: bands by o_totalprice)
# --------------------------------------------------------------------------

_BAND = ("CASE WHEN o_totalprice < 50000.0 THEN 0 "
         "WHEN o_totalprice < 200000.0 THEN 1 ELSE 2 END")


def _q_ht(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ht_total_estimate(load(spark, sf_dir, "orders"),
                             "o_orderkey", "o_totalprice", _BAND)


_D_MOD = " ".join(f"WHEN band = {b} THEN {m}" for b, m in BANDS)

_ORACLE_HT = f"""
WITH rows_l AS (
  SELECT o_orderkey AS id,
    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
    {_BAND} AS band
  FROM orders WHERE o_totalprice IS NOT NULL
), m AS (
  SELECT id, cents, CASE {_D_MOD} END AS m FROM rows_l
), red AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pop,
    CAST(sum(cents) AS BIGINT) AS tru,
    CAST(sum(CASE WHEN id % m = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_sampled,
    CAST(sum(CASE WHEN id % m = 0 THEN cents * m ELSE 0 END)
      AS BIGINT) AS est
  FROM m
)
SELECT n_pop, n_sampled,
  {round_portable_duck("CAST(est AS DOUBLE) / 100.0", 2)}
    AS est_total,
  {round_portable_duck("CAST(tru AS DOUBLE) / 100.0", 2)}
    AS true_total,
  {round_portable_duck(
      "abs(CAST(est - tru AS DOUBLE)) / CAST(tru AS DOUBLE)", 6)}
    AS rel_err
FROM red
"""


QUERIES: dict = {
    "sample_ht_total_orders": (_q_ht, _ORACLE_HT),
}

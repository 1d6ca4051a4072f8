"""One-pass Pearson correlation matrix over a fixed numeric column
set — the data-profiling step that finds redundant / leaking features
before a training run.

All C(n,2) correlations come out of ONE map-side-combinable aggregate:
each column is pre-scaled by a fixed constant (Pearson is
scale-invariant; the constants keep every quantized product inside
int64 at any row count the gate SFs reach), every sum/product
quantizes per-term to BIGINT (the SCALING.md order-free rule), and the
correlation closed form is one shared expression tree per pair.

Plan shape at scale: one scan, one aggregate producing a single row of
2n + n(n+1)/2 BIGINT cells, then a driver-free explode of that row
into the (col_a, col_b, n, pearson) relation via a broadcast literal
pair table. Nothing shuffles but the partial-agg combine. int64
headroom: scaled values are O(1), so per-term quanta are ≤ Q2 and the
sum saturates only past ~9e12 rows — re-scale Q2 down one decade per
100x beyond that.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["correlation_matrix"]

Q = 10 ** 8
QF = float(Q)
Q2 = 10 ** 6
Q2F = float(Q2)

# Fixed per-column scale constants (divide before quantizing).
_LINEITEM_COLS = {
    "l_quantity": 100.0,
    "l_extendedprice": 1_000_000.0,
    "l_discount": 1.0,
    "l_tax": 1.0,
}


def correlation_matrix(df: DataFrame,
                       cols_scales: dict[str, float]) -> DataFrame:
    """(col_a, col_b, n, pearson) for every unordered column pair.
    Rows with a NULL in ANY tracked column are excluded (one shared
    filter, so every pair sees the same n)."""
    names = list(cols_scales)
    flt = df.filter(F.expr(" AND ".join(
        f"{c} IS NOT NULL" for c in names)))
    scaled = {c: f"(CAST({c} AS DOUBLE) / {s!r})"
              for c, s in cols_scales.items()}
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in names:
        aggs.append(F.sum(F.expr(
            f"CAST(round({scaled[c]} * {Q}) AS BIGINT)"
        )).alias(f"__s_{c}"))
        aggs.append(F.sum(F.expr(
            f"CAST(round({scaled[c]} * {scaled[c]} * {Q2}) AS BIGINT)"
        )).alias(f"__ss_{c}_{c}"))
    for a, b in combinations(names, 2):
        aggs.append(F.sum(F.expr(
            f"CAST(round({scaled[a]} * {scaled[b]} * {Q2}) AS BIGINT)"
        )).alias(f"__ss_{a}_{b}"))
    one = flt.agg(*aggs)

    def corr_expr(a: str, b: str) -> str:
        ma = f"(CAST(__s_{a} AS DOUBLE) / (CAST(__n AS DOUBLE) * {QF!r}))"
        mb = f"(CAST(__s_{b} AS DOUBLE) / (CAST(__n AS DOUBLE) * {QF!r}))"
        saa = (f"(CAST(__ss_{a}_{a} AS DOUBLE) / {Q2F!r} "
               f"- CAST(__n AS DOUBLE) * {ma} * {ma})")
        sbb = (f"(CAST(__ss_{b}_{b} AS DOUBLE) / {Q2F!r} "
               f"- CAST(__n AS DOUBLE) * {mb} * {mb})")
        sab = (f"(CAST(__ss_{a}_{b} AS DOUBLE) / {Q2F!r} "
               f"- CAST(__n AS DOUBLE) * {ma} * {mb})")
        return f"(({sab}) / sqrt(({saa}) * ({sbb})))"

    # Unpivot the one-row cell vector with stack(): the aggregate is
    # computed ONCE and explodes driver-free into the pair relation.
    pairs = list(combinations(names, 2))
    wide = one.select(
        "__n",
        *[round_portable(F.expr(corr_expr(a, b)), 6)
          .alias(f"__r_{i}") for i, (a, b) in enumerate(pairs)])
    stack_args = ", ".join(
        f"'{a}', '{b}', __r_{i}" for i, (a, b) in enumerate(pairs))
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) "
        f"AS (col_a, col_b, pearson)",
        "__n AS n",
    ).select("col_a", "col_b", "n", "pearson")


def _q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return correlation_matrix(load(spark, sf_dir, "lineitem"),
                              _LINEITEM_COLS)


def _corr_oracle() -> str:
    names = list(_LINEITEM_COLS)
    scaled = {c: f"(CAST({c} AS DOUBLE) / {s!r})"
              for c, s in _LINEITEM_COLS.items()}
    cells = ["CAST(count(*) AS BIGINT) AS n"]
    for c in names:
        cells.append(
            f"CAST(sum(CAST(round({scaled[c]} * {Q}) AS BIGINT)) "
            f"AS BIGINT) AS s_{c}")
        cells.append(
            f"CAST(sum(CAST(round({scaled[c]} * {scaled[c]} * {Q2}) "
            f"AS BIGINT)) AS BIGINT) AS ss_{c}_{c}")
    for a, b in combinations(names, 2):
        cells.append(
            f"CAST(sum(CAST(round({scaled[a]} * {scaled[b]} * {Q2}) "
            f"AS BIGINT)) AS BIGINT) AS ss_{a}_{b}")
    flt = " AND ".join(f"{c} IS NOT NULL" for c in names)

    def corr_expr(a: str, b: str) -> str:
        ma = f"(CAST(s_{a} AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
        mb = f"(CAST(s_{b} AS DOUBLE) / (CAST(n AS DOUBLE) * {QF!r}))"
        saa = (f"(CAST(ss_{a}_{a} AS DOUBLE) / {Q2F!r} "
               f"- CAST(n AS DOUBLE) * {ma} * {ma})")
        sbb = (f"(CAST(ss_{b}_{b} AS DOUBLE) / {Q2F!r} "
               f"- CAST(n AS DOUBLE) * {mb} * {mb})")
        sab = (f"(CAST(ss_{a}_{b} AS DOUBLE) / {Q2F!r} "
               f"- CAST(n AS DOUBLE) * {ma} * {mb})")
        return f"(({sab}) / sqrt(({saa}) * ({sbb})))"

    pair_rows = " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, n, "
        f"{round_portable_duck(corr_expr(a, b), 6)} AS pearson "
        f"FROM one"
        for a, b in combinations(names, 2))
    return f"""
WITH one AS (
  SELECT {', '.join(cells)} FROM lineitem WHERE {flt}
)
{pair_rows}
"""


QUERIES: dict = {
    "dq_corr_matrix_lineitem": (_q_corr_matrix, _corr_oracle()),
}

"""Run every declared query on Spark AND its DuckDB oracle; compare.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json):
row count, column names, and order-insensitive values (columns sorted
by name). Any query added to the registry is automatically covered.
"""

import math

import pytest

from datafusion_functions_financial_spark.plans.registry import (
    all_oracles,
    all_queries,
)

_QUERIES = all_queries()
_ORACLES = all_oracles()


def normalize(rows, cols):
    """Sort columns by name, then rows; make floats comparable."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        parts = []
        for v in row:
            if v is None:
                parts.append((0, ""))
            elif isinstance(v, float):
                parts.append((1, str(round(v, 6) + 0.0)))
            else:
                parts.append((1, str(v)))
        return tuple(parts)

    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=key), [cols[i] for i in order]


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and math.isnan(a):
            return isinstance(b, float) and math.isnan(b)
        try:
            return a == b or abs(float(a) - float(b)) < 1e-9
        except (TypeError, ValueError):
            return False
    return a == b


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = _QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    if name not in _ORACLES:
        assert len(srows) >= 0  # rows-only check for non-SQL ops
        return

    res = duck.execute(_ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)"
    )

    s_norm, cols_sorted = normalize(srows, scols)
    d_norm, _ = normalize(drows, dcols)
    mismatches = 0
    first = None
    for sr, dr in zip(s_norm, d_norm):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            if not values_equal(sv, dv):
                mismatches += 1
                if first is None:
                    first = (cols_sorted[c], sv, dv)
    assert mismatches == 0, (
        f"{name}: {mismatches} value mismatches; first: col={first[0]} "
        f"spark={first[1]!r} duckdb={first[2]!r}"
    )

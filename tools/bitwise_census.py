"""Bitwise query/oracle census — stricter than tests/test_oracle_parity.py.

Replicates the driver's CORRECTNESS value-hash compare: columns sorted
by name, rows order-insensitive, and every float compared at full bit
fidelity (struct-packed double), so −0.0 vs +0.0 or a 1-ulp rounding
divergence fails here instead of in the driver gate.

Usage:
    python tools/bitwise_census.py [--sf /root/testdata/sf0.01] [name ...]

With no names, runs ALL registered pairs (slow — a full census).
Prints one line per query and a final summary; exit code 1 on any
mismatch.
"""

from __future__ import annotations

import argparse
import struct
import sys

sys.path.insert(0, ".")


def _bits(v):
    if v is None:
        return "\x00null"
    if isinstance(v, float):
        return "f" + struct.pack("<d", v).hex()
    if isinstance(v, bool):
        return f"b{v}"
    return f"v{v!r}"


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_bits(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from datafusion_functions_financial_spark.plans.registry import (
        all_oracles, all_queries,
    )

    queries = all_queries()
    oracles = all_oracles()
    names = args.names or sorted(queries)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bitwise-census")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    bad = 0
    for name in names:
        if name not in queries:
            print(f"{name}: UNKNOWN")
            bad += 1
            continue
        sdf = queries[name](spark, args.sf)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows)")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = [tuple(r) for r in res.fetchall()]
        s_norm, scols = _norm(srows, sdf.columns)
        d_norm, _ = _norm(drows, dcols)
        if sorted(sdf.columns) != sorted(dcols):
            print(f"{name}: COLUMN MISMATCH {sdf.columns} vs {dcols}")
            bad += 1
        elif len(s_norm) != len(d_norm):
            print(f"{name}: ROWCOUNT {len(s_norm)} vs {len(d_norm)}")
            bad += 1
        elif s_norm != d_norm:
            n_bad = sum(1 for a, b in zip(s_norm, d_norm) if a != b)
            first = next(
                (a, b) for a, b in zip(s_norm, d_norm) if a != b)
            print(f"{name}: {n_bad} BITWISE row mismatches; "
                  f"first {first[0]} vs {first[1]} (cols {scols})")
            bad += 1
        else:
            print(f"{name}: ok ({len(s_norm)} rows)")
    print(f"census: {len(names) - bad}/{len(names)} bitwise-identical")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Drive registered queries through the driver's CORRECTNESS-gate
contract: run the Spark query AND its DuckDB oracle on the same
parquet tables, canonicalize (columns sorted by name, rows sorted),
and compare values bitwise (numeric columns via float64 arrays,
others as exact lists).

Usage:
    python tools/verify_driver_contract.py [--sf DIR] [name ...]

With no names, verifies every query in the registry (slow at sf0.1).
Recipe: load the sf parquet tables as DuckDB views, run each Spark
query and its oracle SQL side-by-side, sort columns by name and rows
by value, then compare element-wise. The one known divergence from
the real driver is dtype strictness — the driver's hash tolerates
int32-vs-int64 (rank columns), this script reports value equality
only.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--driver-memory", default="10g",
                    help="JVM heap for the full-registry sf0.1 sweep "
                         "(the r06 sweep died at the default heap)")
    args = ap.parse_args()

    import duckdb
    import numpy as np
    from pyspark.sql import SparkSession

    from datafusion_functions_financial_spark.plans import registry

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("verify-driver-contract")
        .config("spark.driver.memory", args.driver_memory)
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    queries = registry.all_queries()
    oracles = registry.all_oracles()
    names = args.names or sorted(oracles)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    failures = 0
    for name in names:
        if name not in oracles:
            print(f"SKIP  {name} (no oracle — rows-only surface)")
            continue
        try:
            sdf = canon(queries[name](spark, args.sf).toPandas())
            ddf = canon(con.execute(oracles[name]).fetchdf())
            ok = len(sdf) == len(ddf) and list(sdf.columns) == list(
                ddf.columns)
            if ok:
                for c in sdf.columns:
                    a, b = sdf[c], ddf[c]
                    if a.dtype.kind in "if" or b.dtype.kind in "if":
                        ok = ok and np.array_equal(
                            a.astype("float64").to_numpy(),
                            b.astype("float64").to_numpy(),
                            equal_nan=True)
                    else:
                        ok = ok and list(a) == list(b)
            status = "OK   " if ok else "FAIL "
            failures += 0 if ok else 1
            print(f"{status}{name} rows={len(sdf)}/{len(ddf)}")
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"ERROR {name}: {str(e)[:160]}")
    print(f"{len(names)} checked, {failures} failing")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

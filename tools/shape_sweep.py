#!/usr/bin/env python
"""Shape-stability sweep (VERDICT r09 item 6): the Q11 lesson was a
threshold that selected 167 rows at sf0.01 but 0 at sf0.1. Audit
EVERY registered oracle for fixed-absolute / fixed-share gates whose
result set collapses or explodes across sf0.001 / 0.01 / 0.1.

Runs each query's DuckDB oracle (values are Spark-equal by the gate;
DuckDB is ~100x cheaper than a Spark plan per micro-query) at all
three SFs and flags:

- COLLAPSE: > 0 rows at some SF but 0 at a LARGER one (a threshold
  the data outgrew);
- EXPLODE: rows growing CLEARLY faster than the data between
  adjacent SFs (ratio > 20x while the data grows 10x — ~10x is
  expected linear growth for row-level transforms, not a flag);
- EMPTY_AT_ALL_SFS: 0 rows everywhere (the query tests nothing).

Each query runs in its OWN subprocess (SQL via stdin) with a DuckDB
memory limit: a heavy oracle that the OS kills loses only its own
row (recorded ERR:KILLED) instead of a shared worker pool.

Usage: python tools/shape_sweep.py [--jobs 8] [name ...]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
SFS = ("sf0.001", "sf0.01", "sf0.1")

_CHILD = r"""
import json, sys
import duckdb
sql = sys.stdin.read()
out = []
for sf in %(sfs)r:
    con = duckdb.connect()
    con.execute("SET memory_limit='12GB'")
    con.execute("SET threads=2")
    for t in %(tables)r:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '/root/testdata/{sf}/{t}.parquet'")
    try:
        n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    except Exception as e:
        n = f"ERR:{type(e).__name__}"
    finally:
        con.close()
    out.append(n)
print(json.dumps(out))
"""


def _counts_for(args):
    name, sql = args
    child = _CHILD % {"sfs": SFS, "tables": TABLES}
    try:
        r = subprocess.run(
            [sys.executable, "-c", child], input=sql,
            capture_output=True, text=True, timeout=1800)
        if r.returncode != 0:
            return name, [f"ERR:KILLED_rc{r.returncode}"] * len(SFS)
        # scan from the end for the result line (a DuckDB progress
        # artifact can share the last line with, or follow, the JSON)
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                return name, json.loads(line[line.index("["):])
            except (ValueError, json.JSONDecodeError):
                continue
        return name, ["ERR:NO_JSON"] * len(SFS)
    except subprocess.TimeoutExpired:
        return name, ["ERR:TIMEOUT"] * len(SFS)
    except Exception as e:  # noqa: BLE001 - record, don't kill pool
        return name, [f"ERR:{type(e).__name__}"] * len(SFS)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--jobs", type=int, default=6)
    args = ap.parse_args()

    from datafusion_functions_financial_spark.plans import registry

    oracles = registry.all_oracles()
    names = args.names or sorted(oracles)
    work = [(n, oracles[n]) for n in names if n in oracles]

    rows: dict[str, list] = {}
    with ThreadPoolExecutor(max_workers=args.jobs) as ex:
        for name, counts in ex.map(_counts_for, work):
            rows[name] = counts
            print(f"  {name}: {counts}", file=sys.stderr, flush=True)

    flags: dict[str, dict] = {}
    for name, c in sorted(rows.items()):
        if any(isinstance(x, str) for x in c):
            flags[name] = {"counts": c, "flag": "ERROR"}
            continue
        reasons = []
        if all(x == 0 for x in c):
            reasons.append("EMPTY_AT_ALL_SFS")
        else:
            for i in range(len(c) - 1):
                if c[i] > 0 and c[i + 1] == 0:
                    reasons.append(
                        f"COLLAPSE_{SFS[i]}_to_{SFS[i + 1]}")
                if c[i] > 0 and c[i + 1] > 20 * c[i]:
                    reasons.append(
                        f"EXPLODE_{SFS[i]}_to_{SFS[i + 1]}"
                        f"_x{c[i + 1] / c[i]:.1f}")
        if reasons:
            flags[name] = {"counts": c, "flag": ";".join(reasons)}

    print(json.dumps({
        "n_queries": len(rows),
        "n_flagged": len(flags),
        "flags": flags,
    }, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

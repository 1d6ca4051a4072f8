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
import hashlib
import re
import sys
import time

sys.path.insert(0, ".")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


# ---------------------------------------------------------------------------
# Shared-CTE materialization (VERDICT r10 item 5): the dedup family's
# oracles rebuild the same shingle/signature/candidate CTE chains from
# scratch per query — ~75 of the ~89 min full-registry sf0.1 sweep.
# The chains are TEXTUALLY identical across the family, so: parse each
# oracle's top-level WITH list, hash each CTE's (name, body) CHAIN
# (cumulative — a CTE is only equivalent if everything upstream is
# too), materialize chains shared by >= 2 oracles in the run as DuckDB
# temp tables once, and rewrite each oracle's shared prefix to
# ``name AS (SELECT * FROM <temp>)``. Values are untouched — the same
# relations feed the same tails. Any parse/rewrite miss falls back to
# the original SQL (and an execution error retries the original), so
# the optimization can never turn a green pair red.
# ---------------------------------------------------------------------------


def _skip_literal(sql: str, i: int) -> int:
    """``sql[i]`` is a quote char (' or "); return the index just past
    the closing quote, honouring doubled-quote escapes ('' / "").
    Returns len(sql) when unterminated."""
    q = sql[i]
    j, n = i + 1, len(sql)
    while j < n:
        if sql[j] == q:
            if j + 1 < n and sql[j + 1] == q:  # escaped quote
                j += 2
                continue
            return j + 1
        j += 1
    return n


def _skip_comment(sql: str, i: int) -> int:
    """``sql[i:i+2]`` is ``--``; return the index just past the end
    of the line-comment (the newline stays). Comments carry free text
    — apostrophes, unbalanced parens — so every scanner must skip
    them BEFORE interpreting quotes or parens (the ppjoin-stats
    oracle has both inside its -- notes)."""
    j = sql.find("\n", i)
    return len(sql) if j < 0 else j


def _parse_ctes(sql: str):
    """Split ``sql`` into (recursive_kw, [(name, body)], tail); returns
    None when the statement has no leading top-level WITH.

    The paren-depth scan is STRING-LITERAL-AWARE (ADVICE r11): 135 of
    the registry's oracles carry '(' / ')' inside SQL literals (regexp
    classes, format strings); counting those could mis-place a CTE
    boundary at a split that still executes — materializing a wrong
    temp relation that other queries silently reuse."""
    m = re.match(r"\s*WITH(\s+RECURSIVE)?\b", sql, re.IGNORECASE)
    if not m:
        return None
    rec = bool(m.group(1))
    i = m.end()
    ctes = []
    while True:
        m2 = re.match(r'\s*([\w"]+)\s+AS\s*\(', sql[i:])
        if not m2:
            return None
        name = m2.group(1)
        j = i + m2.end()
        depth, k = 1, j
        while depth and k < len(sql):
            c = sql[k]
            if c in ("'", '"'):
                k = _skip_literal(sql, k)
                continue
            if c == "-" and sql[k:k + 2] == "--":
                k = _skip_comment(sql, k)
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        if depth:
            return None
        ctes.append((name, sql[j:k - 1].strip()))
        m3 = re.match(r"\s*,", sql[k:])
        if m3:
            i = k + m3.end()
            continue
        return rec, ctes, sql[k:]


def _strip_comments(text: str) -> str:
    """Replace ``--`` line-comments (outside string literals) with a
    single space."""
    out = []
    i, n, start = 0, len(text), 0
    while i < n:
        c = text[i]
        if c in ("'", '"'):
            i = _skip_literal(text, i)
        elif c == "-" and text[i:i + 2] == "--":
            out.append(text[start:i])
            out.append(" ")
            i = start = _skip_comment(text, i)
        else:
            i += 1
    out.append(text[start:])
    return "".join(out)


def _norm(text: str) -> str:
    """Hash-canonical form of a CTE body: line-comments dropped (free
    text — not part of the relation), whitespace collapsed OUTSIDE
    string literals only, literal content kept verbatim (ADVICE r11:
    two CTEs differing only by whitespace inside a literal are
    different relations). Comment-stripping runs as its own pass so
    the space it leaves collapses with neighbouring whitespace —
    without that, _norm was not idempotent and two comment-bearing
    bodies formatted differently could hash apart (hypothesis-found,
    tests/test_cte_parser_properties.py)."""
    text = _strip_comments(text)
    out = []
    i, n, start = 0, len(text), 0
    while i < n:
        if text[i] in ("'", '"'):
            out.append(re.sub(r"\s+", " ", text[start:i]))
            j = _skip_literal(text, i)
            out.append(text[i:j])
            i = start = j
        else:
            i += 1
    out.append(re.sub(r"\s+", " ", text[start:]))
    return "".join(out).strip()


def _mask_string_literals(text: str) -> str:
    """Replace '...' string-literal content and ``--`` line-comments
    with spacers so name scans (dependencies, self-reference) cannot
    match words inside either. Double-quoted segments are SQL
    identifiers — kept, so dependencies on quoted CTE names still
    resolve."""
    out = []
    i, n, start = 0, len(text), 0
    while i < n:
        c = text[i]
        if c == "'":
            out.append(text[start:i])
            j = _skip_literal(text, i)
            out.append("' '")
            i = start = j
        elif c == '"':
            i = _skip_literal(text, i)
        elif c == "-" and text[i:i + 2] == "--":
            out.append(text[start:i])
            out.append(" ")
            i = start = _skip_comment(text, i)
        else:
            i += 1
    out.append(text[start:])
    return "".join(out)


def _self_referencing(name: str, body: str) -> bool:
    return re.search(rf"\b{re.escape(name)}\b",
                     _mask_string_literals(body)) is not None


def _analyze_ctes(sql: str):
    """(recursive_kw, [(name, body, dep_hash|None)], tail) — dep_hash
    is a DEPENDENCY-GRAPH hash: md5 of the CTE's own (name, body)
    plus the dep-hashes of every earlier CTE its body references, so
    two oracles' relations match whenever body AND full upstream
    lineage match, regardless of the CTE's POSITION in each WITH list
    (the positional-prefix version missed e.g. ngram_jaccard's shared
    shingle relations sitting after a non-shared candidate filter).
    Self-referencing (recursive) CTEs — and anything downstream of
    one — hash to None: not materializable."""
    parsed = _parse_ctes(sql)
    if not parsed:
        return None
    rec, ctes, tail = parsed
    hmap: dict = {}
    info = []
    for cname, body in ctes:
        if _self_referencing(cname, body):
            hmap[cname] = None
            info.append((cname, body, None))
            continue
        masked = _mask_string_literals(body)
        deps = [n2 for n2 in hmap
                if re.search(rf"\b{re.escape(n2)}\b", masked)]
        if any(hmap[d] is None for d in deps):
            hmap[cname] = None
            info.append((cname, body, None))
            continue
        key = (cname + "|" + _norm(body) + "|"
               + "|".join(f"{d}:{hmap[d]}" for d in sorted(deps)))
        h = hashlib.md5(key.encode()).hexdigest()[:16]
        hmap[cname] = h
        info.append((cname, body, h))
    return rec, info, tail


def plan_shared_ctes(oracle_sqls: dict) -> tuple[dict, dict]:
    """Returns (per-query analyzed CTE info, dep-hash use counts)."""
    chains: dict = {}
    counts: dict = {}
    for qname, sql in oracle_sqls.items():
        analyzed = _analyze_ctes(sql)
        if not analyzed:
            continue
        chains[qname] = analyzed
        for _cname, _body, h in analyzed[1]:
            if h is not None:
                counts[h] = counts.get(h, 0) + 1
    return chains, counts


def rewrite_with_temps(con, sql: str, analyzed, counts: dict,
                       created: dict) -> str:
    """Materialize every CTE whose dep-hash is used by >= 2 queries in
    the run (topological = WITH-list order) and return the rewritten
    SQL; ``created`` maps dep_hash -> temp table across queries."""
    rec, info, tail = analyzed
    shared_idx = [i for i, (_c, _b, h) in enumerate(info)
                  if h is not None and counts.get(h, 0) >= 2]
    if not shared_idx:
        return sql

    def cte_sql(upto: int) -> str:
        """WITH-prefix for CTEs [0, upto), materialized ones replaced."""
        parts = []
        for cname, body, h in info[:upto]:
            if h in created:
                parts.append(
                    f"{cname} AS (SELECT * FROM {created[h]})")
            else:
                parts.append(f"{cname} AS ({body})")
        return ", ".join(parts)

    for i in shared_idx:
        cname, body, h = info[i]
        if h in created:
            continue
        temp = f"__shared_{len(created)}_{h}"
        prefix = cte_sql(i)
        with_kw = "WITH " + (prefix + ", " if prefix else "")
        con.execute(
            f"CREATE TEMP TABLE {temp} AS {with_kw}"
            f"{cname} AS ({body}) SELECT * FROM {cname}")
        created[h] = temp
    kw = "WITH RECURSIVE " if rec else "WITH "
    return kw + cte_sql(len(info)) + " " + tail


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--driver-memory", default="10g",
                    help="JVM heap for the full-registry sf0.1 sweep "
                         "(the r06 sweep died at the default heap)")
    ap.add_argument("--no-shared-ctes", action="store_true",
                    help="disable shared-CTE temp-table "
                         "materialization (VERDICT r10 item 5)")
    ap.add_argument("--out", default=None,
                    help="write a JSON summary of the sweep (per-"
                         "query status + row counts + timings) — for "
                         "committed round-close evidence records")
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

    chains: dict = {}
    chain_counts: dict = {}
    created: dict = {}
    if not args.no_shared_ctes:
        chains, chain_counts = plan_shared_ctes(
            {n: oracles[n] for n in names if n in oracles})

    def run_oracle(name: str):
        sql = oracles[name]
        if name in chains:
            try:
                sql2 = rewrite_with_temps(con, sql, chains[name],
                                          chain_counts, created)
                return con.execute(sql2).fetchdf()
            except Exception:  # noqa: BLE001 — fall back to original
                pass
        return con.execute(sql).fetchdf()

    failures = 0
    results: dict = {}
    for name in names:
        if name not in oracles:
            print(f"SKIP  {name} (no oracle — rows-only surface)")
            results[name] = {"status": "SKIP"}
            continue
        t0 = time.perf_counter()
        try:
            sdf = canon(queries[name](spark, args.sf).toPandas())
            t_spark = time.perf_counter() - t0
            t0 = time.perf_counter()
            ddf = canon(run_oracle(name))
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
            t_duck = time.perf_counter() - t0
            print(f"{status}{name} rows={len(sdf)}/{len(ddf)} "
                  f"spark={t_spark:.1f}s oracle={t_duck:.1f}s")
            results[name] = {
                "status": status.strip(), "rows": len(sdf),
                "oracle_rows": len(ddf),
                "spark_sec": round(t_spark, 2),
                "oracle_sec": round(t_duck, 2)}
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"ERROR {name}: {str(e)[:160]}")
            results[name] = {"status": "ERROR", "err": str(e)[:160]}
    # ADVICE r12: "checked" used to be len(names), which counted SKIP
    # (no-oracle) rows as checked — overstating coverage in committed
    # evidence records. Count only rows actually compared.
    skipped = sum(1 for r in results.values() if r["status"] == "SKIP")
    checked = len(results) - skipped
    print(f"{checked} checked ({skipped} skipped), {failures} failing")
    if args.out:
        import json
        with open(args.out, "w") as f:
            json.dump({"sf": args.sf, "checked": checked,
                       "skipped": skipped,
                       "failing": failures, "results": results},
                      f, indent=1, sort_keys=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Interleaved same-host A/B of r12-record HEAD vs r13 HEAD (VERDICT
r13 item 1): close the dedup_minhash_lsh_documents 0.37x and
graph_jaccard_customers_lineitem PERF entries as host noise or code.

Protocol (the r12 A/B, SCALING.md "r12 A/B"): two detached worktrees,
alternating full-suite bench runs A,B,A,B in one quiet window, ANN
audit shrunk to 1000 vectors and the dedup-scale audit skipped so only
the headline suite is measured. Each worktree's committed
bench_detail.json is DELETED before every run so both sides use the
identical measurement policy (median-of-3 only for the 4 named
multi-second queries, no prior-record contention reruns).

Usage: python tools/ab_r14.py [commit_A] [commit_B]
Writes tools/ab_r14_summary.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
A_COMMIT = sys.argv[1] if len(sys.argv) > 1 else "d9d1c86"  # r12 HEAD
B_COMMIT = sys.argv[2] if len(sys.argv) > 2 else "3b923f8"  # r13 HEAD
FOCUS = ["dedup_minhash_lsh_documents", "graph_jaccard_customers_lineitem"]

ENV = dict(os.environ,
           SPARK_GRAFT_ANN_N="1000",
           SPARK_GRAFT_ANN_DEEP="0",
           SPARK_GRAFT_DEDUP_NS="",
           SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
           SPARK_GRAFT_SF_DIR=os.environ.get(
               "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))


def wt(tag: str, commit: str) -> str:
    path = f"/tmp/ab_r14_{tag}"
    if not os.path.isdir(path):
        subprocess.run(["git", "worktree", "add", "--detach", path,
                        commit], cwd=HERE, check=True)
    return path


def bench(path: str) -> dict:
    detail = os.path.join(path, "bench_detail.json")
    if os.path.exists(detail):
        os.unlink(detail)
    subprocess.run([sys.executable, "bench.py"], cwd=path, env=ENV,
                   check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    with open(detail) as f:
        d = json.load(f)
    return d


def main() -> None:
    pa, pb = wt("A", A_COMMIT), wt("B", B_COMMIT)
    runs: dict[str, dict] = {}
    order = [("A1", pa), ("B1", pb), ("A2", pa), ("B2", pb)]
    for tag, path in order:
        print(f"=== run {tag} ({path}) ===", flush=True)
        d = bench(path)
        runs[tag] = {"total": d["value"], "queries": d["queries"],
                     "calibration_sec": d.get("calibration_sec"),
                     "loadavg": d.get("loadavg")}
        print(f"{tag}: total {d['value']}s cal {d.get('calibration_sec')}s",
              flush=True)

    qa = {q: min(runs["A1"]["queries"][q], runs["A2"]["queries"][q])
          for q in runs["A1"]["queries"]
          if q in runs["A2"]["queries"]}
    qb = {q: min(runs["B1"]["queries"][q], runs["B2"]["queries"][q])
          for q in runs["B1"]["queries"]
          if q in runs["B2"]["queries"]}
    common = [q for q in qa if q in qb and qa[q] >= 0.2]
    ratios = {q: round(qb[q] / qa[q], 3) for q in sorted(common)}
    rs = sorted(ratios.values())
    warm = {q: round(runs["B2"]["queries"][q] / runs["A2"]["queries"][q], 3)
            for q in sorted(common)
            if runs["A2"]["queries"][q] >= 0.2}
    ws = sorted(warm.values())
    summary = {
        "a_commit": A_COMMIT, "b_commit": B_COMMIT,
        "protocol": "interleaved A,B,A,B full headline suite; "
                    "ANN_N=1000, dedup audit skipped; per-worktree "
                    "bench_detail.json deleted before each run so "
                    "both sides share one measurement policy",
        "suite_totals": {t: runs[t]["total"] for t in runs},
        "calibration_sec": {t: runs[t]["calibration_sec"] for t in runs},
        "loadavg_at_end": {t: runs[t]["loadavg"] for t in runs},
        "paired_min_of_2": {
            "n": len(rs),
            "median": round(statistics.median(rs), 3) if rs else None,
            "iqr": [round(rs[len(rs) // 4], 3),
                    round(rs[(3 * len(rs)) // 4], 3)] if rs else None,
        },
        "paired_warm_A2_vs_B2": {
            "n": len(ws),
            "median": round(statistics.median(ws), 3) if ws else None,
            "iqr": [round(ws[len(ws) // 4], 3),
                    round(ws[(3 * len(ws)) // 4], 3)] if ws else None,
        },
        "focus_queries": {
            q: {"A1": runs["A1"]["queries"].get(q),
                "A2": runs["A2"]["queries"].get(q),
                "B1": runs["B1"]["queries"].get(q),
                "B2": runs["B2"]["queries"].get(q),
                "min_ratio_B_over_A": ratios.get(q)}
            for q in FOCUS
        },
        "per_query_ratio_B_over_A_min_of_2": ratios,
    }
    out = os.path.join(HERE, "tools", "ab_r14_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({k: summary[k] for k in
                      ("suite_totals", "paired_min_of_2",
                       "paired_warm_A2_vs_B2", "focus_queries")},
                     indent=1))


if __name__ == "__main__":
    main()

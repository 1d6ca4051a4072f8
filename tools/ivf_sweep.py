#!/usr/bin/env python
"""IVF nprobe->recall elbow sweep (VERDICT r11 item 4, second half).

The sizing curve's predicted recall (0.77 @10K / 0.80 @100K) has read
a flat 0.775 at both corpus sizes for three rounds while the 1M point
reads 0.8625 — either the small-K corpora are under-probed relative
to what the sizing achieves at scale, or the uniform-corpus recall
curve has an elbow the power-law fit misses. This sweep measures
recall@5 of the AUTO-sized index at a GRID of nprobe values on the
bench's exact deterministic corpora (same xxhash64 generator, same 16
queries, ground truth served from tools/ann_groundtruth.json when
present) and prints one JSON line per (n, nprobe) point.

Usage: python tools/ivf_sweep.py [--ns 10000,100000] \
           [--fracs 0.1,0.2,0.27,0.35,0.45,0.6]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="10000,100000")
    ap.add_argument("--fracs", default="0.1,0.2,0.27,0.35,0.45,0.6")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()
    ns = [int(x) for x in args.ns.split(",")]
    fracs = [float(x) for x in args.fracs.split(",")]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("ivf-sweep")
        .config("spark.sql.shuffle.partitions", str(2 * int(args.cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_functions_financial_spark.operators.ivf import (
        cosine_topk_ivf, ivf_index,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        cosine_topk_matrix, groundtruth_key, legacy_groundtruth_key,
        uniform_corpus,
    )

    NQ = 16
    here = os.path.dirname(os.path.abspath(__file__))
    gt_path = os.path.join(here, "ann_groundtruth.json")
    try:
        with open(gt_path) as f:
            gt = json.load(f)
    except (OSError, ValueError):
        gt = {}

    def corpus(n: int):
        # generator + cache key shared with bench.py via
        # operators/similarity.py (ADVICE r12: were duplicated here)
        v = uniform_corpus(spark, n, 2 * int(args.cpus)).localCheckpoint()
        return v, v.filter(f"vec_id < {NQ}").localCheckpoint()

    def top5(df) -> dict:
        sets: dict = {}
        for r in (df.filter("rank <= 5")
                  .select("q_id", "n_id").collect()):
            sets.setdefault(r["q_id"], set()).add(r["n_id"])
        return sets

    for n in ns:
        v, q = corpus(n)
        key = groundtruth_key(n, NQ)
        if key not in gt and legacy_groundtruth_key(n, NQ) in gt:
            gt[key] = gt.pop(legacy_groundtruth_key(n, NQ))
        if key in gt:
            bf = {int(k): set(ids) for k, ids in gt[key].items()}
        else:
            bf = top5(cosine_topk_matrix(v, q).localCheckpoint())
            gt[key] = {str(k): sorted(s) for k, s in bf.items()}
            with open(gt_path, "w") as f:
                json.dump(gt, f, sort_keys=True)
        k_cells = max(4, int(round(math.sqrt(n))))
        seed_mod = max(1, int(round(n / k_cells)))
        index = ivf_index(v, seed_mod=seed_mod, seed_hash=True,
                          blas=True)
        index = (index[0], index[1].localCheckpoint())
        n_cells = index[0].count()
        for frac in fracs:
            nprobe = max(1, int(math.ceil(frac * n_cells)))
            t0 = time.perf_counter()
            res = top5(cosine_topk_ivf(
                v, q, nprobe=nprobe, seed_mod=seed_mod, index=index,
                blas=True).localCheckpoint())
            sec = round(time.perf_counter() - t0, 3)
            hits = sum(len(res.get(qq, set()) & bf[qq]) for qq in bf)
            print(json.dumps({
                "n": n, "cells": n_cells, "nprobe": nprobe,
                "frac": round(nprobe / n_cells, 3),
                "recall_at_5": round(hits / (5.0 * len(bf)), 4),
                "query_sec": sec,
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

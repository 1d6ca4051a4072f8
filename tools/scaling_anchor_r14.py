#!/usr/bin/env python
"""r14 core-scaling anchor (VERDICT r13 item 7): time the expensive
graph/dedup/pca tiers on COMPUTE-BOUND inputs (10x the sf0.1 tables /
100-200K synthetic corpora) at $SPARK_GRAFT_CPUS cores, so the suite
can evidence core-scaling somewhere the ~0.3 s/query local scheduling
floor does not dominate.

Inputs are deterministic and built in-run: the sf0.1 parquet tables
replicated COPIES times with key shifts (10 disconnected copies of the
same graph — 10x the work at identical per-key structure/skew), and
the bench's own zipf/uniform generator corpora. Generation and
localCheckpoint happen OUTSIDE the timed region; timing is min of 3
noop-sink runs (the audit-section policy).

Usage: SPARK_GRAFT_CPUS=8 python tools/scaling_anchor_r14.py out8.json
Run once per core count; merge with tools/scaling_anchor_merge.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

COPIES = 10
# Key strides far above the sf0.1 key ranges (max l_orderkey 600K,
# o_custkey 15K, l_partkey 20K at sf0.1).
OK_STRIDE = 10_000_000
CK_STRIDE = 1_000_000
PK_STRIDE = 1_000_000


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"dffs-scaling-anchor-c{cpus}")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_functions_financial_spark.operators import dedup as dd
    from datafusion_functions_financial_spark.operators.corpusgen import (
        zipf_corpus,
    )
    from datafusion_functions_financial_spark.operators.embpca import (
        power_iteration_two,
    )
    from datafusion_functions_financial_spark.operators.graph2 import (
        neighbor_similarity, triangle_count,
    )
    from datafusion_functions_financial_spark.operators.similarity import (
        uniform_corpus,
    )
    from datafusion_functions_financial_spark.plans.analytics4 import (
        copurchase_pairs,
    )
    from datafusion_functions_financial_spark.sources.tables import load

    parts = 2 * int(cpus)

    def replicate(df, shifts: dict[str, int]):
        copies = spark.range(COPIES).selectExpr("id AS __c")
        rep = df.crossJoin(copies)
        for col, stride in shifts.items():
            rep = rep.withColumn(col, F.col(col) + F.col("__c") * stride)
        return rep.drop("__c").repartition(parts).localCheckpoint()

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li10 = replicate(li, {"l_orderkey": OK_STRIDE,
                          "l_partkey": PK_STRIDE})
    od10 = replicate(od, {"o_orderkey": OK_STRIDE,
                          "o_custkey": CK_STRIDE})
    emb100k = uniform_corpus(spark, 100_000, parts).localCheckpoint()
    zipf200k = zipf_corpus(spark, 200_000,
                           partitions=parts).localCheckpoint()
    sig200k = dd.minhash_signatures(zipf200k).localCheckpoint()

    def owns10():
        return li10.join(od10, li10.l_orderkey == od10.o_orderkey) \
            .select("o_custkey", "l_partkey")

    workloads = {
        "graph_jaccard_x10": lambda: neighbor_similarity(
            owns10(), "o_custkey", "l_partkey"),
        "graph_copurchase_x10": lambda: copurchase_pairs(
            li10, "l_orderkey", "l_partkey"),
        "graph_triangles_x10": lambda: triangle_count(
            copurchase_pairs(li10, "l_orderkey", "l_partkey",
                             min_count=2), "item_a", "item_b"),
        "emb_pca2_power_100k": lambda: power_iteration_two(emb100k),
        "dedup_lsh_capped_200k": lambda: dd.minhash_lsh_candidates(
            zipf200k, max_bucket_size=50, sig=sig200k),
    }

    out: dict[str, dict] = {}
    for name, build in workloads.items():
        runs = []
        rows = None
        for _ in range(3):
            df = build()
            spark.sparkContext.setJobDescription(
                f"anchor {name} c{cpus}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        # row count once (correctness cross-check across core counts)
        rows = build().count()
        out[name] = {"sec": min(runs), "runs": runs, "rows": int(rows)}
        print(f"{min(runs):9.3f}s rows={rows} {name}", flush=True)

    try:
        load_now = tuple(round(x, 2) for x in os.getloadavg())
    except OSError:
        load_now = None
    rec = {"cpus": int(cpus), "copies": COPIES, "sf_dir": sf_dir,
           "loadavg_end": load_now, "workloads": out}
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""r14 optimization-round profiler: capture explain('formatted') and
noop-sink wall times for a named list of registry queries at sf0.1.

Usage: python tools/profile_r14.py out_suffix q1 q2 ...
Writes plans/r14/<query>_<suffix>.txt and prints one timing line per
query (two runs each; min reported, both shown).
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dffs-profile-r14")
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

    from datafusion_functions_financial_spark.plans.registry import (
        all_queries,
    )

    queries = all_queries()
    os.makedirs(os.path.join(HERE, "plans", "r14"), exist_ok=True)

    # Warm up JVM / Python workers once.
    queries["ind_combined_events"](spark, sf_dir).write.format(
        "noop").mode("overwrite").save()

    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(HERE, "plans", "r14",
                               f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        runs = []
        for _ in range(2):
            df = queries[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{name} [{suffix}]")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        ex = plan.count("Exchange")
        py = (plan.count("BatchEvalPython")
              + plan.count("ArrowEvalPython")
              + plan.count("MapInPandas") + plan.count("MapInArrow")
              + plan.count("FlatMapGroupsInPandas"))
        print(f"{min(runs):8.3f}  runs={runs}  exchanges={ex} "
              f"python_nodes={py}  {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

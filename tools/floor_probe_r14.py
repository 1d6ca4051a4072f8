#!/usr/bin/env python
"""r14 fixed-floor probe: time a query list under alternative session
configs in ONE process per config (VERDICT r13 item 2 measurement).

Usage:
    python tools/floor_probe_r14.py LABEL [--conf k=v ...] [--] q1 q2 ...

Prints one line per query (min of 3 noop-sink runs) plus the total,
and a jobs/stages/tasks census from the status tracker so the
scheduling floor is a measured number, not a guess.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    label = sys.argv[1]
    args = sys.argv[2:]
    confs: dict[str, str] = {}
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, v = args[i + 1].split("=", 1)
            confs[k] = v
            i += 2
        elif args[i] == "--":
            i += 1
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"dffs-floor-{label}")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
    )
    for k, v in confs.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_functions_financial_spark.plans.registry import (
        all_queries,
    )

    queries = all_queries()
    queries["ind_combined_events"](spark, sf_dir).write.format(
        "noop").mode("overwrite").save()

    st = spark.sparkContext.statusTracker()

    def _jobs() -> int:
        ids = st.getJobIdsForGroup(None)
        return max(ids) if ids else 0

    out: dict[str, dict] = {}
    total = 0.0
    for name in names:
        runs = []
        for r in range(3):
            df = queries[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{name} [{label}]")
            j0 = _jobs()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            j1 = _jobs()
        sec = min(runs)
        total += sec
        out[name] = {"sec": sec, "runs": runs, "jobs_last_run": j1 - j0}
        print(f"{sec:8.3f}  jobs={j1 - j0:3d}  runs={runs}  {name}",
              flush=True)
    print(json.dumps({"label": label, "confs": confs,
                      "total_min": round(total, 3),
                      "queries": out}, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()

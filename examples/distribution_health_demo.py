"""Distribution-health showcase — the r05 additions composed into the
"is this dataset shaped the way production assumes" review:

1. revenue inequality: Gini per priority class, Lorenz deciles, HHI
   per nation (operators/concentration.py)
2. metric anomalies: MAD outlier screen + CUSUM changepoint + arrival
   burstiness (operators/outliers.py)
3. drift: per-column null/distinct profile + PSI between time halves
   (operators/dq2.py)
4. sequence shape: Markov transitions + next-event entropy + gap
   survival (plans/sequences.py)
5. trend + corpus law: Theil-Sen slope, Zipf slope
   (operators/robustfit.py)
6. segmentation: RFM quintiles (operators/rfm.py)

Run: python examples/distribution_health_demo.py [sf_dir]
"""

import sys
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators import (
    concentration, dq2, outliers, rfm, robustfit,
)
from datafusion_functions_financial_spark.plans import sequences
from datafusion_functions_financial_spark.sources.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("distribution-health-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    orders = load(spark, sf_dir, "orders").withColumn(
        "__cents", F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
    events = load(spark, sf_dir, "events").withColumn(
        "__us", F.expr("ts DIV 1000"))
    documents = load(spark, sf_dir, "documents")

    print("=== 1. Inequality: Gini / Lorenz / HHI ===")
    concentration.gini(orders, "__cents", ["o_orderpriority"],
                       ["o_orderkey"]).show()
    concentration.lorenz_deciles(orders, "__cents",
                                 ["o_orderkey"]).orderBy("decile").show()

    print("=== 2. Anomalies: MAD / CUSUM / burstiness ===")
    outliers.mad_outliers(events, "value", "event_type",
                          "event_id").show()
    (outliers.cusum_daily(events, "value", "__us")
     .filter("is_peak = 1").show())
    outliers.arrival_burstiness(events, "event_type", "__us").show()

    print("=== 3. Drift: null profile / PSI ===")
    dq2.null_profile(orders, ["o_orderkey", "o_custkey",
                              "o_totalprice"]).show()
    dq2.psi_drift(events, "event_type", "__us").show()

    print("=== 4. Sequence shape ===")
    sequences.transition_entropy(events).show()
    sequences.gap_survival(events).show()

    print("=== 5. Trend / corpus law ===")
    robustfit.theil_sen_daily(events, "value", "event_type",
                              "__us").show()
    robustfit.zipf_slope(documents).show()

    print("=== 6. RFM segments (top spenders) ===")
    (rfm.rfm_scores(load(spark, sf_dir, "orders"))
     .orderBy(F.desc("monetary_cents")).limit(5).show())

    spark.stop()


if __name__ == "__main__":
    main()

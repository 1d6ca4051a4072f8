"""Experimentation / model-evaluation showcase over the synthetic
events table (beyond-reference operators added late in r07):

1. SRM guardrail — is the 50/50 user split actually 50/50?
2. Two-proportion z + required sample size at the observed lift.
3. CUPED — how much metric variance does the pre-period remove?
4. Jackknife SE for the revenue-per-event ratio metric.
5. Model-evaluation pass on `value` as a purchase score:
   exact AUC, calibration deciles, decision-stump split, WoE/IV.
"""

import sys
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.abtest import (
    jackknife_ratio_se, required_sample_size, srm_check,
    two_proportion_ztest,
)
from datafusion_functions_financial_spark.operators.cuped import (
    cuped_reduction,
)
from datafusion_functions_financial_spark.operators.mlmetrics import (
    auc, calibration_bins, stump_split, woe_iv,
)
from datafusion_functions_financial_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("experimentation-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ev = load(spark, SF_DIR, "events")

    print("=== 1. SRM guardrail (arm = user_id % 2) ===")
    srm_check(ev, "user_id % 2").show()

    print("=== 2. Two-proportion z + sample size ===")
    two_proportion_ztest(ev, "user_id % 2",
                         "event_type = 'purchase'").show()
    required_sample_size(ev, "user_id % 2",
                         "event_type = 'purchase'").show()

    print("=== 3. CUPED variance reduction ===")
    cuped_reduction(ev.withColumn("__us", F.expr("ts DIV 1000")),
                    "value", "user_id", "__us").show()

    print("=== 4. Jackknife SE for revenue per event ===")
    jackknife_ratio_se(ev, "value", "1", "user_id").show()

    two = ev.filter(F.col("event_type").isin(["purchase", "click"]))
    label = "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
    print("=== 5. Model evaluation: value as a purchase score ===")
    auc(two, "value", label).show()
    calibration_bins(two, "value", label, "event_id").show()
    stump_split(two, "value", label).show()
    woe_iv(two, "value", label, "event_id").show()

    spark.stop()


if __name__ == "__main__":
    main()

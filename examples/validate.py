"""Port of the reference's examples/validate.rs: load day aggregates,
run the data-quality validators, print the report + data overview."""

import sys
sys.path.insert(0, "/root/repo")

import gzip
import os
import tempfile

from pyspark.sql import SparkSession, functions as F

from datafusion_functions_financial_spark.plans.validate import (
    validate_day_aggs,
)
from datafusion_functions_financial_spark.sources.polygon import (
    PolygonClient,
    PolygonConfig,
)

# 2023-01-15 is a Sunday — the weekend check should flag all rows.
SAMPLE = """ticker,date,open,high,low,close,volume,vwap,transactions
BTC,2023-01-15,21000.50,21500.75,20800.25,21350.00,1500000,21300.25,12500
ETH,2023-01-15,1550.25,1580.50,1540.00,1575.75,800000,1565.50,8500
LTC,2023-01-15,85.50,87.25,84.75,86.50,150000,86.00,2500
"""


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("validate-demo").config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    with tempfile.TemporaryDirectory() as root:
        d = os.path.join(root, "global_crypto", "day_aggs_v1", "2023")
        os.makedirs(d)
        with gzip.open(os.path.join(d, "2023-01-15.csv.gz"), "wt") as f:
            f.write(SAMPLE)

        client = PolygonClient(spark, PolygonConfig.demo(), local_root=root)
        df = client.load_crypto_day_aggs("2023-01-15")
        client.register_table_with_indicators("validation_data", df)

        print("Running data quality validation...")
        report = validate_day_aggs(df)
        print(report.summary())
        if report.passed:
            print("All validation checks passed!")
        else:
            print("Some validation checks failed (expected here: the "
                  "sample date is a Sunday).")

        print("\nData overview:")
        spark.sql("""
            SELECT COUNT(*) AS total_rows,
                   COUNT(DISTINCT ticker) AS unique_symbols,
                   MIN(date) AS earliest_date,
                   MAX(date) AS latest_date,
                   AVG(close) AS avg_close_price,
                   SUM(volume) AS total_volume
            FROM validation_data
        """).show()
    spark.stop()


if __name__ == "__main__":
    main()

"""Port of the reference's examples/local_demo.rs: load the crypto
day-aggs sample flat file, register it, and run indicator + signal
queries over it."""

import sys
sys.path.insert(0, "/root/repo")


import gzip
import os
import tempfile

from pyspark.sql import SparkSession

import datafusion_functions_financial_spark as dffs
from datafusion_functions_financial_spark.functions import indicators as ind
from datafusion_functions_financial_spark.plans.signals import (
    detect_rsi_signals,
)
from datafusion_functions_financial_spark.plans.validate import (
    validate_day_aggs,
)
from datafusion_functions_financial_spark.sources.polygon import (
    PolygonClient,
    PolygonConfig,
)

SAMPLE = """ticker,date,open,high,low,close,volume,vwap,transactions
BTC,2023-01-15,21000.50,21500.75,20800.25,21350.00,1500000,21300.25,12500
ETH,2023-01-15,1550.25,1580.50,1540.00,1575.75,800000,1565.50,8500
LTC,2023-01-15,85.50,87.25,84.75,86.50,150000,86.00,2500
ADA,2023-01-15,0.35,0.37,0.34,0.36,2000000,0.355,15000
DOT,2023-01-15,6.25,6.45,6.15,6.35,300000,6.30,3500
"""


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("local-demo").config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    dffs.register(spark)

    with tempfile.TemporaryDirectory() as root:
        d = os.path.join(root, "global_crypto", "day_aggs_v1", "2023")
        os.makedirs(d)
        with gzip.open(os.path.join(d, "2023-01-15.csv.gz"), "wt") as f:
            f.write(SAMPLE)

        client = PolygonClient(spark, PolygonConfig.demo(), local_root=root)
        df = client.load_crypto_day_aggs("2023-01-15")
        client.register_table_with_indicators("crypto_day_aggs", df)

        print("Crypto day aggregates:")
        spark.table("crypto_day_aggs").show()

        print("Indicators per ticker:")
        ind.with_indicators(
            df, "close", ["date"], ["ticker"],
            [ind.sma(1, "sma_1"), ind.ema(1, "ema_1")],
        ).select("ticker", "date", "close", "sma_1", "ema_1").show()

        print("RSI signals (none expected on a 1-row series):")
        detect_rsi_signals(df, "close", ["date"], ["ticker"], window=1).show()

        print(validate_day_aggs(df).summary())
    spark.stop()


if __name__ == "__main__":
    main()

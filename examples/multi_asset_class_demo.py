"""Port of the reference's examples/multi_asset_class_demo.rs: load
several asset classes and run per-ticker technical analysis.

The reference's analysis SQL mixes GROUP BY aggregates with an
indicator window in one SELECT (multi_asset_class_demo.rs:33-42) — a
DataFusion-specific quirk that is only well-defined because the window
references grouped columns. ANSI (and Spark) reject it, so the port
expresses it as the documented two-step plan: aggregate per ticker,
then indicator over the per-ticker bar series, joined back
(SURVEY.md §2.B "reference oddity").
"""

import sys
sys.path.insert(0, "/root/repo")

import gzip
import os
import tempfile

from pyspark.sql import SparkSession, functions as F

from datafusion_functions_financial_spark.functions import indicators as ind
from datafusion_functions_financial_spark.sources.polygon import (
    PolygonClient,
    PolygonConfig,
)

MINUTE_CSV_ROWS = "\n".join(
    f"AAPL,{1_700_000_000_000_000_000 + i * 60_000_000_000},"
    f"{190 + i * 0.1:.2f},{190.5 + i * 0.1:.2f},{189.5 + i * 0.1:.2f},"
    f"{190.2 + i * 0.1:.2f},{1000 + i}"
    for i in range(30)
)
MINUTE_CSV = (
    "ticker,window_start,open,high,low,close,volume\n" + MINUTE_CSV_ROWS + "\n"
)
CRYPTO_CSV = """ticker,date,open,high,low,close,volume,vwap,transactions
BTC,2023-01-15,21000.50,21500.75,20800.25,21350.00,1500000,21300.25,12500
ETH,2023-01-15,1550.25,1580.50,1540.00,1575.75,800000,1565.50,8500
"""


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("multi-asset-demo").config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    with tempfile.TemporaryDirectory() as root:
        for sub, name, payload in [
            ("us_stocks_sip/minute_aggs_v1/2023", "2023-01-16.csv.gz",
             MINUTE_CSV),
            ("global_crypto/day_aggs_v1/2023", "2023-01-15.csv.gz",
             CRYPTO_CSV),
        ]:
            d = os.path.join(root, sub)
            os.makedirs(d)
            with gzip.open(os.path.join(d, name), "wt") as f:
                f.write(payload)

        client = PolygonClient(spark, PolygonConfig.demo(), local_root=root)

        print("Stocks — AAPL minute aggregates:")
        stocks = client.load_minute_aggs("AAPL", "2023-01-16")
        stocks.show(3)

        client.register_table_with_indicators("stocks_data", stocks)
        # Two-step form of the reference's mixed agg+window SELECT.
        per_ticker = spark.sql("""
            SELECT ticker, COUNT(*) AS total_bars, AVG(close) AS avg_close
            FROM stocks_data GROUP BY ticker
        """)
        with_sma = ind.with_indicators(
            stocks, "close", ["window_start"], ["ticker"], [ind.sma(20)]
        )
        latest_sma = (
            with_sma.groupBy("ticker")
            .agg(F.expr("max_by(sma_20, window_start)").alias("sma_20"))
        )
        print("Technical analysis (two-step agg + indicator):")
        per_ticker.join(latest_sma, "ticker").show(5)

        print("Crypto — day aggregates:")
        client.load_crypto_day_aggs("2023-01-15").show(3)
    spark.stop()


if __name__ == "__main__":
    main()

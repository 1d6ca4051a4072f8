"""Port of the reference's examples/secure_polygon_integration.rs:
env-credential loading, flat-file discovery, and a data-overview query
(COUNT / COUNT DISTINCT / MIN / MAX per examples/validate.rs:50-59).

Runs against a local flat-file root when S3 credentials are absent
(the reference falls back to demo credentials the same way).
"""

import sys
sys.path.insert(0, "/root/repo")

import gzip
import os
import tempfile

from pyspark.sql import SparkSession, functions as F

from datafusion_functions_financial_spark.sources.polygon import (
    PolygonClient,
    PolygonConfig,
)

SAMPLE = """ticker,date,open,high,low,close,volume,vwap,transactions
BTC,2023-01-15,21000.50,21500.75,20800.25,21350.00,1500000,21300.25,12500
ETH,2023-01-15,1550.25,1580.50,1540.00,1575.75,800000,1565.50,8500
LTC,2023-01-15,85.50,87.25,84.75,86.50,150000,86.00,2500
"""


def main() -> None:
    print("Secure Polygon.io Integration Demo\n")

    config = PolygonConfig.from_env()
    if config.access_key:
        print("Loaded credentials from environment "
              f"(endpoint={config.endpoint}, bucket={config.bucket})")
    else:
        print("No POLYGON_ACCESS_KEY_ID in env — using demo credentials "
              "against a local flat-file root")
        config = PolygonConfig.demo()

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("secure-polygon").config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    with tempfile.TemporaryDirectory() as root:
        d = os.path.join(root, "global_crypto", "day_aggs_v1", "2023")
        os.makedirs(d)
        with gzip.open(os.path.join(d, "2023-01-15.csv.gz"), "wt") as f:
            f.write(SAMPLE)

        client = PolygonClient(spark, config, local_root=root)

        print("\nDiscovering available structure...")
        for f in client.list_available_files():
            print("  ", os.path.relpath(f, root))
        print("Asset classes:", client.discover_asset_classes())
        print("Data types:", client.discover_data_types("global_crypto"))

        df = client.load_crypto_day_aggs("2023-01-15")
        print("\nData overview:")
        df.agg(
            F.count(F.lit(1)).alias("total_rows"),
            F.countDistinct("ticker").alias("unique_tickers"),
            F.min("date").alias("earliest"),
            F.max("date").alias("latest"),
            F.round(F.avg("close"), 2).alias("avg_close"),
        ).show()
    spark.stop()


if __name__ == "__main__":
    main()

"""Port of the reference's examples/basic_usage.rs: indicator SQL over
an inline VALUES table."""

import sys
sys.path.insert(0, "/root/repo")


from pyspark.sql import SparkSession

import datafusion_functions_financial_spark as dffs


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("basic-usage").config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    dffs.register(spark)

    spark.sql("""
        SELECT * FROM VALUES
            ('2024-01-01', 100.0), ('2024-01-02', 102.0),
            ('2024-01-03', 98.0),  ('2024-01-04', 105.0),
            ('2024-01-05', 107.0), ('2024-01-06', 103.0),
            ('2024-01-07', 110.0), ('2024-01-08', 108.0),
            ('2024-01-09', 112.0), ('2024-01-10', 115.0)
        AS stock_data(date, close_price)
    """).createOrReplaceTempView("stock_data")

    print("Original stock data:")
    spark.table("stock_data").show()

    print("With SMA(3) and EMA(3):")
    spark.sql_with_indicators("""
        SELECT date, close_price,
               sma(close_price, 3) OVER (ORDER BY date) AS sma_3,
               ema(close_price, 3) OVER (ORDER BY date) AS ema_3
        FROM stock_data
        ORDER BY date
    """).show()
    spark.stop()


if __name__ == "__main__":
    main()

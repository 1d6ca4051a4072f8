"""Partitioned write sink: layout, pruning, and round-trip."""

import os

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.sources.sink import (
    write_partitioned,
)
from datafusion_functions_financial_spark.sources.tables import load


def test_write_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    write_partitioned(orders, out, partition_by=["order_year"])

    # Hive-style directory layout.
    years = [d for d in os.listdir(out) if d.startswith("order_year=")]
    assert len(years) >= 1

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    # Partition pruning: a year filter must prune at scan time.
    year = int(years[0].split("=")[1])
    pruned = back.filter(F.col("order_year") == year)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "order_year" in plan
    assert pruned.count() > 0

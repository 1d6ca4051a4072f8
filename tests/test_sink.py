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


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC is the second columnar format Spark ships natively; the
    sinks accept it via format=. Round-trip must preserve values and
    the scan must push filters/prune columns like parquet."""
    from datafusion_functions_financial_spark.sources.sink import (
        write_partitioned,
    )
    from datafusion_functions_financial_spark.sources.tables import load

    orders = load(spark, sf_dir, "orders")
    dest = str(tmp_path / "orders_orc")
    write_partitioned(orders, dest, partition_by=["o_orderstatus"],
                      format="orc")

    back = spark.read.orc(dest)
    assert back.count() == orders.count()
    # Values survive the round trip (spot-check a full-row compare).
    a = sorted(orders.select("o_orderkey", "o_totalprice").collect())
    b = sorted(back.select("o_orderkey", "o_totalprice").collect())
    assert a == b

    # Partition pruning: a status filter must prune directories.
    plan = (
        back.filter("o_orderstatus = 'F'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    # Predicate pushdown to the ORC reader.
    plan2 = (
        back.filter("o_totalprice > 1000.0").select("o_orderkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan2
    assert "o_totalprice" in plan2.split("PushedFilters")[1][:200]

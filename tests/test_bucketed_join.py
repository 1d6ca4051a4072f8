"""Bucketing demo: pre-bucketed tables delete the join shuffle.

This is the 100 TB answer for the fact-to-fact join
(q_lineitem_order_revenue): bucket both tables on the join key at
write time and the sort-merge join reads co-located buckets with NO
exchange on either side.
"""

import re

import pytest


@pytest.mark.slow
def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # warehouse.dir is static; create the demo DB at an explicit location
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucket_demo LOCATION '{tmp_path}/wh'"
    )
    spark.sql("USE bucket_demo")
    try:
        from datafusion_functions_financial_spark.sources.tables import load

        load(spark, sf_dir, "lineitem").write.bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
        load(spark, sf_dir, "orders").write.bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").mode("overwrite").saveAsTable("ord_b")

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.sql("""
            SELECT o_orderpriority, count(*) AS cnt
            FROM li_b JOIN ord_b ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_join_shuffles = len(
            re.findall(r"Exchange hashpartitioning\((?:l_orderkey|o_orderkey)",
                       plan)
        )
        assert n_join_shuffles == 0, plan
        assert joined.count() == 5
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
        spark.sql("USE default")


@pytest.mark.slow
def test_bucketed_sink_roundtrip_revenue_no_shuffle(spark, sf_dir, tmp_path):
    # End-to-end 100 TB fact-join story: write both facts through the
    # sink API bucketed on the join key, re-read, and run the real
    # q_lineitem_order_revenue aggregation shuffle-free on the join,
    # with results identical to the parquet-scan plan.
    from pyspark.sql import functions as F

    from datafusion_functions_financial_spark.plans.analytics import (
        _q_lineitem_order_revenue,
    )
    from datafusion_functions_financial_spark.sources.sink import (
        write_bucketed_table,
    )
    from datafusion_functions_financial_spark.sources.tables import load

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS sink_demo LOCATION '{tmp_path}/wh2'"
    )
    spark.sql("USE sink_demo")
    try:
        write_bucketed_table(
            load(spark, sf_dir, "lineitem"), "li_rb",
            ["l_orderkey"], 8, sort_by=["l_orderkey"],
        )
        write_bucketed_table(
            load(spark, sf_dir, "orders"), "ord_rb",
            ["o_orderkey"], 8, sort_by=["o_orderkey"],
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li, od = spark.table("li_rb"), spark.table("ord_rb")
        joined = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    0,
                ).alias("revenue"),
                F.count(F.lit(1)).alias("line_count"),
            )
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert not re.findall(
            r"Exchange hashpartitioning\((?:l_orderkey|o_orderkey)", plan
        ), plan
        got = {r.o_orderpriority: (r.revenue, r.line_count)
               for r in joined.collect()}
        want = {r.o_orderpriority: (r.revenue, r.line_count)
                for r in _q_lineitem_order_revenue(spark, sf_dir).collect()}
        assert got == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_rb")
        spark.sql("DROP TABLE IF EXISTS ord_rb")
        spark.sql("USE default")
        spark.sql("DROP DATABASE IF EXISTS sink_demo")

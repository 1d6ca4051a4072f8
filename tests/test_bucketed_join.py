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

"""Salted aggregation: same results as direct agg, spread plan shape."""

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.skew import salted_agg
from datafusion_functions_financial_spark.sources.tables import load


def test_salted_agg_matches_direct(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    direct = {
        r["event_type"]: r
        for r in ev.groupBy("event_type").agg(
            F.sum("value").alias("sum_value"),
            F.count(F.lit(1)).alias("cnt"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        ).collect()
    }
    salted = {
        r["event_type"]: r
        for r in salted_agg(
            ev, ["event_type"], num_salts=8,
            sums=["value"], mins=["value"], maxs=["value"],
        ).collect()
    }
    assert set(direct) == set(salted)
    for k, d in direct.items():
        s = salted[k]
        assert s["cnt"] == d["cnt"]
        assert s["min_value"] == d["min_value"]
        assert s["max_value"] == d["max_value"]
        # Sum order differs (that's the point); values agree to fp noise.
        assert abs(s["sum_value"] - d["sum_value"]) < 1e-6 * abs(d["sum_value"])
        assert abs(s["avg_value"] - d["sum_value"] / d["cnt"]) < 1e-9


def test_salted_agg_two_stage_plan(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = salted_agg(ev, ["event_type"], num_salts=8, sums=["value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Two logical aggregation stages: (key, salt) then (key).
    assert "__salt" in plan

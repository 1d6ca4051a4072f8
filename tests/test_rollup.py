"""Incremental rollup: algebraic-merge correctness and delta-scaled
plan shape (operators/rollup.py)."""

import pytest

from pyspark.sql import functions as F

from datafusion_functions_financial_spark.operators.rollup import (
    bar_partials,
    incremental_rollup,
    merge_bar_partials,
)
from datafusion_functions_financial_spark.sources.tables import load


def _normalize(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_full_for_any_split(spark, sf_dir):
    """bar_partials(A) ⊕ bar_partials(B) == bar_partials(A ∪ B) for an
    arbitrary (non-time) split — here by event_id parity, which
    scatters both sides across every bucket."""
    events = load(spark, sf_dir, "events")
    a = events.filter("event_id % 2 = 0")
    b = events.filter("event_id % 2 = 1")
    merged = merge_bar_partials(bar_partials(a), bar_partials(b))
    full = bar_partials(events)
    assert _normalize(merged) == _normalize(full)


@pytest.mark.slow
def test_incremental_equals_full_at_multiple_cutoffs(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    full = _normalize(bar_partials(events))
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    for frac in (0.25, 0.5, 0.9):
        cut = lo + int((hi - lo) * frac)
        bars = bar_partials(events.filter(F.col("ts") < cut))
        out = incremental_rollup(bars, events.filter(F.col("ts") >= cut))
        assert _normalize(out) == full, f"cutoff frac {frac}"


def test_incremental_handles_empty_delta(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    bars = bar_partials(events)
    out = incremental_rollup(bars, events.filter("1 = 0"))
    assert _normalize(out) == _normalize(bars)


def test_incremental_plan_never_reaggregates_history(spark, sf_dir):
    """The untouched-bars branch must be anti-join passthrough: the
    only HashAggregates in the plan consume the delta or the touched
    subset, and the touched-bucket joins broadcast the tiny key set."""
    events = load(spark, sf_dir, "events")
    bars = bar_partials(events.filter("ts < 0"))  # empty history, same plan
    out = incremental_rollup(bars, events)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight" in plan.replace("  ", " "), plan
    assert "LeftSemi, BuildRight" in plan.replace("  ", " "), plan


@pytest.mark.slow
def test_partitioned_maintenance_rewrites_only_touched_dates(
    spark, sf_dir, tmp_path
):
    """Durable path: bars partitioned by bucket_date on disk; a delta
    must rewrite only its own date partitions (checked by file mtimes)
    and the final table must equal a full recompute."""
    import os
    import time

    from pyspark.sql import functions as SF

    from datafusion_functions_financial_spark.operators.rollup import (
        maintain_partitioned_bars,
    )

    events = load(spark, sf_dir, "events")
    lo, hi = events.agg(SF.min("ts"), SF.max("ts")).first()
    cut = lo + int((hi - lo) * 0.8)
    path = str(tmp_path / "bars")

    hist_bars = bar_partials(events.filter(SF.col("ts") < cut)).withColumn(
        "bucket_date", SF.to_date(SF.timestamp_seconds(SF.col("bucket_start")))
    )
    hist_bars.write.partitionBy("bucket_date").parquet(path)

    def mtimes():
        out = {}
        for d in os.listdir(path):
            if d.startswith("bucket_date="):
                p = os.path.join(path, d)
                out[d] = max(
                    os.path.getmtime(os.path.join(p, f))
                    for f in os.listdir(p) if f.endswith(".parquet")
                )
        return out

    before = mtimes()
    time.sleep(1.1)  # mtime resolution guard
    touched = maintain_partitioned_bars(
        spark, path, events.filter(SF.col("ts") >= cut)
    )
    after = mtimes()

    assert touched, "delta must touch at least one date"
    touched_dirs = {f"bucket_date={d}" for d in touched}
    for d, t in after.items():
        if d in touched_dirs:
            assert t > before.get(d, 0), f"{d} should have been rewritten"
        else:
            assert t == before[d], f"{d} rewritten unnecessarily"

    final = spark.read.parquet(path).drop("bucket_date")
    full = bar_partials(events)
    assert _normalize(final) == _normalize(full)

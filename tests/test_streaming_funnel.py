"""Streaming funnel progression: the last emitted depth per user
after a replay must aggregate to exactly the batch
``funnel_conversion`` counts, and the change-driven emission history
must be a strictly-progressing sequence per user when rows arrive in
order."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.plans.funnel import (
    funnel_conversion,
)
from datafusion_functions_financial_spark.sources.tables import load
from datafusion_functions_financial_spark.streaming.funnel import (
    depth_of, funnel_stream,
)

SF001 = "/root/testdata/sf0.001"
STEPS = ["view", "click", "purchase"]
N_REPLAY_FILES = 4


def test_depth_of_chain_rules():
    assert depth_of([None, None]) == 0
    assert depth_of([5, None]) == 1
    assert depth_of([5, 9, 11]) == 3
    assert depth_of([5, 5, 9]) == 1      # not strictly later
    assert depth_of([5, 9, 7]) == 2      # step-3 first precedes step-2
    assert depth_of([5, None, 9]) == 1   # missing middle step blocks


def _batch_counts(spark, sf=SF001):
    ev = load(spark, sf, "events")
    return {
        r["step_idx"]: r["n_users"]
        for r in funnel_conversion(ev, STEPS).collect()
    }


def _run_stream(spark, tmp_path, n_files):
    ev = load(spark, SF001, "events").select(
        "user_id", "event_type", "ts")
    pdf = ev.toPandas().sort_values(["ts", "user_id"]).reset_index(
        drop=True)
    src = tmp_path / "funnel_src"
    src.mkdir()
    n = len(pdf)
    for i in range(n_files):
        sl = pdf.iloc[i * n // n_files:(i + 1) * n // n_files]
        spark.createDataFrame(
            sl, schema="user_id long, event_type string, ts long"
        ).coalesce(1).write.parquet(str(src / f"f={i}"))
    stream = (
        spark.readStream
        .schema("user_id long, event_type string, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"funnel_{n_files}"
    q = (
        funnel_stream(stream, STEPS)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(240)
    return spark.table(name).toPandas()


def _final_depths(emitted: pd.DataFrame) -> dict:
    if len(emitted) == 0:
        return {}
    last = emitted.groupby("user").tail(1)
    return dict(zip(last["user"], last["depth"]))


def _counts_from_depths(spark, depths: dict, sf=SF001) -> dict:
    """Batch-equivalent funnel counts: users with final depth > k
    reached step k."""
    n_users_total = (
        load(spark, sf, "events").select("user_id").distinct().count())
    counts = {}
    for k in range(len(STEPS)):
        counts[k] = sum(1 for d in depths.values() if d > k)
    assert len(depths) <= n_users_total
    return counts


@pytest.mark.slow
def test_single_batch_stream_matches_batch_funnel(spark, tmp_path):
    emitted = _run_stream(spark, tmp_path, 1)
    got = _counts_from_depths(spark, _final_depths(emitted))
    assert got == _batch_counts(spark)


@pytest.mark.slow
def test_replay_across_microbatches_matches_batch_funnel(
        spark, tmp_path):
    emitted = _run_stream(spark, tmp_path, N_REPLAY_FILES)
    got = _counts_from_depths(spark, _final_depths(emitted))
    assert got == _batch_counts(spark)
    # in-order replay: per-user emitted depths strictly increase
    for _, grp in emitted.groupby("user"):
        ds = list(grp["depth"])
        assert all(b > a for a, b in zip(ds, ds[1:])), ds


@pytest.mark.slow
def test_min_merge_is_order_free(spark, tmp_path):
    """An out-of-order replay (later file carries earlier rows) must
    still land on the batch depth — firsts are min-merged."""
    rows = [
        # user 1: view@10, click@20, purchase@30 (full funnel), but
        # the view arrives LAST.
        (1, "click", 20), (1, "purchase", 30), (1, "view", 10),
        # user 2: click before view -> depth stops at view.
        (2, "click", 5), (2, "view", 8),
    ]
    src = tmp_path / "ooo_src"
    src.mkdir()
    for i, r in enumerate(rows):
        spark.createDataFrame(
            [r], schema="user_id long, event_type string, ts long"
        ).coalesce(1).write.parquet(str(src / f"f={i}"))
    stream = (
        spark.readStream
        .schema("user_id long, event_type string, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        funnel_stream(stream, STEPS)
        .writeStream.format("memory").queryName("funnel_ooo")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_ooo"))
        .start()
    )
    q.awaitTermination(240)
    final = _final_depths(spark.table("funnel_ooo").toPandas())
    assert final == {1: 3, 2: 1}

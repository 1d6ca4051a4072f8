"""Streaming drift monitor (VERDICT r05 item 8): the windowed bin
counts a replayed sf0.01 event stream accumulates must equal the
batch twin bit-for-bit, and the PSI scored from the stream's sink
contents must equal the PSI scored from the batch relation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.sources.tables import load
from datafusion_functions_financial_spark.streaming import drift

SF001 = "/root/testdata/sf0.01"
N_REPLAY_FILES = 4


def _ticks(spark):
    ev = load(spark, SF001, "events")
    return ev.selectExpr(
        "timestamp_micros(ts DIV 1000) AS timestamp",
        "value",
    )


def test_bin_expr_tails_and_edges(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in (-5, 0, 1, 2.5, 99)], "v double")
    got = {r.v: r.b for r in df.selectExpr(
        "v", f"{drift.bin_expr('v', [0.0, 2.5])} AS b").collect()}
    # left tail < first edge -> 0; [0, 2.5) -> 1; >= last edge -> 2
    assert got == {-5.0: 0, 0.0: 1, 1.0: 1, 2.5: 2, 99.0: 2}


def test_psi_zero_on_identical_distribution(spark):
    df = _ticks(spark)
    edges = drift.baseline_edges(df, "value", n_bins=8)
    counts = drift.binned_window_batch(df, "timestamp", "value", edges)
    ref = drift.baseline_shares(df, "value", edges)
    # Scoring every window against the WHOLE corpus as baseline: PSI
    # must be small-but-nonzero per window, and scoring the corpus
    # against itself must be exactly 0.
    whole = ref.select(
        F.expr("named_struct('start', timestamp'2000-01-01', "
               "'end', timestamp'2000-01-02')").alias("window"),
        F.col("bin"), F.col("ref_n").alias("n"))
    [row] = drift.psi_from_counts(whole, ref).collect()
    assert row.psi == 0.0 and row.n == df.count()


def test_js_zero_on_identical_and_ln2_on_disjoint(spark):
    import math

    df = _ticks(spark)
    edges = drift.baseline_edges(df, "value", n_bins=8)
    ref = drift.baseline_shares(df, "value", edges)
    whole = ref.select(
        F.expr("named_struct('start', timestamp'2000-01-01', "
               "'end', timestamp'2000-01-02')").alias("window"),
        F.col("bin"), F.col("ref_n").alias("n"))
    [row] = drift.js_from_counts(whole, ref).collect()
    assert row.js == 0.0 and row.n == df.count()
    # a window concentrated in a bin the baseline never saw -> the
    # bounded maximum ln 2 (PSI would be undefined/unbounded here)
    alien = whole.select("window", F.lit(9999).alias("bin"),
                         F.lit(100).alias("n"))
    [arow] = drift.js_from_counts(alien, ref).collect()
    assert abs(arow.js - math.log(2)) < 1e-6


@pytest.mark.slow
def test_drift_stream_replay_sf001_equals_batch(spark, tmp_path):
    ticks = _ticks(spark)
    edges = drift.baseline_edges(ticks, "value", n_bins=10)

    pdf = ticks.toPandas().sort_values("timestamp").reset_index(drop=True)
    src = tmp_path / "sf001_drift"
    src.mkdir()
    n = len(pdf)
    for i in range(N_REPLAY_FILES):
        sl = pdf.iloc[i * n // N_REPLAY_FILES:(i + 1) * n // N_REPLAY_FILES]
        spark.createDataFrame(
            sl, schema="timestamp timestamp, value double"
        ).coalesce(1).write.parquet(str(src / f"f={i}"))

    stream = (
        spark.readStream.schema("timestamp timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    counts_stream = drift.binned_window_stream(
        stream, "timestamp", "value", edges,
        window="6 hours", watermark="1 hour")
    q = (
        counts_stream.writeStream.format("memory")
        .queryName("drift_counts").outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(240)

    got = spark.table("drift_counts")
    want = drift.binned_window_batch(
        ticks, "timestamp", "value", edges, window="6 hours")

    def norm(df):
        return sorted(
            (r.window.start, r.window.end, r.bin, r.n)
            for r in df.collect()
        )

    assert norm(got) == norm(want)

    # PSI scored from the stream's sink contents == PSI from batch.
    ref = drift.baseline_shares(ticks, "value", edges)
    p_stream = drift.psi_from_counts(got, ref).toPandas().sort_values(
        "window_start").reset_index(drop=True)
    p_batch = drift.psi_from_counts(want, ref).toPandas().sort_values(
        "window_start").reset_index(drop=True)
    pd.testing.assert_frame_equal(p_stream, p_batch)

    # chi-square scored from the stream's sink contents == batch.
    c_stream = drift.chi2_from_counts(got, ref).toPandas().sort_values(
        "window_start").reset_index(drop=True)
    c_batch = drift.chi2_from_counts(want, ref).toPandas().sort_values(
        "window_start").reset_index(drop=True)
    pd.testing.assert_frame_equal(c_stream, c_batch)

    # JS scored from the stream's sink contents == batch, and bounded.
    j_stream = drift.js_from_counts(got, ref).toPandas().sort_values(
        "window_start").reset_index(drop=True)
    j_batch = drift.js_from_counts(want, ref).toPandas().sort_values(
        "window_start").reset_index(drop=True)
    pd.testing.assert_frame_equal(j_stream, j_batch)
    assert ((j_batch["js"] >= 0) & (j_batch["js"] <= 0.6932)).all()

    # VERDICT r09 item 7: the risky branch is a window bin ABSENT
    # from the baseline (the p·ln2 / absent-mass identity). Score the
    # same stream/batch counts against a TRUNCATED baseline (top two
    # bins dropped) so every window holding those bins exercises it;
    # stream == batch must still hold bit-for-bit.
    ref_trunc = ref.filter(F.col("bin") <= 8)
    jt_stream = drift.js_from_counts(got, ref_trunc).toPandas()\
        .sort_values("window_start").reset_index(drop=True)
    jt_batch = drift.js_from_counts(want, ref_trunc).toPandas()\
        .sort_values("window_start").reset_index(drop=True)
    pd.testing.assert_frame_equal(jt_stream, jt_batch)
    assert ((jt_batch["js"] >= 0) & (jt_batch["js"] <= 0.6932)).all()
    # the truncation must actually bite (no monotonic claim: dropping
    # bins also renormalizes the remaining baseline shares)
    assert (jt_batch["js"] - j_batch["js"]).abs().max() > 1e-6
    # Sanity: every full window scored, PSI finite and >= 0 is not
    # guaranteed (PSI terms can be negative only if... they can't:
    # (a-b)*ln(a/b) >= 0), so assert non-negative.
    assert (p_batch["psi"] >= 0).all()


def test_js_matches_naive_formula_all_branches(spark):
    """Hand-built counts exercising every js_from_counts branch in one
    window: present pair, window bin absent from baseline (p·ln2),
    baseline bin absent from window (absent-mass remainder), and a
    ZERO-COUNT bin row (ADVICE r09: without the n > 0 guard the
    0·ln(0) term went NULL while its baseline share was still pulled
    out of the remainder, undercounting JS by 0.5·q·ln2)."""
    import math

    ref = spark.createDataFrame(
        [(0, 10), (1, 30), (2, 60)], "bin int, ref_n long")
    # window: bin0 present, bin1 ZERO-count row, bin3 alien, bin2 absent
    counts = spark.createDataFrame(
        [(0, 12), (1, 0), (3, 8)], "bin int, n long").select(
        F.expr("named_struct('start', timestamp'2000-01-01', "
               "'end', timestamp'2000-01-02')").alias("window"),
        "bin", "n")
    [row] = drift.js_from_counts(counts, ref).collect()

    def js(p_vec, q_vec):
        tot = 0.0
        for p, q in zip(p_vec, q_vec):
            m = (p + q) / 2.0
            if p > 0:
                tot += 0.5 * p * math.log(p / m)
            if q > 0:
                tot += 0.5 * q * math.log(q / m)
        return tot

    n_w = 20.0
    want = js([12 / n_w, 0.0, 0.0, 8 / n_w],
              [0.1, 0.3, 0.6, 0.0])
    assert row.n == 20
    assert abs(row.js - want) < 1e-6


@pytest.mark.slow
def test_js_by_source_single_source_is_zero(spark):
    """ADVICE r09: a single-source corpus made the q-side divide by
    zero (NULL/NaN js); the contract is now js = 0 for a source that
    holds the whole corpus."""
    from datafusion_functions_financial_spark.operators.text9 import (
        js_by_source,
    )

    df = spark.createDataFrame(
        [("only", "alpha beta gamma alpha"),
         ("only", "beta beta delta")],
        "source string, text string")
    [row] = js_by_source(df).collect()
    assert row.source == "only" and row.js == 0.0 and row.n_tokens == 7


def test_chi2_zero_on_identical_distribution(spark):
    df = _ticks(spark)
    edges = drift.baseline_edges(df, "value", n_bins=8)
    ref = drift.baseline_shares(df, "value", edges)
    whole = ref.select(
        F.expr("named_struct('start', timestamp'2000-01-01', "
               "'end', timestamp'2000-01-02')").alias("window"),
        F.col("bin"), F.col("ref_n").alias("n"))
    [row] = drift.chi2_from_counts(whole, ref).collect()
    assert row.chi2 == 0.0 and row.n == df.count()
    assert row.dof == ref.count() - 1


def test_chi2_matches_naive_formula(spark):
    # Hand-built counts: one window observing [5, 15, 0] against a
    # baseline of [10, 10, 10] (bin 2 unobserved still contributes).
    ref = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10)], "bin int, ref_n long")
    counts = spark.createDataFrame(
        [(0, 5), (1, 15)], "bin int, n long").select(
        F.expr("named_struct('start', timestamp'2000-01-01', "
               "'end', timestamp'2000-01-02')").alias("window"),
        "bin", "n")
    [row] = drift.chi2_from_counts(counts, ref).collect()
    n_w = 20
    exp = n_w / 3
    want = sum((o - exp) ** 2 / exp for o in (5, 15, 0))
    assert row.n == n_w and row.dof == 2
    assert abs(row.chi2 - want) < 1e-6

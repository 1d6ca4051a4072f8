"""Unit tests for the r04 tier-2 modules (technical2, rollstats2,
analytics2, text2, embstats) — known-value and invariant checks beyond
the oracle-parity suite."""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.functions.technical2 import (
    cci, mfi, rolling_zscore, vwma, williams_r,
)
from datafusion_functions_financial_spark.functions.rollstats2 import (
    rolling_beta, rolling_moments, rolling_ols_slope,
)
from datafusion_functions_financial_spark.plans.analytics2 import (
    event_streaks, latest_order_per_customer,
)
from datafusion_functions_financial_spark.operators.text2 import (
    lexical_stats, oov_rate,
)
from datafusion_functions_financial_spark.operators.embstats import (
    random_projection,
)


def _series(spark, vals, key="k"):
    rows = [(key, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, seq long, v double")


def test_williams_r_bounds_and_extremes(spark):
    # Monotonic increase: current price == rolling max -> %R == 0.
    df = williams_r(_series(spark, [1, 2, 3, 4, 5]), "v", ["k"], ["seq"],
                    n=3)
    rows = {r["seq"]: r["williams_r"] for r in df.collect()}
    assert rows[0] is None and rows[1] is None  # warm-up
    assert rows[2] == 0.0 and rows[4] == 0.0
    # Monotonic decrease: current price == rolling min -> %R == -100.
    df2 = williams_r(_series(spark, [5, 4, 3, 2, 1]), "v", ["k"], ["seq"],
                     n=3)
    assert all(r["williams_r"] == -100.0
               for r in df2.collect() if r["williams_r"] is not None)


def test_cci_known_value(spark):
    # Frame [1, 2, 3]: mean=2, MAD=2/3, CCI = (3-2)/(0.015*2/3) = 100.
    df = cci(_series(spark, [1.0, 2.0, 3.0]), "v", ["k"], ["seq"], n=3)
    last = df.orderBy("seq").collect()[-1]
    assert last["cci"] == pytest.approx(100.0, abs=1e-4)


def test_mfi_bounds_and_all_up(spark):
    # Strictly rising prices -> all flow positive -> MFI == 100.
    rows = [("k", i, float(i + 1), 10.0) for i in range(6)]
    df = spark.createDataFrame(
        rows, "k string, seq long, p double, vol double")
    out = mfi(df, "p", "vol", ["k"], ["seq"], n=3)
    vals = [r["mfi"] for r in out.collect() if r["mfi"] is not None]
    assert vals and all(v == 100.0 for v in vals)


def test_vwma_equal_weights_is_sma(spark):
    rows = [("k", i, float(v), 1.0) for i, v in enumerate([2, 4, 6, 8])]
    df = spark.createDataFrame(
        rows, "k string, seq long, p double, vol double")
    out = vwma(df, "p", "vol", ["k"], ["seq"], n=2).orderBy("seq").collect()
    assert out[1]["vwma"] == 3.0 and out[3]["vwma"] == 7.0


def test_zscore_symmetric(spark):
    # Frame [1, 3]: mean 2, sd sqrt(2); z(3) = 1/sqrt(2).
    out = rolling_zscore(_series(spark, [1.0, 3.0]), "v", ["k"], ["seq"],
                         n=2).orderBy("seq").collect()
    assert out[0]["zscore"] is None
    assert out[1]["zscore"] == pytest.approx(1 / math.sqrt(2), abs=1e-4)


def test_ols_slope_recovers_linear_trend(spark):
    # v = 7 + 3*seq -> slope exactly 3 in every full frame.
    df = rolling_ols_slope(
        _series(spark, [7 + 3 * i for i in range(10)]), "v", ["k"],
        ["seq"], n=4)
    vals = [r["trend_slope"] for r in df.collect()
            if r["trend_slope"] is not None]
    assert len(vals) == 7 and all(v == 3.0 for v in vals)


def test_moments_symmetric_frame_zero_skew(spark):
    # Symmetric frame -> skewness 0; uniform-ish kurtosis negative.
    df = rolling_moments(_series(spark, [1.0, 2.0, 3.0, 4.0, 5.0]), "v",
                         ["k"], ["seq"], n=5)
    last = df.orderBy("seq").collect()[-1]
    assert last["roll_skew"] == 0.0
    assert last["roll_kurt"] < 0.0


def test_rolling_beta_exact_linear_relation(spark):
    # y = 2x + 1 exactly -> beta == 2 wherever defined.
    rows = [("k", i, float(x), float(2 * x + 1))
            for i, x in enumerate([1, 3, 2, 5, 4, 6])]
    df = spark.createDataFrame(
        rows, "k string, seq long, x double, y double")
    out = rolling_beta(df, "y", "x", ["k"], ["seq"], n=3)
    vals = [r["beta"] for r in out.collect() if r["beta"] is not None]
    assert vals and all(v == 2.0 for v in vals)


def test_event_streaks_islands(spark):
    rows = [
        (1, i, t, ts) for i, (t, ts) in enumerate(
            [("a", 10), ("a", 20), ("b", 30), ("a", 40), ("a", 50),
             ("a", 60)])
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts long")
    out = {(r["event_type"], r["start_event_id"]): r["streak_len"]
           for r in event_streaks(df, min_len=2).collect()}
    # Two qualifying runs: a[0..1] (len 2) and a[3..5] (len 3); the
    # lone 'b' is filtered.
    assert out == {("a", 0): 2, ("a", 3): 3}


def test_latest_order_matches_window_idiom(spark, sf_dir):
    from datafusion_functions_financial_spark.sources.tables import load
    orders = load(spark, sf_dir, "orders")
    fast = latest_order_per_customer(orders)
    from pyspark.sql import Window
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    slow = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("o_custkey",
                F.col("o_orderkey").alias("last_orderkey"),
                F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("last_order_us"),
                F.col("o_totalprice").alias("last_totalprice"))
    )
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_lexical_stats_known_doc(spark):
    df = spark.createDataFrame(
        [(1, "the cat the hat")], "doc_id long, text string")
    row = lexical_stats(df).collect()[0]
    assert row["n_tokens"] == 4
    assert row["ttr"] == 0.75            # {the, cat, hat} / 4
    assert row["stopword_ratio"] == 0.5  # 'the' twice
    assert row["mean_word_len"] == 3.0


def test_oov_rate_topk(spark):
    # Vocab k=1 keeps only the most frequent term ('x', tf 3).
    df = spark.createDataFrame(
        [(1, "x x x y"), (2, "y z")], "doc_id long, text string")
    rows = {r["doc_id"]: r["oov_rate"] for r in oov_rate(df, k=1).collect()}
    assert rows[1] == 0.25
    assert rows[2] == 1.0


def test_random_projection_shape_and_determinism(spark, sf_dir):
    from datafusion_functions_financial_spark.sources.tables import load
    emb = load(spark, sf_dir, "embeddings").limit(5)
    a = random_projection(emb).collect()
    b = random_projection(emb).collect()
    assert all(len(r["projected"]) == 8 for r in a)
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_chunking_rejects_gapping_stride(spark):
    from datafusion_functions_financial_spark.operators.chunking import (
        chunk_documents,
    )
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=2, stride=10)


def test_time_since_high_resets_on_new_peak(spark):
    from datafusion_functions_financial_spark.functions.rollstats2 import (
        time_since_high,
    )
    out = time_since_high(_series(spark, [5, 3, 4, 6, 2, 2]), "v",
                          ["k"], ["seq"]).orderBy("seq").collect()
    # peaks at seq 0 and 3; distances: 0,1,2,0,1,2
    assert [r["bars_since_high"] for r in out] == [0, 1, 2, 0, 1, 2]


def test_return_autocorr_alternating_series(spark):
    from datafusion_functions_financial_spark.functions.rollstats2 import (
        return_autocorr,
    )
    # Alternating up/down returns -> strong negative lag-1 autocorr.
    vals, v = [], 100.0
    for i in range(20):
        v = v * (1.25 if i % 2 == 0 else 0.8)
        vals.append(v)
    out = return_autocorr(_series(spark, vals), "v", ["k"], ["seq"]).collect()
    assert len(out) == 1
    assert out[0]["autocorr"] < -0.9


def test_candle_patterns_doji_flag(spark):
    from datafusion_functions_financial_spark.functions.candles import (
        candle_patterns,
    )
    day_ns = 86_400 * 10**9
    # Day 0: open 10 ... close 10.01, high 12, low 8 -> doji (body 1% of range)
    # Day 1: strong green bar after red -> engulfing impossible here (prev green?)
    rows = [
        (1, 0 * day_ns + 1, 0, 10.0), (1, 0 * day_ns + 2, 1, 12.0),
        (1, 0 * day_ns + 3, 2, 8.0), (1, 0 * day_ns + 4, 3, 10.01),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, value double")
    out = candle_patterns(df).collect()
    assert len(out) == 1 and out[0]["is_doji"] is True


def test_candle_bull_engulf(spark):
    from datafusion_functions_financial_spark.functions.candles import (
        candle_patterns,
    )
    day_ns = 86_400 * 10**9
    rows = [
        # Day 0: red bar open 11 -> close 10
        (1, 0 * day_ns + 1, 0, 11.0), (1, 0 * day_ns + 2, 1, 10.0),
        # Day 1: green bar open 9.5 -> close 11.5, engulfing day 0's body
        (1, 1 * day_ns + 1, 2, 9.5), (1, 1 * day_ns + 2, 3, 11.5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, value double")
    out = {r["day"]: r for r in candle_patterns(df).collect()}
    assert out[1]["is_bull_engulf"] is True
    assert not out[0]["is_bull_engulf"]


def test_resample_interp_linear_gap(spark):
    from datafusion_functions_financial_spark.functions.resample import (
        resample_interp,
    )
    s_ns = 10**9
    width = 10  # 10-second buckets
    rows = [
        # obs in bucket 0 (v=10) and bucket 3 (v=40): gap buckets 1,2
        # interpolate to 20, 30.
        (1, 5 * s_ns, 0, 10.0), (1, 35 * s_ns, 1, 40.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, value double")
    out = {r["bucket_start"]: r["value_interp"]
           for r in resample_interp(df, width_s=width).collect()}
    assert out == {0: 10.0, 10: 20.0, 20: 30.0, 30: 40.0}


def test_composite_quality_monotone_in_ttr(spark):
    from datafusion_functions_financial_spark.operators.text2 import (
        composite_quality,
    )
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),      # TTR 1.0, no stopwords
         (2, "spam spam spam spam")],        # TTR 0.25
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in composite_quality(df).collect()}
    assert rows[1]["quality_score"] > rows[2]["quality_score"]
    assert rows[1]["decile"] == 1


def test_session_stats_bounce(spark):
    from datafusion_functions_financial_spark.plans.analytics2 import (
        session_stats,
    )
    m_ns = 60 * 10**9
    rows = [
        # user 1: session A (2 events 10min apart), then 40min gap ->
        # session B (1 event) => 2 sessions, bounce rate 0.5
        (1, 0 * m_ns, 0, "x", 1.0), (1, 10 * m_ns, 1, "x", 1.0),
        (1, 50 * m_ns, 2, "x", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, ts long, event_id long, event_type string, "
        "value double")
    out = session_stats(df).collect()[0]
    assert out["n_sessions"] == 2
    assert out["bounce_rate"] == 0.5
    # durations: 600s and 0s -> mean 300s
    assert out["mean_duration_s"] == 300.0


def test_knn_label_vote_self_consistent(spark, sf_dir):
    from datafusion_functions_financial_spark.operators.embstats import (
        knn_label_vote,
    )
    from datafusion_functions_financial_spark.sources.tables import load
    emb = load(spark, sf_dir, "embeddings")
    out = knn_label_vote(emb, emb.filter(F.col("vec_id") < 5)).collect()
    assert len(out) == 5
    labels = {r["label"] for r in emb.select("label").collect()}
    assert all(r["pred_label"] in labels for r in out)
    assert all(1 <= r["votes"] <= 5 for r in out)


def test_weighted_quantile_known_values(spark):
    from datafusion_functions_financial_spark.operators.wquantile import (
        weighted_quantile,
    )
    # Group g: values 1(w=1), 2(w=1), 3(w=8) -> total 10, half 5 ->
    # first value whose cumw*2 >= 10 is 3 (cum 1,2,10).
    rows = [("g", 0, 1.0, 1.0), ("g", 1, 2.0, 1.0), ("g", 2, 3.0, 8.0),
            # Group h: equal weights -> weighted median = lower median.
            ("h", 0, 10.0, 1.0), ("h", 1, 20.0, 1.0)]
    df = spark.createDataFrame(
        rows, "k string, seq long, v double, w double")
    out = {r["k"]: (r["w_quantile"], r["total_weight"])
           for r in weighted_quantile(df, "v", "w", ["k"], ["seq"]).collect()}
    assert out["g"] == (3.0, 10)
    assert out["h"] == (10.0, 2)


def test_weighted_quantile_p90(spark):
    from datafusion_functions_financial_spark.operators.wquantile import (
        weighted_quantile,
    )
    rows = [("g", i, float(i), 1.0) for i in range(1, 11)]  # 1..10
    df = spark.createDataFrame(
        rows, "k string, seq long, v double, w double")
    out = weighted_quantile(df, "v", "w", ["k"], ["seq"],
                            numer=9, denom=10).collect()[0]
    assert out["w_quantile"] == 9.0  # first cumw*10 >= 90 is at v=9


def test_snapshot_diff_statuses(spark):
    from datafusion_functions_financial_spark.operators.diff import (
        snapshot_diff,
    )
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "id long, v string")
    out = {r["id"]: r["status"]
           for r in snapshot_diff(old, new, ["id"], ["v"]).collect()}
    assert out == {1: "removed", 3: "changed", 4: "added"}


def test_fk_orphans_anti_join(spark):
    from datafusion_functions_financial_spark.operators.diff import (
        fk_orphans,
    )
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99)], "id long, pk long")
    parent = spark.createDataFrame([(10,), (20,)], "k long")
    out = fk_orphans(child, parent, "pk", "k").collect()
    assert [(r["id"], r["pk"]) for r in out] == [(3, 99)]

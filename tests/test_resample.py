"""Behavioral tests for gap-filled resampling (functions/resample.py)."""

from datafusion_functions_financial_spark.functions.resample import (
    resample_ffill,
)


def _events(spark, rows):
    # (user_id, ts_seconds, event_id, value) -> ns timestamps
    data = [(u, int(t * 1_000_000_000), e, float(v)) for u, t, e, v in rows]
    return spark.createDataFrame(
        data, "user_id long, ts long, event_id long, value double"
    )


def test_gaps_are_filled_forward(spark):
    df = _events(spark, [(1, 0, 1, 10.0), (1, 35, 2, 20.0)])
    out = resample_ffill(df, width_s=10).orderBy("bucket_start").collect()
    assert [(r.bucket_start, r.value_ff, r.n_obs) for r in out] == [
        (0, 10.0, 1), (10, 10.0, 0), (20, 10.0, 0), (30, 20.0, 1),
    ]


def test_last_observation_in_bucket_wins(spark):
    df = _events(spark, [(1, 0, 1, 10.0), (1, 5, 2, 99.0), (1, 3, 3, 50.0)])
    out = resample_ffill(df, width_s=10).collect()
    assert len(out) == 1 and out[0].value_ff == 99.0 and out[0].n_obs == 3


def test_tiebreak_on_event_id(spark):
    df = _events(spark, [(1, 5, 7, 1.0), (1, 5, 9, 2.0)])
    out = resample_ffill(df, width_s=10).collect()
    assert out[0].value_ff == 2.0  # higher event_id wins at equal ts


def test_keys_are_independent(spark):
    df = _events(spark, [(1, 0, 1, 1.0), (1, 25, 2, 2.0), (2, 12, 3, 5.0)])
    out = resample_ffill(df, width_s=10)
    by_key = {}
    for r in out.collect():
        by_key.setdefault(r.user_id, []).append(r)
    assert len(by_key[1]) == 3  # buckets 0,1,2
    assert len(by_key[2]) == 1  # only its own bucket, no global extent
    assert by_key[2][0].bucket_start == 10

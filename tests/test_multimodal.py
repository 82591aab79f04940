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


def test_pil_decoder_gating(media):
    if not MM._have_pil():
        with pytest.raises(NotImplementedError, match="PIL not available"):
            MM.decode_images(media, decoder="pil")
        # auto falls back to the deterministic fake
        out = {r["media_id"]: r for r in MM.decode_images(media, decoder="auto").collect()}
        assert len(out["m0"]["pixels"]) == 8 * 8 * 3
    with pytest.raises(ValueError):
        MM.decode_images(media, decoder="nope")


class _StubImageModule:
    """Minimal PIL.Image stand-in: enough surface (open/convert/resize +
    __array__) to drive _decode_batch's REAL pil branch in-process when
    the container has no PIL.  Bytes starting with 'IMG' decode to a
    solid-color image whose value is byte 3; everything else raises, like
    PIL would on garbage."""

    class _Img:
        def __init__(self, val, size):
            self._val, self._size = val, size

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def resize(self, size):
            return _StubImageModule._Img(self._val, size)

        def __array__(self, dtype=None, copy=None):
            import numpy as np

            w, h = self._size
            return np.full((h, w, 3), self._val, dtype=dtype or np.uint8)

    @staticmethod
    def open(bio):
        data = bio.read()
        if not data.startswith(b"IMG"):
            raise OSError("cannot identify image file")
        return _StubImageModule._Img(data[3], (64, 48))


def test_pil_branch_plumbing(monkeypatch):
    """Drives the real decoder='pil' branch of _decode_batch (bytes ->
    Image.open -> RGB -> resize -> uint8 tensor; per-row failure -> nulls)
    with a stand-in PIL module, since this container ships without PIL.
    test_pil_decode_real below runs the same path with the real library
    wherever it exists."""
    import sys
    import types

    import pandas as pd

    pil = types.ModuleType("PIL")
    pil.Image = _StubImageModule
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _StubImageModule)

    pdf = pd.DataFrame(
        {
            "media_id": ["a", "b", "c", "d"],
            "kind": ["image", "image", "image", "audio"],
            "bytes": [b"IMG\x07rest", b"IMGgarbage", b"notanimage", b"RIFF"],
        }
    )
    out = MM._decode_batch(pdf, "pil", 4, 4)
    a = out.loc[out.media_id == "a"].iloc[0]
    assert a["px_width"] == 4 and a["px_height"] == 4
    assert a["pixels"] == [7] * (4 * 4 * 3)
    b = out.loc[out.media_id == "b"].iloc[0]
    assert b["pixels"] == [ord("g")] * (4 * 4 * 3)
    # undecodable bytes and non-image rows yield nulls, not failures
    assert out.loc[out.media_id == "c"].iloc[0]["pixels"] is None
    assert out.loc[out.media_id == "d"].iloc[0]["pixels"] is None


@pytest.mark.skipif(not MM._have_pil(), reason="PIL not installed")
def test_pil_decode_real(spark):
    """End-to-end decoder='pil' through Spark with a real PNG."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (16, 12), (250, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [("p0", "image", bytearray(buf.getvalue()), None)], MM.MEDIA_SCHEMA
    )
    row = MM.decode_images(df, decoder="pil", target=(4, 4)).collect()[0]
    assert row["px_width"] == 4 and len(row["pixels"]) == 4 * 4 * 3
    assert row["pixels"][0] > 200  # red channel survived decode+resize


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

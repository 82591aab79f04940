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
        # auto falls back to the real numpy PNG decoder: the fixture's
        # fake bytes aren't PNGs, so they decode to nulls (per-row, no
        # job failure) — the stub pixels require decoder='fake' explicitly
        out = {r["media_id"]: r for r in MM.decode_images(media, decoder="auto").collect()}
        assert out["m0"]["pixels"] is None
    fake = {r["media_id"]: r for r in MM.decode_images(media, decoder="fake").collect()}
    assert len(fake["m0"]["pixels"]) == 8 * 8 * 3
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


def _png_bytes(arr, color_type=2, filter_type=0, palette=None):
    """Minimal PNG encoder (test-side): 8-bit, non-interlaced, one
    filter type for every scanline — exercises the decoder's unfilter
    paths against spec-correct input."""
    import struct
    import zlib

    import numpy as np

    h, w = arr.shape[:2]
    channels = arr.shape[2] if arr.ndim == 3 else 1
    flat = arr.reshape(h, w * channels).astype(np.int32)
    bpp = channels
    lines = []
    prev = np.zeros(w * channels, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - left
        elif filter_type == 2:
            out = cur - prev
        elif filter_type == 3:
            out = cur - (left + prev) // 2
        else:  # paeth
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            out = cur - pred
        lines.append(bytes([filter_type]) + bytes((out % 256).astype(np.uint8)))
        prev = cur

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette.astype(np.uint8).reshape(-1)))
    out += chunk(b"IDAT", zlib.compress(b"".join(lines)))
    return out + chunk(b"IEND", b"")


def test_png_decoder_all_filters_and_colortypes():
    """_decode_png must invert every scanline filter and expand every
    supported color type back to the original RGB."""
    import numpy as np

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(9, 5, 3), dtype=np.uint8)
    for ftype in range(5):
        got = MM._decode_png(_png_bytes(rgb, color_type=2, filter_type=ftype))
        assert got is not None and (got == rgb).all(), f"filter {ftype}"
    gray = rng.randint(0, 256, size=(4, 6, 1), dtype=np.uint8)
    got = MM._decode_png(_png_bytes(gray, color_type=0, filter_type=4))
    assert (got == np.repeat(gray, 3, axis=2)).all()
    rgba = np.dstack([rgb, np.full((9, 5), 128, np.uint8)])
    got = MM._decode_png(_png_bytes(rgba, color_type=6, filter_type=1))
    assert (got == rgb).all()  # alpha dropped
    pal = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idxs = rng.randint(0, 4, size=(3, 7, 1), dtype=np.uint8)
    got = MM._decode_png(_png_bytes(idxs, color_type=3, filter_type=2, palette=pal))
    assert (got == pal[idxs[:, :, 0]]).all()
    # junk and truncated input -> None, never an exception
    assert MM._decode_png(b"notapng") is None
    assert MM._decode_png(_png_bytes(rgb)[:30]) is None


def test_png_decode_real(spark):
    """End-to-end REAL decode through Spark: actual PNG bytes ->
    decoder='png' (the dependency-free real path; 'auto' resolves to it
    here) -> resized RGB tensor."""
    import numpy as np

    img = np.zeros((12, 16, 3), dtype=np.uint8)
    img[:, :, 0] = 250  # solid red
    img[:, :, 1] = 10
    df = spark.createDataFrame(
        [
            ("p0", "image", bytearray(_png_bytes(img, filter_type=4)), None),
            ("p1", "image", bytearray(b"corrupt bytes"), None),
        ],
        MM.MEDIA_SCHEMA,
    )
    decoder = "pil" if MM._have_pil() else "png"
    rows = {
        r["media_id"]: r
        for r in MM.decode_images(df, decoder=decoder, target=(4, 4)).collect()
    }
    assert rows["p0"]["px_width"] == 4 and len(rows["p0"]["pixels"]) == 4 * 4 * 3
    assert rows["p0"]["pixels"][0] > 200  # red channel survived decode+resize
    assert rows["p0"]["pixels"][2] == 0  # blue stayed dark
    assert rows["p1"]["pixels"] is None  # corrupt row -> nulls, not failure


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


# ---------------------------------------------------------------------------
# real WAV decode (stdlib wave, mirroring the PNG real path)
# ---------------------------------------------------------------------------

def _wav_bytes(samples, rate=8000, sampwidth=2, channels=1):
    """Write float samples in [-1, 1] (1-D mono, or (n, channels)) to
    PCM WAV bytes via the stdlib writer — the decoder's exact inverse."""
    import io
    import wave

    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if channels > 1:
        assert arr.ndim == 2 and arr.shape[1] == channels
        arr = arr.reshape(-1)  # interleave
    if sampwidth == 1:
        data = np.clip(arr * 127 + 128, 0, 255).astype(np.uint8).tobytes()
    elif sampwidth == 2:
        data = np.clip(arr * 32767, -32768, 32767).astype("<i2").tobytes()
    else:
        data = np.clip(arr * 2147483647, -(2**31), 2**31 - 1).astype("<i4").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        wf.writeframes(data)
    return buf.getvalue()


def test_wav_decoder_roundtrip():
    import numpy as np

    t = np.arange(16000) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    got = MM._decode_wav(_wav_bytes(sine, rate=8000, sampwidth=2))
    assert got is not None
    samples, rate = got
    assert rate == 8000 and len(samples) == 16000
    assert np.sqrt((samples**2).mean()) == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    # 8-bit path (coarse quantization, wider tolerance)
    s8, _ = MM._decode_wav(_wav_bytes(sine, sampwidth=1))
    assert np.sqrt((s8**2).mean()) == pytest.approx(0.5 / np.sqrt(2), rel=2e-2)
    # 32-bit path
    s32, _ = MM._decode_wav(_wav_bytes(sine, sampwidth=4))
    assert np.abs(s32 - sine).max() < 1e-6
    # stereo averages to mono: L = +0.5, R = -0.5 cancels
    st = np.stack([np.full(100, 0.5), np.full(100, -0.5)], axis=1)
    sm, _ = MM._decode_wav(_wav_bytes(st, channels=2))
    assert len(sm) == 100 and np.abs(sm).max() < 1e-3
    # non-WAV bytes refuse cleanly
    assert MM._decode_wav(b"RIFFfakeaudio" * 50) is None
    assert MM._decode_wav(b"") is None


def test_audio_window_stats_real_wav(spark):
    """End-to-end REAL audio through Spark: a 2 s WAV whose first second
    is loud (amp .8) and second second quiet (amp .2) must produce four
    500 ms windows whose RMS tracks the amplitude profile; undecodable
    audio rows emit no windows."""
    import numpy as np

    t = np.arange(8000) / 8000.0
    loud = 0.8 * np.sin(2 * np.pi * 440 * t)
    quiet = 0.2 * np.sin(2 * np.pi * 440 * t)
    wav = _wav_bytes(np.concatenate([loud, quiet]), rate=8000)
    df = spark.createDataFrame(
        [
            ("a0", "audio", bytearray(wav),
             {"format": "wav", "width": None, "height": None, "duration_ms": 2000}),
            ("a1", "audio", bytearray(b"not a wav at all"),
             {"format": "wav", "width": None, "height": None, "duration_ms": 1000}),
        ],
        MM.MEDIA_SCHEMA,
    )
    rows = MM.audio_window_stats(df, window_ms=500, decoder="wav").collect()
    by_idx = {r["window_idx"]: r["energy"] for r in rows}
    assert all(r["media_id"] == "a0" for r in rows)  # a1 undecodable -> dropped
    assert sorted(by_idx) == [0, 1, 2, 3]
    assert by_idx[0] == pytest.approx(0.8 / np.sqrt(2), rel=1e-2)
    assert by_idx[1] == pytest.approx(0.8 / np.sqrt(2), rel=1e-2)
    assert by_idx[2] == pytest.approx(0.2 / np.sqrt(2), rel=1e-2)
    assert by_idx[3] == pytest.approx(0.2 / np.sqrt(2), rel=1e-2)


# ---------------------------------------------------------------------------
# real Y4M video decode (stdlib parse, mirroring the PNG/WAV real paths)
# ---------------------------------------------------------------------------

def _y4m_bytes(lumas, fps=(2, 1), fmt=b"C420jpeg"):
    """Encode (H, W) uint8 luma frames as YUV4MPEG2 bytes (neutral
    chroma planes) — the decoder's exact inverse for the luma channel."""
    import numpy as np

    H, W = lumas[0].shape
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (W, H, fps[0], fps[1], fmt)
    out = [head]
    for fr in lumas:
        out.append(b"FRAME\n")
        out.append(fr.astype(np.uint8).tobytes())
        out.append(bytes([128] * (2 * ((W // 2) * (H // 2)))))  # flat chroma
    return b"".join(out)


def test_y4m_decoder_roundtrip():
    import numpy as np

    lumas = [np.full((6, 8), v, dtype=np.uint8) for v in (10, 120, 240)]
    got = MM._decode_y4m(_y4m_bytes(lumas, fps=(2, 1)))
    assert got is not None
    frames, fps = got
    assert fps == 2.0 and len(frames) == 3
    assert frames[0].shape == (6, 8, 3)
    assert int(frames[1][0, 0, 0]) == 120  # luma replicated to RGB
    assert MM._decode_y4m(b"not a video") is None
    assert MM._decode_y4m(_y4m_bytes(lumas)[:40]) is None  # truncated


def test_sample_frames_decoded_real_y4m(spark):
    """End-to-end REAL video through Spark: 4 frames at 2 fps (2 s),
    sampled every 500 ms, must yield each frame once with its planted
    luma; an undecodable video row emits nothing."""
    import numpy as np

    lumas = [np.full((6, 8), 40 * (i + 1), dtype=np.uint8) for i in range(4)]
    df = spark.createDataFrame(
        [
            ("v0", "video", bytearray(_y4m_bytes(lumas, fps=(2, 1))),
             {"format": "y4m", "width": 8, "height": 6, "duration_ms": 2000}),
            ("v1", "video", bytearray(b"garbage bytes"),
             {"format": "y4m", "width": 8, "height": 6, "duration_ms": 2000}),
        ],
        MM.MEDIA_SCHEMA,
    )
    rows = MM.sample_frames_decoded(df, every_ms=500, target=(4, 4)).collect()
    assert all(r["media_id"] == "v0" for r in rows)
    by_ts = {r["frame_ts_ms"]: r for r in rows}
    assert sorted(by_ts) == [0, 500, 1000, 1500]
    for i, ts in enumerate(sorted(by_ts)):
        r = by_ts[ts]
        assert r["px_width"] == 4 and len(r["pixels"]) == 4 * 4 * 3
        assert r["pixels"][0] == 40 * (i + 1)  # frame i's planted luma
    # the decoded frame rows feed the image featurizer directly
    feats = MM.image_features(
        MM.sample_frames_decoded(df, every_ms=500, target=(4, 4)), dim=8
    ).collect()
    assert all(len(r["features"]) == 8 for r in feats)

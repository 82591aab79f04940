"""Multimodal (image/audio/video) column handling for training pipelines.

Design: media are opaque ``binary`` columns + a typed metadata struct —
the only schema that survives 100 TB (never parse media on the driver,
never explode bytes into rows).  All per-item work happens in
Arrow-batched ``mapInPandas`` kernels so bytes move executor-side in
columnar batches.

Decoders: ``decoder="png"`` is a REAL, dependency-free decoder — a
pure numpy+zlib implementation of the PNG spec (8-bit depth, color
types 0/2/3/4/6, non-interlaced; the format the vast majority of
lossless training images use) with nearest-neighbor resize — so real
bytes flow through the whole pipeline even in this codec-less
container.  ``decoder="pil"`` uses PIL when importable (full format
coverage, bilinear resize) and raises NotImplementedError otherwise.
``decoder="fake"`` (default) keeps the deterministic content-hash stub
for fixtures whose bytes aren't real media.  ``decoder="auto"`` picks
pil, else png.  Audio has the same split: ``decoder="wav"`` is a REAL
stdlib ``wave``-based PCM decoder (8/16/32-bit, any channel count).
Video too: ``sample_frames_decoded(decoder="y4m")`` parses the
uncompressed YUV4MPEG2 container and samples REAL frames.  Only
compressed codecs (mp3/ogg, h264/vp9; ffmpeg/librosa) remain stubbed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_pixels(data: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: seed a PRNG from the content hash so the
    'pixels' are stable across runs/partitions (replayable tests)."""
    seed = int.from_bytes(hashlib.sha256(data or b"").digest()[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(data: bytes) -> "np.ndarray | None":
    """Pure numpy+zlib PNG decode -> (H, W, 3) uint8, or None if the
    bytes aren't a decodable PNG.  Implements the public PNG spec
    (RFC 2083): chunk walk, zlib inflate, per-scanline unfilter
    (None/Sub/Up/Average/Paeth), then sample expansion to RGB.
    Supports bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), interlace 0 — alpha is dropped."""
    import struct
    import zlib

    try:
        if not data or not data.startswith(_PNG_SIG):
            return None
        pos, ihdr, plte, idat = len(_PNG_SIG), None, None, []
        while pos + 8 <= len(data):
            (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
            body = data[pos + 8:pos + 8 + length]
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", body)
            elif ctype == b"PLTE":
                plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
            elif ctype == b"IDAT":
                idat.append(body)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + body + crc
        if ihdr is None or not idat:
            return None
        width, height, depth, color, _comp, _filt, interlace = ihdr
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
        if depth != 8 or channels is None or interlace != 0:
            return None
        raw = zlib.decompress(b"".join(idat))
        stride = width * channels
        if len(raw) < height * (stride + 1):
            return None
        rows = np.frombuffer(raw, dtype=np.uint8)[: height * (stride + 1)]
        rows = rows.reshape(height, stride + 1)
        filters, scan = rows[:, 0], rows[:, 1:].astype(np.int32)
        out = np.zeros((height, stride), dtype=np.uint8)
        bpp = channels
        for y in range(height):
            f, cur = filters[y], scan[y].copy()
            prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
            if f == 0:
                rec = cur
            elif f == 2:  # Up
                rec = cur + prev
            else:  # Sub / Average / Paeth need the running left value
                rec = cur
                for x in range(stride):
                    left = rec[x - bpp] if x >= bpp else 0
                    up = prev[x]
                    ul = prev[x - bpp] if x >= bpp else 0
                    if f == 1:
                        rec[x] += left
                    elif f == 3:
                        rec[x] += (left + up) // 2
                    elif f == 4:
                        p = left + up - ul
                        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                        if pa <= pb and pa <= pc:
                            rec[x] += left
                        elif pb <= pc:
                            rec[x] += up
                        else:
                            rec[x] += ul
                    else:
                        return None
                    rec[x] &= 0xFF
            out[y] = rec & 0xFF
        px = out.reshape(height, width, channels)
        if color == 2:
            rgb = px
        elif color == 6:
            rgb = px[:, :, :3]
        elif color == 0:
            rgb = np.repeat(px, 3, axis=2)
        elif color == 4:
            rgb = np.repeat(px[:, :, :1], 3, axis=2)
        else:  # palette
            if plte is None:
                return None
            rgb = plte[px[:, :, 0]]
        return np.ascontiguousarray(rgb, dtype=np.uint8)
    except Exception:
        return None


def _decode_wav(data: bytes):
    """Stdlib ``wave`` decode -> (mono float64 samples in [-1, 1],
    sample_rate), or None if the bytes aren't PCM WAV — the audio
    sibling of _decode_png (real bytes, zero third-party deps).
    Supports 8/16/32-bit integer PCM; multi-channel audio is averaged
    to mono."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data)) as wf:
            nch = wf.getnchannels()
            sw = wf.getsampwidth()
            rate = wf.getframerate()
            raw = wf.readframes(wf.getnframes())
    except Exception:
        return None
    if rate <= 0 or nch <= 0:
        return None
    if sw == 1:  # unsigned 8-bit
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    if nch > 1:
        arr = arr[: (len(arr) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return arr, rate


_Y4M_SIG = b"YUV4MPEG2 "


def _decode_y4m(data: bytes):
    """Stdlib YUV4MPEG2 (y4m) decode -> (frames, fps) or None — the
    video sibling of _decode_png/_decode_wav (real bytes, zero
    third-party deps; y4m is the uncompressed interchange format of the
    public mjpegtools lineage).  ``frames`` is a list of (H, W, 3)
    uint8 RGB arrays (luma replicated to RGB for C420/C422/Cmono —
    chroma is irrelevant to the feature kernels downstream).  Only the
    container is parsed here; compressed codecs (h264/vp9) remain
    stubbed behind decoder='fake'."""
    try:
        if not data or not data.startswith(_Y4M_SIG):
            return None
        nl = data.index(b"\n")
        params = data[len(_Y4M_SIG):nl].split(b" ")
        W = H = None
        num, den = 25, 1
        fmt = b"420"
        for p in params:
            if p[:1] == b"W":
                W = int(p[1:])
            elif p[:1] == b"H":
                H = int(p[1:])
            elif p[:1] == b"F":
                num, den = (int(x) for x in p[1:].split(b":"))
            elif p[:1] == b"C":
                fmt = p[1:]
        if not W or not H or num <= 0 or den <= 0:
            return None
        if fmt.startswith(b"420"):
            frame_len = W * H + 2 * ((W // 2) * (H // 2))
        elif fmt.startswith(b"422"):
            frame_len = W * H + 2 * ((W // 2) * H)
        elif fmt.startswith(b"444"):
            frame_len = 3 * W * H
        elif fmt.startswith(b"mono"):
            frame_len = W * H
        else:
            return None
        frames, pos = [], nl + 1
        while pos < len(data):
            fnl = data.index(b"\n", pos)
            if data[pos:pos + 5] != b"FRAME":
                return None
            body = data[fnl + 1 : fnl + 1 + frame_len]
            if len(body) < frame_len:
                return None
            luma = np.frombuffer(body[: W * H], dtype=np.uint8).reshape(H, W)
            frames.append(np.repeat(luma[:, :, None], 3, axis=2))
            pos = fnl + 1 + frame_len
        if not frames:
            return None
        return frames, num / den
    except Exception:
        return None


def _nearest_resize(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize of (H, W, C) to (h, w, C)."""
    H, W = arr.shape[:2]
    ys = np.minimum((np.arange(h) * H) // h, H - 1)
    xs = np.minimum((np.arange(w) * W) // w, W - 1)
    return arr[ys][:, xs]


def _decode_batch(pdf, decoder: str, w: int, h: int):
    """Decode one Arrow batch (pandas DataFrame) -> pixel columns.

    Factored out of the mapInPandas kernel so the REAL decoder branch is
    unit-testable in-process (tests/test_multimodal.py) even though this
    container ships without PIL — Spark workers and the test exercise the
    identical code.  `decoder='pil'`: PIL.Image bytes -> RGB -> resize;
    rows whose bytes don't parse yield nulls (decode failure is a per-row
    condition, not a job failure).  `decoder='fake'`: deterministic
    content-hash pixels (the documented stub)."""
    if decoder == "pil":
        import io

        from PIL import Image  # imported on the executor, where it runs

    pixels, widths, heights = [], [], []
    for data, kind in zip(pdf["bytes"], pdf["kind"]):
        if kind != "image" or data is None:
            pixels.append(None)
            widths.append(None)
            heights.append(None)
            continue
        if decoder == "pil":
            try:
                img = Image.open(io.BytesIO(bytes(data))).convert("RGB").resize((w, h))
                arr = np.asarray(img, dtype=np.uint8)
            except Exception:
                pixels.append(None)
                widths.append(None)
                heights.append(None)
                continue
        elif decoder == "png":
            decoded = _decode_png(bytes(data))
            if decoded is None:
                pixels.append(None)
                widths.append(None)
                heights.append(None)
                continue
            arr = _nearest_resize(decoded, w, h)
        else:
            arr = _fake_pixels(bytes(data), w, h)
        pixels.append(arr.reshape(-1).astype("int32").tolist())
        widths.append(w)
        heights.append(h)
    return pdf.assign(pixels=pixels, px_width=widths, px_height=heights)


def decode_images(
    df: DataFrame,
    decoder: str = "fake",
    target: tuple[int, int] = (8, 8),
) -> DataFrame:
    """binary -> fixed-shape pixel tensor column (flattened array<int> +
    shape fields).  Resize is part of decode so undecoded full-resolution
    pixels never hit the shuffle.

    decoder='pil' is the full-coverage REAL path (requires PIL on
    driver+executors); decoder='png' is the dependency-free REAL path
    (pure numpy+zlib PNG, nearest-neighbor resize); 'auto' picks pil
    when available, else png; 'fake' is the deterministic content-hash
    stub for non-media fixture bytes."""
    if decoder == "auto":
        decoder = "pil" if _have_pil() else "png"
    if decoder == "pil" and not _have_pil():
        raise NotImplementedError(
            "PIL not available in this environment; use decoder='png' or 'auto'"
        )
    if decoder not in ("fake", "pil", "png"):
        raise ValueError(f"unknown decoder {decoder!r}")
    w, h = target
    out_schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("pixels", T.ArrayType(T.IntegerType()), True),
            T.StructField("px_width", T.IntegerType(), True),
            T.StructField("px_height", T.IntegerType(), True),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            yield _decode_batch(pdf, decoder, w, h)

    return df.mapInPandas(kernel, out_schema)


def image_features(df_decoded: DataFrame, dim: int = 16) -> DataFrame:
    """Pixel tensor -> normalized feature embedding (array<float>).

    The fake featurizer is channel-histogram pooling — deterministic and
    shaped exactly like a real model head, so downstream kNN/dedup over
    media embeddings is fully exercised."""
    out_schema = T.StructType(
        list(df_decoded.schema) + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for px in pdf["pixels"]:
                if px is None or len(px) == 0:
                    feats.append(None)
                    continue
                arr = np.asarray(px, dtype=np.float64)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                v = hist.astype(np.float64)
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).astype("float32").tolist())
            yield pdf.assign(features=feats)

    return df_decoded.mapInPandas(kernel, out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> one row per sampled frame timestamp (schema plumbing for
    frame extraction; the decode itself is the stubbed fake — see
    sample_frames_decoded for the real y4m path)."""
    frames = F.when(
        (F.col("kind") == "video") & F.col("meta.duration_ms").isNotNull(),
        F.sequence(
            F.lit(0),
            F.greatest(F.lit(0), (F.col("meta.duration_ms") / every_ms).cast("long") - 1)
            * every_ms
            + 0,
            F.lit(every_ms),
        ),
    )
    return (
        df.withColumn("frame_ts_ms", F.explode(frames))
        .select("media_id", "kind", "frame_ts_ms", "bytes", "meta")
    )


def sample_frames_decoded(
    df: DataFrame,
    every_ms: int = 1000,
    decoder: str = "y4m",
    target: tuple[int, int] = (8, 8),
) -> DataFrame:
    """REAL frame sampling: decode y4m video bytes and emit one PIXEL
    row per sampled timestamp — (media_id, frame_ts_ms, pixels,
    px_width, px_height), resized like decode_images so the rows feed
    image_features / media kNN directly.  Sampling picks the frame at
    floor(ts * fps / 1000); rows whose bytes don't parse emit nothing
    (the per-row decode-failure contract of the image/audio paths).
    ``decoder='fake'`` emits deterministic content-hash pixels at the
    metadata-derived timestamps, for fixtures without real media."""
    if decoder not in ("y4m", "fake"):
        raise ValueError(f"unknown decoder {decoder!r}")
    w, h = target
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("pixels", T.ArrayType(T.IntegerType()), True),
            T.StructField("px_width", T.IntegerType(), True),
            T.StructField("px_height", T.IntegerType(), True),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows = {"media_id": [], "frame_ts_ms": [], "pixels": [],
                    "px_width": [], "px_height": []}
            for mid, kind, data, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["bytes"], pdf["meta"]
            ):
                if kind != "video" or data is None:
                    continue
                if decoder == "y4m":
                    dec = _decode_y4m(bytes(data))
                    if dec is None:
                        continue
                    frames, fps = dec
                    dur_ms = int(len(frames) / fps * 1000)
                    ts = 0
                    while ts < max(dur_ms, 1):
                        idx = min(int(ts * fps / 1000.0), len(frames) - 1)
                        arr = _nearest_resize(frames[idx], w, h)
                        rows["media_id"].append(mid)
                        rows["frame_ts_ms"].append(ts)
                        rows["pixels"].append(
                            arr.reshape(-1).astype("int32").tolist()
                        )
                        rows["px_width"].append(w)
                        rows["px_height"].append(h)
                        ts += every_ms
                else:
                    dur = (meta or {}).get("duration_ms") or 0
                    for ts in range(0, max(int(dur), 1), every_ms):
                        arr = _fake_pixels(
                            bytes(data) + ts.to_bytes(8, "big"), w, h
                        )
                        rows["media_id"].append(mid)
                        rows["frame_ts_ms"].append(ts)
                        rows["pixels"].append(
                            arr.reshape(-1).astype("int32").tolist()
                        )
                        rows["px_width"].append(w)
                        rows["px_height"].append(h)
            if rows["media_id"]:  # empty frame -> ndarray cols Arrow
                yield pd.DataFrame(rows)  # can't cast to list<int32>

    return df.mapInPandas(kernel, out_schema)


def audio_window_stats(
    df: DataFrame, window_ms: int = 500, decoder: str = "fake"
) -> DataFrame:
    """Audio -> per-window RMS energy (mapInPandas over byte windows).

    decoder='wav' is the REAL dependency-free path (stdlib ``wave`` +
    numpy, _decode_wav): windows are ``window_ms`` of actual samples at
    the file's own sample rate and energy is the RMS of the decoded
    [-1, 1] signal; rows whose bytes don't parse as PCM WAV emit no
    windows (decode failure is a per-row condition, exactly like the
    image path's null pixels).  decoder='fake' keeps the deterministic
    byte-chunk stub for fixtures whose bytes aren't real media; a
    librosa/ffmpeg branch would slot into the same kernel."""
    if decoder not in ("fake", "wav"):
        raise ValueError(f"unknown decoder {decoder!r}")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("window_idx", T.IntegerType(), False),
            T.StructField("energy", T.DoubleType(), True),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows_id, rows_w, rows_e = [], [], []
            for mid, kind, data, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["bytes"], pdf["meta"]
            ):
                if kind != "audio" or data is None:
                    continue
                if decoder == "wav":
                    dec = _decode_wav(bytes(data))
                    if dec is None:
                        continue
                    samples, rate = dec
                    spw = max(1, int(rate * window_ms / 1000))
                    n_windows = max(1, -(-len(samples) // spw))
                    for i in range(n_windows):
                        seg = samples[i * spw : (i + 1) * spw]
                        rows_id.append(mid)
                        rows_w.append(i)
                        rows_e.append(
                            float(np.sqrt((seg**2).mean())) if len(seg) else 0.0
                        )
                    continue
                dur = (meta or {}).get("duration_ms") or 0
                n_windows = max(1, int(dur // window_ms))
                b = bytes(data)
                chunk = max(1, len(b) // n_windows)
                for i in range(n_windows):
                    seg = b[i * chunk : (i + 1) * chunk]
                    arr = np.frombuffer(seg, dtype=np.uint8).astype(np.float64)
                    rows_id.append(mid)
                    rows_w.append(i)
                    rows_e.append(float(np.sqrt((arr**2).mean())) if len(arr) else 0.0)
            yield pd.DataFrame(
                {"media_id": rows_id, "window_idx": rows_w, "energy": rows_e}
            )

    return df.mapInPandas(kernel, out_schema)

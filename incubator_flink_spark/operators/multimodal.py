"""Multimodal column handling (beyond-reference training-data scope).

Convention: a modality column is an opaque ``binary`` payload plus a typed
metadata struct (media_type, byte_len, checksum). Real decode/resize/
frame-sample needs image/audio libraries that are not in this container,
so the decode kernel is STUBBED behind ``try-import`` with a
deterministic fallback; the Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` signature, partition behavior — is real and
tested (tests/test_multimodal.py).

At 100TB the pattern holds: binary payloads ride through shuffles
untouched (only metadata is grouped/joined on), and feature extraction is
an Arrow-batched map-side pass with no shuffle at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("sha256_hex", T.StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", media_type: str = "text/plain") -> DataFrame:
    """Demonstration encoder: wrap a string column as a binary payload +
    metadata struct (the shape image/audio ingestion would produce)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).alias("byte_len"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def _decode_stub(payload: bytes) -> bytes:
    """Deterministic stand-in for an image/audio decode. If a real decoder
    (e.g. PIL) were present we'd dispatch on media_type here."""
    try:  # pragma: no cover - decoder libs absent in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real decoders not wired in this environment")
    except ImportError:
        return payload  # identity decode: bytes pass through


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the multimodal hot path. Deterministic per row, so it is
    oracle-checkable despite running in Python."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf[payload_col].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": decoded.map(len).astype("int64"),
                    "first_byte": decoded.map(lambda b: b[0] if len(b) else -1).astype("int64"),
                    "sha256_hex": decoded.map(lambda b: hashlib.sha256(b).hexdigest()),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, FEATURE_SCHEMA)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: decode (stub), then
    truncate/cycle the byte stream to exactly width*height bytes — the
    shape a real `PIL.Image.resize` would produce for a grayscale raster.
    Keeps the kernel a pure bytes->bytes function, which is exactly the
    contract a real decoder slots into."""
    decoded = _decode_stub(payload)
    n = width * height
    if not decoded:
        return bytes(n)
    reps = -(-n // len(decoded))
    return (decoded * reps)[:n]


def resize_image(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched image resize: one output row per input row with the
    resized payload and refreshed metadata (media_type, byte_len, width,
    height). Map-side only — payloads never shuffle."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField(
                "media_meta",
                T.StructType(
                    [
                        T.StructField("media_type", T.StringType()),
                        T.StructField("byte_len", T.LongType()),
                        T.StructField("width", T.IntegerType()),
                        T.StructField("height", T.IntegerType()),
                    ]
                ),
            ),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf[payload_col].map(lambda b: _resize_stub(b, width, height))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": resized,
                    "media_meta": [
                        {
                            "media_type": "image/raw",
                            "byte_len": len(b),
                            "width": width,
                            "height": height,
                        }
                        for b in resized
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def sample_frames(
    df: DataFrame,
    frame_bytes: int,
    every_n: int = 2,
    max_frames: int | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling: treat the payload as a stream of fixed-size
    frames, emit every ``every_n``-th frame as its own row (doc_id,
    frame_idx, frame) — the fan-out mapInPandas shape real video decode
    uses (one input row -> many output rows inside one Arrow batch; no
    shuffle, no driver involvement). ``max_frames`` caps per-doc output,
    bounding worst-case fan-out at scale."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                decoded = _decode_stub(payload)
                n_frames = len(decoded) // frame_bytes
                taken = 0
                for i in range(0, n_frames, every_n):
                    if max_frames is not None and taken >= max_frames:
                        break
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(decoded[i * frame_bytes : (i + 1) * frame_bytes])
                    taken += 1
            yield pd.DataFrame({id_col: ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


# --- audio: REAL numpy-only decode (raw PCM and WAV containers) --------------
# Unlike image/video decode (which needs codec libraries this container
# lacks), 16-bit PCM and the RIFF/WAVE container are pure byte layouts —
# so the audio path is fully real: header walk with struct, sample
# decode with numpy.frombuffer, features with vectorized numpy (FFT
# included). No stub anywhere.


def parse_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a RIFF/WAVE container: returns (sample_rate, n_channels,
    bits_per_sample, pcm_bytes). Walks the chunk list (fmt / data may be
    preceded by LIST etc.), accepting only uncompressed PCM (format tag
    1). Pure struct unpacking — no audio library."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if tag != 1:
                raise ValueError(f"compressed WAV (format tag {tag}) needs a codec library")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, channels, bits, data


def _pcm_to_float(pcm: bytes, bits: int, channels: int):
    """int16/int8 PCM bytes -> mono float64 numpy array in [-1, 1)
    (channels averaged)."""
    import numpy as np

    if bits == 16:
        arr = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:  # WAV 8-bit is unsigned
        arr = (np.frombuffer(pcm, dtype="u1").astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM depth {bits}")
    if channels > 1:
        arr = arr[: len(arr) - len(arr) % channels].reshape(-1, channels).mean(axis=1)
    return arr


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("dominant_freq_hz", T.DoubleType()),
    ]
)


def audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    sample_rate: int | None = None,
    bits: int = 16,
    channels: int = 1,
) -> DataFrame:
    """Per-clip audio features from binary payloads — REAL decode, no
    stub: ``sample_rate=None`` parses each payload as a WAV container;
    a given rate treats payloads as headerless PCM. Features are
    vectorized numpy per clip: RMS, peak, zero-crossing count, dominant
    frequency via rFFT magnitude argmax (DC excluded).

    Scale shape: identical to the other modality kernels — Arrow-batched
    mapInPandas, zero shuffles; payload bytes never leave the partition
    that read them, and the output is a tiny fixed-width feature row per
    clip (the thing later joins/apply filters run on)."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if sample_rate is None:
                    rate, ch, depth, pcm = parse_wav(b)
                else:
                    rate, ch, depth, pcm = sample_rate, channels, bits, b
                x = _pcm_to_float(pcm, depth, ch)
                n = len(x)
                if n == 0:
                    rows.append((rid, rate, 0, 0.0, 0.0, 0.0, 0, 0.0))
                    continue
                rms = float(np.sqrt(np.mean(x * x)))
                peak = float(np.max(np.abs(x)))
                zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                if n >= 4:
                    mag = np.abs(np.fft.rfft(x))
                    k = int(np.argmax(mag[1:])) + 1  # skip DC
                    dom = float(k * rate / n)
                else:
                    dom = 0.0
                rows.append((rid, rate, n, n / rate, rms, peak, zc, dom))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "sample_rate",
                    "n_samples",
                    "duration_s",
                    "rms",
                    "peak",
                    "zero_crossings",
                    "dominant_freq_hz",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, AUDIO_FEATURE_SCHEMA)


# --- images: REAL decode for uncompressed containers --------------------------
# Like WAV/PCM for audio, uncompressed BMP (BI_RGB 24-bit) and binary
# PPM (P6) are pure byte layouts — header walk with struct, pixels with
# numpy.frombuffer — so those image paths are fully real; only
# compressed codecs (JPEG/PNG/video) remain behind the decode stub.


def parse_image(payload: bytes):
    """(height x width x 3 uint8 RGB array) from a BMP (24-bit BI_RGB)
    or binary PPM (P6) payload. Pure struct/numpy — no imaging library."""
    import struct

    import numpy as np

    if payload[:2] == b"BM":
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bits = struct.unpack_from("<HH", payload, 26)
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bits != 24 or comp != 0:
            raise ValueError(f"compressed/{bits}-bit BMP needs a codec library")
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        px = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
        rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR -> RGB
    if payload[:2] == b"P6":
        # header: P6 <w> <h> <maxval> with whitespace/#comments, then raw RGB
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError("only 8-bit PPM supported")
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        return px.reshape(h, w, 3).copy()
    raise ValueError("not a BMP or P6 PPM payload")


def encode_ppm(img) -> bytes:
    """RGB uint8 array -> binary PPM (P6) bytes — the deterministic
    container the real resize emits."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("brightness", T.DoubleType()),
        T.StructField("edge_energy", T.DoubleType()),
    ]
)


def image_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Per-image features from BMP/PPM payloads — REAL decode: channel
    means, luma brightness (Rec.601), and edge energy (mean absolute
    horizontal+vertical gradient of the gray plane).  Arrow-batched
    mapInPandas, zero shuffles — payload bytes never leave the partition
    that read them."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = parse_image(bytes(payload)).astype(np.float64)
                h, w = img.shape[:2]
                mr, mg, mb = (float(img[:, :, c].mean()) for c in range(3))
                gray = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
                gx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
                gy = np.abs(np.diff(gray, axis=0)).mean() if h > 1 else 0.0
                rows.append((rid, w, h, mr, mg, mb, float(gray.mean()), float(gx + gy)))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "mean_r", "mean_g", "mean_b", "brightness", "edge_energy"],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, IMAGE_FEATURE_SCHEMA)


def resize_image_real(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL nearest-neighbor resize of BMP/PPM payloads, re-encoded as
    P6 PPM — the actual pixel path, not the stub: numpy index-gather per
    image inside Arrow batches, zero shuffles."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = parse_image(bytes(payload))
                h, w = img.shape[:2]
                yi = (np.arange(height) * h) // height
                xi = (np.arange(width) * w) // width
                out = img[yi][:, xi]
                rows.append((rid, encode_ppm(out)))
            yield pd.DataFrame(rows, columns=[id_col, payload_col])

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField(payload_col, T.BinaryType())]
    )
    return df.select(id_col, payload_col).mapInPandas(fn, schema)


# --- video: REAL container parse for uncompressed AVI -------------------------
# Like BMP/PPM for images and WAV for audio, an uncompressed AVI (RIFF
# 'AVI ' with '00db' DIB frames) is a pure byte layout: chunk walk with
# struct, frame pixels with numpy.frombuffer.  This makes the VIDEO path
# real end-to-end for codec-free containers — only compressed codecs
# (H.264/VP9/...) remain behind the decode stub.


def encode_avi(frames, us_per_frame: int = 100_000) -> bytes:
    """RGB uint8 frame arrays -> minimal uncompressed AVI bytes (RIFF
    hdrl/avih + strl/strh/strf + movi with '00db' DIB frames) — the
    deterministic fixture writer the tests pair with ``parse_avi``."""
    import struct

    import numpy as np

    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    dibs = []
    for f in frames:
        bgr = np.asarray(f, dtype=np.uint8)[:, :, ::-1]
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        dibs.append(rows[::-1].tobytes())  # bottom-up
    frame_sz = h * stride

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(listtype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", listtype + data)

    avih = struct.pack(
        "<14I", us_per_frame, frame_sz * 10, 0, 0, len(frames), 0, 1, frame_sz,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<3I2HIIIIIi", 0, 0, 0, 0, 0, 1,
                                        1_000_000 // us_per_frame, 0, len(frames),
                                        frame_sz, -1)
        + struct.pack("<I4H", 0, 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_sz, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes):
    """(width, height, us_per_frame, [RGB uint8 frame arrays]) from an
    uncompressed AVI payload. Pure struct/numpy — no codec library."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    w = h = None
    us_per_frame = 0
    dibs: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, us_per_frame
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            data_start = pos + 8
            if fourcc == b"LIST":
                walk(data_start + 4, data_start + size)
            elif fourcc == b"avih":
                us_per_frame, = struct.unpack_from("<I", payload, data_start)
                w, h = struct.unpack_from("<II", payload, data_start + 32)
            elif fourcc in (b"00db", b"00dc"):
                dibs.append(payload[data_start : data_start + size])
            pos = data_start + size + (size % 2)

    walk(12, len(payload))
    if w is None or h is None:
        raise ValueError("AVI avih header not found")
    stride = (w * 3 + 3) & ~3
    frames = []
    for d in dibs:
        px = np.frombuffer(d, dtype=np.uint8, count=stride * h)
        rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1]
        frames.append(rows[:, :, ::-1].copy())  # BGR -> RGB
    return w, h, us_per_frame, frames


VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("brightness", T.DoubleType()),
        T.StructField("motion_energy", T.DoubleType()),
    ]
)


def video_features(
    df: DataFrame,
    every_n: int = 1,
    max_frames: int | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-video features from uncompressed AVI payloads — REAL decode:
    container geometry, frame counts, mean Rec.601 brightness over the
    sampled frames, and motion energy (mean absolute gray-plane delta
    between consecutive sampled frames — the shot-boundary/static-clip
    signal video curation filters on).  Arrow-batched mapInPandas, zero
    shuffles; ``every_n``/``max_frames`` bound per-row decode cost."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, _us, frames = parse_avi(bytes(payload))
                sampled = frames[::every_n]
                if max_frames is not None:
                    sampled = sampled[:max_frames]
                grays = [
                    0.299 * f[:, :, 0].astype(np.float64)
                    + 0.587 * f[:, :, 1]
                    + 0.114 * f[:, :, 2]
                    for f in sampled
                ]
                bright = float(np.mean([g.mean() for g in grays])) if grays else 0.0
                motion = (
                    float(np.mean([np.abs(b - a).mean() for a, b in zip(grays, grays[1:])]))
                    if len(grays) > 1
                    else 0.0
                )
                rows.append((rid, w, h, len(frames), len(sampled), bright, motion))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "n_frames", "n_sampled", "brightness", "motion_energy"],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, VIDEO_FEATURE_SCHEMA)


def sample_frames_avi(
    df: DataFrame,
    every_n: int = 2,
    max_frames: int | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL video frame sampling: parse the AVI container and emit every
    ``every_n``-th frame as its own row (doc_id, frame_idx, frame) with
    the frame re-encoded as P6 PPM — the fan-out shape of
    ``sample_frames`` with an actual decoder behind it."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, out = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                _w, _h, _us, frames = parse_avi(bytes(payload))
                taken = 0
                for i in range(0, len(frames), every_n):
                    if max_frames is not None and taken >= max_frames:
                        break
                    ids.append(rid)
                    idxs.append(i)
                    out.append(encode_ppm(frames[i]))
                    taken += 1
            yield pd.DataFrame({id_col: ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": out})

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


# --- perceptual image dedup (dHash) ------------------------------------------

_DHASH_BANDS = 8
_DHASH_BAND_BITS = 8


def _gray_small(payload: bytes):
    """Decode -> Rec.601 grayscale -> nearest-neighbor 9x8 downscale."""
    import numpy as np

    img = parse_image(payload)  # (h, w, 3) uint8
    gray = (
        0.299 * img[:, :, 0].astype(np.float64)
        + 0.587 * img[:, :, 1].astype(np.float64)
        + 0.114 * img[:, :, 2].astype(np.float64)
    )
    h, w = gray.shape
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(9) * w) // 9
    return gray[np.ix_(rows, cols)]


def dhash64(payload: bytes) -> int:
    """64-bit difference hash: each bit is gray[r,c+1] > gray[r,c] over
    the 9x8 thumbnail — invariant to global brightness/contrast shifts,
    stable under small local edits (the perceptual property MinHash
    lacks for pixels)."""
    g = _gray_small(payload)
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out


def image_dhash(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Per-image 64-bit perceptual hash via zero-exchange mapInPandas
    (Arrow batches of binary payloads; decode never leaves the
    partition)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    # top bit kept in int64 range: dHash uses 63 bits max
                    # below (bit 63 masked) so the column stays a signed long
                    "dhash": [dhash64(p) & ((1 << 63) - 1) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


def dhash_near_pairs(hashes: DataFrame, id_col: str = "doc_id", max_hamming: int = 6) -> DataFrame:
    """Near-duplicate image pairs by banded hamming join: 8 bands x 8
    bits — by pigeonhole any pair with hamming <= 7 shares at least one
    exact band, so recall is 1.0 for max_hamming <= 7; the band equi-join
    keeps candidates linear (the same discipline as simhash_pairs for
    text).  Verified with bit_count(xor)."""
    bands = hashes.select(
        F.col(id_col),
        F.col("dhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("dhash"), b * _DHASH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << _DHASH_BAND_BITS) - 1))
                        .alias("band_key"),
                    )
                    for b in range(_DHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(F.col(id_col), F.col("dhash"), F.col("bk.band_idx"), F.col("bk.band_key"))
    a = bands.select(F.col(id_col).alias("id_a"), F.col("dhash").alias("h_a"), "band_idx", "band_key")
    b = bands.select(F.col(id_col).alias("id_b"), F.col("dhash").alias("h_b"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

"""Multimodal binary-column plumbing (beyond-reference training-data
scope): payload attach, Arrow-batched feature extraction, resize, and
frame sampling. Decoders are env-stubbed (deterministic identity), so
every kernel is exactly reproducible — the tests pin the Spark-side
contracts: schema, fan-out shape, map-side-only execution."""

import hashlib

from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    resize_image,
    sample_frames,
)
from incubator_flink_spark.plans.audit import audit_plan

SF = "/root/testdata/sf0.001"


def _docs(spark, n=20):
    return attach_binary_payload(load(spark, SF, "documents").limit(n))


def test_attach_and_extract_features(spark):
    rows = extract_features(_docs(spark)).collect()
    assert len(rows) == 20
    by_id = {r.doc_id: r for r in rows}
    src = {r.doc_id: r.text for r in load(spark, SF, "documents").limit(20).collect()}
    for doc_id, text in src.items():
        raw = text.encode("utf-8")
        r = by_id[doc_id]
        assert r.byte_len == len(raw)
        assert r.first_byte == raw[0]
        assert r.sha256_hex == hashlib.sha256(raw).hexdigest()


def test_resize_image_schema_and_determinism(spark):
    out = resize_image(_docs(spark), width=8, height=4)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r.payload) == 32
        assert r.media_meta.byte_len == 32
        assert (r.media_meta.width, r.media_meta.height) == (8, 4)
        assert r.media_meta.media_type == "image/raw"
    # deterministic: second run byte-identical
    again = {r.doc_id: bytes(r.payload) for r in out.collect()}
    assert {r.doc_id: bytes(r.payload) for r in rows} == again


def test_sample_frames_fanout_and_cap(spark):
    d = _docs(spark)
    rows = sample_frames(d, frame_bytes=16, every_n=2, max_frames=3).collect()
    src = {r.doc_id: r.text.encode("utf-8") for r in load(spark, SF, "documents").limit(20).collect()}
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, payload in src.items():
        n_frames = len(payload) // 16
        expected = min(len(range(0, n_frames, 2)), 3)
        got = sorted(per_doc.get(doc_id, []), key=lambda r: r.frame_idx)
        assert len(got) == expected
        for r in got:
            assert bytes(r.frame) == payload[r.frame_idx * 16 : (r.frame_idx + 1) * 16]
            assert r.frame_idx % 2 == 0


def test_multimodal_ops_are_map_side_only(spark):
    # payloads must never shuffle: the whole pipeline is scan -> project
    # -> mapInPandas with zero exchanges (a filter, unlike limit, adds no
    # exchange — and pushes down to the scan)
    d = attach_binary_payload(load(spark, SF, "documents").where(F.col("doc_id") < 20))
    rep = audit_plan(sample_frames(resize_image(d, 8, 4), frame_bytes=8))
    assert rep.exchanges == 0
    assert rep.scans_with_pushed_filters == 1


def _wav_bytes(freq_hz: float, rate: int, dur_s: float, amp: float = 0.5) -> bytes:
    """Minimal mono 16-bit PCM WAV, built by hand (struct only)."""
    import math
    import struct

    n = int(rate * dur_s)
    samples = b"".join(
        struct.pack("<h", int(amp * 32767 * math.sin(2 * math.pi * freq_hz * i / rate)))
        for i in range(n)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(samples)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(samples)) + samples
    return out


def test_audio_features_real_wav_decode(spark):
    """audio_features is a REAL decode path (no stub): hand-built WAV
    sines come back with the analytically-known rate, duration, RMS
    (a/sqrt(2)), zero-crossing count (~2 f t), and FFT dominant
    frequency."""
    from incubator_flink_spark.operators.multimodal import audio_features, parse_wav

    clips = [(1, _wav_bytes(440.0, 8000, 1.0)), (2, _wav_bytes(1000.0, 16000, 0.5, amp=0.25))]
    rate, ch, bits, pcm = parse_wav(clips[0][1])
    assert (rate, ch, bits, len(pcm)) == (8000, 1, 16, 16000)
    df = spark.createDataFrame(clips, "doc_id long, payload binary")
    out = {r.doc_id: r for r in audio_features(df).collect()}
    r1, r2 = out[1], out[2]
    assert (r1.sample_rate, r1.n_samples, r1.duration_s) == (8000, 8000, 1.0)
    assert abs(r1.rms - 0.5 / 2**0.5) < 1e-3
    assert abs(r1.dominant_freq_hz - 440.0) < 1.0
    assert abs(r1.zero_crossings - 2 * 440) <= 2
    assert (r2.sample_rate, r2.n_samples) == (16000, 8000)
    assert abs(r2.dominant_freq_hz - 1000.0) < 2.0
    assert abs(r2.peak - 0.25) < 1e-2
    # headerless PCM path: same samples, rate passed explicitly
    raw = spark.createDataFrame([(3, pcm)], "doc_id long, payload binary")
    r3 = audio_features(raw, sample_rate=8000).first()
    assert abs(r3.dominant_freq_hz - 440.0) < 1.0 and r3.n_samples == 8000
    # stereo averaging: duplicate each sample into 2 channels -> same features
    import numpy as np

    st = np.repeat(np.frombuffer(pcm, dtype="<i2"), 2).astype("<i2").tobytes()
    sdf = spark.createDataFrame([(4, st)], "doc_id long, payload binary")
    r4 = audio_features(sdf, sample_rate=8000, channels=2).first()
    assert abs(r4.rms - r1.rms) < 1e-6 and abs(r4.dominant_freq_hz - 440.0) < 1.0
    # compressed WAV rejected with a clear error
    import pytest, struct as _s

    bad = clips[0][1].replace(b"fmt " + _s.pack("<I", 16) + _s.pack("<HH", 1, 1), b"fmt " + _s.pack("<I", 16) + _s.pack("<HH", 85, 1))
    with pytest.raises(ValueError, match="format tag"):
        parse_wav(bad)


def _make_bmp(w, h, rgb_rows):
    """Minimal 24-bit BI_RGB bottom-up BMP from an HxWx3 uint8 array."""
    import struct

    import numpy as np

    img = np.asarray(rgb_rows, dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][:, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    px = b"".join(rows)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(px), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return header + info + px


def _make_ppm(img):
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + img.tobytes()


def test_image_features_real_decode_bmp_and_ppm(spark):
    """BMP and PPM payloads decode to the same analytic features: a
    half-red/half-blue 4x2 image has exact channel means, Rec.601
    brightness, and one vertical edge."""
    import numpy as np

    from incubator_flink_spark.operators.multimodal import image_features

    img = np.zeros((2, 4, 3), dtype=np.uint8)
    img[:, :2, 0] = 255  # left half red
    img[:, 2:, 2] = 255  # right half blue
    df = spark.createDataFrame(
        [(1, bytearray(_make_bmp(4, 2, img))), (2, bytearray(_make_ppm(img)))],
        "doc_id LONG, payload BINARY",
    )
    got = {r["doc_id"]: r for r in image_features(df).collect()}
    for rid in (1, 2):
        r = got[rid]
        assert (r["width"], r["height"]) == (4, 2)
        assert r["mean_r"] == 127.5 and r["mean_b"] == 127.5 and r["mean_g"] == 0.0
        want_brightness = (0.299 * 255 + 0.114 * 255) / 2
        assert abs(r["brightness"] - want_brightness) < 1e-9
        assert r["edge_energy"] > 0  # the red/blue boundary
    # identical pixels => identical features across containers
    assert tuple(got[1])[1:] == tuple(got[2])[1:]


def test_resize_image_real_nearest_neighbor(spark):
    import numpy as np

    from incubator_flink_spark.operators.multimodal import (
        parse_image,
        resize_image_real,
    )

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[:, 0] = (10, 20, 30)
    img[:, 1] = (200, 210, 220)
    df = spark.createDataFrame(
        [(1, bytearray(_make_ppm(img)))], "doc_id LONG, payload BINARY"
    )
    out = resize_image_real(df, 4, 4).collect()[0]
    res = parse_image(bytes(out["payload"]))
    assert res.shape == (4, 4, 3)
    assert (res[:, :2] == (10, 20, 30)).all() and (res[:, 2:] == (200, 210, 220)).all()


class TestVideoAvi:
    def _clip(self, np, n=6, w=8, h=6, step=30):
        return [np.full((h, w, 3), i * step, dtype=np.uint8) for i in range(n)]

    def test_video_features_analytic(self, spark):
        """Constant-value frames i*30: brightness and motion energy have
        closed forms (Rec.601 of a constant plane is the constant)."""
        import numpy as np

        from incubator_flink_spark.operators.multimodal import encode_avi, video_features

        avi = encode_avi(self._clip(np))
        df = spark.createDataFrame([(1, bytearray(avi))], "doc_id LONG, payload BINARY")
        r = video_features(df, every_n=2).collect()[0]
        # sampled frames 0, 2, 4 -> values 0, 60, 120
        assert (r["width"], r["height"], r["n_frames"], r["n_sampled"]) == (8, 6, 6, 3)
        assert abs(r["brightness"] - (0 + 60 + 120) / 3) < 1e-9
        assert abs(r["motion_energy"] - 60.0) < 1e-9

    def test_sample_frames_avi_roundtrip(self, spark):
        """Sampled frames re-encode as PPM and decode back to the exact
        source pixels (fan-out: one row in, three rows out)."""
        import numpy as np

        from incubator_flink_spark.operators.multimodal import (
            encode_avi,
            parse_image,
            sample_frames_avi,
        )

        frames = self._clip(np)
        df = spark.createDataFrame(
            [(7, bytearray(encode_avi(frames)))], "doc_id LONG, payload BINARY"
        )
        rows = sample_frames_avi(df, every_n=2).orderBy("frame_idx").collect()
        assert [r["frame_idx"] for r in rows] == [0, 2, 4]
        for r in rows:
            img = parse_image(bytes(r["frame"]))
            assert (img == frames[r["frame_idx"]]).all()

    def test_stride_padding_and_cap(self, spark):
        import numpy as np

        from incubator_flink_spark.operators.multimodal import encode_avi, video_features

        frames = [np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3) for _ in range(9)]
        df = spark.createDataFrame([(2, bytearray(encode_avi(frames)))], "doc_id LONG, payload BINARY")
        r = video_features(df, every_n=1, max_frames=4).collect()[0]
        assert (r["width"], r["height"], r["n_frames"], r["n_sampled"]) == (5, 3, 9, 4)
        assert r["motion_energy"] == 0.0  # identical frames


def test_image_dhash_near_dup_detection(spark):
    """Perceptual dHash dedup: near-identical images (tiny local edit,
    global brightness shift) land within hamming<=6 of their original;
    unrelated images stay far.  Banded pairs equal brute-force hamming
    pairs (pigeonhole recall 1.0 at this threshold)."""
    import numpy as np

    from incubator_flink_spark.operators.multimodal import (
        dhash64,
        dhash_near_pairs,
        image_dhash,
    )

    rng = np.random.default_rng(7)
    W_, H_ = 27, 16
    base = rng.integers(0, 256, size=(H_, W_, 3), dtype=np.uint8)
    near = base.copy()
    near[3:5, 4:6] = 255 - near[3:5, 4:6]  # small local edit
    bright = np.clip(base.astype(np.int16) + 25, 0, 255).astype(np.uint8)  # global shift
    other = rng.integers(0, 256, size=(H_, W_, 3), dtype=np.uint8)

    payloads = [(1, _make_ppm(base)), (2, _make_ppm(near)),
                (3, _make_ppm(bright)), (4, _make_ppm(other))]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads], "doc_id LONG, payload BINARY"
    )
    hashes = image_dhash(df)
    got_pairs = {
        (r.id_a, r.id_b) for r in dhash_near_pairs(hashes, max_hamming=6).collect()
    }
    # brute force over the same hashes
    hs = {i: dhash64(bytes(p)) & ((1 << 63) - 1) for i, p in payloads}
    expect = {
        (a, b)
        for a in hs
        for b in hs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 6
    }
    assert got_pairs == expect
    assert (1, 3) in got_pairs  # brightness shift is dHash-invariant
    assert all(4 not in p for p in got_pairs)  # unrelated image stays out

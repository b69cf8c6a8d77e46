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

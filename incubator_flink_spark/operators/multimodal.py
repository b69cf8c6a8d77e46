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

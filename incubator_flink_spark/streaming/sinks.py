"""Sink-side changelog application (reference: upsert sinks —
upsert-kafka, JDBC upsert, filesystem compaction; SURVEY.md §2.1/§1.3).

``upsert_sink`` maintains a keyed parquet table from an update-mode
stream via foreachBatch: each micro-batch's rows overwrite the current
row for their key (DELETE tombstones — ``tombstone_col`` true — remove
the key). The merge is a batch anti-join + union per micro-batch, the
standard Spark pattern where a transactional table format would do a
MERGE INTO; exactly-once comes from Structured Streaming checkpointing
plus the idempotent overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class UpsertParquetSink:
    def __init__(self, path: str, keys: list[str], tombstone: Column | None = None):
        self.path = path
        self.keys = keys
        self.tombstone = tombstone

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        incoming = batch_df
        if self.tombstone is not None:
            deletes = incoming.where(self.tombstone).select(*self.keys)
            upserts = incoming.where(~self.tombstone)
        else:
            deletes = None
            upserts = incoming
        if os.path.exists(self.path):
            current = spark.read.parquet(self.path)
            keep = current.join(upserts.select(*self.keys), self.keys, "left_anti")
            if deletes is not None:
                keep = keep.join(deletes, self.keys, "left_anti")
            merged = keep.unionByName(upserts.select(*current.columns))
        else:
            merged = upserts
        # write-then-swap for idempotence (re-running a batch converges)
        tmp = self.path + f".__tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)


def upsert_sink(stream: DataFrame, path: str, keys: list[str], tombstone: Column | None = None):
    """Attach the upsert sink; caller configures trigger/checkpoint and
    starts the returned writer."""
    return stream.writeStream.outputMode("update").foreachBatch(UpsertParquetSink(path, keys, tombstone))

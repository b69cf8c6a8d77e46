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


def incremental_dedup_stream(
    stream_docs,
    ref_docs,
    on_batch,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    checkpoint: str | None = None,
):
    """Streaming incremental dedup: each micro-batch of newly ingested
    documents is matched against the STATIC reference corpus
    (operators/dedup.incremental_dedup) and ``on_batch(matches_df,
    batch_id)`` receives the (doc_id, ref_id, jaccard) drop table — the
    continuous-ingest counterpart of the batch pass, and the Spark-first
    replacement for a Flink keyed lookup pipeline over a dedup index.

    The reference side is signed ONCE (prepare_dedup_reference, both
    tables persisted) and reused by every batch — per-batch work is the
    new slice's explode + the asymmetric banded join, exactly the
    steady-state ingest cost.  Because matches depend only on (batch
    row, static reference), batch-by-batch union equals the one-shot
    batch result — pinned by tests/test_streaming.py.  Returns the
    started StreamingQuery (availableNow trigger if no checkpoint is
    supplied for a long-running run)."""
    import tempfile

    from incubator_flink_spark.operators.dedup import (
        incremental_dedup,
        prepare_dedup_reference,
    )

    prepared = prepare_dedup_reference(ref_docs, id_col, text_col)

    def _batch(bdf, bid):
        matches = incremental_dedup(
            bdf, ref_docs, id_col, text_col, threshold=threshold, ref_prepared=prepared
        )
        on_batch(matches, bid)

    return (
        stream_docs.writeStream.outputMode("append")
        .foreachBatch(_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="ckpt_incdedup_"),
        )
        .start()
    )


def growing_dedup_stream(
    stream_docs,
    ref_dir: str,
    on_batch,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    checkpoint: str | None = None,
):
    """Streaming dedup against a GROWING reference: every micro-batch is
    matched against the accumulated survivor corpus (everything ingested
    before it), in-batch near-dups are resolved keep-smallest-id, and the
    batch's survivors APPEND to the reference store — so the stream
    converges to a near-dup-free corpus with keep-first semantics over
    ingest order.  This is the production continuous-ingest shape ("is
    this crawl doc already in the training set — including what this
    crawl already added?"); the static-reference form above is the
    steady-state fast path when the reference is re-signed offline.

    Per-batch cost: the new slice's signatures + one asymmetric banded
    join against the reference (candidate-proportional) + the in-batch
    pair join.  The reference store is parquet laid out one directory
    per batch (``ref_dir/b<batch_id>``): the foreachBatch body is
    IDEMPOTENT — a retried batch overwrites its own directory and the
    reference it deduplicates against is exactly the directories of
    EARLIER batch ids, so a retry neither self-matches its previous
    partial write nor double-appends.  At scale the store is the same
    bucketed signature table tests/test_bucketed.py builds.
    ``on_batch(survivors_df, matches_df, batch_id)`` observes each step.
    """
    import os
    import tempfile

    from pyspark.sql import functions as F

    from incubator_flink_spark.operators.dedup import incremental_dedup, minhash_lsh_pairs

    def _batch(bdf, bid):
        spark = bdf.sparkSession
        bdf = bdf.localCheckpoint(eager=True)  # freeze the slice; reused 3x
        # in-batch keep-smallest-id near-dedup
        pairs = minhash_lsh_pairs(bdf, id_col=id_col, text_col=text_col, threshold=threshold)
        in_batch = bdf.join(
            pairs.select(F.col("id_b").alias(id_col)).distinct(), id_col, "anti"
        )
        # reference = every COMMITTED earlier batch directory; listing by
        # batch id (never a bare read of ref_dir) keeps retries exact and
        # makes real I/O errors surface instead of masquerading as
        # "no reference yet"
        prior = sorted(
            os.path.join(ref_dir, d)
            for d in (os.listdir(ref_dir) if os.path.isdir(ref_dir) else [])
            if d.startswith("b") and d[1:].isdigit() and int(d[1:]) < bid
        )
        if prior:
            ref = spark.read.parquet(*prior)
            matches = incremental_dedup(
                in_batch, ref, id_col, text_col, threshold=threshold
            ).localCheckpoint(eager=True)  # columns: (id_col, ref_id, jaccard)
            survivors = in_batch.join(matches.select(id_col).distinct(), id_col, "anti")
        else:
            # derive the id/ref_id types from the incoming batch so batch 0
            # observes the same matches schema as later batches whatever the
            # id column's type (unions across batches would fail otherwise)
            id_t = bdf.schema[id_col].dataType.simpleString()
            matches = spark.createDataFrame(
                [], f"{id_col} {id_t}, ref_id {id_t}, jaccard DOUBLE"
            )
            survivors = in_batch
        survivors = survivors.localCheckpoint(eager=True)
        # idempotent: a retried batch replaces its own directory
        survivors.write.mode("overwrite").parquet(os.path.join(ref_dir, f"b{bid:09d}"))
        on_batch(survivors, matches, bid)

    return (
        stream_docs.writeStream.outputMode("append")
        .foreachBatch(_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="ckpt_growdedup_"),
        )
        .start()
    )


class MaterializedViewSink:
    """Continuously-maintained materialized aggregate — the reference's
    dynamic table (SURVEY.md §1.3) as a foreachBatch sink.

    Each micro-batch is a signed changelog (``sign_col`` = +1 for
    +I/+U, -1 for -U/-D rows carrying the record's measure values); the
    standing count/sum MV is delta-merged per batch
    (operators/mv.mv_delta_merge — O(|batch| + |keys touched|), the
    fact history is never rescanned).

    Exactly-once discipline (the contract TwoPhaseCommitSinkFunction
    provides in the reference): the merge is an INCREMENT, so it is NOT
    naturally idempotent — foreachBatch is at-least-once and replays the
    last in-flight batch after a crash.  The sink therefore persists the
    last-applied batch_id in an atomically-swapped pointer file and makes
    a replayed batch (batch_id <= applied) a NO-OP.  Each batch writes a
    fresh snapshot directory ``v<batch_id>`` under ``path`` and commits
    it by ``os.replace`` of the pointer (atomic on POSIX), so a crash at
    ANY point leaves the previous committed snapshot intact and readable;
    superseded snapshot dirs are garbage-collected after the swap.  Read
    the view with ``MaterializedViewSink.read(spark, path)``.
    """

    POINTER = "_LATEST"

    def __init__(self, path: str, keys: list[str], count_col: str, sum_cols: list[str], sign_col: str = "__sign"):
        self.path = path
        self.keys = keys
        self.count_col = count_col
        self.sum_cols = sum_cols
        self.sign_col = sign_col

    @classmethod
    def committed(cls, path: str) -> tuple[int, str] | None:
        """(applied batch_id, snapshot dir name) from the pointer file,
        or None if no batch has ever committed."""
        import json

        ptr = os.path.join(path, cls.POINTER)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            meta = json.load(f)
        return int(meta["batch_id"]), meta["dir"]

    @classmethod
    def read(cls, spark, path: str) -> DataFrame:
        """The current committed view (raises if nothing committed yet)."""
        c = cls.committed(path)
        if c is None:
            raise FileNotFoundError(f"no committed MV snapshot under {path}")
        return spark.read.parquet(os.path.join(path, c[1]))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import json
        import shutil

        from incubator_flink_spark.operators.mv import mv_delta_merge

        spark = batch_df.sparkSession
        committed = self.committed(self.path)
        if committed is not None and batch_id <= committed[0]:
            return  # checkpoint replay of an already-applied batch: no-op
        if committed is not None:
            mv = spark.read.parquet(os.path.join(self.path, committed[1]))
            merged = mv_delta_merge(
                mv, batch_df, self.keys, self.count_col, self.sum_cols, self.sign_col
            )
        else:
            merged = (
                batch_df.groupBy(*self.keys)
                .agg(
                    F.sum(self.sign_col).cast("bigint").alias(self.count_col),
                    *[
                        F.sum(F.col(self.sign_col) * F.col(c)).alias(c)
                        for c in self.sum_cols
                    ],
                )
                .where(F.col(self.count_col) > 0)
            )
        os.makedirs(self.path, exist_ok=True)
        vdir = f"v{batch_id:012d}"
        # mode=overwrite: a retried batch that crashed mid-write replaces
        # its own partial snapshot before the commit point
        merged.write.mode("overwrite").parquet(os.path.join(self.path, vdir))
        tmp_ptr = os.path.join(self.path, self.POINTER + ".tmp")
        with open(tmp_ptr, "w") as f:
            json.dump({"batch_id": batch_id, "dir": vdir}, f)
        os.replace(tmp_ptr, os.path.join(self.path, self.POINTER))  # commit point
        # GC with a one-snapshot grace period: a concurrent read() that
        # resolved the pointer just before the swap may still be scanning
        # the previous snapshot, so keep it and only delete older dirs —
        # a reader is never more than one commit behind the pointer.
        keep = {vdir}
        if committed is not None:
            keep.add(committed[1])
        for d in os.listdir(self.path):
            if d.startswith("v") and d not in keep:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)


def mv_sink(stream: DataFrame, path: str, keys: list[str], count_col: str, sum_cols: list[str]):
    """Attach the MV-maintenance sink; caller configures trigger/checkpoint
    and starts the returned writer."""
    return stream.writeStream.outputMode("append").foreachBatch(
        MaterializedViewSink(path, keys, count_col, sum_cols)
    )

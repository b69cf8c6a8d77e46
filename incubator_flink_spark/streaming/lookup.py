"""Lookup join against an external/refreshable dimension (reference:
StreamExecLookupJoin.java:43, LookupJoinRunner / AsyncLookupJoinRunner;
broadcast state pattern CoBroadcastWithKeyedOperator).

Two modes, both foreachBatch-shaped so the dimension can change between
micro-batches (the FOR SYSTEM_TIME AS OF proc-time semantics):

- ``lookup_join_per_batch``: re-evaluate a dimension loader each batch
  and broadcast-join — right for small/medium dims (JDBC snapshot, file).
- ``async_lookup``: per-row keyed lookups through operators/async_io —
  right for point-lookup services; batched + concurrent per partition.

Side outputs (reference OutputTag/ctx.output) are the filter-split
helper ``side_outputs``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.operators.async_io import async_map


def lookup_join_per_batch(
    stream: DataFrame,
    dim_loader: Callable[[SparkSession], DataFrame],
    on: list[str] | Column,
    how: str = "left",
    sink: Callable[[DataFrame, int], None] | None = None,
):
    """Start a foreachBatch query that joins each micro-batch against a
    freshly loaded dimension snapshot (broadcast). Returns the streaming
    query handle; caller controls trigger/checkpoint via .trigger etc. on
    the returned writer if ``sink`` is None."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        dim = dim_loader(batch_df.sparkSession)
        joined = batch_df.join(F.broadcast(dim), on, how)
        if sink is not None:
            sink(joined, batch_id)

    return stream.writeStream.foreachBatch(process)


def async_lookup(df: DataFrame, fn, output_schema: str, capacity: int = 16, ordered: bool = True) -> DataFrame:
    """Per-row external lookup with bounded concurrency (AsyncLookupJoin)."""
    return async_map(df, fn, output_schema, capacity=capacity, ordered=ordered)


def side_outputs(df: DataFrame, tags: dict[str, Column]) -> dict[str, DataFrame]:
    """Split one stream into tagged outputs (reference OutputTag): each tag
    is a predicate; rows matching no tag land in '__main'. Each output is
    an independent plan over the same scan — write-side fan-out happens in
    foreachBatch (multi-write) exactly like the reference's side-output
    sinks."""
    matched = None
    outs: dict[str, DataFrame] = {}
    for name, pred in tags.items():
        outs[name] = df.where(pred)
        matched = pred if matched is None else (matched | pred)
    outs["__main"] = df.where(~matched) if matched is not None else df
    return outs

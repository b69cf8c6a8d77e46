"""Watermarked streaming window aggregations (reference:
StreamExecWindowAggregate / WatermarkAssignerOperator — SURVEY.md §2.4,
§2.9). These are thin declarative wrappers: Structured Streaming owns
watermark propagation (global min across partitions, the engine-side
equivalent of StatusWatermarkValve) and state cleanup."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay_s: int) -> DataFrame:
    """WATERMARK FOR ts AS ts - INTERVAL delay (bounded out-of-orderness,
    reference BoundedOutOfOrdernessWatermarks)."""
    return df.withWatermark(ts_col, f"{delay_s} seconds")


def tumble_agg(
    df: DataFrame, ts_col: str, size_s: int, delay_s: int, keys: list[str], aggs: list[Column]
) -> DataFrame:
    w = with_watermark(df, ts_col, delay_s)
    return w.groupBy(F.window(F.col(ts_col), f"{size_s} seconds").alias("w"), *keys).agg(*aggs).select(
        F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *keys,
        *[F.col(c) for c in _agg_names(aggs)],
    )


def hop_agg(
    df: DataFrame, ts_col: str, size_s: int, slide_s: int, delay_s: int, keys: list[str], aggs: list[Column]
) -> DataFrame:
    w = with_watermark(df, ts_col, delay_s)
    return (
        w.groupBy(F.window(F.col(ts_col), f"{size_s} seconds", f"{slide_s} seconds").alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *keys,
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )


def session_agg(
    df: DataFrame, ts_col: str, gap_s: int, delay_s: int, keys: list[str], aggs: list[Column]
) -> DataFrame:
    w = with_watermark(df, ts_col, delay_s)
    return (
        w.groupBy(F.session_window(F.col(ts_col), f"{gap_s} seconds").alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *keys,
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )


def session_agg_dynamic(
    df: DataFrame, ts_col: str, gap_expr: Column, delay_s: int, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Dynamic-gap session windows on a stream (reference:
    DynamicEventTimeSessionWindows + SessionWindowTimeGapExtractor): the
    per-row gap is any expression over the row. Spark's session_window
    accepts an expression gap natively, so merging and state eviction stay
    engine-owned — the streaming twin of the batch
    `window_session_dynamic` query."""
    w = with_watermark(df, ts_col, delay_s)
    return (
        w.groupBy(F.session_window(F.col(ts_col), gap_expr).alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *keys,
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )


def cumulate_agg(
    df: DataFrame, ts_col: str, step_s: int, max_size_s: int, delay_s: int, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """CUMULATE windows on a stream (reference: StreamExecWindowAggregate
    over SliceAssigners.cumulative:93): growing [bucket, bucket + k*step)
    windows within each epoch-aligned max_size bucket.

    The k-expansion (explode + filter) is stateless and leaves ``ts_col``
    untouched, so the watermark survives to an ``F.window(ts, max_size)``
    grouping — Structured Streaming then owns state eviction, and all k
    slices of a bucket close together when the bucket's max window passes
    the watermark: the same state lifetime as the reference's slicing
    operator (one slice buffer held until the largest window fires)."""
    if max_size_s % step_s != 0:
        raise ValueError("max_size must be a multiple of step")
    n = max_size_s // step_s
    w = with_watermark(df, ts_col, delay_s)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    step_us = step_s * 1_000_000
    bucket_us = us - (us % (max_size_s * 1_000_000))
    expanded = (
        w.withColumn("__k", F.explode(F.sequence(F.lit(1), F.lit(n))))
        .where(us < bucket_us + F.col("__k") * step_us)
    )
    return (
        expanded.groupBy(F.window(F.col(ts_col), f"{max_size_s} seconds").alias("w"), F.col("__k"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.timestamp_micros(F.unix_micros(F.col("w.start").cast("timestamp")) + F.col("__k") * step_us).alias(
                "window_end"
            ),
            *keys,
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )


def _agg_names(aggs: list[Column]) -> list[str]:
    # aliased agg columns expose their name via the expression string
    names = []
    for c in aggs:
        s = c._jc.toString()
        names.append(s.split(" AS ")[-1].strip("`") if " AS " in s else s)
    return names

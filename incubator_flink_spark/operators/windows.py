"""Window assignment operators (reference: SliceAssigners in
flink-table-runtime/.../operators/window/slicing/SliceAssigners.java —
tumbling:60, hopping:76, cumulative:93 — and the window TVFs of
StreamExecWindowTableFunction.java:49).

TUMBLE and HOP map to the built-in ``F.window`` (epoch-aligned, identical
semantics); SESSION maps to ``F.session_window``.  CUMULATE has no Spark
built-in: an event in a max-size bucket belongs to every growing window
[bucket_start, bucket_start + k*step) whose end is past the event, so we
explode k with ``F.sequence`` — pure JVM-side expressions, no UDF, and
the multiplier (max_size/step) is a small constant so the blow-up is
bounded exactly like the reference's slice re-use.

All helpers append ``window_start``/``window_end`` timestamp columns.
At 100TB these stay shuffle-friendly: window assignment is a map-side
narrow op; only the downstream groupBy shuffles, keyed on
(window_start, group keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _win_cols(df: DataFrame, win: Column) -> DataFrame:
    return (
        df.withColumn("__w", win)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def tumble(df: DataFrame, ts_col: str, size_s: int, offset_s: int = 0) -> DataFrame:
    """TUMBLE(ts, size[, offset]): epoch-aligned fixed windows (built-in).

    ``offset_s`` shifts window boundaries (reference: TumblingEventTimeWindows
    .of(size, offset) — e.g. timezone-aligned days); maps to F.window's
    startTime parameter."""
    return _win_cols(
        df,
        F.window(F.col(ts_col), f"{size_s} seconds", f"{size_s} seconds", f"{offset_s} seconds")
        if offset_s
        else F.window(F.col(ts_col), f"{size_s} seconds"),
    )


def hop(df: DataFrame, ts_col: str, size_s: int, slide_s: int, offset_s: int = 0) -> DataFrame:
    """HOP(ts, slide, size[, offset]): sliding windows (built-in; one row
    per covering window, size/slide rows per event; offset as in tumble —
    SlidingEventTimeWindows.of(size, slide, offset))."""
    return _win_cols(
        df,
        F.window(F.col(ts_col), f"{size_s} seconds", f"{slide_s} seconds", f"{offset_s} seconds")
        if offset_s
        else F.window(F.col(ts_col), f"{size_s} seconds", f"{slide_s} seconds"),
    )


def session_col(ts_col: str, gap_s: int) -> Column:
    """SESSION(ts, gap) grouping column (built-in session_window;
    window_end = last event + gap). Session merging happens inside the
    aggregation, so this MUST be used as a groupBy key — projecting it
    yields unmerged per-row windows."""
    return F.session_window(F.col(ts_col), f"{gap_s} seconds")


def cumulate(df: DataFrame, ts_col: str, step_s: int, max_size_s: int) -> DataFrame:
    """CUMULATE(ts, step, max): growing windows within each max-size
    bucket — [b, b+step), [b, b+2*step), ..., [b, b+max).

    Custom (no Spark equivalent; reference SliceAssigners.cumulative:93).
    Expressed with integer epoch arithmetic + sequence explode so it stays
    inside whole-stage codegen.
    """
    if max_size_s % step_s != 0:
        raise ValueError("max_size must be a multiple of step")
    n = max_size_s // step_s
    us = F.unix_micros(F.col(ts_col))
    bucket_start = (us - (us % (max_size_s * 1_000_000))).alias("__bucket_us")
    return (
        df.withColumn("__bucket_us", bucket_start)
        .withColumn("__k", F.explode(F.sequence(F.lit(1), F.lit(n))))
        .withColumn("window_end_us", F.col("__bucket_us") + F.col("__k") * (step_s * 1_000_000))
        .where(us < F.col("window_end_us"))
        .withColumn("window_start", F.timestamp_micros(F.col("__bucket_us")))
        .withColumn("window_end", F.timestamp_micros(F.col("window_end_us")))
        .drop("__bucket_us", "__k", "window_end_us")
    )


def count_window(df: DataFrame, *keys: str, order_by: list[str], size: int) -> DataFrame:
    """Tumbling count windows per key (reference KeyedStream.countWindow:696
    + CountTrigger): window_id = (row_number-1) div size.

    Custom — Spark has no count windows. Batch form uses a per-key
    row_number (one shuffle + partition-local sort); the streaming form
    lives in streaming/stateful.py.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("window_id", ((F.row_number().over(w) - 1) / size).cast("bigint"))


def sliding_count_window(df: DataFrame, *keys: str, order_by: list[str], size: int, slide: int) -> DataFrame:
    """Sliding count windows per key (reference KeyedStream.countWindow(size,
    slide): fire every `slide` elements over the last `size` elements).

    Window w (1-based) closes at element w*slide and covers row numbers
    (w*slide - size, w*slide]. Each element belongs to ceil(size/slide)
    windows; the expansion is a per-row sequence explode — stateless after
    the same one-shuffle row_number as tumbling count windows. Only
    complete windows (full `slide` tail present) are emitted, mirroring
    the reference's CountTrigger firing on exact multiples."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(*order_by)
    staged = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__last", F.floor(F.count(F.lit(1)).over(W.partitionBy(*keys)) / F.lit(slide)).cast("bigint")
    )
    # windows containing row rn: w*slide >= rn AND w*slide - size < rn,
    # clamped to complete windows only
    w_min = F.greatest(F.ceil(F.col("__rn") / F.lit(slide)).cast("bigint"), F.lit(1))
    w_max = F.least(
        F.floor((F.col("__rn") + F.lit(size) - 1) / F.lit(slide)).cast("bigint"), F.col("__last")
    )
    seq = F.when(w_min <= w_max, F.sequence(w_min, w_max))  # null → explode drops row
    return staged.withColumn("window_id", F.explode(seq)).drop("__rn", "__last")


def window_cogroup(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    size_s: int,
    fn,
    output_schema: str,
) -> DataFrame:
    """Windowed coGroup (reference: CoGroupedStreams.java — tagged-union
    into a WindowOperator handing both sides' buffers to the user
    function). Spark form: assign windows to both sides, then
    ``cogroup().applyInPandas`` on (window, keys) — fn(left_pdf,
    right_pdf) sees every row of each side for the group, including
    groups present on only one side (the coGroup/full-outer contract)."""
    lw = tumble(left, ts_col, size_s)
    rw = tumble(right, ts_col, size_s)
    group_cols = ["window_start", *keys]
    return lw.groupBy(*group_cols).cogroup(rw.groupBy(*group_cols)).applyInPandas(fn, output_schema)

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


def session_rows_streaming(
    df: DataFrame, keys: list[str], ts_col: str, gap_s: int
) -> DataFrame:
    """Row-level merged session windows on a STREAM — the streaming form
    of the SESSION window TVF's row-level output (reference:
    StreamExecWindowTableFunction.java:49 with a SessionWindowSpec; docs'
    "Session window TVF" emits every input row tagged with its merged
    window_start/window_end).

    Spark's native ``session_window`` only exists fused into an
    aggregation, so the row-level form is a keyed stateful operator:
    open sessions buffer their rows (ts + JSON payload) in state, merge
    as new rows arrive (gaps-and-islands over the buffered + new rows),
    and a session EMITS all its rows — tagged with the final merged
    bounds — once the watermark passes session_end (+gap), exactly when
    the reference's merging window operator fires.  Requires
    ``withWatermark(ts_col, ...)`` upstream.

    State per key is O(rows of OPEN sessions) — bounded by the watermark
    horizon like the reference's merging window state (which also buffers
    per-row state for row-emitting session TVFs).  Keys shard across the
    state store; an unkeyed call degenerates to one state partition
    (same caveat as the batch gaps-and-islands rewrite).

    Timestamps in the payload are serialized as unix micros (exact);
    floats round-trip through JSON repr (exact for IEEE doubles)."""
    import json

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from incubator_flink_spark.streaming.stateful import _ts_us

    in_fields = list(df.schema.fields)
    col_order = [f.name for f in in_fields]
    ts_fields = [f.name for f in in_fields if isinstance(f.dataType, T.TimestampType)]
    int_fields = [
        f.name for f in in_fields if isinstance(f.dataType, (T.LongType, T.IntegerType))
    ]
    out_schema = T.StructType(
        [
            *in_fields,
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ts_us", T.ArrayType(T.LongType())),
            T.StructField("payload", T.ArrayType(T.StringType())),
        ]
    )
    gap_us = gap_s * 1_000_000

    def _encode(pdf: pd.DataFrame) -> list[str]:
        # per-record conversion (state buffers hold only OPEN-session rows,
        # so this loop is small): NaT must become JSON null BEFORE any
        # int64 view (NaT.astype('int64') silently yields INT64_MIN), and
        # nullable long/int payloads — which arrive float64 through the
        # pandas bridge (5 -> 5.0, null -> NaN) — must store exact ints /
        # JSON null, never bare NaN.  Column-level .where(..., None) is
        # avoided on purpose: pandas coerces the None back to NaN.
        recs = []
        for rec in pdf[col_order].to_dict("records"):
            for c in ts_fields:
                v = rec[c]
                rec[c] = None if pd.isna(v) else pd.Timestamp(v).value // 1000
            for c in int_fields:
                v = rec[c]
                rec[c] = None if pd.isna(v) else int(v)
            recs.append(json.dumps(rec))
        return recs

    def _decode(payload: list[str], w_start_us: int, w_end_us: int) -> pd.DataFrame:
        res = pd.DataFrame([json.loads(s) for s in payload], columns=col_order)
        for c in ts_fields:
            # element-wise: JSON null -> NaT (a column-level `* 1000` on a
            # column holding None would be object-dtype and fail)
            res[c] = pd.to_datetime(
                pd.Series(
                    [None if v is None else v * 1000 for v in res[c]], index=res.index
                ),
                utc=False,
            )
        for c in int_fields:
            # pandas nullable Int64, not numpy int64: JSON null decodes to
            # None and a bare astype('int64') raises inside the stateful
            # operator (the batch session path handles nulls fine — parity)
            res[c] = pd.array(res[c], dtype="Int64")
        res["window_start"] = pd.Timestamp(w_start_us * 1000)
        res["window_end"] = pd.Timestamp(w_end_us * 1000)
        return res

    def fn(key: tuple, pdfs, state: GroupState):
        if state.exists:
            st = state.get
            ts_buf, pl_buf = list(st[0]), list(st[1])
        else:
            ts_buf, pl_buf = [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                ts_buf.extend(int(t) for t in _ts_us(pdf[ts_col]))
                pl_buf.extend(_encode(pdf))
        if not ts_buf:
            if state.exists:
                state.remove()
            return
        order = sorted(range(len(ts_buf)), key=lambda i: (ts_buf[i], pl_buf[i]))
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000 if wm_ms > 0 else -(1 << 62)

        # gaps-and-islands over the merged buffer
        sessions: list[list[int]] = [[order[0]]]
        for i in order[1:]:
            if ts_buf[i] - ts_buf[sessions[-1][-1]] > gap_us:
                sessions.append([i])
            else:
                sessions[-1].append(i)

        out: list[pd.DataFrame] = []
        keep_ts: list[int] = []
        keep_pl: list[str] = []
        open_ends: list[int] = []
        for sess in sessions:
            start_us = ts_buf[sess[0]]
            end_us = ts_buf[sess[-1]] + gap_us
            if end_us <= wm_us:  # merged for good: fire row-level output
                out.append(_decode([pl_buf[i] for i in sess], start_us, end_us))
            else:
                keep_ts.extend(ts_buf[i] for i in sess)
                keep_pl.extend(pl_buf[i] for i in sess)
                open_ends.append(end_us)

        if keep_ts:
            state.update((keep_ts, keep_pl))
            state.setTimeoutTimestamp(max(min(open_ends) // 1000, wm_ms + 1))
        elif state.exists:
            state.remove()

        if out:
            res = pd.concat(out, ignore_index=True)
            yield res[[c.name for c in out_schema.fields]]

    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__all"))
    return grouped.applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )

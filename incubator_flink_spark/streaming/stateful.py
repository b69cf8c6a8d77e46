"""Custom keyed stateful streaming operators (SURVEY.md §7 Phase 3),
built on ``applyInPandasWithState`` (Arrow-batched keyed state — the
Spark analog of the reference's keyed ValueState + KeyedProcessOperator).

Implemented here:

- ``keep_last_dedup`` — keep-latest row per key, emitting only on change.
  Reference: StreamExecDeduplicate.java:70 keep-last /
  StreamExecChangelogNormalize.java:61 (upsert normalization).
  State per key: (ts_us, tiebreak) of the current winner — O(1).
  A change can only be caused by a row in the current batch, so the
  emitted row is always available from the batch itself; state never
  stores the payload.

- ``streaming_topn`` — per-key top-N by value with retract-tagged deltas
  (`__rowkind`: +I inserted entry, -D retracted entry), the
  RetractableTopNFunction analog (flink-table-runtime/.../rank/
  RetractableTopNFunction.java, 469 LoC). State per key: the N
  (value, id) pairs — O(N), independent of stream length.

- ``count_window_counts`` — tumbling count windows per key
  (KeyedStream.countWindow:696 + CountTrigger): emits a row per closed
  window; a partial window stays in state until filled. State: count +
  running aggregate of the open window.

Scale: state is per-key O(1)/O(N); Structured Streaming shards keys
across partitions (state store per shuffle partition), so 100TB key
cardinality scales horizontally exactly like the reference's keyed state
backends. Output rows per batch ∝ changes, not state size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _ts_us(series: pd.Series) -> pd.Series:
    return series.astype("int64") // 1000  # datetime64[ns] → micros


# --- vectorized per-batch kernels -------------------------------------------
# The stateful over/count-window operators process each Arrow batch with
# numpy (cumulative sums in extended precision + searchsorted window
# bounds) instead of per-row Python loops: throughput is array-speed, the
# carried state contract is unchanged.  tests/test_kernels.py pins both
# the semantics (vs a naive loop) and the >=5x speedup on a 100k batch.


def over_rows_kernel(
    vals: np.ndarray, buf: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW sums/counts for a sorted
    batch `vals` continuing carried window `buf` (<= n-1 values).
    Returns (sums, cnts, new_buf)."""
    c = np.concatenate([buf, vals])
    s = np.concatenate([[0.0], np.cumsum(c, dtype=np.longdouble)])
    gi = np.arange(len(buf), len(c))
    start = np.maximum(gi - (n - 1), 0)
    sums = np.round((s[gi + 1] - s[start]).astype(np.float64), 9)
    cnts = (gi + 1 - start).astype(np.int64)
    new_buf = c[max(0, len(c) - (n - 1)) :] if n > 1 else c[:0]
    return sums, cnts, new_buf


def over_range_kernel(
    ts_us: np.ndarray, vals: np.ndarray, buf_ts: np.ndarray, buf_vals: np.ndarray, horizon_us: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """RANGE [ts - horizon, ts] sums/counts for a ts-sorted batch
    continuing the carried in-horizon buffer (assumes ordered replay, the
    operator's documented contract).  Returns
    (sums, cnts, new_buf_ts, new_buf_vals)."""
    cts = np.concatenate([buf_ts, ts_us])
    cvs = np.concatenate([buf_vals, vals])
    s = np.concatenate([[0.0], np.cumsum(cvs, dtype=np.longdouble)])
    gi = np.arange(len(buf_ts), len(cts))
    start = np.searchsorted(cts, cts[gi] - horizon_us, side="left")
    sums = np.round((s[gi + 1] - s[start]).astype(np.float64), 9)
    cnts = (gi + 1 - start).astype(np.int64)
    keep = int(np.searchsorted(cts, cts[-1] - horizon_us, side="left")) if len(cts) else 0
    return sums, cnts, cts[keep:], cvs[keep:]


def count_window_kernel(
    vals: np.ndarray, open_cnt: int, open_total: float, n_seen: int, size: int
) -> tuple[np.ndarray, np.ndarray, int, float, int]:
    """Tumbling count windows over a sorted batch continuing an open
    window of (open_cnt, open_total).  Returns
    (window_ids, totals, new_open_cnt, new_open_total, new_n_seen) —
    one entry per window CLOSED inside this batch."""
    m = len(vals)
    s = np.concatenate([[0.0], np.cumsum(vals, dtype=np.longdouble)])
    closes = np.arange(size - open_cnt - 1, m, size)
    if len(closes) == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.float64),
            open_cnt + m,
            float(open_total + float(s[m])),
            n_seen,
        )
    totals = np.diff(np.concatenate([[0.0], s[closes + 1]])).astype(np.float64)
    totals[0] += open_total
    totals = np.round(totals, 9)
    wids = n_seen // size + np.arange(len(closes), dtype=np.int64)
    last = int(closes[-1]) + 1
    return (
        wids,
        totals,
        m - last,
        float(s[m] - s[last]),
        n_seen + size * len(closes),
    )


def keep_last_dedup(df: DataFrame, keys: list[str], ts_col: str, tiebreak: str) -> DataFrame:
    """Emit the new latest row per key whenever it changes (update
    semantics). Output schema == input schema."""
    out_schema = df.schema
    state_schema = T.StructType(
        [T.StructField("ts_us", T.LongType()), T.StructField("tb", T.LongType())]
    )
    key_fields = [f.name for f in out_schema.fields if f.name in keys]
    assert len(key_fields) == len(keys)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        best_ts, best_tb = state.get if state.exists else (-(1 << 62), -(1 << 62))
        winner = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.assign(__ts_us=_ts_us(pdf[ts_col]))
            pdf = pdf.sort_values(["__ts_us", tiebreak]).tail(1)
            ts_v = int(pdf["__ts_us"].iloc[0])
            tb_v = int(pdf[tiebreak].iloc[0])
            if (ts_v, tb_v) > (best_ts, best_tb):
                best_ts, best_tb = ts_v, tb_v
                winner = pdf.drop(columns="__ts_us")
        if winner is not None:
            state.update((best_ts, best_tb))
            yield winner

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def topn_output_schema(key_fields: list[T.StructField]) -> T.StructType:
    return T.StructType(
        [
            T.StructField("__rowkind", T.StringType()),
            *key_fields,
            T.StructField("rank", T.IntegerType()),
            T.StructField("id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )


def streaming_topn(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    value_col: str,
    n: int,
    op_col: str | None = None,
) -> DataFrame:
    """Per-key top-N by value (desc, id asc tiebreak) with retract-tagged
    delta output: on each change, -D rows retract displaced entries and
    +I rows insert new ones (consumers reconstruct the ranked list).

    With ``op_col`` the INPUT is itself a retracting changelog
    (RetractableTopNFunction.java consuming an upstream retract
    aggregate): +I/+U rows add a (value, id) entry, -D/-U rows remove
    the exact (value, id) entry — so an upstream update arrives as
    -U(old value) then +U(new value) and replaces the entry instead of
    duplicating the id.  Retractions may displace entries back INTO the
    top-N; state therefore keeps ALL live entries per key (like the
    reference's data-state map), not just the head."""
    key_fields = [f for f in df.schema.fields if f.name in keys]
    out_schema = topn_output_schema(key_fields)
    state_schema = T.StructType(
        [T.StructField("vals", T.ArrayType(T.DoubleType())), T.StructField("ids", T.ArrayType(T.LongType()))]
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        vals, ids = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        if op_col is None:
            old = list(zip(vals, ids))
            live = {(v, i) for v, i in old}
        else:
            # with retraction input, state = [top-N entries..., remainder];
            # the emitted old ranking is the first n entries
            live_list = list(zip(vals, ids))
            old = live_list[:n]
            live = set(live_list)
        for pdf in pdfs:
            if op_col is None:
                for v, i in zip(pdf[value_col].astype(float), pdf[id_col].astype(int)):
                    live.add((float(v), int(i)))
            else:
                for op, v, i in zip(
                    pdf[op_col], pdf[value_col].astype(float), pdf[id_col].astype(int)
                ):
                    if op in ("+I", "+U"):
                        live.add((float(v), int(i)))
                    else:  # -D / -U retract the exact entry
                        live.discard((float(v), int(i)))
        ordered = sorted(live, key=lambda e: (-e[0], e[1]))
        new = ordered[:n]
        kept = new if op_col is None else ordered
        if kept != list(zip(vals, ids)):
            state.update(([v for v, _ in kept], [i for _, i in kept]))
        if new == old:
            return
        out: list[dict[str, Any]] = []
        old_set, new_set = set(old), set(new)
        for rank, (v, i) in enumerate(old, start=1):
            if (v, i) not in new_set:
                out.append({"__rowkind": "-D", "rank": rank, "id": i, "value": v})
        for rank, (v, i) in enumerate(new, start=1):
            if (v, i) not in old_set or old[rank - 1 : rank] != [(v, i)]:
                out.append({"__rowkind": "+I", "rank": rank, "id": i, "value": v})
        res = pd.DataFrame(out)
        for f, kv in zip(key_fields, key):
            res[f.name] = kv
        yield res[[c.name for c in out_schema.fields]]

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def count_window_counts(df: DataFrame, keys: list[str], ts_col: str, tiebreak: str, value_col: str, size: int) -> DataFrame:
    """Tumbling count windows per key: emit (key, window_id, cnt, total)
    when a window fills. Rows are processed in (ts, tiebreak) order within
    each batch (cross-batch order follows arrival, as in the reference's
    processing-time count windows)."""
    key_fields = [f for f in df.schema.fields if f.name in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("window_id", T.LongType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_seen", T.LongType()),
            T.StructField("open_cnt", T.LongType()),
            T.StructField("open_total", T.DoubleType()),
        ]
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n_seen, open_cnt, open_total = state.get if state.exists else (0, 0, 0.0)
        wid_parts: list[np.ndarray] = []
        tot_parts: list[np.ndarray] = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values([ts_col, tiebreak])
            vals = pdf[value_col].to_numpy(np.float64)
            wids, totals, open_cnt, open_total, n_seen = count_window_kernel(
                vals, open_cnt, open_total, n_seen, size
            )
            if len(wids):
                wid_parts.append(wids)
                tot_parts.append(totals)
        state.update((n_seen, open_cnt, open_total))
        if wid_parts:
            res = pd.DataFrame(
                {
                    "window_id": np.concatenate(wid_parts),
                    "total": np.concatenate(tot_parts),
                }
            )
            res["cnt"] = size
            for f, kv in zip(key_fields, key):
                res[f.name] = kv
            yield res[[c.name for c in out_schema.fields]]

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_over_range(
    df: DataFrame, keys: list[str], ts_col: str, id_col: str, value_col: str, range_s: int
) -> DataFrame:
    """Event-time RANGE OVER aggregation per key: for each row, the
    sum/count of values in (row_ts - range_s, row_ts] — the streaming form
    of RowTimeRangeBoundedPrecedingFunction.java:296.

    State per key: the buffer of (ts_us, value) pairs still inside the
    range horizon — pruned on every row, so state is O(rows-in-range),
    matching the reference's retention cleanup. Rows are processed in
    (ts, id) order within each batch; cross-batch order follows arrival
    (exact under ordered replay; the reference additionally buffers
    out-of-order rows until the watermark — documented divergence).
    """
    key_fields = [f for f in df.schema.fields if f.name in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("sum_range", T.DoubleType()),
            T.StructField("cnt_range", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ts_buf", T.ArrayType(T.LongType())),
            T.StructField("val_buf", T.ArrayType(T.DoubleType())),
        ]
    )
    horizon_us = range_s * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf_ts = np.asarray(state.get[0], np.int64)
            buf_vals = np.asarray(state.get[1], np.float64)
        else:
            buf_ts = np.empty(0, np.int64)
            buf_vals = np.empty(0, np.float64)
        parts: list[pd.DataFrame] = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values([ts_col, id_col])
            ts_us = _ts_us(pdf[ts_col]).to_numpy(np.int64)
            vals = pdf[value_col].to_numpy(np.float64)
            sums, cnts, buf_ts, buf_vals = over_range_kernel(ts_us, vals, buf_ts, buf_vals, horizon_us)
            parts.append(
                pd.DataFrame(
                    {
                        "id": pdf[id_col].to_numpy(np.int64),
                        "ts": pd.to_datetime(ts_us, unit="us"),
                        "sum_range": sums,
                        "cnt_range": cnts,
                    }
                )
            )
        state.update(([int(t) for t in buf_ts], [float(v) for v in buf_vals]))
        if parts:
            res = pd.concat(parts, ignore_index=True)
            for f, kv in zip(key_fields, key):
                res[f.name] = kv
            yield res[[c.name for c in out_schema.fields]]

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_over_rows(
    df: DataFrame, keys: list[str], ts_col: str, id_col: str, value_col: str, n: int
) -> DataFrame:
    """Event-time ROWS OVER aggregation per key: for each row, the
    sum/count over itself and the (n-1) preceding rows in (ts, id) order —
    the streaming form of RowTimeRowsBoundedPrecedingFunction.java (the
    ROWS sibling of the RANGE variant above; flink-table-runtime/.../over/).

    State per key: ring buffer of the last (n-1) values — O(n), matching
    the reference's retract-list cleanup. Rows are processed in (ts, id)
    order within each batch; cross-batch order follows arrival (exact
    under ordered replay; the reference buffers out-of-order rows until
    the watermark — documented divergence, same as streaming_over_range).
    """
    key_fields = [f for f in df.schema.fields if f.name in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("sum_rows", T.DoubleType()),
            T.StructField("cnt_rows", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("val_buf", T.ArrayType(T.DoubleType()))])

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        buf = np.asarray(state.get[0], np.float64) if state.exists else np.empty(0, np.float64)
        parts: list[pd.DataFrame] = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values([ts_col, id_col])
            vals = pdf[value_col].to_numpy(np.float64)
            sums, cnts, buf = over_rows_kernel(vals, buf, n)
            parts.append(
                pd.DataFrame(
                    {
                        "id": pdf[id_col].to_numpy(np.int64),
                        "ts": pd.to_datetime(_ts_us(pdf[ts_col]).to_numpy(np.int64), unit="us"),
                        "sum_rows": sums,
                        "cnt_rows": cnts,
                    }
                )
            )
        state.update(([float(v) for v in buf],))
        if parts:
            res = pd.concat(parts, ignore_index=True)
            for f, kv in zip(key_fields, key):
                res[f.name] = kv
            yield res[[c.name for c in out_schema.fields]]

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def temporal_join_stream(
    tagged: DataFrame,
    keys: list[str],
    ts_col: str,
    side_col: str,
    id_col: str,
    value_col: str,
    version_ttl_s: int | None = None,
) -> DataFrame:
    """Streaming event-time temporal join (TemporalRowTimeJoinOperator.java:78)
    over a tagged union of the probe and build streams (side_col: 'probe' /
    'build' — Spark stateful ops are single-input, so the two-input
    operator becomes union + dispatch, the same trick as CoProcess).

    Build rows append (ts, id, value) versions to per-key state; probe rows
    emit the version valid at their timestamp (latest build_ts <= probe_ts;
    ties: build processed first).

    Version GC (the reference's watermark-driven cleanup,
    TemporalRowTimeJoinOperator.java cleanup logic): with
    ``version_ttl_s`` set, versions older than (max event time seen -
    ttl) are pruned EXCEPT the newest such version — probes always need
    the version valid at the horizon, so exactly one pre-horizon version
    survives. State is then O(versions inside the horizon) per key.
    """
    key_fields = [f for f in tagged.schema.fields if f.name in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("probe_id", T.LongType()),
            T.StructField("probe_ts", T.TimestampType()),
            T.StructField("version_id", T.LongType()),
            T.StructField("version_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("v_ts", T.ArrayType(T.LongType())),
            T.StructField("v_id", T.ArrayType(T.LongType())),
            T.StructField("v_val", T.ArrayType(T.DoubleType())),
        ]
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import bisect

        v_ts, v_id, v_val = (
            (list(state.get[0]), list(state.get[1]), list(state.get[2])) if state.exists else ([], [], [])
        )
        max_us_seen = v_ts[-1] if v_ts else -(1 << 62)
        out: list[dict[str, Any]] = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.assign(__us=_ts_us(pdf[ts_col]), __b=(pdf[side_col] == "build").astype(int))
            # build rows first at equal timestamps (inclusive <= semantics)
            pdf = pdf.sort_values(["__us", "__b", id_col], ascending=[True, False, True])
            for us, side, rid, v in zip(
                pdf["__us"], pdf[side_col], pdf[id_col].astype(int), pdf[value_col].astype(float)
            ):
                us = int(us)
                max_us_seen = max(max_us_seen, us)
                if side == "build":
                    pos = bisect.bisect_right(v_ts, us)
                    v_ts.insert(pos, us)
                    v_id.insert(pos, int(rid))
                    v_val.insert(pos, float(v))
                else:
                    pos = bisect.bisect_right(v_ts, us) - 1
                    out.append(
                        {
                            "probe_id": int(rid),
                            "probe_ts": pd.Timestamp(us * 1000),
                            "version_id": int(v_id[pos]) if pos >= 0 else None,
                            "version_value": float(v_val[pos]) if pos >= 0 else None,
                        }
                    )
        if version_ttl_s is not None and v_ts:
            horizon = max_us_seen - version_ttl_s * 1_000_000
            cut = bisect.bisect_right(v_ts, horizon)
            if cut > 1:
                # prune pre-horizon versions, keeping the newest of them
                # (still the valid version for probes at the horizon)
                drop = cut - 1
                del v_ts[:drop], v_id[:drop], v_val[:drop]
        state.update((v_ts, v_id, v_val))
        if out:
            res = pd.DataFrame(out)
            for f, kv in zip(key_fields, key):
                res[f.name] = kv
            yield res[[c.name for c in out_schema.fields]]

    return tagged.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_multi_distinct(
    df: DataFrame, keys: list[str], distinct_cols: list[str], total_col: str = "total"
) -> DataFrame:
    """Update-mode EXACT ``COUNT(*)`` + ``COUNT(DISTINCT col)...`` per key
    (Structured Streaming rejects distinct aggregates natively).
    Reference: distinct aggregates on streams carry per-key distinct
    map-view state (flink-table-planner/.../rules/logical/
    SplitAggregateRule.scala splits them into partial/final with a
    distinct accumulator view); here the per-key state IS the distinct
    value sets, the same asymptotics as the reference's map views.

    ``distinct_cols`` must be integral columns.  Scale: state per key is
    O(distinct values) — identical to the reference's distinct view; for
    sketch-bounded state use streaming/sketches.py (per-group HLL)
    instead."""
    out_fields = [f for f in df.schema.fields if f.name in keys]
    out_schema = T.StructType(
        out_fields
        + [T.StructField(total_col, T.LongType())]
        + [T.StructField(f"distinct_{c}", T.LongType()) for c in distinct_cols]
    )
    state_schema = T.StructType(
        [T.StructField("cnt", T.LongType())]
        + [T.StructField(f"s_{c}", T.ArrayType(T.LongType())) for c in distinct_cols]
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            cnt, sets = st[0], [set(x) for x in st[1:]]
        else:
            cnt, sets = 0, [set() for _ in distinct_cols]
        seen = 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            seen += len(pdf)
            for s, c in zip(sets, distinct_cols):
                s.update(int(v) for v in pdf[c].dropna())
        if seen:
            cnt += seen
            state.update((cnt, *[sorted(s) for s in sets]))
            row = {k: v for k, v in zip(keys, key)}
            row[total_col] = cnt
            for c, s in zip(distinct_cols, sets):
                row[f"distinct_{c}"] = len(s)
            yield pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def keep_last_dedup_ttl(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak: str, ttl_s: int
) -> DataFrame:
    """keep_last_dedup with event-time state TTL (reference StateTtlConfig
    + StreamExecDeduplicate's state retention): a key's winner state is
    dropped once the watermark passes last_update + ttl. On expiry a
    tombstone row is emitted (key columns set, ``tiebreak`` = -1) so
    downstream upsert sinks can retract the key — and so the cleanup is
    observable/testable.

    Requires ``df.withWatermark(ts_col, ...)`` upstream (the event-time
    timeout clock is the stream's watermark, the same clock the reference
    uses for state cleanup)."""
    out_schema = df.schema
    state_schema = T.StructType(
        [T.StructField("ts_us", T.LongType()), T.StructField("tb", T.LongType())]
    )
    key_fields = [f for f in out_schema.fields if f.name in keys]

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # TTL cleanup — forget the winner
            tomb = {f.name: None for f in out_schema.fields}
            for f, kv in zip(key_fields, key):
                tomb[f.name] = kv
            tomb[tiebreak] = -1
            yield pd.DataFrame([tomb])[[f.name for f in out_schema.fields]]
            return
        best_ts, best_tb = state.get if state.exists else (-(1 << 62), -(1 << 62))
        winner = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.assign(__ts_us=_ts_us(pdf[ts_col]))
            pdf = pdf.sort_values(["__ts_us", tiebreak]).tail(1)
            ts_v = int(pdf["__ts_us"].iloc[0])
            tb_v = int(pdf[tiebreak].iloc[0])
            if (ts_v, tb_v) > (best_ts, best_tb):
                best_ts, best_tb = ts_v, tb_v
                winner = pdf.drop(columns="__ts_us")
        if winner is not None:
            state.update((best_ts, best_tb))
            state.setTimeoutTimestamp(best_ts // 1000 + ttl_s * 1000)  # epoch ms
            yield winner

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.EventTimeTimeout
    )


def keep_last_dedup_tws(df: DataFrame, keys: list[str], ts_col: str, tiebreak: str, ttl_ms: int | None = None) -> DataFrame:
    """keep_last_dedup on the Spark 4 ``transformWithStateInPandas`` API
    (StatefulProcessor + typed ValueState with native per-state TTL — the
    closest analog to the reference's ValueState + StateTtlConfig;
    SURVEY.md §2.9 keyed-state row). Functionally identical to
    keep_last_dedup; kept as the forward-looking implementation since
    applyInPandasWithState is the legacy path.

    Requires a working google.protobuf (the TWS state protocol runs over
    protobuf); environments without it should use keep_last_dedup."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf; use keep_last_dedup instead"
        ) from e
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = df.schema
    state_schema = T.StructType([T.StructField("ts_us", T.LongType()), T.StructField("tb", T.LongType())])

    class KeepLast(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.winner = handle.getValueState("winner", state_schema, ttlDurationMs=ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            best = self.winner.get() if self.winner.exists() else None
            best_ts, best_tb = (best[0], best[1]) if best else (-(1 << 62), -(1 << 62))
            winner = None
            for pdf in rows:
                if pdf.empty:
                    continue
                pdf = pdf.assign(__ts_us=_ts_us(pdf[ts_col]))
                pdf = pdf.sort_values(["__ts_us", tiebreak]).tail(1)
                ts_v = int(pdf["__ts_us"].iloc[0])
                tb_v = int(pdf[tiebreak].iloc[0])
                if (ts_v, tb_v) > (best_ts, best_tb):
                    best_ts, best_tb = ts_v, tb_v
                    winner = pdf.drop(columns="__ts_us")
            if winner is not None:
                self.winner.update((best_ts, best_tb))
                yield winner

        def close(self) -> None:
            pass

    return df.groupBy(*keys).transformWithStateInPandas(
        KeepLast(), out_schema, "update", "None"
    )


def attribution_stream(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak: str,
    type_col: str,
    value_col: str,
    touch_types: tuple[str, ...] = ("click", "view", "signup"),
    conv_type: str = "purchase",
    lookback_s: int = 604800,
) -> DataFrame:
    """Streaming last-touch attribution: per-user O(1) state carries the
    most recent touch (type, event-time); each conversion emits one
    attributed row — the touch's channel if it happened within the
    lookback, else 'direct'.

    This is the streaming execution of the registered batch query
    ``attribution_last_touch`` (queries/events.py): the batch last-non-null
    window becomes keyed carry-forward state, the same keyed-state shape
    as the reference's KeyedProcessFunction with a single ValueState
    (flink-streaming-java KeyedProcessOperator) — state never grows with
    history, only ONE (type, ts) pair per user.  Within a micro-batch rows
    are applied in (event-time, tiebreak) order; cross-batch order is the
    replay contract (event-time-ordered sources, as replay_table feeds)."""
    key_fields = [f for f in df.schema.fields if f.name == user_col]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("ts", T.TimestampType()),
            T.StructField("channel", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("touch_type", T.StringType()),
            T.StructField("touch_us", T.LongType()),
        ]
    )
    touch_set = set(touch_types)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        touch_type, touch_us = (state.get if state.exists else (None, None))
        out: list[dict[str, Any]] = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.assign(__us=_ts_us(pdf[ts_col]))
            pdf = pdf.sort_values(["__us", tiebreak])
            for us, etype, val in zip(pdf["__us"], pdf[type_col], pdf[value_col]):
                us = int(us)
                if etype == conv_type:
                    if touch_us is not None and us - touch_us <= lookback_s * 1_000_000:
                        channel = touch_type
                    else:
                        channel = "direct"
                    out.append(
                        {"ts": pd.Timestamp(us * 1000), "channel": channel, "value": float(val)}
                    )
                elif etype in touch_set:
                    touch_type, touch_us = str(etype), us
        if touch_us is not None:
            state.update((touch_type, touch_us))
        if out:
            res = pd.DataFrame(out)
            for f, kv in zip(key_fields, key):
                res[f.name] = kv
            yield res[[c.name for c in out_schema.fields]]

    return df.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def gapfill_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak: str,
    value_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Streaming gap-fill resample: per key, hourly (bucket_s) averages
    emitted in grid order as the WATERMARK closes each bucket — including
    synthetic rows for empty buckets, which carry the last observed
    average forward (the streaming execution of the registered batch
    query ``timeseries_gapfill``).

    Gap rows are TIMER-DRIVEN: a key with no incoming data still emits
    its gap rows as the watermark advances, because each key re-arms a
    GroupStateTimeout.EventTimeTimeout at its next unclosed bucket
    boundary — the reference's timer-driven window firing
    (InternalTimerService / WindowOperator.onEventTime), not an
    input-piggybacked emission.  State per key is the OPEN buckets only
    ((hour, sum, count) triples past the watermark) plus the fill value —
    bounded by out-of-orderness, not by history."""
    key_fields = [f for f in df.schema.fields if f.name == key_col]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("hour", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("filled_value", T.DoubleType()),
            T.StructField("is_gap", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("hours", T.ArrayType(T.LongType())),
            T.StructField("sums", T.ArrayType(T.DoubleType())),
            T.StructField("cnts", T.ArrayType(T.LongType())),
            T.StructField("next_emit_us", T.LongType()),
            T.StructField("last_avg", T.DoubleType()),
            T.StructField("has_last", T.BooleanType()),
        ]
    )
    bucket_us = bucket_s * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            hours, sums, cnts, next_emit, last_avg, has_last = state.get
            open_b = {h: [s, c] for h, s, c in zip(hours, sums, cnts)}
        else:
            open_b, next_emit, last_avg, has_last = {}, None, 0.0, False
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.assign(__us=_ts_us(pdf[ts_col])).sort_values(["__us", tiebreak])
            for us, v in zip(pdf["__us"], pdf[value_col]):
                h = int(us) // bucket_us * bucket_us
                if next_emit is not None and h < next_emit:
                    continue  # late past the emitted region: dropped (documented)
                b = open_b.setdefault(h, [0.0, 0])
                b[0] += float(v)
                b[1] += 1
        if next_emit is None and open_b:
            next_emit = min(open_b)
        out: list[dict[str, Any]] = []
        while next_emit is not None and next_emit + bucket_us <= wm_us:
            b = open_b.pop(next_emit, None)
            if b is not None:
                last_avg, has_last = b[0] / b[1], True
                out.append(
                    {"hour": pd.Timestamp(next_emit * 1000), "n_events": b[1],
                     "filled_value": last_avg, "is_gap": 0}
                )
            else:
                out.append(
                    {"hour": pd.Timestamp(next_emit * 1000), "n_events": 0,
                     "filled_value": last_avg if has_last else 0.0, "is_gap": 1}
                )
            next_emit += bucket_us
        if next_emit is None and not open_b:
            if state.exists:
                state.remove()
        else:
            hs = sorted(open_b)
            state.update(
                (hs, [open_b[h][0] for h in hs], [open_b[h][1] for h in hs],
                 next_emit, last_avg, has_last)
            )
            # arm the timer at the close of the next unclosed bucket so gap
            # rows fire on watermark advance even with no input for this key
            deadline_ms = (next_emit + bucket_us) // 1000 + 1
            state.setTimeoutTimestamp(max(deadline_ms, wm_us // 1000 + 1))
        if out:
            res = pd.DataFrame(out)
            for f, kv in zip(key_fields, key):
                res[f.name] = kv
            yield res[[c.name for c in out_schema.fields]]

    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )

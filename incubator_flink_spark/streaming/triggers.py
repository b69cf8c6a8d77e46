"""Custom window triggers, evictors, and allowed-lateness semantics
(SURVEY.md §2.9 rows "Triggers", "Evictors", "Allowed lateness + late side
output") as keyed stateful operators over ``applyInPandasWithState``.

Spark's built-in windowed aggregation fires exactly once per window at
watermark close (EventTimeTrigger + PurgingTrigger in reference terms) and
silently drops post-watermark rows. The reference's richer per-window
firing policies (flink-streaming-java/.../windowing/triggers/: CountTrigger,
ContinuousEventTimeTrigger, PurgingTrigger; evictors/: CountEvictor;
WindowedStream.allowedLateness:108 + sideOutputLateData:124) are emulated
here with explicit per-key window state and event-time timeouts — the same
watermark clock the reference's trigger/timer services run on.

State per key: the open windows' (start, cnt, sum[, last-N value ring]) —
O(open windows), purged on final fire (PurgingTrigger semantics), so state
is bounded by windows inside the watermark horizon (+ lateness), matching
the reference WindowOperator's cleanup timers.

Scale: keys shard across shuffle partitions via the state store exactly
like every other stateful op here; emission volume ∝ fires, not state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from incubator_flink_spark.streaming.stateful import _ts_us


def _fire_schema(key_fields: list[T.StructField]) -> T.StructType:
    return T.StructType(
        [
            *key_fields,
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("fire_kind", T.StringType()),  # early | final | late_update | late_dropped
        ]
    )


def _row(w_us: int, size_us: int, cnt: int, total: float, kind: str) -> dict[str, Any]:
    return {
        "window_start": pd.Timestamp(w_us * 1000),
        "window_end": pd.Timestamp((w_us + size_us) * 1000),
        "cnt": int(cnt),
        "total": round(float(total), 9),
        "fire_kind": kind,
    }


def early_firing_tumble_agg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    size_s: int,
    every_n: int,
    evict_last_n: int | None = None,
) -> DataFrame:
    """Tumbling event-time count/sum aggregation with a CountTrigger:
    every ``every_n``-th row of a window emits an early partial result
    (fire_kind='early'), and watermark passing the window end emits the
    final result (fire_kind='final') and purges the window.

    With ``evict_last_n`` set, final results aggregate only the last N
    rows (by (ts, id)) of the window — CountEvictor.of(N) semantics
    (flink-streaming-java/.../windowing/evictors/CountEvictor.java);
    early fires still report the running aggregate.

    Requires ``df.withWatermark(ts_col, ...)`` upstream. Rows arriving
    for an already-finalized window are dropped (no lateness here — see
    ``tumble_agg_with_lateness``).
    """
    key_fields = [f for f in df.schema.fields if f.name in keys]
    out_schema = _fire_schema(key_fields)
    state_schema = T.StructType(
        [
            T.StructField("w_start", T.ArrayType(T.LongType())),
            T.StructField("w_cnt", T.ArrayType(T.LongType())),
            T.StructField("w_sum", T.ArrayType(T.DoubleType())),
            # flattened last-N ring per window (evictor); window i owns
            # slots [i*N, (i+1)*N) with w_cnt[i] deciding how many are live
            T.StructField("w_ring", T.ArrayType(T.DoubleType())),
            T.StructField("max_final_us", T.LongType()),  # purge horizon
        ]
    )
    size_us = size_s * 1_000_000
    ring_n = evict_last_n or 0

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            windows: dict[int, list[Any]] = {}
            for i, w in enumerate(st[0]):
                # slots beyond min(cnt, N) are padding, not live values
                live = min(st[1][i], ring_n)
                ring = list(st[3][i * ring_n : i * ring_n + live]) if ring_n else []
                windows[w] = [st[1][i], st[2][i], ring]
            max_final_us = st[4]
        else:
            windows, max_final_us = {}, -(1 << 62)
        out: list[dict[str, Any]] = []

        if not state.hasTimedOut:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values([ts_col, id_col])
                for ts_us, v in zip(_ts_us(pdf[ts_col]), pdf[value_col].astype(float)):
                    w = (int(ts_us) // size_us) * size_us
                    if w < max_final_us:  # window already fired final
                        continue
                    cnt, total, ring = windows.setdefault(w, [0, 0.0, []])
                    cnt += 1
                    total += float(v)
                    if ring_n:
                        ring.append(float(v))
                        if len(ring) > ring_n:
                            ring.pop(0)
                    windows[w] = [cnt, total, ring]
                    if cnt % every_n == 0:
                        out.append(_row(w, size_us, cnt, total, "early"))

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        for w in sorted(windows):
            if w + size_us <= wm_us:
                cnt, total, ring = windows.pop(w)
                if ring_n:
                    cnt, total = min(cnt, ring_n), sum(ring)
                out.append(_row(w, size_us, cnt, total, "final"))
                max_final_us = max(max_final_us, w + size_us)

        if windows:
            starts = sorted(windows)
            ring_flat: list[float] = []
            for w in starts:
                ring = windows[w][2]
                ring_flat.extend(ring + [0.0] * (ring_n - len(ring)))
            state.update(
                (
                    starts,
                    [windows[w][0] for w in starts],
                    [windows[w][1] for w in starts],
                    ring_flat,
                    max_final_us,
                )
            )
            # fire when the watermark passes the earliest open window end
            state.setTimeoutTimestamp(max((starts[0] + size_us) // 1000, wm_ms + 1))
        elif state.exists:
            state.remove()

        if out:
            res = pd.DataFrame(out)
            for f, kv in zip(key_fields, key):
                res[f.name] = kv
            yield res[[c.name for c in out_schema.fields]]

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def tumble_agg_with_lateness(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    size_s: int,
    lateness_s: int,
    delay_s: int = 0,
    side_slack_s: int | None = None,
) -> DataFrame:
    """Tumbling event-time aggregation with allowedLateness + late side
    output (WindowedStream.allowedLateness:108 / sideOutputLateData:124):

    - watermark passes window end      -> emit fire_kind='final'
    - late row within end + lateness   -> re-emit fire_kind='late_update'
      with the corrected aggregate (the reference re-fires the window)
    - late row beyond end + lateness   -> emit the row's would-be window
      tagged fire_kind='late_dropped' with the row's own (1, value) — the
      side-output channel; filter on fire_kind to split the two streams.

    Window state is purged only at end + lateness (the reference's
    cleanup timer at window.maxTimestamp + allowedLateness).

    Mechanics: Spark drops watermark-late rows BEFORE a stateful operator
    ever sees them, so a watermark with the user's real delay would make
    lateness unobservable. The operator therefore registers the watermark
    with an widened delay of (delay + lateness + side_slack) — late rows
    survive Spark's upstream filter — and reconstructs the true
    bounded-out-of-orderness watermark inside the operator by adding the
    widening back (true_wm = spark_wm + lateness + side_slack). Timers
    are registered on Spark's lagged clock with the same correction.
    Rows later than lateness + side_slack are still dropped silently by
    Spark itself — side_slack bounds how far behind the side output can
    observe (the reference's side output is unbounded; the bound is the
    price of Spark's upstream filter — documented divergence). Pass
    ``df`` WITHOUT a watermark; ``delay_s`` is the user's real
    out-of-orderness allowance.
    """
    shift_s = lateness_s + (side_slack_s if side_slack_s is not None else lateness_s)
    df = df.withWatermark(ts_col, f"{shift_s + delay_s} seconds")
    shift_us = shift_s * 1_000_000
    key_fields = [f for f in df.schema.fields if f.name in keys]
    out_schema = _fire_schema(key_fields)
    state_schema = T.StructType(
        [
            T.StructField("w_start", T.ArrayType(T.LongType())),
            T.StructField("w_cnt", T.ArrayType(T.LongType())),
            T.StructField("w_sum", T.ArrayType(T.DoubleType())),
            T.StructField("w_fired", T.ArrayType(T.BooleanType())),
            T.StructField("purge_horizon_us", T.LongType()),
        ]
    )
    size_us = size_s * 1_000_000
    late_us = lateness_s * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            windows = {w: [st[1][i], st[2][i], st[3][i]] for i, w in enumerate(st[0])}
            purge_us = st[4]
        else:
            windows, purge_us = {}, -(1 << 62)
        out: list[dict[str, Any]] = []
        # Spark's lagged watermark -> true event-time watermark (undo the
        # delay widening; keep the initial 0 sentinel at "far past")
        spark_wm_ms = state.getCurrentWatermarkMs()
        wm_us = spark_wm_ms * 1000 + shift_us if spark_wm_ms > 0 else -(1 << 62)

        if not state.hasTimedOut:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values([ts_col, id_col])
                for ts_us, v in zip(_ts_us(pdf[ts_col]), pdf[value_col].astype(float)):
                    w = (int(ts_us) // size_us) * size_us
                    if w + size_us + late_us <= max(wm_us, purge_us):
                        # beyond allowed lateness: side output, don't touch state
                        out.append(_row(w, size_us, 1, float(v), "late_dropped"))
                        continue
                    cnt, total, fired = windows.setdefault(w, [0, 0.0, False])
                    cnt += 1
                    total += float(v)
                    windows[w] = [cnt, total, fired]
                    if fired:  # window already emitted final: re-fire update
                        out.append(_row(w, size_us, cnt, total, "late_update"))

        for w in sorted(windows):
            cnt, total, fired = windows[w]
            if not fired and w + size_us <= wm_us:
                out.append(_row(w, size_us, cnt, total, "final"))
                windows[w] = [cnt, total, True]
            if w + size_us + late_us <= wm_us:
                windows.pop(w)
                purge_us = max(purge_us, w + size_us + late_us)

        if windows:
            starts = sorted(windows)
            state.update(
                (
                    starts,
                    [windows[w][0] for w in starts],
                    [windows[w][1] for w in starts],
                    [windows[w][2] for w in starts],
                    purge_us,
                )
            )
            # next fire: earliest pending final, else earliest purge
            # (true clock -> Spark's lagged clock for the timer service;
            # clamped to wm+1, so a not-yet-due timer re-fires next batch)
            pending = [w + size_us for w in starts if not windows[w][2]]
            nxt = min(pending) if pending else min(w + size_us + late_us for w in starts)
            state.setTimeoutTimestamp(max((nxt - shift_us) // 1000, state.getCurrentWatermarkMs() + 1))
        elif state.exists:
            state.remove()

        if out:
            res = pd.DataFrame(out)
            for f, kv in zip(key_fields, key):
                res[f.name] = kv
            yield res[[c.name for c in out_schema.fields]]

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )

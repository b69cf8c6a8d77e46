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
        # delay widening; keep the initial 0 sentinel at "far past").
        # LIMITATION (documented divergence): Spark reports "no watermark
        # yet" as 0 ms, which aliases a real watermark at the 1970 epoch —
        # streams whose event times are at/near the epoch would keep the
        # reconstructed watermark at "far past" until the true watermark
        # first exceeds 0, delaying (never corrupting) final fires for
        # epoch-adjacent data. Real event-time data is decades past 1970.
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


# --- round-2: the remaining trigger/evictor family ---------------------------
# (flink-streaming-java/.../windowing/triggers/DeltaTrigger.java,
#  ContinuousEventTimeTrigger.java, ProcessingTimeoutTrigger.java;
#  evictors/TimeEvictor.java, DeltaEvictor.java, CountEvictor.java)


class CountTrigger:
    """Fire every n-th element of a window (CountTrigger.of(n))."""

    def __init__(self, n: int):
        self.n = n

    def on_element(self, aux: float | None, cnt: int, value: float):
        return cnt % self.n == 0, aux


class DeltaTrigger:
    """Fire when delta_fn(last_triggering_element, element) > threshold;
    the triggering element is then remembered (DeltaTrigger.java:44).
    Aux state: the last triggering element's value (first element seeds)."""

    def __init__(self, threshold: float, delta_fn=None):
        self.threshold = threshold
        self.delta_fn = delta_fn or (lambda old, new: abs(new - old))

    def on_element(self, aux: float | None, cnt: int, value: float):
        if aux is None:
            return False, value
        if self.delta_fn(aux, value) > self.threshold:
            return True, value
        return False, aux


class ContinuousEventTimeTrigger:
    """Fire repeatedly every `interval_s` of event time while the window
    is open (ContinuousEventTimeTrigger.java): the first timer is the
    interval boundary at/after the first element; each watermark advance
    past the registered boundary fires and re-registers.  (At most one
    early fire per window per micro-batch — boundaries crossed inside one
    batch coalesce, a micro-batch-granularity divergence.)"""

    def __init__(self, interval_s: int):
        self.interval_us = interval_s * 1_000_000

    def first_fire(self, ts_us: int) -> float:
        return float(((ts_us // self.interval_us) + 1) * self.interval_us)

    def on_watermark(self, next_fire: float, wm_us: int, w_end: int):
        if next_fire and wm_us >= next_fire and next_fire < w_end:
            nxt = ((wm_us // self.interval_us) + 1) * self.interval_us
            return True, float(min(nxt, w_end))
        return False, next_fire


class ProcessingTimeoutTrigger:
    """Fire open windows after `timeout_s` of PROCESSING time since the
    window's first element (ProcessingTimeoutTrigger.of); final fires
    still happen at the event-time watermark when later batches arrive.

    NOTE: a query using this trigger is wall-clock-driven and does not
    drain under trigger(availableNow=True) — Spark keeps scheduling
    no-data state-cleanup batches while stateful processing-time state
    exists; run it with a processing-time trigger and stop explicitly."""

    def __init__(self, timeout_s: float):
        self.timeout_ms = int(timeout_s * 1000)

    def on_element(self, aux: float | None, cnt: int, value: float):
        return False, aux


class CountEvictor:
    """Keep only the last n elements at fire time (CountEvictor.of)."""

    def __init__(self, n: int):
        self.n = n

    def evict(self, ts: list[int], vals: list[float]):
        return ts[-self.n :], vals[-self.n :]


class TimeEvictor:
    """Keep elements with ts > max_ts - keep_s (TimeEvictor.of: evicts
    elements older than `windowSize` before the buffer's max timestamp)."""

    def __init__(self, keep_s: int):
        self.keep_us = keep_s * 1_000_000

    def evict(self, ts: list[int], vals: list[float]):
        if not ts:
            return ts, vals
        lo = max(ts) - self.keep_us
        kept = [(t, v) for t, v in zip(ts, vals) if t > lo]
        return [t for t, _ in kept], [v for _, v in kept]


class DeltaEvictor:
    """Evict elements whose delta_fn(element, last_element) >= threshold
    (DeltaEvictor.java: compares each buffered element to the LAST one)."""

    def __init__(self, threshold: float, delta_fn=None):
        self.threshold = threshold
        self.delta_fn = delta_fn or (lambda v, last: abs(v - last))

    def evict(self, ts: list[int], vals: list[float]):
        if not vals:
            return ts, vals
        last = vals[-1]
        kept = [(t, v) for t, v in zip(ts, vals) if self.delta_fn(v, last) < self.threshold]
        return [t for t, _ in kept], [v for _, v in kept]


def tumble_agg_triggered(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    size_s: int,
    trigger=None,
    evictor=None,
    purging: bool = False,
) -> DataFrame:
    """Tumbling event-time count/sum aggregation with a pluggable trigger
    (CountTrigger / DeltaTrigger / ContinuousEventTimeTrigger /
    ProcessingTimeoutTrigger) and optional evictor (CountEvictor /
    TimeEvictor / DeltaEvictor), generalizing early_firing_tumble_agg to
    the reference's full WindowOperator trigger/evictor surface.

    Elements are buffered per open window (as the reference's evicting
    windows do); the evictor runs before EVERY fire's aggregation
    (evictBefore).  Early fires are tagged 'early', the watermark-close
    fire 'final' (PurgingTrigger: the final fire purges the window).
    ``purging=True`` wraps the trigger in the reference's PurgingTrigger
    (PurgingTrigger.java — FIRE becomes FIRE_AND_PURGE): every early fire
    clears the window's element buffer, so successive fires aggregate
    DISJOINT chunks and the watermark-close fire emits only the tail
    since the last purge (and nothing at all if the pane is empty —
    WindowOperator skips null contents).  Trigger state (e.g. the
    DeltaTrigger register) is NOT purged, matching the reference.
    Requires ``df.withWatermark(ts_col, ...)`` upstream."""
    key_fields = [f for f in df.schema.fields if f.name in keys]
    out_schema = _fire_schema(key_fields)
    state_schema = T.StructType(
        [
            T.StructField("elem_w", T.ArrayType(T.LongType())),
            T.StructField("elem_ts", T.ArrayType(T.LongType())),
            T.StructField("elem_val", T.ArrayType(T.DoubleType())),
            T.StructField("aux_w", T.ArrayType(T.LongType())),
            T.StructField("aux_val", T.ArrayType(T.DoubleType())),
            T.StructField("max_final_us", T.LongType()),
        ]
    )
    size_us = size_s * 1_000_000
    proc_timeout = isinstance(trigger, ProcessingTimeoutTrigger)

    def agg_fire(w: int, ts: list[int], vals: list[float], kind: str) -> dict[str, Any]:
        if evictor is not None:
            ts, vals = evictor.evict(ts, vals)
        return _row(w, size_us, len(vals), sum(vals), kind)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        windows: dict[int, list[list]] = {}
        aux: dict[int, float | None] = {}
        max_final_us = -(1 << 62)
        if state.exists:
            st = state.get
            for w, t, v in zip(st[0], st[1], st[2]):
                windows.setdefault(w, [[], []])
                windows[w][0].append(t)
                windows[w][1].append(v)
            aux = dict(zip(st[3], st[4]))
            max_final_us = st[5]
        out: list[dict[str, Any]] = []

        if state.hasTimedOut and proc_timeout:
            for w in sorted(windows):
                out.append(agg_fire(w, windows[w][0], windows[w][1], "early"))

        if not state.hasTimedOut:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values([ts_col, id_col])
                for ts_us, v in zip(_ts_us(pdf[ts_col]), pdf[value_col].astype(float)):
                    ts_us, v = int(ts_us), float(v)
                    w = (ts_us // size_us) * size_us
                    if w < max_final_us:
                        continue
                    new = w not in windows
                    buf = windows.setdefault(w, [[], []])
                    buf[0].append(ts_us)
                    buf[1].append(v)
                    if isinstance(trigger, ContinuousEventTimeTrigger):
                        if new:
                            aux[w] = trigger.first_fire(ts_us)
                    elif trigger is not None and not proc_timeout:
                        fire, aux[w] = trigger.on_element(aux.get(w), len(buf[0]), v)
                        if fire:
                            out.append(agg_fire(w, buf[0], buf[1], "early"))
                            if purging:
                                buf[0].clear()
                                buf[1].clear()

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        for w in sorted(windows):
            if isinstance(trigger, ContinuousEventTimeTrigger):
                fire, aux[w] = trigger.on_watermark(aux.get(w) or 0.0, wm_us, w + size_us)
                if fire and w + size_us > wm_us:
                    out.append(agg_fire(w, windows[w][0], windows[w][1], "early"))
                    if purging:
                        windows[w][0].clear()
                        windows[w][1].clear()
            if w + size_us <= wm_us:
                buf = windows.pop(w)
                aux.pop(w, None)
                if buf[0] or not purging:
                    out.append(agg_fire(w, buf[0], buf[1], "final"))
                max_final_us = max(max_final_us, w + size_us)

        if windows:
            starts = sorted(windows)
            elem_w, elem_ts, elem_val = [], [], []
            for w in starts:
                for t, v in zip(windows[w][0], windows[w][1]):
                    elem_w.append(w)
                    elem_ts.append(t)
                    elem_val.append(v)
            aux_w = [w for w in starts if aux.get(w) is not None]
            state.update(
                (elem_w, elem_ts, elem_val, aux_w, [float(aux[w]) for w in aux_w], max_final_us)
            )
            if proc_timeout:
                # arm the timer only on data arrival: re-arming inside the
                # timeout callback would wake the query forever and keep
                # an availableNow drain from terminating
                if not state.hasTimedOut:
                    state.setTimeoutDuration(trigger.timeout_ms)
            else:
                nxt = [w + size_us for w in starts]
                if isinstance(trigger, ContinuousEventTimeTrigger):
                    nxt += [int(aux[w]) for w in aux_w]
                state.setTimeoutTimestamp(max(min(nxt) // 1000, wm_ms + 1))
        elif state.exists:
            state.remove()

        if out:
            res = pd.DataFrame(out)
            for f, kv in zip(key_fields, key):
                res[f.name] = kv
            yield res[[c.name for c in out_schema.fields]]

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if proc_timeout else GroupStateTimeout.EventTimeTimeout
    )
    return df.groupBy(*keys).applyInPandasWithState(fn, out_schema, state_schema, "append", timeout)

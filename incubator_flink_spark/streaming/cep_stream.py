"""Streaming CEP: the NFA executed incrementally over a keyed event
buffer (reference: CepOperator.java:81 — keyed buffer + watermark-driven
match emission).

Mechanics per key and micro-batch:
- new rows (already watermark-filtered by Spark) append to the buffer;
- rerunning the NFA over the time-sorted buffer yields a superset of the
  matches found before (matches are monotone in the event set), so a
  match is emitted exactly once: when its last event's timestamp first
  falls at or below the current watermark but was above the previous
  one;
- buffer rows older than (watermark - within) can no longer join any
  future event (future rows arrive above the watermark) and are pruned —
  state is O(events inside the pattern window) per key, the same bound
  as the reference's shared buffer after pruning.

Restriction: NO_SKIP match enumeration only (after-match skip needs
cross-batch match bookkeeping); patterns must set ``within`` so pruning
is sound. Event payloads ride in state as JSON (typed reconstruction via
the select function's own casts).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from datetime import datetime, timezone
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from incubator_flink_spark.cep.nfa import find_matches, find_timed_out_matches
from incubator_flink_spark.cep.pattern import NO_SKIP, Pattern


def match_pattern_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    pattern: Pattern,
    select_fn: Callable[[dict, dict[str, list[dict]]], dict],
    output_schema: str,
    tiebreak: str,
    timeout_fn: Callable[[dict, dict[str, list[dict]]], dict] | None = None,
) -> DataFrame:
    """Streaming match_pattern. ``df`` must carry a watermark on
    ``ts_col``; ``pattern.within_s`` is required (bounds state).

    ``timeout_fn`` (optional) is the timed-out-partial-match side output
    (reference: TimedOutPartialMatchHandler in CepOperator): when a
    partial match's window [first.ts, first.ts+within] expires under the
    advancing watermark without completing, ``timeout_fn(key_dict,
    partial_capture)`` emits one row into the same output (tag-column
    convention; filter-split downstream).  Like the reference's per-key
    event-time timers (CepOperator.onEventTime), the deadline is armed
    as a GroupStateTimeout.EventTimeTimeout timestamp at the earliest
    buffered event's expiry, so a SILENT key still surfaces its timeout
    when the watermark passes — the function re-fires with
    ``state.hasTimedOut`` and no input rows."""
    if pattern.within_s is None:
        raise ValueError("streaming CEP requires pattern.within(...) to bound state")
    if pattern.skip_strategy != NO_SKIP:
        raise ValueError("streaming CEP supports NO_SKIP only")
    key_fields = [f for f in df.schema.fields if f.name in keys]
    out_fields = output_schema  # DDL string
    state_schema = T.StructType(
        [
            T.StructField("ts_us", T.ArrayType(T.LongType())),
            T.StructField("rows", T.ArrayType(T.StringType())),
            T.StructField("last_wm_us", T.LongType()),
        ]
    )
    horizon_us = int(pattern.within_s * 1_000_000)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        ts_buf, rows_buf, last_wm = (
            (list(state.get[0]), list(state.get[1]), state.get[2]) if state.exists else ([], [], -(1 << 62))
        )
        for pdf in pdfs:
            if pdf.empty:
                continue
            for rec in pdf.to_dict("records"):
                us = int(pd.Timestamp(rec[ts_col]).value // 1000)
                rec[ts_col] = us  # store micros; rebuilt below
                rows_buf.append(json.dumps(rec, default=str))
                ts_buf.append(us)
        wm_us = state.getCurrentWatermarkMs() * 1000
        # sort buffer by (ts, tiebreak)
        order = sorted(range(len(ts_buf)), key=lambda i: (ts_buf[i], json.loads(rows_buf[i]).get(tiebreak, 0)))
        ts_buf = [ts_buf[i] for i in order]
        rows_buf = [rows_buf[i] for i in order]
        events = []
        for s in rows_buf:
            e = json.loads(s)
            e[ts_col] = datetime.fromtimestamp(e[ts_col] / 1e6, tz=timezone.utc).replace(tzinfo=None)
            events.append(e)
        key_dict = {f.name: kv for f, kv in zip(key_fields, key)}
        out: list[dict[str, Any]] = []
        for m in find_matches(pattern, events, ts_key=ts_col):
            last_ts = max(int(e[ts_col].timestamp() * 1_000_000) for v in m.values() for e in v)
            if last_wm < last_ts <= wm_us:
                out.append(select_fn(key_dict, m))
        if timeout_fn is not None and wm_us > 0:
            wm_dt = datetime.fromtimestamp(wm_us / 1e6, tz=timezone.utc).replace(tzinfo=None)
            for p in find_timed_out_matches(pattern, events, ts_key=ts_col, now=wm_dt):
                first_us = min(int(e[ts_col].timestamp() * 1_000_000) for v in p.values() for e in v)
                deadline = first_us + horizon_us
                # emit once: when the deadline first falls behind the watermark
                if last_wm <= deadline < wm_us:
                    out.append(timeout_fn(key_dict, p))
        # prune closed-and-unextendable events; keep the deadline==wm
        # boundary (not yet strictly expired) so its timeout can still fire
        keep = [i for i, t in enumerate(ts_buf) if t >= wm_us - horizon_us]
        if not keep:
            # buffer fully expired: every pending timeout has a deadline
            # behind the watermark and was emitted above — drop the state
            # row entirely (CepOperator clears its NFA state the same way)
            # instead of keeping an empty buffer per key forever
            if state.exists:
                state.remove()
            if out:
                yield pd.DataFrame(out)
            return
        state.update(([ts_buf[i] for i in keep], [rows_buf[i] for i in keep], max(last_wm, wm_us)))
        if timeout_fn is not None and keep:
            # arm the per-key timer at the earliest surviving deadline (the
            # reference's NFA timer); must be strictly ahead of the watermark
            next_deadline_ms = (min(ts_buf[i] for i in keep) + horizon_us) // 1000 + 1
            state.setTimeoutTimestamp(max(next_deadline_ms, wm_us // 1000 + 1))
        if out:
            yield pd.DataFrame(out)

    mode = GroupStateTimeout.EventTimeTimeout if timeout_fn is not None else GroupStateTimeout.NoTimeout
    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_fields, state_schema, "append", mode
    )

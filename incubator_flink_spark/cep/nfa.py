"""NFA pattern matcher over a time-sorted event list (reference:
flink-cep/.../nfa/NFA.java, 1111 LoC — ours is a compact backtracking
matcher over the linear Stage sequence, which covers the Pattern surface
in pattern.py without the reference's shared-buffer machinery).

Semantics implemented (mirroring the reference's documented behavior):
- STRICT contiguity: the stage's first event must be the event
  immediately after the previous stage's last event; within a
  multi-`times` stage the repeats are also contiguous.
- RELAXED contiguity: any number of non-matching events may be skipped
  before each accepted event.
- Quantifiers: times(n,m), one_or_more (unbounded), optional. Under
  NO_SKIP every repetition count is emitted; under SKIP_PAST_LAST_EVENT
  the earliest-starting, shortest match wins — the reference's reluctant
  default (greedy() is opt-in there and not implemented here).
- Negated stages (notNext / notFollowedBy): no matching event may occur
  at the required position (strict) / anywhere before the next stage's
  match (relaxed). A trailing notFollowedBy is checked to end-of-stream.
- within: last_event.ts - first_event.ts <= window.
- After-match skip: NO_SKIP emits every match combination;
  SKIP_PAST_LAST_EVENT restarts after the previous match's last index.
"""

from __future__ import annotations

from incubator_flink_spark.cep.pattern import NO_SKIP, RELAXED, STRICT, Pattern, Stage


def _stage_matches(
    stages: list[Stage],
    si: int,
    events: list[dict],
    start_idx: int,
    first_ts,
    within_s: float | None,
    ts_key: str,
):
    """Yield (next_idx, captured) for stage si starting at start_idx.
    captured: list of event indices taken by this stage."""
    stage = stages[si]

    def in_window(idx: int, ref_ts=None) -> bool:
        ref = first_ts if first_ts is not None else ref_ts
        if within_s is None or ref is None:
            return True
        return (events[idx][ts_key] - ref).total_seconds() <= within_s

    if stage.negated:
        # negative stage captures nothing; it constrains the region between
        # the previous match position and the next positive match.
        yield (start_idx, [])
        return

    if stage.optional:
        yield (start_idx, [])

    max_t = stage.max_times if stage.max_times != -1 else len(events)

    if stage.contiguity == STRICT:
        # must start exactly at start_idx, repeats contiguous
        taken: list[int] = []
        idx = start_idx
        ref = None
        while idx < len(events) and len(taken) < max_t and stage.accepts(events[idx]) and in_window(idx, ref):
            taken.append(idx)
            if ref is None:
                ref = events[taken[0]][ts_key]
            idx += 1
            if len(taken) >= stage.min_times:
                yield (idx, list(taken))
    else:
        # relaxed: choose any first index >= start_idx; repeats may skip
        def extend(taken: list[int], idx: int):
            ref = events[taken[0]][ts_key]
            if len(taken) >= stage.min_times:
                yield (taken[-1] + 1, list(taken))
            if len(taken) >= max_t:
                return
            j = idx
            while j < len(events):
                if stage.accepts(events[j]) and in_window(j, ref):
                    yield from extend(taken + [j], j + 1)
                j += 1

        j = start_idx
        while j < len(events):
            if stage.accepts(events[j]) and in_window(j):
                yield from extend([j], j + 1)
            j += 1


def _violates_negation(stage: Stage, events: list[dict], lo: int, hi: int, strict_pos: int | None) -> bool:
    """True if a negated stage's predicate fires in the forbidden region.
    strict (notNext): only position strict_pos matters; relaxed
    (notFollowedBy): any position in [lo, hi)."""
    if stage.contiguity == STRICT:
        return strict_pos is not None and strict_pos < len(events) and stage.accepts(events[strict_pos])
    return any(stage.accepts(events[i]) for i in range(lo, hi))


def find_matches(pattern: Pattern, events: list[dict], ts_key: str = "ts") -> list[dict[str, list[dict]]]:
    """All matches of `pattern` over time-sorted `events`; each match maps
    stage name → captured events (in order)."""
    stages = pattern.stages
    matches: list[tuple[int, int, dict]] = []  # (first_idx, last_idx, capture)

    def search(si: int, start_idx: int, first_ts, capture: dict, last_idx: int):
        if si == len(stages):
            idxs = capture.get("__idx", [])
            if idxs:
                matches.append((min(idxs), max(idxs), dict(capture)))
            return
        stage = stages[si]
        if stage.negated:
            search_negated(si, start_idx, first_ts, capture, last_idx)
            return
        for nxt, taken in _stage_matches(stages, si, events, start_idx, first_ts, pattern.within_s, ts_key):
            f_ts = first_ts
            if taken and f_ts is None:
                f_ts = events[taken[0]][ts_key]
            if taken and si > 0 and stage.contiguity == STRICT and start_idx != taken[0]:
                continue
            cap = dict(capture)
            cap[stage.name] = [events[i] for i in taken]
            cap.setdefault("__idx", []).extend(taken)
            search(si + 1, nxt, f_ts, cap, taken[-1] if taken else last_idx)

    def search_negated(si: int, start_idx: int, first_ts, capture: dict, last_idx: int):
        neg = stages[si]
        rest = si + 1
        if rest == len(stages):
            # trailing negation: forbidden anywhere to end of stream
            if not _violates_negation(neg, events, start_idx, len(events), start_idx):
                search(rest, start_idx, first_ts, capture, last_idx)
            return
        # find each match of the remaining pattern and check the gap region
        nxt_stage = stages[rest]
        for nxt, taken in _stage_matches(stages, rest, events, start_idx, first_ts, pattern.within_s, ts_key):
            if not taken:
                continue
            region_hi = taken[0]
            if _violates_negation(neg, events, start_idx, region_hi, start_idx):
                continue
            f_ts = first_ts if first_ts is not None else events[taken[0]][ts_key]
            cap = dict(capture)
            cap[nxt_stage.name] = [events[i] for i in taken]
            cap.setdefault("__idx", []).extend(taken)
            search(rest + 1, nxt, f_ts, cap, taken[-1])

    search(0, 0, None, {}, -1)

    # deduplicate identical captures (relaxed enumeration can revisit)
    seen = set()
    uniq = []
    for first_i, last_i, cap in matches:
        key = tuple(sorted((k, tuple(id(e) for e in v)) for k, v in cap.items() if k != "__idx"))
        if key not in seen:
            seen.add(key)
            uniq.append((first_i, last_i, cap))
    uniq.sort(key=lambda m: (m[0], m[1]))

    if pattern.skip_strategy == NO_SKIP:
        return [{k: v for k, v in cap.items() if k != "__idx"} for _, _, cap in uniq]
    # SKIP_PAST_LAST_EVENT: greedily take non-overlapping matches in order
    out = []
    cursor = -1
    for first_i, last_i, cap in uniq:
        if first_i > cursor:
            out.append({k: v for k, v in cap.items() if k != "__idx"})
            cursor = last_i
    return out

"""NFA pattern matcher over a time-sorted event list (reference:
flink-cep/.../nfa/NFA.java, 1111 LoC — ours is a compact backtracking
matcher over the linear Stage sequence, which covers the Pattern surface
in pattern.py without the reference's shared-buffer machinery).

Semantics implemented (mirroring the reference's documented behavior):
- STRICT contiguity: the stage's first event must be the event
  immediately after the previous stage's last event; within a
  multi-`times` stage the repeats are also contiguous.
- RELAXED contiguity (followedBy / SKIP_TILL_NEXT): non-matching events
  may be skipped before each accepted event, but an event MATCHING the
  stage cannot be skipped (NFACompiler getIgnoreCondition =
  NOT(takeCondition)) — ``a followedBy b`` on ``a b1 b2`` matches only
  {a, b1}.  RELAXED_ANY (followedByAny / SKIP_TILL_ANY) may also skip
  matching events.  Stage 0 starts a fresh computation at every event.
- Quantifiers: times(n,m), one_or_more (unbounded), optional. Under
  NO_SKIP every repetition count is emitted (reluctant default); with
  greedy() a looping stage consumes maximally per run and shorter
  prefixes of that run are not emitted (like the reference, greedy does
  not backtrack when the maximal consumption starves later stages).
- until(cond): the looping stage stops scanning at the first event where
  the condition fires; that event is not consumed
  (Pattern.java:500 untilCondition).
- Iterative conditions: predicates registered with where_iterative get
  (event, ctx); ctx.get_events_for_pattern(name) returns the events
  accepted so far in this partial match for stage `name`, including
  earlier repeats of the stage being evaluated
  (conditions/IterativeCondition.java:63 getEventsForPattern).
- Negated stages (notNext / notFollowedBy): no matching event may occur
  at the required position (strict) / anywhere before the next stage's
  match (relaxed). A trailing notFollowedBy is checked to end-of-stream.
- within: last_event.ts - first_event.ts <= window.
- After-match skip (nfa/aftermatch/AfterMatchSkipStrategy.java):
  NO_SKIP emits every match combination; SKIP_TO_NEXT keeps only the
  first match per start event (SkipToNextStrategy.java:30);
  SKIP_PAST_LAST_EVENT restarts after the previous match's last index;
  SKIP_TO_FIRST(p)/SKIP_TO_LAST(p) discard matches starting before the
  first/last event mapped to stage p of the previously emitted match.
"""

from __future__ import annotations

from incubator_flink_spark.cep.pattern import (
    NO_SKIP,
    RELAXED,
    RELAXED_ANY,
    SKIP_PAST_LAST_EVENT,
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
    SKIP_TO_NEXT,
    STRICT,
    Pattern,
    Stage,
)


class Context:
    """IterativeCondition.Context analog: read access to the events
    accepted so far in the current partial match, plus MATCH_RECOGNIZE
    row-pattern navigation (PREV/NEXT over the ordered partition —
    MatchCodeGenerator's prev/next offsets)."""

    __slots__ = ("_capture", "_stage_name", "_stage_taken", "_events", "_idx")

    def __init__(
        self,
        capture: dict,
        stage_name: str,
        stage_taken: list[dict],
        events: list[dict] | None = None,
        idx: int | None = None,
    ):
        self._capture = capture
        self._stage_name = stage_name
        self._stage_taken = stage_taken
        self._events = events
        self._idx = idx

    def get_events_for_pattern(self, name: str) -> list[dict]:
        if name == self._stage_name:
            return list(self._capture.get(name, [])) + list(self._stage_taken)
        return list(self._capture.get(name, []))

    def prev(self, n: int = 1) -> dict | None:
        """PREV(expr, n): the row n positions before the current row in
        the ordered partition (None past the partition start)."""
        if self._events is None or self._idx is None or self._idx - n < 0:
            return None
        return self._events[self._idx - n]

    def ahead(self, n: int = 1) -> dict | None:
        """NEXT(expr, n): the row n positions after the current row
        (None past the partition end)."""
        if self._events is None or self._idx is None or self._idx + n >= len(self._events):
            return None
        return self._events[self._idx + n]


def _stage_matches(
    stage: Stage,
    is_start: bool,
    events: list[dict],
    start_idx: int,
    first_ts,
    within_s: float | None,
    ts_key: str,
    capture: dict,
):  # noqa: C901
    """Yield (next_idx, captured) for a scalar stage starting its scan at
    start_idx; captured: list of event indices taken by this stage.
    ``is_start`` marks the pattern's start state (a fresh computation
    begins at every event, so relaxed scanning never dies)."""

    def in_window(idx: int, ref_ts=None) -> bool:
        ref = first_ts if first_ts is not None else ref_ts
        if within_s is None or ref is None:
            return True
        return (events[idx][ts_key] - ref).total_seconds() <= within_s

    def ctx_for(taken: list[int], idx: int | None = None) -> Context:
        return Context(capture, stage.name, [events[i] for i in taken], events, idx)

    if stage.negated:
        # negative stage captures nothing; it constrains the region between
        # the previous match position and the next positive match.
        yield (start_idx, [])
        return

    if stage.optional:
        yield (start_idx, [])

    max_t = stage.max_times if stage.max_times != -1 else len(events)

    if stage.contiguity == STRICT:
        # repeats contiguous; the run starts exactly at start_idx — UNLESS
        # this stage is the computation's effective START (stage 0, or
        # every earlier optional stage took nothing): the start state
        # opens a computation at EVERY event, so contiguity binds the
        # repeats, not the (nonexistent) previous stage
        def strict_runs(s: int):
            taken: list[int] = []
            idx = s
            ref = None
            collected = []
            while idx < len(events) and len(taken) < max_t and in_window(idx, ref):
                ctx = ctx_for(taken, idx)
                if stage.until_fires(events[idx], ctx) or not stage.accepts(events[idx], ctx):
                    break
                taken.append(idx)
                if ref is None:
                    ref = events[taken[0]][ts_key]
                idx += 1
                if len(taken) >= stage.min_times:
                    collected.append((idx, list(taken)))
            if stage.greedy and collected:
                yield collected[-1]  # maximal consumption only
            else:
                yield from collected

        if is_start:
            for s in range(start_idx, len(events)):
                yield from strict_runs(s)
        else:
            yield from strict_runs(start_idx)
    else:
        # relaxed: choose any first index >= start_idx; between repeats the
        # loop skips NON-matching events only (the reference's relaxed
        # consuming strategy) unless allow_combinations() opts into
        # skipping matching events too (SKIP_TILL_ANY). greedy: only the
        # maximal extension of each run is yielded. until: the scan for
        # further repeats stops at the first event where the until
        # condition fires.  Explicit stack, not recursion: a hot key with
        # a run of thousands of contiguous repeats must not trip Python's
        # recursion limit (one stack entry per accepted repeat).
        def extend(taken0: list[int], idx0: int):
            stack = [(taken0, idx0)]
            while stack:
                taken, idx = stack.pop()
                ref = events[taken[0]][ts_key]
                extended = False
                if len(taken) < max_t:
                    j = idx
                    while j < len(events):
                        ctx = ctx_for(taken, j)
                        if stage.until_fires(events[j], ctx):
                            break
                        if stage.accepts(events[j], ctx):
                            if in_window(j, ref):
                                extended = True
                                stack.append((taken + [j], j + 1))
                            if not stage.combinations:
                                break  # a matching event cannot be skipped
                        elif stage.inner_strict:
                            # consecutive(): repeats strictly contiguous — a
                            # non-matching event at the next position ends
                            # the run (Pattern.java consecutive:477)
                            break
                        j += 1
                if len(taken) >= stage.min_times and not (stage.greedy and extended):
                    yield (taken[-1] + 1, list(taken))

        j = start_idx
        while j < len(events):
            ctx = ctx_for([], j)
            if stage.until_fires(events[j], ctx):
                if not is_start:
                    # within a computation the looping state can neither
                    # take nor ignore an until-firing event
                    # (NFACompiler.java:683,847: take/ignore are guarded
                    # with NOT(until)) — the scan dies here
                    break
                # start state: a fresh NFA computation starts at every
                # later event (the start state restarts per event); only
                # THIS event is excluded as a start
                j += 1
                continue
            if stage.accepts(events[j], ctx):
                if in_window(j):
                    yield from extend([j], j + 1)
                if not is_start and stage.contiguity == RELAXED:
                    # SKIP_TILL_NEXT (followedBy): the IGNORE edge is
                    # NOT(takeCondition) (NFACompiler.java
                    # getIgnoreCondition:923) — an event matching this
                    # stage cannot be skipped, so no later start exists
                    # for this computation.  RELAXED_ANY (followedByAny)
                    # and the start state (per-event computation starts)
                    # keep scanning.
                    break
            j += 1


def _merge_until(a, b):
    """OR of two until conditions (a group's until layered onto an inner
    stage that may carry its own)."""
    from incubator_flink_spark.cep.pattern import Cond

    if a is None:
        return b
    if b is None:
        return a

    def fire(e, ctx, _a=a, _b=b):
        fa = _a.pred(e, ctx) if _a.iterative else _a.pred(e)
        fb = _b.pred(e, ctx) if _b.iterative else _b.pred(e)
        return fa or fb

    return Cond(fire, iterative=True)


def _group_matches(
    stage: Stage,
    is_start: bool,
    events: list[dict],
    start_idx: int,
    first_ts,
    within_s: float | None,
    ts_key: str,
    capture: dict,
):
    """Yield (next_idx, taken_map) for a GROUP stage (GroupPattern.java:30;
    NFACompiler createGroupPatternState / createLoopingGroupPatternState).

    One iteration = one full match of the inner linear stage sequence.
    The group's ENTRY contiguity governs the first event of iteration 1;
    between iterations the group's loop contiguity applies
    (consecutive → STRICT, allowCombinations → SKIP_TILL_ANY, default
    SKIP_TILL_NEXT against the iteration's first taking stage).  Inner
    stages keep their own contiguity/quantifiers within an iteration —
    including NESTED group stages (the reference compiles group bodies
    recursively: NFACompiler createGroupPatternState calls back into the
    generic state construction, so ``((a b)+ c)+`` is legal); nesting
    recurses through _matches_for.  A group-level until() guards EVERY
    inner stage's take/ignore (NFACompiler getTakeCondition:950/
    getIgnoreCondition:932 extend with NOT(until) while compiling a group
    body), so the sub-automaton's consumption stops at the first
    until-firing event; across nesting levels untils compose by OR (an
    outer group's until also stops every nested sub-automaton).
    taken_map accumulates inner LEAF stage name → event indices across
    iterations (group stage names never capture)."""
    from dataclasses import replace

    sub = stage.sub_stages
    max_t = stage.max_times if stage.max_times != -1 else len(events)
    if stage.inner_strict:
        loop_contig = STRICT
    elif stage.combinations:
        loop_contig = RELAXED_ANY
    else:
        loop_contig = RELAXED

    if stage.optional:
        yield (start_idx, {})

    def one_iteration(pos, entry_contig, entry_is_start, f_ts, cap):
        """Yield (next_idx, iter_map, first_ts') for ONE inner match.
        The entry contiguity override applies to the first inner stage
        that actually takes an event (earlier optional stages may be
        skipped with the override still pending)."""

        def dfs(k, p, ft, cap_k, m, pending):
            if k == len(sub):
                if any(m.values()):
                    yield (p, m, ft)
                return
            st = sub[k]
            eff = replace(st, contiguity=entry_contig) if pending else st
            if stage.until_cond is not None:
                eff = replace(eff, until_cond=_merge_until(st.until_cond, stage.until_cond))
            for nxt, tmap in _matches_for(
                eff, entry_is_start and pending, events, p, ft, within_s, ts_key, cap_k
            ):
                all_i = sorted(i for v in tmap.values() for i in v)
                ft2 = ft
                if all_i and ft2 is None:
                    ft2 = events[all_i[0]][ts_key]
                cap2 = dict(cap_k)
                m2 = dict(m)
                for name, idxs in tmap.items():
                    cap2[name] = cap2.get(name, []) + [events[i] for i in idxs]
                    m2[name] = m2.get(name, []) + list(idxs)
                yield from dfs(k + 1, nxt, ft2, cap2, m2, pending and not all_i)

        yield from dfs(0, pos, f_ts, cap, {}, True)

    # explicit stack, not recursion: a hot key with thousands of
    # contiguous iterations (× inner-stage frames) must not trip Python's
    # recursion limit — one stack entry per group iteration, DFS depth
    # now bounded by the pattern's stage count only (ADVICE r7)
    stack = [(start_idx, first_ts, dict(capture), {}, 0)]
    while stack:
        pos, f_ts, cap, acc, count = stack.pop()
        if count >= stage.min_times and count > 0:
            yield (pos, {k: list(v) for k, v in acc.items()})
        if count >= max_t:
            continue
        contig = stage.contiguity if count == 0 else loop_contig
        for nxt, m, ft2 in one_iteration(
            pos, contig, is_start and count == 0, f_ts, cap
        ):
            cap2 = dict(cap)
            acc2 = {k: list(v) for k, v in acc.items()}
            for name, idxs in m.items():
                cap2[name] = cap2.get(name, []) + [events[i] for i in idxs]
                acc2[name] = acc2.get(name, []) + list(idxs)
            stack.append((nxt, ft2, cap2, acc2, count + 1))


def _group_partial_captures(
    stage: Stage,
    is_start: bool,
    events: list[dict],
    start_idx: int,
    first_ts,
    within_s: float | None,
    ts_key: str,
    capture: dict,
):
    """Partial capture maps for an INCOMPLETE group stage (the timeout
    side output's view into a sub-automaton): iteration prefixes below
    the quantifier minimum AND partial progress inside an iteration
    (inner stages captured so far).  These states are dead ends — they
    never resume into later pattern stages — and are consumed only by
    find_timed_out_matches to surface the deepest timed-out capture."""
    from dataclasses import replace

    sub = stage.sub_stages
    max_t = stage.max_times if stage.max_times != -1 else len(events)
    if stage.inner_strict:
        loop_contig = STRICT
    elif stage.combinations:
        loop_contig = RELAXED_ANY
    else:
        loop_contig = RELAXED

    def one_iter_states(pos, entry_contig, entry_is_start, f_ts, cap):
        """Yield (iter_map, next_idx, first_ts', complete)."""

        def dfs(k, p, ft, cap_k, m, pending):
            if k == len(sub):
                if any(m.values()):
                    yield (m, p, ft, True)
                return
            if any(m.values()):
                yield (m, p, ft, False)  # prefix: inner stages 0..k-1 only
            st = sub[k]
            eff = replace(st, contiguity=entry_contig) if pending else st
            if stage.until_cond is not None:
                eff = replace(eff, until_cond=_merge_until(st.until_cond, stage.until_cond))
            if st.sub_stages is not None:
                # a NESTED group can itself be mid-iteration when the
                # window expires: surface its partial capture maps too
                for acc_n in _group_partial_captures(
                    eff, entry_is_start and pending, events, p, ft, within_s, ts_key, cap_k
                ):
                    m2 = dict(m)
                    for name, idxs in acc_n.items():
                        m2[name] = m2.get(name, []) + list(idxs)
                    if any(m2.values()):
                        yield (m2, p, ft, False)
            for nxt, tmap in _matches_for(
                eff, entry_is_start and pending, events, p, ft, within_s, ts_key, cap_k
            ):
                all_i = sorted(i for v in tmap.values() for i in v)
                ft2 = ft
                if all_i and ft2 is None:
                    ft2 = events[all_i[0]][ts_key]
                cap2 = dict(cap_k)
                m2 = dict(m)
                for name, idxs in tmap.items():
                    cap2[name] = cap2.get(name, []) + [events[i] for i in idxs]
                    m2[name] = m2.get(name, []) + list(idxs)
                yield from dfs(k + 1, nxt, ft2, cap2, m2, pending and not all_i)

        yield from dfs(0, pos, f_ts, cap, {}, True)

    # explicit stack (same recursion-limit rationale as _group_matches)
    stack = [(start_idx, first_ts, dict(capture), {}, 0)]
    while stack:
        pos, f_ts, cap, acc, count = stack.pop()
        contig = stage.contiguity if count == 0 else loop_contig
        for m, nxt, ft2, complete in one_iter_states(
            pos, contig, is_start and count == 0, f_ts, cap
        ):
            acc2 = {k: list(v) for k, v in acc.items()}
            for name, idxs in m.items():
                acc2[name] = acc2.get(name, []) + list(idxs)
            yield acc2
            if complete and count + 1 < max_t:
                cap2 = dict(cap)
                for name, idxs in m.items():
                    cap2[name] = cap2.get(name, []) + [events[i] for i in idxs]
                stack.append((nxt, ft2, cap2, acc2, count + 1))


def _matches_for(
    stage: Stage,
    is_start: bool,
    events: list[dict],
    start_idx: int,
    first_ts,
    within_s: float | None,
    ts_key: str,
    capture: dict,
):
    """Uniform stage-match generator: yields (next_idx, taken_map) for
    scalar and group stages alike (taken_map: stage name → indices)."""
    if stage.sub_stages is not None:
        yield from _group_matches(
            stage, is_start, events, start_idx, first_ts, within_s, ts_key, capture
        )
    else:
        for nxt, taken in _stage_matches(
            stage, is_start, events, start_idx, first_ts, within_s, ts_key, capture
        ):
            yield nxt, {stage.name: list(taken)}


def _leaf_names(stages: list[Stage], include_negated: bool) -> list[str]:
    """Scalar (capturing) stage names in declaration order, recursing
    through nested group bodies; group stage names themselves never
    capture and are excluded."""
    names: list[str] = []
    for s in stages:
        if s.sub_stages is not None:
            names.extend(_leaf_names(s.sub_stages, include_negated))
        elif include_negated or not s.negated:
            names.append(s.name)
    return names


def _violates_negation(
    stage: Stage,
    events: list[dict],
    lo: int,
    hi: int,
    strict_pos: int | None,
    first_ts=None,
    within_s: float | None = None,
    ts_key: str = "ts",
) -> bool:
    """True if a negated stage's predicate fires in the forbidden region.
    strict (notNext): only position strict_pos matters; relaxed
    (notFollowedBy): any position in [lo, hi).

    The region is additionally bounded by the pattern WINDOW (reference:
    NFACompiler's NOT_FOLLOW STOP states belong to the same NFA
    computation, which dies when [first.ts, first.ts + within] expires —
    a negated event arriving AFTER the window closed cannot stop a match
    that was already emitted at window expiry).  first_ts None (nothing
    captured yet) or within None leaves the region unbounded."""

    def in_window(i: int) -> bool:
        if within_s is None or first_ts is None:
            return True
        return (events[i][ts_key] - first_ts).total_seconds() <= within_s

    if stage.contiguity == STRICT:
        return (
            strict_pos is not None
            and strict_pos < len(events)
            and in_window(strict_pos)
            and stage.accepts(events[strict_pos])
        )
    return any(in_window(i) and stage.accepts(events[i]) for i in range(lo, hi))


def _enumerate(pattern: Pattern, events: list[dict], ts_key: str = "ts"):
    """All unique matches as (first_idx, last_idx, capture, stage_idxs),
    sorted by position — shared by find_matches (which applies the
    after-match skip strategy) and find_timed_out_matches (which needs
    the set of completed start indices)."""
    stages = pattern.stages
    all_names = _leaf_names(stages, include_negated=True)
    if len(set(all_names)) != len(all_names):
        # the reference throws MalformedPatternException on ANY duplicate
        # stage name (NFACompiler checkPatternNameUniqueness) — raising
        # unconditionally avoids silent append-capture semantics (ADVICE r7)
        raise ValueError(f"duplicate stage names in pattern: {all_names}")
    capture_names = _leaf_names(stages, include_negated=False)
    matches: list[tuple[int, int, dict, dict]] = []  # (first, last, capture, stage_idxs)

    def merge(capture: dict, stage_idxs: dict, tmap: dict):
        cap = dict(capture)
        sidx = dict(stage_idxs)
        for name, idxs in tmap.items():
            cap[name] = cap.get(name, []) + [events[i] for i in idxs]
            sidx[name] = sidx.get(name, []) + list(idxs)
        return cap, sidx

    def search(si: int, start_idx: int, first_ts, capture: dict, stage_idxs: dict, last_idx: int, fresh: bool):
        """``fresh``: no stage has captured anything yet (stage 0, or every
        earlier optional stage took nothing) — the current stage is then
        the computation's effective START STATE: it opens at every event
        (relaxed scans never die, strict runs start anywhere)."""
        if si == len(stages):
            idxs = [i for v in stage_idxs.values() for i in v]
            if idxs:
                matches.append((min(idxs), max(idxs), dict(capture), dict(stage_idxs)))
            return
        stage = stages[si]
        if stage.negated:
            search_negated(si, start_idx, first_ts, capture, stage_idxs, last_idx, fresh)
            return
        for nxt, tmap in _matches_for(
            stage, fresh, events, start_idx, first_ts, pattern.within_s, ts_key, capture
        ):
            all_idx = sorted(i for v in tmap.values() for i in v)
            f_ts = first_ts
            if all_idx and f_ts is None:
                f_ts = events[all_idx[0]][ts_key]
            if (
                all_idx
                and not fresh
                and stage.contiguity == STRICT
                and stage.sub_stages is None
                and start_idx != all_idx[0]
            ):
                continue
            cap, sidx = merge(capture, stage_idxs, tmap)
            search(
                si + 1, nxt, f_ts, cap, sidx,
                all_idx[-1] if all_idx else last_idx, fresh and not all_idx,
            )

    def search_negated(si: int, start_idx: int, first_ts, capture: dict, stage_idxs: dict, last_idx: int, fresh: bool):
        neg = stages[si]
        rest = si + 1
        if rest == len(stages):
            # trailing negation: forbidden to end of stream, BOUNDED by the
            # pattern window (a not-event beyond first.ts + within arrives
            # after the reference NFA emitted the match at window expiry)
            if not _violates_negation(
                neg, events, start_idx, len(events), start_idx,
                first_ts, pattern.within_s, ts_key,
            ):
                search(rest, start_idx, first_ts, capture, stage_idxs, last_idx, fresh)
            return
        # find each match of the remaining pattern and check the gap region
        nxt_stage = stages[rest]
        for nxt, tmap in _matches_for(
            nxt_stage, False, events, start_idx, first_ts, pattern.within_s, ts_key, capture
        ):
            all_idx = sorted(i for v in tmap.values() for i in v)
            if not all_idx:
                continue
            region_hi = all_idx[0]
            f_ts0 = first_ts if first_ts is not None else events[all_idx[0]][ts_key]
            if _violates_negation(
                neg, events, start_idx, region_hi, start_idx,
                f_ts0, pattern.within_s, ts_key,
            ):
                continue
            f_ts = first_ts if first_ts is not None else events[all_idx[0]][ts_key]
            cap, sidx = merge(capture, stage_idxs, tmap)
            search(rest + 1, nxt, f_ts, cap, sidx, all_idx[-1], False)

    search(0, 0, None, {}, {}, -1, True)

    # deduplicate identical captures (relaxed enumeration can revisit)
    seen = set()
    uniq = []
    for first_i, last_i, cap, sidx in matches:
        key = tuple(sorted((k, tuple(v)) for k, v in sidx.items()))
        if key not in seen:
            seen.add(key)
            uniq.append((first_i, last_i, cap, sidx))
    # total deterministic order: (first, last) then the stage-ordered
    # capture index tuples (inner group names in declaration order) —
    # ties on (first, last) are real (e.g. a loop emitting (1,) and
    # (1,2) that both complete with the same suffix) and the after-match
    # skip cursor depends on which is seen first
    stage_order = capture_names
    uniq.sort(
        key=lambda m: (m[0], m[1], tuple(tuple(m[3].get(nm, ())) for nm in stage_order))
    )
    return uniq


def find_matches(pattern: Pattern, events: list[dict], ts_key: str = "ts") -> list[dict[str, list[dict]]]:
    """All matches of `pattern` over time-sorted `events`; each match maps
    stage name → captured events (in order)."""
    uniq = _enumerate(pattern, events, ts_key)

    if pattern.skip_strategy == NO_SKIP:
        return [cap for _, _, cap, _ in uniq]

    # prune runs per AfterMatchSkipStrategy: discard matches starting
    # before the cursor; emitted matches advance the cursor.
    out = []
    cursor = 0
    for first_i, last_i, cap, sidx in uniq:
        if first_i < cursor:
            continue
        out.append(cap)
        if pattern.skip_strategy == SKIP_TO_NEXT:
            # SkipToNextStrategy.java:30 — discard every other match
            # starting with the same event as the emitted one
            cursor = first_i + 1
        elif pattern.skip_strategy == SKIP_PAST_LAST_EVENT:
            cursor = last_i + 1
        elif pattern.skip_strategy == SKIP_TO_FIRST:
            idxs = sidx.get(pattern.skip_stage, [])
            cursor = max(cursor, min(idxs)) if idxs else cursor
        elif pattern.skip_strategy == SKIP_TO_LAST:
            idxs = sidx.get(pattern.skip_stage, [])
            cursor = max(cursor, max(idxs)) if idxs else cursor
    return out


def find_timed_out_matches(
    pattern: Pattern, events: list[dict], ts_key: str = "ts", now=None
) -> list[dict[str, list[dict]]]:
    """Timed-out partial matches (reference: CepOperator's
    TimedOutPartialMatchHandler — partial matches pruned on pattern-window
    expiry surface on the timeout side output; PatternStream.flatSelect
    timeout variant).

    A start event opens a partial match if it is accepted as the first
    captured event of stage 0. For each start that (a) never completes to
    a full match over `events` and (b) whose window [start.ts,
    start.ts + within] has expired by `now` (None = bounded input
    exhausted, i.e. watermark at +inf — every incomplete partial is
    expired), the DEEPEST partial capture reachable from that start is
    returned (most completed stages, then most captured events).

    Divergence from the reference (documented): the reference times out
    each NFA computation-state branch individually; we emit one maximal
    partial per expired start event, and a start that participates in any
    complete match emits no timeout.

    Cost bound: one exhaustive DFS per expired start on top of the
    _enumerate pass — worst case O(starts x branching^stages) per key
    group for dense self-matching patterns, though ``within`` confines
    each DFS to the events inside the start's window (the same window
    bound the reference's NFA state obeys).  Acceptable because timeout
    extraction runs once per key group on the (small) expired remainder,
    not on the hot match path; if a pattern makes this bite, narrow
    ``within`` or tighten the stage-0 predicate, which prunes starts.
    """
    if pattern.within_s is None:
        return []  # no window → partials never time out (reference: no timer)
    stages = pattern.stages
    completed = {first_i for first_i, _, _, _ in _enumerate(pattern, events, ts_key)}
    out: list[dict[str, list[dict]]] = []

    # a partial opens at event i when any OPENER stage accepts it — the
    # openers walk the (possibly nested) stage list past optional stages
    # (ADVICE r7: a group whose first inner stage is optional can open a
    # partial via the second inner stage)
    openers = _openers(stages)
    for i in range(len(events)):
        if i in completed:
            continue
        if not any(
            st.accepts(events[i], Context({}, st.name, [], events, i)) for st in openers
        ):
            continue
        start_ts = events[i][ts_key]
        if now is not None and (now - start_ts).total_seconds() <= pattern.within_s:
            continue  # window still open; may yet complete
        best: dict = {"depth": 0, "events": 0, "cap": None}
        start_i = i

        def bump(si, n_ev, capture, min_taken):
            if (
                min_taken == start_i
                and n_ev > 0
                and (si, n_ev) > (best["depth"], best["events"])
            ):
                best.update(depth=si, events=n_ev, cap=dict(capture))

        def dfs(si: int, start_idx: int, first_ts, capture: dict, nevents: int, min_taken):
            """min_taken: index of the partial's first captured event
            (None while nothing captured) — the partial is pinned to
            start_i by requiring min_taken == start_i at scoring time,
            which lets optional leading stages take nothing."""
            bump(si, nevents, capture, min_taken)
            if si >= len(stages):
                return
            stage = stages[si]
            if stage.negated:
                # negation constrains full matches; partials pass through
                dfs(si + 1, start_idx, first_ts, capture, nevents, min_taken)
                return
            if stage.sub_stages is not None:
                # a sub-automaton can time out MID-GROUP: surface partial
                # iteration progress as capture depth (dead-end states —
                # they never resume into later stages)
                for acc in _group_partial_captures(
                    stage, min_taken is None, events, start_idx, first_ts, pattern.within_s, ts_key, capture
                ):
                    p_idx = sorted(j for v in acc.values() for j in v)
                    if min_taken is None and (not p_idx or p_idx[0] != start_i):
                        continue
                    mt = min_taken if min_taken is not None else p_idx[0]
                    ncap = dict(capture)
                    for name, idxs in acc.items():
                        ncap[name] = ncap.get(name, []) + [events[j] for j in idxs]
                    bump(si, nevents + len(p_idx), ncap, mt)
            for nxt, tmap in _matches_for(
                stage, min_taken is None, events, start_idx, first_ts, pattern.within_s, ts_key, capture
            ):
                all_idx = sorted(j for v in tmap.values() for j in v)
                if min_taken is None and all_idx and all_idx[0] != start_i:
                    continue  # pin the partial to this start event
                if (
                    all_idx
                    and min_taken is not None
                    and stage.contiguity == STRICT
                    and stage.sub_stages is None
                    and start_idx != all_idx[0]
                ):
                    continue
                f_ts = first_ts
                if all_idx and f_ts is None:
                    f_ts = events[all_idx[0]][ts_key]
                mt = min_taken
                if mt is None and all_idx:
                    mt = all_idx[0]
                cap = dict(capture)
                for name, idxs in tmap.items():
                    cap[name] = cap.get(name, []) + [events[j] for j in idxs]
                dfs(si + 1, nxt, f_ts, cap, nevents + len(all_idx), mt)

        dfs(0, i, None, {}, 0, None)
        if best["cap"]:
            out.append(best["cap"])
    return out


def _openers(stages: list[Stage]) -> list[Stage]:
    """Stages whose acceptance of an event can OPEN a partial match:
    collect stages (recursing into group bodies) until the first
    non-optional positive stage, inclusive — optional stages may take
    nothing, passing the opening to the next stage; negated stages never
    capture.  A non-optional group must take at least one event, so it
    ends the walk after contributing its inner openers."""
    out: list[Stage] = []
    for s in stages:
        if s.negated:
            continue
        if s.sub_stages is not None:
            out.extend(_openers(s.sub_stages))
            if not s.optional:
                break
            continue
        out.append(s)
        if not s.optional:
            break
    return out

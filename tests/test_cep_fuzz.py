"""Randomized CEP cross-check (VERDICT r5 item 5): fuzz small event
sequences and verify cep/nfa.py against an INDEPENDENT enumerator.

The reference enumerator below is written validation-first (enumerate
candidate index assignments per stage, filter by declarative rules)
rather than scan-first like the NFA, and its rules are derived directly
from the reference compiler, not from nfa.py:

- SKIP_TILL_NEXT (followedBy): the IGNORE edge is NOT(takeCondition)
  (NFACompiler.java getIgnoreCondition:923 / getInnerIgnoreCondition:876)
  — no event matching the stage may sit in a skipped gap.
- SKIP_TILL_ANY (followedByAny / allowCombinations): IGNORE is true —
  matching events may be skipped (entry gaps for followedByAny, inner
  loop gaps for allowCombinations).
- STRICT (next): no gap at entry, repeats contiguous.
- until: take and ignore are both guarded with NOT(until)
  (NFACompiler.java:683,847), so a computation can cross neither a
  captured nor a skipped until-firing event; stage 0 starts a fresh
  computation at every event, so later starts survive an earlier until.
- greedy: the loop cannot stop while its scan would accept another
  in-window event (and shorter prefixes of that run are not emitted).
- negation: notNext forbids a match of the negated predicate at the
  position immediately after the previous stage; notFollowedBy forbids
  it anywhere in the gap before the next stage's first event (trailing
  notFollowedBy: to end of stream).
- within: every captured event within [first.ts, first.ts + within].
- after-match skip: NO_SKIP emits all; SKIP_TO_NEXT keeps one match per
  start event; SKIP_PAST_LAST_EVENT / SKIP_TO_FIRST(p) / SKIP_TO_LAST(p)
  prune matches starting before the cursor advanced by the previously
  emitted match.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from incubator_flink_spark.cep.nfa import find_matches
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
)

EPOCH = datetime(2021, 1, 1)


class RefCtx:
    """Minimal IterativeCondition context for the reference enumerator."""

    def __init__(self, capture, stage_name, stage_taken):
        self._capture = capture
        self._stage_name = stage_name
        self._stage_taken = stage_taken

    def get_events_for_pattern(self, name):
        if name == self._stage_name:
            return list(self._capture.get(name, [])) + list(self._stage_taken)
        return list(self._capture.get(name, []))


def ref_find_matches(pattern, events, ts_key="ts"):
    stages = pattern.stages
    n = len(events)
    within = pattern.within_s
    found = []  # (first_idx, last_idx, sidx)

    def in_window(j, first_idx):
        if within is None or first_idx is None:
            return True
        return (events[j][ts_key] - events[first_idx][ts_key]).total_seconds() <= within

    def acc(st, j, capture, taken):
        ctx = RefCtx(capture, st.name, [events[i] for i in taken])
        return st.accepts(events[j], ctx)

    def unt(st, j, capture, taken):
        ctx = RefCtx(capture, st.name, [events[i] for i in taken])
        return st.until_fires(events[j], ctx)

    def gen_stage(st, si, pos, first_idx, capture):
        """Yield (taken_tuple, next_pos) for stage si scanning from pos."""
        if st.optional:
            yield ((), pos)
        maxt = st.max_times if st.max_times != -1 else n

        if st.contiguity == STRICT:
            # an effective START stage (si == 0) opens at every event;
            # otherwise the run is pinned to pos
            def strict_from(start):
                taken = []
                j = start
                emitted = []
                while j < n and len(taken) < maxt:
                    if unt(st, j, capture, taken) or not acc(st, j, capture, taken):
                        break
                    fi = first_idx if first_idx is not None else start
                    if not in_window(j, fi):
                        break
                    taken.append(j)
                    j += 1
                    if len(taken) >= st.min_times:
                        emitted.append((tuple(taken), j))
                if st.greedy and emitted:
                    yield emitted[-1]
                else:
                    yield from emitted

            if si == 0:
                for start in range(pos, n):
                    yield from strict_from(start)
            else:
                yield from strict_from(pos)
            return

        # relaxed / relaxed_any: enumerate candidate increasing tuples and
        # validate each against the gap/until/window/greedy rules
        any_entry = st.contiguity == RELAXED_ANY or si == 0
        any_inner = st.combinations

        def entry_gap_ok(first):
            for j in range(pos, first):
                if unt(st, j, capture, []):
                    return si == 0  # fresh computations restart after until
                if not any_entry and acc(st, j, capture, []):
                    return False
            return True

        def inner_gap_ok(prefix, lo, hi):
            for j in range(lo, hi):
                if unt(st, j, capture, prefix):
                    return False
                if not any_inner and acc(st, j, capture, prefix):
                    return False
            return True

        def greedy_maximal(taken, fi):
            if not st.greedy or len(taken) >= maxt:
                return True if not st.greedy else len(taken) >= maxt or _no_ext(taken, fi)
            return _no_ext(taken, fi)

        def _no_ext(taken, fi):
            if st.inner_strict:
                j = taken[-1] + 1
                return not (
                    j < n
                    and not unt(st, j, capture, taken)
                    and acc(st, j, capture, taken)
                    and in_window(j, fi)
                )
            j = taken[-1] + 1
            while j < n:
                if unt(st, j, capture, taken):
                    return True
                if acc(st, j, capture, taken):
                    if in_window(j, fi):
                        return False  # an extension exists — must take it
                    if not any_inner:
                        return True  # scan dies at unskippable event
                j += 1
            return True

        def build(taken, next_scan):
            fi = first_idx if first_idx is not None else (taken[0] if taken else None)
            if st.min_times <= len(taken) and greedy_maximal(taken, fi):
                yield (tuple(taken), taken[-1] + 1)
            if len(taken) >= maxt:
                return
            if st.inner_strict:
                # consecutive(): the only candidate repeat is the very
                # next event — contiguous, accepted, in window, no until
                j = next_scan
                if (
                    j < n
                    and not unt(st, j, capture, taken)
                    and acc(st, j, capture, taken)
                    and in_window(j, fi)
                ):
                    yield from build(taken + [j], j + 1)
                return
            for j in range(next_scan, n):
                if not inner_gap_ok(taken, next_scan, j):
                    break  # gaps only get worse as j grows
                if unt(st, j, capture, taken):
                    break
                if acc(st, j, capture, taken) and in_window(j, fi):
                    yield from build(taken + [j], j + 1)
                # a matching-but-out-of-window event still blocks the scan
                # under SKIP_TILL_NEXT; handled by inner_gap_ok on later j

        for first in range(pos, n):
            if not entry_gap_ok(first):
                continue
            if unt(st, first, capture, []):
                if si == 0:
                    continue
                break
            if acc(st, first, capture, []):
                fi = first_idx if first_idx is not None else first
                if in_window(first, fi):
                    yield from build([first], first + 1)

    def gen_group(g, si, pos, first_idx, capture):
        """Yield (taken_map, next_pos) for a GROUP stage: iterations are
        full inner-sequence matches; the group's entry contiguity guards
        iteration 1's first taken event, the loop contiguity
        (consecutive → STRICT / allowCombinations → SKIP_TILL_ANY /
        default SKIP_TILL_NEXT) guards later iterations — each rule
        applied against the first inner stage that takes an event."""
        from dataclasses import replace as _rp

        maxt = g.max_times if g.max_times != -1 else n
        if g.inner_strict:
            loop_c = STRICT
        elif g.combinations:
            loop_c = RELAXED_ANY
        else:
            loop_c = RELAXED
        if g.optional:
            yield ({}, pos)

        def _ored_until(a, b):
            from incubator_flink_spark.cep.pattern import Cond

            if a is None:
                return b

            def f(e, ctx, _a=a, _b=b):
                fa = _a.pred(e, ctx) if _a.iterative else _a.pred(e)
                fb = _b.pred(e, ctx) if _b.iterative else _b.pred(e)
                return fa or fb

            return Cond(f, iterative=True)

        def iter_once(p, contig, entry_si, fi, cap):
            def d(k, q, fi2, cap2, m, pending):
                if k == len(g.sub_stages):
                    if any(m.values()):
                        yield (m, q, fi2)
                    return
                st = g.sub_stages[k]
                eff = _rp(st, contiguity=contig) if pending else st
                if g.until_cond is not None:
                    # group until guards every inner take/ignore
                    # (NFACompiler getTakeCondition:950/getIgnoreCondition:932);
                    # across nesting levels untils compose by OR
                    eff = _rp(eff, until_cond=_ored_until(st.until_cond, g.until_cond))
                # gen_any recurses for NESTED group inner stages
                for tmap, nq in gen_any(eff, entry_si if pending else 1, q, fi2, cap2):
                    all_i = sorted(i for v in tmap.values() for i in v)
                    fi3 = fi2 if fi2 is not None else (all_i[0] if all_i else None)
                    c3 = dict(cap2)
                    m2 = dict(m)
                    for name, idxs in tmap.items():
                        c3[name] = c3.get(name, []) + [events[i] for i in idxs]
                        m2[name] = m2.get(name, []) + list(idxs)
                    yield from d(k + 1, nq, fi3, c3, m2, pending and not all_i)

            yield from d(0, p, fi, cap, {}, True)

        def loop(p, fi, cap, acc, count):
            if count >= g.min_times and count > 0:
                yield ({k: list(v) for k, v in acc.items()}, p)
            if count >= maxt:
                return
            contig = g.contiguity if count == 0 else loop_c
            entry_si = si if count == 0 else 1
            for m, nq, fi2 in iter_once(p, contig, entry_si, fi, cap):
                cap2 = dict(cap)
                acc2 = {k: list(v) for k, v in acc.items()}
                for name, idxs in m.items():
                    cap2[name] = cap2.get(name, []) + [events[i] for i in idxs]
                    acc2[name] = acc2.get(name, []) + list(idxs)
                yield from loop(nq, fi2, cap2, acc2, count + 1)

        yield from loop(pos, first_idx, dict(capture), {}, 0)

    def gen_any(st, si, pos, first_idx, capture):
        """Uniform (taken_map, next_pos) generator over scalar + group."""
        if st.sub_stages is not None:
            yield from gen_group(st, si, pos, first_idx, capture)
        else:
            for tup, np in gen_stage(st, si, pos, first_idx, capture):
                yield ({st.name: list(tup)}, np)

    def violates(neg, lo, hi, strict_pos, first_idx):
        # window-bounded (STOP states die at window expiry — see
        # _violates_negation in cep/nfa.py); derived independently from
        # NFACompiler's NOT_FOLLOW stop-state compilation
        def in_w(j):
            if within is None or first_idx is None:
                return True
            return (events[j][ts_key] - events[first_idx][ts_key]).total_seconds() <= within

        if neg.contiguity == STRICT:
            return (
                strict_pos is not None and strict_pos < n
                and in_w(strict_pos) and neg.accepts(events[strict_pos])
            )
        return any(in_w(j) and neg.accepts(events[j]) for j in range(lo, hi))

    def merge(capture, sidx, tmap):
        cap2 = dict(capture)
        s2 = dict(sidx)
        for name, idxs in tmap.items():
            cap2[name] = cap2.get(name, []) + [events[i] for i in idxs]
            s2[name] = s2.get(name, []) + list(idxs)
        return cap2, s2

    def rec(si, pos, first_idx, capture, sidx, fresh):
        # fresh: nothing captured yet — current stage is the effective
        # start state (gen_* treat si==0 as the start-state marker)
        if si == len(stages):
            idxs = [i for v in sidx.values() for i in v]
            if idxs:
                found.append((min(idxs), max(idxs), dict(sidx)))
            return
        st = stages[si]
        if st.negated:
            if si + 1 == len(stages):
                if not violates(st, pos, n, pos, first_idx):
                    rec(si + 1, pos, first_idx, capture, sidx, fresh)
                return
            nxt = stages[si + 1]
            for tmap, np in gen_any(nxt, 1, pos, first_idx, capture):
                all_idx = sorted(i for v in tmap.values() for i in v)
                if not all_idx:
                    continue
                fi0 = first_idx if first_idx is not None else all_idx[0]
                if violates(st, pos, all_idx[0], pos, fi0):
                    continue
                fi = first_idx if first_idx is not None else all_idx[0]
                cap2, s2 = merge(capture, sidx, tmap)
                rec(si + 2, np, fi, cap2, s2, False)
            return
        for tmap, np in gen_any(st, 0 if fresh else 1, pos, first_idx, capture):
            all_idx = sorted(i for v in tmap.values() for i in v)
            fi = first_idx
            if all_idx and fi is None:
                fi = all_idx[0]
            cap2, s2 = merge(capture, sidx, tmap)
            rec(si + 1, np, fi, cap2, s2, fresh and not all_idx)

    rec(0, 0, None, {}, {}, True)

    seen = set()
    uniq = []
    for first_i, last_i, sidx in found:
        key = tuple(sorted((k, tuple(v)) for k, v in sidx.items()))
        if key not in seen:
            seen.add(key)
            uniq.append((first_i, last_i, sidx))
    def leaf_names(ss):
        out = []
        for s in ss:
            if s.sub_stages is not None:
                out.extend(leaf_names(s.sub_stages))
            else:
                out.append(s.name)
        return out

    stage_order = leaf_names(stages)
    uniq.sort(
        key=lambda m: (m[0], m[1], tuple(tuple(m[2].get(nm, ())) for nm in stage_order))
    )

    if pattern.skip_strategy == NO_SKIP:
        return [sidx for _, _, sidx in uniq]
    out = []
    cursor = 0
    for first_i, last_i, sidx in uniq:
        if first_i < cursor:
            continue
        out.append(sidx)
        if pattern.skip_strategy == SKIP_TO_NEXT:
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


# ---------------------------------------------------------------- fuzz --


def _events(seq):
    return [
        {"ts": EPOCH + timedelta(seconds=3 * i), "label": ch, "value": float(i), "event_id": i}
        for i, ch in enumerate(seq)
    ]


def _nfa_keys(pattern, events):
    out = []
    for cap in find_matches(pattern, events):
        out.append(tuple(sorted((k, tuple(e["event_id"] for e in v)) for k, v in cap.items())))
    return sorted(out)


def _ref_keys(pattern, events):
    out = []
    for sidx in ref_find_matches(pattern, events):
        out.append(tuple(sorted((k, tuple(v)) for k, v in sidx.items())))
    return sorted(out)


def _rand_pattern(rng):
    def pred(ch):
        return lambda e, c=ch: e["label"] == c

    p = Pattern.begin("s0").where(pred(rng.choice("ab")))
    n_stages = rng.randint(1, 3)
    quant = rng.choice(["one", "one", "times12", "times2", "oneormore", "timesormore2", "optional"])
    _apply_quant(p, quant, rng)
    neg_used = False
    for k in range(1, n_stages):
        link = rng.choice(["followed_by", "followed_by", "next", "followed_by_any", "neg"])
        if link == "neg" and not neg_used and k < n_stages:
            neg_used = True
            if rng.random() < 0.5:
                p.not_followed_by(f"n{k}").where(pred(rng.choice("abc")))
            else:
                p.not_next(f"n{k}").where(pred(rng.choice("abc")))
            p.followed_by(f"s{k}").where(pred(rng.choice("abc")))
            continue
        if link == "neg":
            link = "followed_by"
        getattr(p, link)(f"s{k}").where(pred(rng.choice("abc")))
        _apply_quant(p, rng.choice(["one", "one", "times12", "oneormore", "timesormore2", "optional"]), rng)
    skip = rng.choice(["none", "none", "past", "first", "last", "next"])
    if skip == "past":
        p.after_match_skip_past_last_event()
    elif skip == "first":
        p.after_match_skip_to_first("s0")
    elif skip == "last":
        p.after_match_skip_to_last("s0")
    elif skip == "next":
        p.after_match_skip_to_next()
    if rng.random() < 0.3:
        p.within(3 * rng.randint(2, 6))
    return p


def _apply_quant(p, quant, rng, allow_modes=True):
    if quant == "times12":
        p.times(1, 2)
    elif quant == "times2":
        p.times(2)
    elif quant == "oneormore":
        p.one_or_more()
    elif quant == "timesormore2":
        p.times_or_more(2)
    elif quant == "optional":
        p.optional()
    if allow_modes and quant in ("times12", "times2", "oneormore", "timesormore2"):
        if rng.random() < 0.4:
            p.greedy()
        inner = rng.random()
        if inner < 0.25:
            p.allow_combinations()
        elif inner < 0.5:
            p.consecutive()
        if rng.random() < 0.3:
            p.until(lambda e: e["label"] == "u")


def _rand_group(rng, gi):
    """A random GroupPattern body: 1-2 scalar inner stages with their own
    contiguity and (limited) quantifiers."""

    def pred(ch):
        return lambda e, c=ch: e["label"] == c

    sub = Pattern.begin(f"g{gi}_0").where(pred(rng.choice("ab")))
    if rng.random() < 0.3:
        _apply_quant(sub, rng.choice(["times12", "oneormore"]), rng, allow_modes=False)
    if rng.random() < 0.75:
        link = rng.choice(["followed_by", "followed_by", "next", "followed_by_any"])
        getattr(sub, link)(f"g{gi}_1").where(pred(rng.choice("abc")))
        if rng.random() < 0.3:
            _apply_quant(sub, rng.choice(["times12", "optional"]), rng, allow_modes=False)
    return sub


def _rand_group_pattern(rng):
    """Pattern with at least one group stage (plus optional scalar
    neighbors), exercising group quantifiers × inner contiguity ×
    entry contiguity × skip strategies."""

    def pred(ch):
        return lambda e, c=ch: e["label"] == c

    lead = rng.random() < 0.4
    gi = 0
    if lead:
        p = Pattern.begin("s0").where(pred(rng.choice("ab")))
        link = rng.choice(["followed_by", "followed_by", "next", "followed_by_any"])
        getattr(p, link)(_rand_group(rng, gi))
    else:
        p = Pattern.begin(_rand_group(rng, gi))
    _apply_group_quant(p, rng)
    if rng.random() < 0.5:
        if rng.random() < 0.3:
            p.not_followed_by("nn").where(pred(rng.choice("abc")))
        if rng.random() < 0.4:
            gi += 1
            link = rng.choice(["followed_by", "next", "followed_by_any"])
            getattr(p, link)(_rand_group(rng, gi))
            _apply_group_quant(p, rng)
        else:
            p.followed_by("s9").where(pred(rng.choice("abc")))
            _apply_quant(p, rng.choice(["one", "one", "times12", "oneormore", "optional"]), rng)
    skip = rng.choice(["none", "none", "past", "next", "first"])
    if skip == "past":
        p.after_match_skip_past_last_event()
    elif skip == "next":
        p.after_match_skip_to_next()
    elif skip == "first":
        p.after_match_skip_to_first("g0_0")
    if rng.random() < 0.3:
        p.within(3 * rng.randint(2, 6))
    return p


def _rand_nested_group(rng, gi):
    """A group body that CONTAINS a group stage (nested GroupPattern —
    the reference compiles group bodies recursively, NFACompiler
    createGroupPatternState): optional scalar lead, a quantified nested
    group, optional scalar tail."""

    def pred(ch):
        return lambda e, c=ch: e["label"] == c

    inner = _rand_group(rng, 10 + gi)  # distinct leaf-name namespace
    if rng.random() < 0.4:
        sub = Pattern.begin(f"g{gi}_L").where(pred(rng.choice("ab")))
        link = rng.choice(["followed_by", "next", "followed_by_any"])
        getattr(sub, link)(inner)
    else:
        sub = Pattern.begin(inner)
    _apply_group_quant(sub, rng)
    if rng.random() < 0.5:
        sub.followed_by(f"g{gi}_T").where(pred(rng.choice("abc")))
    return sub


def _rand_nested_pattern(rng):
    def pred(ch):
        return lambda e, c=ch: e["label"] == c

    if rng.random() < 0.35:
        p = Pattern.begin("s0").where(pred(rng.choice("ab")))
        link = rng.choice(["followed_by", "next", "followed_by_any"])
        getattr(p, link)(_rand_nested_group(rng, 0))
    else:
        p = Pattern.begin(_rand_nested_group(rng, 0))
    _apply_group_quant(p, rng)
    if rng.random() < 0.4:
        p.followed_by("s9").where(pred(rng.choice("abc")))
    skip = rng.choice(["none", "none", "past", "next"])
    if skip == "past":
        p.after_match_skip_past_last_event()
    elif skip == "next":
        p.after_match_skip_to_next()
    if rng.random() < 0.3:
        p.within(3 * rng.randint(2, 6))
    return p


def test_fuzz_nested_group_patterns_vs_reference_enumerator():
    """NESTED GroupPattern fuzz: a group whose body contains a group
    (``((a b)+ c)+`` shapes) — nested quantifiers × contiguity modes ×
    group until × skip strategies, cross-checked against the independent
    validation enumerator (which recurses through gen_any)."""
    rng = random.Random(8_2026)
    divergences = []
    for case in range(400):
        n = rng.randint(5, 10)
        alphabet = "aabbcu" if rng.random() < 0.4 else "aabbc"
        seq = "".join(rng.choice(alphabet) for _ in range(n))
        events = _events(seq)
        pattern = _rand_nested_pattern(rng)
        got = _nfa_keys(pattern, events)
        want = _ref_keys(pattern, events)
        if got != want:
            divergences.append((case, seq, _describe(pattern), got, want))
    assert not divergences, f"{len(divergences)} divergences; first: {divergences[0]}"


def _apply_group_quant(p, rng):
    q = rng.choice(["one", "times2", "times12", "oneormore", "timesormore2", "optional"])
    if q == "times2":
        p.times(2)
    elif q == "times12":
        p.times(1, 2)
    elif q == "oneormore":
        p.one_or_more()
    elif q == "timesormore2":
        p.times_or_more(2)
    elif q == "optional":
        p.optional()
    if q != "one":
        inner = rng.random()
        if inner < 0.25:
            p.allow_combinations()
        elif inner < 0.5:
            p.consecutive()
        if rng.random() < 0.3:
            p.until(lambda e: e["label"] == "u")


def test_fuzz_nfa_vs_reference_enumerator():
    rng = random.Random(20260815)
    divergences = []
    for case in range(400):
        n = rng.randint(3, 10)
        alphabet = "aabbcu" if rng.random() < 0.4 else "aabbc"
        seq = "".join(rng.choice(alphabet) for _ in range(n))
        events = _events(seq)
        pattern = _rand_pattern(rng)
        got = _nfa_keys(pattern, events)
        want = _ref_keys(pattern, events)
        if got != want:
            divergences.append((case, seq, _describe(pattern), got, want))
    assert not divergences, f"{len(divergences)} divergences; first: {divergences[0]}"


def test_fuzz_group_patterns_vs_reference_enumerator():
    """GroupPattern fuzz (GroupPattern.java:30): quantified sub-pattern
    stages — group quantifier × inner contiguity (default / consecutive /
    allowCombinations) × entry contiguity × skip strategy × within —
    cross-checked against the independent validation enumerator."""
    rng = random.Random(7_2026)
    divergences = []
    for case in range(800):
        n = rng.randint(5, 12)
        alphabet = "aabbcu" if rng.random() < 0.4 else "aabbc"
        seq = "".join(rng.choice(alphabet) for _ in range(n))
        events = _events(seq)
        pattern = _rand_group_pattern(rng)
        got = _nfa_keys(pattern, events)
        want = _ref_keys(pattern, events)
        if got != want:
            divergences.append((case, seq, _describe(pattern), got, want))
    assert not divergences, f"{len(divergences)} divergences; first: {divergences[0]}"


def _describe(p):
    def one(s):
        d = (
            s.name,
            s.contiguity,
            s.min_times,
            s.max_times,
            s.optional,
            s.negated,
            s.greedy,
            s.combinations,
            s.inner_strict,
            s.until_cond is not None,
        )
        if s.sub_stages is not None:
            return (d, [one(x) for x in s.sub_stages])
        return d

    return [one(s) for s in p.stages] + [p.skip_strategy, p.within_s]


def test_fuzz_iterative_conditions():
    """Iterative (capture-dependent) predicates across the same engines:
    the second stage must exceed the max value captured so far by the
    first — exactly where ctx-threading bugs would hide."""
    rng = random.Random(99)
    for _ in range(150):
        n = rng.randint(3, 9)
        seq = "".join(rng.choice("aabb") for _ in range(n))
        events = _events(seq)
        p = (
            Pattern.begin("xs")
            .where(lambda e: e["label"] == "a")
            .times(1, 2)
            .followed_by("big")
            .where_iterative(
                lambda e, ctx: e["label"] == "b"
                and e["value"] > max(x["value"] for x in ctx.get_events_for_pattern("xs"))
            )
        )
        assert _nfa_keys(p, events) == _ref_keys(p, events), seq


# ------------------------------------------------- brute-force oracle --
# ADVICE r7: gen_group shares the production algorithm's reading of the
# reference; this third oracle shares NOTHING with either — for patterns
# whose contiguity is fully STRICT (next() links, consecutive() loops,
# strict group entry+loop), every match is a CONTIGUOUS label run, so the
# complete NO_SKIP match set is enumerable by expanding quantifier counts
# into literal token strings and sliding them over the event labels.  No
# scanning, no gap rules, no ignore edges.


def _spec_pattern(spec, within):
    """spec: list of stage specs; scalar = (name, label, lo, hi, optional),
    group = ('GROUP', body_spec, lo, hi, optional)."""

    def pred(ch):
        return lambda e, c=ch: e["label"] == c

    def build(items):
        p = None
        for it in items:
            if it[0] == "GROUP":
                _, body, lo, hi, opt = it
                sub = build(body)
                p = Pattern.begin(sub) if p is None else p.next(sub)
                p.times(lo, hi).consecutive()
                if opt:
                    p.optional()
            else:
                name, label, lo, hi, opt = it
                p = Pattern.begin(name) if p is None else p.next(name)
                p.where(pred(label))
                if (lo, hi) != (1, 1):
                    p.times(lo, hi).consecutive()
                if opt:
                    p.optional()
        return p

    p = build(spec)
    if within is not None:
        p.within(within)
    return p


def _expansions(items, cap):
    """All (tokens, names) for a strict spec; tokens = [(name, label)...]."""

    def stage_exp(it):
        out = []
        if it[0] == "GROUP":
            _, body, lo, hi, opt = it
            if opt:
                out.append(([], frozenset()))
            body_exps = [e for e in _expansions(body, cap) if e[0]]  # an iteration takes >=1 event
            names = frozenset().union(*[n for _, n in _expansions(body, cap)]) if body else frozenset()
            import itertools as _it

            for c in range(max(lo, 1), hi + 1):
                for combo in _it.product(body_exps, repeat=c):
                    toks = [t for e, _ in combo for t in e]
                    out.append((toks, names))
        else:
            name, label, lo, hi, opt = it
            if opt:
                out.append(([], frozenset([name])))
            for c in range(lo, hi + 1):
                if c == 0:
                    continue
                out.append(([(name, label)] * c, frozenset([name])))
        return out

    if not items:
        return [([], frozenset())]
    head, rest = items[0], items[1:]
    outs = []
    for toks, names in stage_exp(head):
        for t2, n2 in _expansions(rest, cap):
            outs.append((toks + t2, names | n2))
    return outs


def brute_force_strict(spec, events, within):
    keys = set()
    for toks, names in _expansions(spec, len(events)):
        if not toks:
            continue
        L = len(toks)
        for s in range(len(events) - L + 1):
            if within is not None and 3 * (L - 1) > within:
                continue
            if all(events[s + j]["label"] == toks[j][1] for j in range(L)):
                cap = {n: [] for n in names}
                for j, (n, _) in enumerate(toks):
                    cap[n].append(s + j)
                keys.add(tuple(sorted((k, tuple(v)) for k, v in cap.items())))
    return sorted(keys)


def _rand_strict_spec(rng):
    spec = []
    gi = 0
    for k in range(rng.randint(1, 3)):
        if rng.random() < 0.3:
            body = []
            for j in range(rng.randint(1, 2)):
                lo, hi = rng.choice([(1, 1), (1, 2)])
                body.append((f"g{gi}_{j}", rng.choice("ab"), lo, hi, rng.random() < 0.2))
            if all(b[4] for b in body):  # an iteration must be able to take
                body[0] = body[0][:4] + (False,)
            lo, hi = rng.choice([(1, 1), (1, 2), (2, 2), (1, 3)])
            spec.append(("GROUP", body, lo, hi, rng.random() < 0.2))
            gi += 1
        else:
            lo, hi = rng.choice([(1, 1), (1, 1), (1, 2), (2, 2), (0, 2), (1, 3)])
            opt = rng.random() < 0.25 if lo > 0 else False
            spec.append((f"s{k}", rng.choice("abc"), max(lo, 1) if lo else 1, max(hi, 1), opt or lo == 0))
    return spec


def test_fuzz_strict_patterns_vs_bruteforce():
    """Strict-contiguity patterns (groups included) against the
    token-expansion brute force — an oracle with no scan/gap logic at
    all, so a shared misreading of the reference's consuming strategies
    cannot hide here."""
    rng = random.Random(81_2026)
    divergences = []
    for case in range(400):
        n = rng.randint(4, 9)
        seq = "".join(rng.choice("aabbc") for _ in range(n))
        events = _events(seq)
        spec = _rand_strict_spec(rng)
        within = 3 * rng.randint(2, 6) if rng.random() < 0.3 else None
        pattern = _spec_pattern(spec, within)
        got = _nfa_keys(pattern, events)
        want = brute_force_strict(spec, events, within)
        if got != want:
            divergences.append((case, seq, spec, within, got, want))
    assert not divergences, f"{len(divergences)} divergences; first: {divergences[0]}"

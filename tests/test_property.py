"""Property-based tests (hypothesis) for the pure-Python hot logic:

- CEP NFA (cep/nfa.py) vs exact brute-force enumeration for pattern
  families whose semantics are unambiguous (single-event stages,
  negation), plus well-formedness/subset invariants for quantified and
  skip-strategy patterns where the reference semantics allow choice.
- Vectorized streaming kernels (streaming/stateful.py): the carried
  state must make any batch split of an input equivalent to one big
  batch — the applyInPandasWithState contract Structured Streaming
  relies on across micro-batches.

No SparkSession needed; hundreds of examples run in seconds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_flink_spark.cep.nfa import find_matches
from incubator_flink_spark.cep.pattern import Pattern
from incubator_flink_spark.streaming.stateful import (
    count_window_kernel,
    over_range_kernel,
    over_rows_kernel,
)

# ---------------------------------------------------------------- CEP --

labels = st.lists(st.sampled_from("abc"), min_size=0, max_size=12)


def _events(seq):
    return [{"ts": i, "label": ch} for i, ch in enumerate(seq)]


def _idx(match, stage):
    return [e["ts"] for e in match[stage]]


@given(labels)
@settings(max_examples=200, deadline=None)
def test_followed_by_any_matches_all_pairs(seq):
    """begin(A=a).followed_by_any(B=b) (SKIP_TILL_ANY), NO_SKIP == every
    (i<j) pair — followedByAny may skip matching events too."""
    events = _events(seq)
    p = (
        Pattern.begin("A").where(lambda e: e["label"] == "a")
        .followed_by_any("B").where(lambda e: e["label"] == "b")
    )
    got = {(m["A"][0]["ts"], m["B"][0]["ts"]) for m in find_matches(p, events)}
    want = {
        (i, j)
        for i, x in enumerate(seq)
        for j, y in enumerate(seq)
        if i < j and x == "a" and y == "b"
    }
    assert got == want


def _first_after(seq, i, ch):
    for j in range(i + 1, len(seq)):
        if seq[j] == ch:
            return j
    return None


@given(labels)
@settings(max_examples=200, deadline=None)
def test_followed_by_matches_first_b_only(seq):
    """begin(A=a).followed_by(B=b) (SKIP_TILL_NEXT), NO_SKIP: each a pairs
    with ONLY the first following b — an event matching B cannot be
    skipped (NFACompiler getIgnoreCondition = NOT(take))."""
    events = _events(seq)
    p = (
        Pattern.begin("A").where(lambda e: e["label"] == "a")
        .followed_by("B").where(lambda e: e["label"] == "b")
    )
    got = {(m["A"][0]["ts"], m["B"][0]["ts"]) for m in find_matches(p, events)}
    want = {
        (i, _first_after(seq, i, "b"))
        for i, x in enumerate(seq)
        if x == "a" and _first_after(seq, i, "b") is not None
    }
    assert got == want


@given(labels)
@settings(max_examples=200, deadline=None)
def test_next_matches_adjacent_pairs(seq):
    """begin(A=a).next(B=b) strict == (i, i+1) pairs only."""
    events = _events(seq)
    p = (
        Pattern.begin("A").where(lambda e: e["label"] == "a")
        .next("B").where(lambda e: e["label"] == "b")
    )
    got = {(m["A"][0]["ts"], m["B"][0]["ts"]) for m in find_matches(p, events)}
    want = {(i, i + 1) for i in range(len(seq) - 1) if seq[i] == "a" and seq[i + 1] == "b"}
    assert got == want


@given(labels)
@settings(max_examples=200, deadline=None)
def test_not_followed_by_blocks_intervening(seq):
    """A=a .not_followed_by(N=b) .followed_by(C=c): pairs (i<k) with no b
    strictly between them (reference NotFollowedBy relaxed semantics)."""
    events = _events(seq)
    p = (
        Pattern.begin("A").where(lambda e: e["label"] == "a")
        .not_followed_by("N").where(lambda e: e["label"] == "b")
        .followed_by_any("C").where(lambda e: e["label"] == "c")
    )
    got = {(m["A"][0]["ts"], m["C"][0]["ts"]) for m in find_matches(p, events)}
    want = {
        (i, k)
        for i, x in enumerate(seq)
        for k, z in enumerate(seq)
        if i < k and x == "a" and z == "c" and "b" not in seq[i + 1 : k]
    }
    assert got == want


@given(labels)
@settings(max_examples=200, deadline=None)
def test_within_window_prunes_pairs(seq):
    """followed_by_any with within(3s): last.ts - first.ts <= 3 (datetime
    ts, matching the NFA's total_seconds() window arithmetic)."""
    from datetime import datetime, timedelta

    epoch = datetime(2020, 1, 1)
    events = [{"ts": epoch + timedelta(seconds=i), "label": ch} for i, ch in enumerate(seq)]
    p = (
        Pattern.begin("A").where(lambda e: e["label"] == "a")
        .followed_by_any("B").where(lambda e: e["label"] == "b")
        .within(3)
    )
    got = {
        (int((m["A"][0]["ts"] - epoch).total_seconds()), int((m["B"][0]["ts"] - epoch).total_seconds()))
        for m in find_matches(p, events)
    }
    want = {
        (i, j)
        for i, x in enumerate(seq)
        for j, y in enumerate(seq)
        if i < j and j - i <= 3 and x == "a" and y == "b"
    }
    assert got == want


@given(labels)
@settings(max_examples=150, deadline=None)
def test_one_or_more_well_formed_and_greedy_subset(seq):
    """one_or_more: every match takes only a-events at increasing indices;
    greedy emits a subset of the reluctant emission (maximal runs only)."""
    events = _events(seq)
    base = Pattern.begin("A").where(lambda e: e["label"] == "a").one_or_more()
    reluctant = find_matches(base, events)
    greedy = find_matches(
        Pattern.begin("A").where(lambda e: e["label"] == "a").one_or_more().greedy(),
        events,
    )
    rel_sets = {tuple(_idx(m, "A")) for m in reluctant}
    for m in reluctant + greedy:
        idxs = _idx(m, "A")
        assert idxs == sorted(idxs) and len(set(idxs)) == len(idxs)
        assert all(seq[i] == "a" for i in idxs)
    assert {tuple(_idx(m, "A")) for m in greedy} <= rel_sets


@given(labels)
@settings(max_examples=150, deadline=None)
def test_skip_past_last_non_overlapping_subset(seq):
    """SKIP_PAST_LAST_EVENT: matches are a subset of NO_SKIP's and are
    pairwise non-overlapping in event positions."""

    def pat(skip_past):
        p = (
            Pattern.begin("A").where(lambda e: e["label"] == "a")
            .followed_by("B").where(lambda e: e["label"] == "b")
        )
        return p.after_match_skip_past_last_event() if skip_past else p

    all_matches = {
        (m["A"][0]["ts"], m["B"][0]["ts"]) for m in find_matches(pat(False), _events(seq))
    }
    skipped = [
        (m["A"][0]["ts"], m["B"][0]["ts"])
        for m in find_matches(pat(True), _events(seq))
    ]
    assert set(skipped) <= all_matches
    for (a1, b1), (a2, b2) in zip(skipped, skipped[1:]):
        assert a2 > b1  # strictly after the previous match's last event


# ------------------------------------------------------------ kernels --

floats = st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=32), min_size=0, max_size=60)


def _splits(data, cut_points):
    cuts = sorted({c % (len(data) + 1) for c in cut_points})
    batches, lo = [], 0
    for c in cuts:
        batches.append(data[lo:c])
        lo = c
    batches.append(data[lo:])
    return batches


@given(floats, st.lists(st.integers(0, 60), max_size=3), st.integers(1, 7))
@settings(max_examples=200, deadline=None)
def test_over_rows_kernel_split_invariant(vals, cuts, n):
    whole_s, whole_c, _ = over_rows_kernel(np.array(vals), np.empty(0), n)
    got_s, got_c, buf = [], [], np.empty(0)
    for batch in _splits(vals, cuts):
        s, c, buf = over_rows_kernel(np.array(batch), np.asarray(buf, dtype=np.float64), n)
        got_s += list(s)
        got_c += list(c)
    assert got_c == list(whole_c)
    assert np.allclose(got_s, whole_s, atol=1e-6)


@given(
    st.lists(st.tuples(st.integers(1, 50), st.floats(-1e6, 1e6, allow_nan=False, width=32)), max_size=60),
    st.lists(st.integers(0, 60), max_size=3),
    st.integers(1, 200),
)
@settings(max_examples=200, deadline=None)
def test_over_range_kernel_split_invariant(gaps_vals, cuts, horizon):
    ts = np.cumsum([g for g, _ in gaps_vals]).astype(np.int64)
    vals = [v for _, v in gaps_vals]
    whole_s, whole_c, _, _ = over_range_kernel(
        ts, np.array(vals), np.empty(0, np.int64), np.empty(0, np.float64), horizon
    )
    got_s, got_c = [], []
    bt, bv = np.empty(0, np.int64), np.empty(0, np.float64)
    for batch in _splits(list(zip(ts.tolist(), vals)), cuts):
        bts = np.array([t for t, _ in batch], dtype=np.int64)
        bvs = np.array([v for _, v in batch], dtype=np.float64)
        s, c, bt, bv = over_range_kernel(bts, bvs, bt, bv, horizon)
        got_s += list(s)
        got_c += list(c)
    assert got_c == list(whole_c)
    assert np.allclose(got_s, whole_s, atol=1e-6)


@given(floats, st.lists(st.integers(0, 60), max_size=3), st.integers(1, 9))
@settings(max_examples=200, deadline=None)
def test_count_window_kernel_split_invariant(vals, cuts, size):
    ww, wt, *_ = count_window_kernel(np.array(vals), 0, 0.0, 0, size)
    got_w, got_t = [], []
    oc, ot, ns = 0, 0.0, 0
    for batch in _splits(vals, cuts):
        w, t, oc, ot, ns = count_window_kernel(np.array(batch), oc, ot, ns, size)
        got_w += list(w)
        got_t += list(t)
    assert got_w == list(ww)
    assert np.allclose(got_t, wt, atol=1e-6)


def test_sql_expr_random_arithmetic_matches_python():
    """Property: the MATCH_RECOGNIZE expression compiler agrees with
    Python evaluation on randomly generated arithmetic/boolean trees over
    integer literals and one column."""
    import random

    from incubator_flink_spark.cep.match_recognize import MatchAccess
    from incubator_flink_spark.cep.sql_expr import compile_measure

    rng = random.Random(1234)
    m = MatchAccess({"A": [{"x": 7}]}, ["A"])

    def gen(depth):
        if depth == 0 or rng.random() < 0.3:
            return str(rng.randint(-9, 9)) if rng.random() < 0.7 else "A.x"
        op = rng.choice(["+", "-", "*", "%", "<", "<=", ">", ">=", "=", "<>"])
        l, r = gen(depth - 1), gen(depth - 1)
        if op in ("%",):
            r = str(rng.randint(1, 9))  # avoid zero divisor
        return f"({l} {op} {r})"

    for _ in range(300):
        expr = gen(3)
        py = expr.replace("A.x", "7").replace("=", "==").replace("<>", "!=")
        py = py.replace("<==", "<=").replace(">==", ">=").replace("!==", "!=")
        try:
            expected = eval(py)  # noqa: S307 - test-local, generated input
        except Exception:
            continue
        got = compile_measure(expr)(m)
        # SQL comparisons return booleans; Python arithmetic on bools
        # differs, so only compare when types line up
        if isinstance(expected, bool):
            assert bool(got) == expected, expr
        else:
            assert got == expected, expr

"""Negation-dense CEP fuzz (VERDICT r9 #5): every pattern carries at
least one NOT_NEXT/NOT_FOLLOWED_BY stage, with within drawn often, so the
negation x within x optional x quantifier x skip interplay is exercised
densely (the general fuzz in test_cep_fuzz.py draws negation in ~1/5 of
links and within in ~30% — the cross product was sparse).

The reference model is test_cep_fuzz.ref_find_matches, whose negation
rule is derived independently from the reference's STOP-state compilation
(NFACompiler.java createMiddleStates NOT_FOLLOW / NOT_NEXT): the
forbidden region is [prev_end, next_first) (trailing: to end of input),
window-bounded — a computation's stop states die with the computation at
[first.ts + within] expiry.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from incubator_flink_spark.cep.nfa import find_matches
from incubator_flink_spark.cep.pattern import Pattern

from tests.test_cep_fuzz import _apply_quant, _describe, _events, _nfa_keys, _ref_keys

EPOCH = datetime(2021, 1, 1)


def _rand_negation_pattern(rng):
    """2-4 stages, ALWAYS at least one negation; quantifiers on the
    positive stages; within drawn 60% of the time."""

    def pred(ch):
        return lambda e, c=ch: e["label"] == c

    p = Pattern.begin("s0").where(pred(rng.choice("ab")))
    _apply_quant(p, rng.choice(["one", "one", "times12", "oneormore", "optional"]), rng)
    n_links = rng.randint(1, 3)
    neg_at = rng.randrange(n_links)
    k = 0
    for i in range(n_links):
        if i == neg_at:
            k += 1
            if rng.random() < 0.5:
                p.not_followed_by(f"n{k}").where(pred(rng.choice("abc")))
            else:
                p.not_next(f"n{k}").where(pred(rng.choice("abc")))
            if rng.random() < 0.85 or i < n_links - 1:
                # negation usually followed by a positive stage; ~15% of
                # final-link draws leave it TRAILING
                k += 1
                p.followed_by(f"s{k}").where(pred(rng.choice("abc")))
                if rng.random() < 0.4:
                    _apply_quant(p, rng.choice(["times12", "oneormore", "optional"]), rng)
        else:
            k += 1
            getattr(p, rng.choice(["followed_by", "followed_by", "next", "followed_by_any"]))(
                f"s{k}"
            ).where(pred(rng.choice("abc")))
            if rng.random() < 0.5:
                _apply_quant(p, rng.choice(["times12", "oneormore", "optional"]), rng)
    skip = rng.choice(["none", "none", "past", "next"])
    if skip == "past":
        p.after_match_skip_past_last_event()
    elif skip == "next":
        p.after_match_skip_to_next()
    if rng.random() < 0.6:
        p.within(3 * rng.randint(2, 6))
    return p


def test_fuzz_negation_vs_reference_enumerator():
    rng = random.Random(10_2026)
    divergences = []
    for case in range(600):
        n = rng.randint(3, 10)
        alphabet = "aabbcc" if rng.random() < 0.5 else "aabbcx"
        seq = "".join(rng.choice(alphabet) for _ in range(n))
        events = _events(seq)
        pattern = _rand_negation_pattern(rng)
        got = _nfa_keys(pattern, events)
        want = _ref_keys(pattern, events)
        if got != want:
            divergences.append((case, seq, _describe(pattern), got, want))
    assert not divergences, f"{len(divergences)} divergences; first: {divergences[0]}"


def test_trailing_negation_window_bounded():
    """Pinned STOP-state semantics: a negated event AFTER the pattern
    window cannot kill the match (the reference emits the match at window
    expiry — FLINK-23886's notFollowedBy-with-within surface); inside the
    window it does."""
    ev = _events("ax")  # a@t0, x@t3s
    p = (
        Pattern.begin("s")
        .where(lambda e: e["label"] == "a")
        .not_followed_by("n")
        .where(lambda e: e["label"] == "x")
        .within(2)  # window closes BEFORE x arrives (x at +3s)
    )
    m = find_matches(p, ev)
    assert len(m) == 1 and m[0]["s"][0]["event_id"] == 0
    p2 = (
        Pattern.begin("s")
        .where(lambda e: e["label"] == "a")
        .not_followed_by("n")
        .where(lambda e: e["label"] == "x")
        .within(10)  # x inside the window: match killed
    )
    assert find_matches(p2, ev) == []
    # no window: forbidden to end of input (unchanged behavior)
    p3 = (
        Pattern.begin("s")
        .where(lambda e: e["label"] == "a")
        .not_followed_by("n")
        .where(lambda e: e["label"] == "x")
    )
    assert find_matches(p3, ev) == []


def test_not_next_window_bounded():
    """notNext's strict position check is window-bounded the same way."""
    ev = _events("ax")
    p = (
        Pattern.begin("s")
        .where(lambda e: e["label"] == "a")
        .not_next("n")
        .where(lambda e: e["label"] == "x")
        .within(2)
    )
    assert len(find_matches(p, ev)) == 1
    p2 = (
        Pattern.begin("s")
        .where(lambda e: e["label"] == "a")
        .not_next("n")
        .where(lambda e: e["label"] == "x")
        .within(10)
    )
    assert find_matches(p2, ev) == []

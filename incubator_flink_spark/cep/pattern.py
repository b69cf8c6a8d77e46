"""Pattern combinator API (reference: flink-cep/.../pattern/Pattern.java:
begin:128, where:180, next:288, followedBy:316, notNext/notFollowedBy,
times:427, oneOrMore:391, optional:369, greedy:380, until:500, within:543;
conditions/IterativeCondition.java; nfa/aftermatch/AfterMatchSkipStrategy.java).

A pattern is a linear sequence of stages; each stage has a name, a
predicate over the event (a callable on a dict-like row), a contiguity
mode relative to the previous stage (STRICT for next(), RELAXED for
followed_by()), and a quantifier (times(n[, m]), one_or_more, optional).
``within(seconds)`` bounds first-to-last event time.

Round-2 additions mirroring the reference:
- ``where_iterative(pred)`` — IterativeCondition: the predicate receives
  ``(event, ctx)`` where ``ctx.get_events_for_pattern(name)`` returns the
  events already accepted for stage ``name`` in this partial match
  (including earlier repeats of the current stage), like
  IterativeCondition.Context.getEventsForPattern.
- ``greedy()`` — the looping stage consumes as many matching events as it
  can per run; shorter prefixes of the same run are not emitted
  (Pattern.java:380; like the reference, greedy does not backtrack when a
  longer consumption starves later stages — documented limitation).
- ``until(pred)`` — stops the looping stage's acceptance at the first
  event where the condition fires (Pattern.java:500); the until event is
  not consumed.
- ``after_match_skip_to_first(name)`` / ``after_match_skip_to_last(name)``
  — AfterMatchSkipStrategy.skipToFirst/skipToLast: after emitting a
  match, discard matches starting before the first/last event mapped to
  stage ``name``.

NOT_NEXT/NOT_FOLLOWED_BY compile as a stage-level negation lookahead that
models the reference's STOP-state semantics (NFACompiler createMiddleStates
NOT_FOLLOW): the forbidden region runs from the previous stage's last event
to the next stage's first taken event (trailing negation: to end of input),
BOUNDED by the pattern window — a negated event arriving after
[first.ts + within] cannot stop a match the reference already emitted at
window expiry.  Verified by a negation-dense fuzz matrix
(tests/test_cep_negation_fuzz.py: negation × within × optional ×
quantifiers × skip strategies, 600 cases) against an independent
enumerator.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

STRICT = "strict"  # next()
RELAXED = "relaxed"  # followedBy() — SKIP_TILL_NEXT
RELAXED_ANY = "relaxed_any"  # followedByAny() — SKIP_TILL_ANY

NO_SKIP = "no_skip"
SKIP_TO_NEXT = "skip_to_next"
SKIP_PAST_LAST_EVENT = "skip_past_last_event"
SKIP_TO_FIRST = "skip_to_first"
SKIP_TO_LAST = "skip_to_last"

Predicate = Callable[[dict], bool]


@dataclass
class Cond:
    pred: Callable[..., bool]
    iterative: bool = False  # iterative preds receive (event, ctx)


@dataclass
class Stage:
    name: str
    contiguity: str = RELAXED
    conditions: list[Cond] = field(default_factory=list)
    min_times: int = 1
    max_times: int = 1  # -1 → unbounded (oneOrMore)
    optional: bool = False
    negated: bool = False  # notNext/notFollowedBy
    greedy: bool = False
    combinations: bool = False  # allowCombinations(): loop repeats may skip matching events
    inner_strict: bool = False  # consecutive(): loop repeats strictly contiguous
    until_cond: Cond | None = None
    sub_stages: list["Stage"] | None = None  # GroupPattern body (pattern-valued stage)

    def accepts(self, event: dict, ctx: Any = None) -> bool:
        return all(
            c.pred(event, ctx) if c.iterative else c.pred(event) for c in self.conditions
        )

    def until_fires(self, event: dict, ctx: Any = None) -> bool:
        if self.until_cond is None:
            return False
        c = self.until_cond
        return c.pred(event, ctx) if c.iterative else c.pred(event)


def _group_body(sub: "Pattern") -> list[Stage]:
    """Validate and extract a GroupPattern body (GroupPattern.java:30 —
    a whole Pattern used as one stage; NFACompiler compiles it as a
    sub-automaton).  Bodies are linear sequences whose stages may
    themselves be groups — the reference compiles group bodies
    recursively (NFACompiler createGroupPatternState calls back into
    generic state construction), so ``((a b)+ c)+`` is legal.  Negated
    stages are rejected (a group-internal notFollowedBy would need a
    per-iteration forbidden region the enumerator doesn't model), and a
    group-level within/skip strategy is meaningless (the OUTER pattern
    owns both) — both raise rather than silently diverging."""
    if sub.within_s is not None:
        raise ValueError("within() belongs on the outer pattern, not a group body")
    if sub.skip_strategy != NO_SKIP:
        raise ValueError("after-match skip belongs on the outer pattern, not a group body")
    for s in sub.stages:
        if s.negated:
            raise ValueError("negated stages inside a group pattern are not supported")
    return list(sub.stages)


class Pattern:
    """Linear pattern builder. All mutators return self for chaining."""

    def __init__(self, first_stage: Stage):
        self.stages: list[Stage] = [first_stage]
        self.within_s: float | None = None
        self.skip_strategy: str = NO_SKIP
        self.skip_stage: str | None = None  # for SKIP_TO_FIRST/SKIP_TO_LAST

    # --- constructors ---------------------------------------------------------
    @staticmethod
    def begin(name: "str | Pattern") -> "Pattern":
        if isinstance(name, Pattern):
            return Pattern(Stage("__group0", contiguity=RELAXED, sub_stages=_group_body(name)))
        return Pattern(Stage(name, contiguity=RELAXED))

    # --- predicates -----------------------------------------------------------
    def _positive(self) -> Stage:
        """The last stage, rejecting group stages — conditions apply to
        scalar stages only (GroupPattern.java:46,51 — where/or throw
        UnsupportedOperationException)."""
        s = self.stages[-1]
        if s.sub_stages is not None:
            raise ValueError("conditions are not supported on group patterns "
                             "(GroupPattern.java:46,51 — where/or throw)")
        return s

    def where(self, pred: Predicate) -> "Pattern":
        self._positive().conditions.append(Cond(pred))
        return self

    def where_iterative(self, pred: Callable[[dict, Any], bool]) -> "Pattern":
        """IterativeCondition: pred(event, ctx);
        ctx.get_events_for_pattern(name) -> accepted events of a stage."""
        self._positive().conditions.append(Cond(pred, iterative=True))
        return self

    def or_(self, pred: Predicate) -> "Pattern":
        """OR with the previous predicate (Pattern.or)."""
        stage = self._positive()
        if not stage.conditions:
            stage.conditions.append(Cond(pred))
            return self
        prev = stage.conditions.pop()
        if prev.iterative:
            stage.conditions.append(
                Cond(lambda e, ctx, a=prev.pred, b=pred: a(e, ctx) or b(e), iterative=True)
            )
        else:
            stage.conditions.append(Cond(lambda e, a=prev.pred, b=pred: a(e) or b(e)))
        return self

    # --- sequencing -----------------------------------------------------------
    def _seq(self, name: "str | Pattern", contiguity: str) -> "Pattern":
        if isinstance(name, Pattern):
            self.stages.append(
                Stage(f"__group{len(self.stages)}", contiguity=contiguity,
                      sub_stages=_group_body(name))
            )
        else:
            self.stages.append(Stage(name, contiguity=contiguity))
        return self

    def next(self, name: "str | Pattern") -> "Pattern":
        return self._seq(name, STRICT)

    def followed_by(self, name: "str | Pattern") -> "Pattern":
        """Relaxed contiguity (Pattern.java followedBy:291 —
        ConsumingStrategy.SKIP_TILL_NEXT): non-matching events between
        the previous stage and this one are skipped, but an event that
        MATCHES this stage cannot be skipped (NFACompiler
        getIgnoreCondition: NOT(takeCondition)) — ``a followedBy b`` on
        ``a b1 b2`` matches only {a, b1}.

        A ``Pattern`` argument makes this a GROUP stage
        (GroupPattern.java:30): the sub-pattern matches as a unit and the
        group takes the quantifiers — ``followed_by(sub).times(2)`` is
        ``(sub){2}``."""
        return self._seq(name, RELAXED)

    def followed_by_any(self, name: "str | Pattern") -> "Pattern":
        """Non-deterministic relaxed contiguity (Pattern.java
        followedByAny:322 — ConsumingStrategy.SKIP_TILL_ANY): matching
        events may also be skipped, so ``a followedByAny b`` on
        ``a b1 b2`` matches {a, b1} AND {a, b2}."""
        return self._seq(name, RELAXED_ANY)

    def not_next(self, name: str) -> "Pattern":
        self.stages.append(Stage(name, contiguity=STRICT, negated=True))
        return self

    def not_followed_by(self, name: str) -> "Pattern":
        self.stages.append(Stage(name, contiguity=RELAXED, negated=True))
        return self

    # --- quantifiers ----------------------------------------------------------
    def times(self, n: int, m: int | None = None) -> "Pattern":
        s = self.stages[-1]
        s.min_times, s.max_times = n, (m if m is not None else n)
        return self

    def one_or_more(self) -> "Pattern":
        s = self.stages[-1]
        s.min_times, s.max_times = 1, -1
        return self

    def times_or_more(self, n: int) -> "Pattern":
        """At least ``n`` repetitions, unbounded above
        (Pattern.java timesOrMore:416)."""
        s = self.stages[-1]
        s.min_times, s.max_times = n, -1
        return self

    def optional(self) -> "Pattern":
        self.stages[-1].optional = True
        return self

    def greedy(self) -> "Pattern":
        """Looping stage consumes maximally per run (Pattern.java:365).
        Not supported on group stages, as in the reference
        (Pattern.java greedy():367 calls checkIfNoGroupPattern:568)."""
        if self.stages[-1].sub_stages is not None:
            raise ValueError("greedy() is not supported on group patterns "
                             "(Pattern.java checkIfNoGroupPattern:568)")
        self.stages[-1].greedy = True
        return self

    def allow_combinations(self) -> "Pattern":
        """Non-deterministic relaxed looping: repeats may also skip
        MATCHING events (Pattern.java allowCombinations / Quantifier
        ConsumingStrategy.SKIP_TILL_ANY).  The default relaxed loop skips
        only non-matching events between repeats, like the reference."""
        self.stages[-1].combinations = True
        self.stages[-1].inner_strict = False
        return self

    def consecutive(self) -> "Pattern":
        """STRICT contiguity between the looping stage's repeats
        (Pattern.java consecutive:477 — inner ConsumingStrategy.STRICT);
        the stage's ENTRY contiguity stays whatever the connector set.
        Mutually exclusive with allow_combinations, as in the
        reference (the inner strategy is a single assignment)."""
        self.stages[-1].inner_strict = True
        self.stages[-1].combinations = False
        return self

    def until(self, pred: Predicate) -> "Pattern":
        """Stop the looping stage at the first event where pred fires
        (Pattern.java:500); the until event is not consumed.  On a GROUP
        stage the guard extends every inner state's take/ignore edge
        (NFACompiler.java getTakeCondition:950 / getIgnoreCondition:932 /
        getInnerIgnoreCondition:885 extend with NOT(until) while
        currentGroupPattern is set): the whole sub-automaton's
        consumption stops at the first until-firing event."""
        self.stages[-1].until_cond = Cond(pred)
        return self

    def until_iterative(self, pred: Callable[[dict, Any], bool]) -> "Pattern":
        self.stages[-1].until_cond = Cond(pred, iterative=True)
        return self

    # --- window / skip --------------------------------------------------------
    def within(self, seconds: float) -> "Pattern":
        self.within_s = seconds
        return self

    def after_match_skip_to_next(self) -> "Pattern":
        """AfterMatchSkipStrategy.skipToNext
        (nfa/aftermatch/SkipToNextStrategy.java:30): after emitting a
        match, discard every other match that STARTED WITH THE SAME
        EVENT — at most one match per start event, resuming at the event
        after the match's first.  This is SQL's AFTER MATCH SKIP TO NEXT
        ROW; unlike NO_SKIP it suppresses same-start alternatives (e.g.
        the longer runs of a reluctant loop)."""
        self.skip_strategy = SKIP_TO_NEXT
        return self

    def after_match_skip_past_last_event(self) -> "Pattern":
        self.skip_strategy = SKIP_PAST_LAST_EVENT
        return self

    def after_match_skip_to_first(self, stage_name: str) -> "Pattern":
        """AfterMatchSkipStrategy.skipToFirst(stage): discard matches
        starting before the first event of `stage` in the emitted match."""
        self.skip_strategy = SKIP_TO_FIRST
        self.skip_stage = stage_name
        return self

    def after_match_skip_to_last(self, stage_name: str) -> "Pattern":
        """AfterMatchSkipStrategy.skipToLast(stage)."""
        self.skip_strategy = SKIP_TO_LAST
        self.skip_stage = stage_name
        return self

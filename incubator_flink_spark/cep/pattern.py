"""Pattern combinator API (reference: flink-cep/.../pattern/Pattern.java:
begin:128, where:180, next:288, followedBy:316, notNext/notFollowedBy,
times:427, oneOrMore:391, optional:369, greedy:380, within:543).

A pattern is a linear sequence of stages; each stage has a name, a
predicate over the event (a callable on a dict-like row), a contiguity
mode relative to the previous stage (STRICT for next(), RELAXED for
followed_by()), and a quantifier (times(n[, m]), one_or_more, optional).
``within(seconds)`` bounds first-to-last event time.

Differences from the reference (documented divergence): predicates are
simple (non-iterative) conditions; contiguity NOT_NEXT/NOT_FOLLOWED_BY
is supported as a stage-level negation lookahead; after-match skip
supports NO_SKIP (default, all matches) and SKIP_PAST_LAST_EVENT.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

STRICT = "strict"  # next()
RELAXED = "relaxed"  # followedBy()

NO_SKIP = "no_skip"
SKIP_PAST_LAST_EVENT = "skip_past_last_event"

Predicate = Callable[[dict], bool]


@dataclass
class Stage:
    name: str
    contiguity: str = RELAXED
    predicates: list[Predicate] = field(default_factory=list)
    min_times: int = 1
    max_times: int = 1  # -1 → unbounded (oneOrMore)
    optional: bool = False
    negated: bool = False  # notNext/notFollowedBy

    def accepts(self, event: dict) -> bool:
        return all(p(event) for p in self.predicates)


class Pattern:
    """Linear pattern builder. All mutators return self for chaining."""

    def __init__(self, first_stage: Stage):
        self.stages: list[Stage] = [first_stage]
        self.within_s: float | None = None
        self.skip_strategy: str = NO_SKIP

    # --- constructors ---------------------------------------------------------
    @staticmethod
    def begin(name: str) -> "Pattern":
        return Pattern(Stage(name, contiguity=RELAXED))

    # --- predicates -----------------------------------------------------------
    def where(self, pred: Predicate) -> "Pattern":
        self.stages[-1].predicates.append(pred)
        return self

    def or_(self, pred: Predicate) -> "Pattern":
        """OR with the previous predicate (Pattern.or)."""
        stage = self.stages[-1]
        if not stage.predicates:
            stage.predicates.append(pred)
            return self
        prev = stage.predicates.pop()
        stage.predicates.append(lambda e, a=prev, b=pred: a(e) or b(e))
        return self

    # --- sequencing -----------------------------------------------------------
    def next(self, name: str) -> "Pattern":
        self.stages.append(Stage(name, contiguity=STRICT))
        return self

    def followed_by(self, name: str) -> "Pattern":
        self.stages.append(Stage(name, contiguity=RELAXED))
        return self

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

    def optional(self) -> "Pattern":
        self.stages[-1].optional = True
        return self

    # --- window / skip --------------------------------------------------------
    def within(self, seconds: float) -> "Pattern":
        self.within_s = seconds
        return self

    def after_match_skip_past_last_event(self) -> "Pattern":
        self.skip_strategy = SKIP_PAST_LAST_EVENT
        return self

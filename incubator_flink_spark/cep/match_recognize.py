"""MATCH_RECOGNIZE-style entry point over the CEP engine (reference:
SQL MATCH_RECOGNIZE via StreamExecMatch.java:90 + MatchCodeGenerator;
Calcite pattern grammar).

``match_recognize`` accepts the familiar clause pieces:

    match_recognize(
        df, partition_by=["user_id"], order_by="ts",
        pattern="A B+ C?",                  # quantifiers: + * ? {n} {n,m}
        define={"A": lambda e: ..., "B": lambda e, ctx: ...},
        measures=lambda key, m: {...},      # m: MatchAccess (FINAL semantics)
        output_schema="...", within=3600, after_match_skip=True)

Pattern grammar (linear, like the reference's supported core): variables
separated by spaces, each optionally quantified. All steps use relaxed
(followedBy) contiguity by default; pass ``strict=True`` for SQL-strict
row contiguity (next() semantics).

Measures semantics (StreamExecMatch.java:90, MatchCodeGenerator.scala):

- DEFINE conditions may take ``(row)`` or ``(row, ctx)``; the two-arg form
  gets RUNNING semantics — ``ctx.get_events_for_pattern(var)`` is the
  rows matched to ``var`` so far (LAST(A.x) ≡ ctx.get_events_for_pattern
  ("A")[-1]), and ``ctx.prev(n)`` / ``ctx.ahead(n)`` are the PREV/NEXT
  partition-row navigation functions.
- ONE ROW PER MATCH (default): ``measures(key, m)`` where ``m`` is a
  ``MatchAccess`` — a dict (variable → rows) extended with FINAL-semantics
  helpers: ``first/last(var, field)``, ``classifier()`` (variable of the
  final row), ``count/sum_/min_/max_(var, field)``.
- ALL ROWS PER MATCH: pass ``all_rows=True``; ``measures(key, running,
  final, row, classifier)`` is called once per matched row in match
  order, where ``running`` is the match restricted to rows up to and
  including the current one (RUNNING aggregates) and ``final`` the whole
  match (FINAL aggregates).
"""

from __future__ import annotations

import inspect
import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame

from incubator_flink_spark.cep.nfa import find_matches
from incubator_flink_spark.cep.pattern import Pattern

_TOKEN = re.compile(r"^(\w+)(\+\??|\*\??|\?|\{(\d+)(?:,(\d+))?\})?$")


class MatchAccess(dict):
    """A match (variable → captured rows, in order) with the
    MATCH_RECOGNIZE measure helpers (FINAL semantics over its contents)."""

    def __init__(self, match: dict[str, list[dict]], var_order: list[str]):
        super().__init__(match)
        self._var_order = [v for v in var_order if match.get(v)]

    def rows(self, var: str) -> list[dict]:
        return self.get(var, [])

    def first(self, var: str, field: str | None = None):
        r = self.rows(var)
        if not r:
            return None
        return r[0][field] if field else r[0]

    def last(self, var: str, field: str | None = None):
        r = self.rows(var)
        if not r:
            return None
        return r[-1][field] if field else r[-1]

    def classifier(self) -> str | None:
        """Variable name of the final row of the match (CLASSIFIER())."""
        return self._var_order[-1] if self._var_order else None

    def count(self, var: str) -> int:
        return len(self.rows(var))

    def sum_(self, var: str, field: str):
        return sum(r[field] for r in self.rows(var))

    def min_(self, var: str, field: str):
        r = self.rows(var)
        return min((x[field] for x in r), default=None)

    def max_(self, var: str, field: str):
        r = self.rows(var)
        return max((x[field] for x in r), default=None)


_QUANT = r"(?:\+\??|\*\??|\?|\{\d+(?:,\d+)?\})"
_PTOKEN = re.compile(rf"\(|\){_QUANT}?|\w+{_QUANT}?")


def _append_scalar(built: Pattern | None, tok: str, define: dict[str, Callable], strict: bool) -> Pattern:
    m = _TOKEN.match(tok)
    if not m:
        raise ValueError(f"bad pattern token: {tok}")
    name, quant = m.group(1), m.group(2)
    if built is None:
        built = Pattern.begin(name)
    elif strict:
        built = built.next(name)
    else:
        built = built.followed_by(name)
    pred = define.get(name)
    if pred is not None:
        # two-arg DEFINE conditions get RUNNING/navigation context
        # (PREV/NEXT, LAST(var.x) via ctx.get_events_for_pattern)
        if len(inspect.signature(pred).parameters) >= 2:
            built = built.where_iterative(pred)
        else:
            built = built.where(pred)
    # SQL MATCH_RECOGNIZE quantifiers are GREEDY by default; the
    # reluctant variants are spelled with a trailing '?' (B+?), unlike
    # the Pattern API where greedy() is opt-in (Pattern.java:380).
    if quant in ("+", "+?"):
        built = built.one_or_more()
        if quant == "+":
            built = built.greedy()
    elif quant in ("*", "*?"):
        built = built.one_or_more().optional()
        if quant == "*":
            built = built.greedy()
    elif quant == "?":
        built = built.optional()
    elif quant and quant.startswith("{"):
        n = int(m.group(3))
        mx = int(m.group(4)) if m.group(4) else n
        built = built.times(n, mx)
    return built


def _attach_group(built: Pattern | None, sub: Pattern, quant: str | None, strict: bool) -> Pattern:
    if built is None:
        built = Pattern.begin(sub)
    elif strict:
        built = built.next(sub)
    else:
        built = built.followed_by(sub)
    if quant in ("+", "*"):
        raise ValueError(
            f"greedy group quantifier '(...){quant}' is not supported "
            "(Pattern.java checkIfNoGroupPattern); use the reluctant "
            f"spelling '(...){quant}?'"
        )
    if quant == "+?":
        built = built.one_or_more()
    elif quant == "*?":
        built = built.one_or_more().optional()
    elif quant == "?":
        built = built.optional()
    elif quant and quant.startswith("{"):
        qm = re.fullmatch(r"\{(\d+)(?:,(\d+))?\}", quant)
        n = int(qm.group(1))
        built = built.times(n, int(qm.group(2)) if qm.group(2) else n)
    if strict and quant and quant != "?":
        # SQL row patterns are REGEX concatenation: the group's
        # iterations are strictly contiguous, not SKIP_TILL_NEXT
        built = built.consecutive()
    return built


def _parse_seq(
    toks: list[str], i: int, define: dict[str, Callable], strict: bool
) -> tuple[Pattern | None, int]:
    """Parse pattern items until an unmatched ')' or end of tokens;
    recursive descent, so groups NEST — ``((A B)+? C){2}`` — mirroring
    the reference's recursive group compilation (NFACompiler
    createGroupPatternState)."""
    built: Pattern | None = None
    while i < len(toks) and not toks[i].startswith(")"):
        if toks[i] == "(":
            sub, j = _parse_seq(toks, i + 1, define, strict)
            if j >= len(toks) or not toks[j].startswith(")"):
                raise ValueError("unbalanced '(' in pattern")
            if sub is None:
                raise ValueError("empty group in pattern")
            quant = toks[j][1:] or None
            built = _attach_group(built, sub, quant, strict)
            i = j + 1
        else:
            built = _append_scalar(built, toks[i], define, strict)
            i += 1
    return built, i


def parse_pattern(pattern: str, define: dict[str, Callable], strict: bool = False) -> Pattern:
    """Row-pattern text → Pattern.  Beyond the scalar token grammar,
    PARENTHESIZED GROUPS are supported — ``(A B)+? C`` / ``(A B){2}`` —
    and nest — ``((A B)+? C){2}`` — compiling to the engine's
    (recursively compiled) GroupPattern (GroupPattern.java:30; a
    Spark-side superset: the reference's SQL surface rejects grouped
    quantifiers, its CEP library accepts them).  Because the reference
    forbids GREEDY groups (Pattern.java checkIfNoGroupPattern), the
    greedy spellings ``(..)+``/``(..)*`` raise — use the reluctant
    ``+?``/``*?`` forms."""
    toks = _PTOKEN.findall(pattern)
    if not toks:
        raise ValueError("empty pattern")
    if "".join(toks).replace(" ", "") != pattern.replace(" ", ""):
        raise ValueError(f"bad pattern: {pattern!r}")
    built, i = _parse_seq(toks, 0, define, strict)
    if i < len(toks):
        raise ValueError(f"unbalanced ')' in pattern: {pattern!r}")
    if built is None:
        raise ValueError("empty pattern")
    return built


def _pattern_vars(pattern: str) -> list[str]:
    return re.findall(r"[A-Za-z_]\w*", pattern)


def _apply_skip(p, after_match_skip):
    """AFTER MATCH strategy → Pattern skip config.  ``True`` = SKIP PAST
    LAST ROW (the SQL default), ``False`` = SKIP TO NEXT ROW
    (AfterMatchSkipStrategy.skipToNext — at most one match per start
    row), ``"no_skip"`` = the library-only NO_SKIP that also emits
    same-start alternatives (every reluctant-loop prefix),
    ``("skip_to_first"|"skip_to_last", var)`` = SKIP TO FIRST/LAST var.

    BEHAVIOR CHANGE (r7): ``False`` used to mean NO_SKIP; it now maps to
    SKIP TO NEXT ROW per the SQL spelling it documents — callers wanting
    the old every-alternative enumeration must pass ``"no_skip"``
    explicitly (also noted in COVERAGE.md)."""
    if after_match_skip is True:
        return p.after_match_skip_past_last_event()
    if after_match_skip is False:
        return p.after_match_skip_to_next()
    if after_match_skip == "no_skip":
        return p  # Pattern default: NO_SKIP
    if isinstance(after_match_skip, tuple) and len(after_match_skip) == 2:
        strat, stage = after_match_skip
        if strat == "skip_to_first":
            return p.after_match_skip_to_first(stage)
        if strat == "skip_to_last":
            return p.after_match_skip_to_last(stage)
    raise ValueError(
        f"unsupported after_match_skip {after_match_skip!r}: use True (past last row), "
        "False (to next row), 'no_skip' (library-only: all same-start alternatives), "
        "or ('skip_to_first'|'skip_to_last', variable)"
    )


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    pattern: str,
    define: dict[str, Callable],
    measures: Callable,
    output_schema: str,
    within: float | None = None,
    after_match_skip: bool | tuple[str, str] = True,
    strict: bool = False,
    tiebreak: str | None = None,
    all_rows: bool = False,
) -> DataFrame:
    """ONE ROW PER MATCH by default; ``all_rows=True`` for ALL ROWS PER
    MATCH with per-row RUNNING semantics (see module docstring)."""
    p = parse_pattern(pattern, define, strict=strict)
    if within is not None:
        p = p.within(within)
    p = _apply_skip(p, after_match_skip)
    var_order = _pattern_vars(pattern)
    order = [order_by] + ([tiebreak] if tiebreak else [])

    def group_fn(first: dict, events: list[dict]) -> list[dict]:
        key_dict = {k: first[k] for k in partition_by}
        rows = []
        for m in find_matches(p, events, ts_key=order_by):
            final = MatchAccess(m, var_order)
            if not all_rows:
                rows.append(measures(key_dict, final))
                continue
            # ALL ROWS PER MATCH: iterate matched rows in variable order,
            # building the RUNNING view incrementally
            running: dict[str, list[dict]] = {}
            for var in var_order:
                for row in m.get(var, []):
                    running.setdefault(var, []).append(row)
                    rows.append(
                        measures(
                            key_dict,
                            MatchAccess({k: list(v) for k, v in running.items()}, var_order),
                            final,
                            row,
                            var,
                        )
                    )
        return rows

    from incubator_flink_spark.cep.executor import run_grouped

    return run_grouped(df, partition_by, order, group_fn, output_schema)


def match_recognize_sql(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    pattern: str,
    define: dict[str, str],
    measures: dict[str, str],
    output_schema: str,
    within: float | None = None,
    after_match_skip: bool | tuple[str, str] = True,
    strict: bool = False,
    tiebreak: str | None = None,
    all_rows: bool = False,
    input_cols: list[str] | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE with DEFINE/MEASURES given as SQL text — the
    reference's SQL spelling (StreamExecMatch.java:90; expressions
    compiled by cep/sql_expr.py instead of MatchCodeGenerator's Janino).

    ``define``: variable → SQL boolean over the current row with
    PREV/NEXT/FIRST/LAST navigation and RUNNING aggregates;
    ``measures``: output column → SQL expression. ONE ROW PER MATCH
    (default): FINAL semantics, output = partition keys + measures.
    ALL ROWS PER MATCH (``all_rows=True``): one output row per matched
    input row carrying ``input_cols`` (default: all input columns) then
    the measures — aggregates default to RUNNING, the FINAL keyword
    switches to whole-match values, bare columns read the current row,
    CLASSIFIER() is the row's variable. ``output_schema`` is the DDL for
    exactly the emitted columns."""
    import re

    from incubator_flink_spark.cep.sql_expr import compile_define, compile_measure

    compiled_def = {v: compile_define(v, sql) for v, sql in define.items()}
    compiled_meas = {name: compile_measure(sql) for name, sql in measures.items()}

    if all_rows:
        cols = input_cols if input_cols is not None else list(df.columns)

    # Prune to the columns the DEFINE/MEASURES text references (plus keys,
    # order, tiebreak, and — under ALL ROWS — the carried input columns):
    # the compiled predicates read row dicts by name, so Spark cannot see
    # which columns they touch and would otherwise ship every column
    # through the exchange and the Arrow boundary (guide §2.3/§4.1).
    # Identifier extraction over-approximates (a name inside a string
    # literal keeps its column) — over-inclusion is safe, it can never
    # change a result.
    idents: set[str] = set()
    for sql in [*define.values(), *measures.values()]:
        idents |= set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", sql))
    need = dict.fromkeys(
        [*partition_by, order_by, *([tiebreak] if tiebreak else [])]
        + ([] if not all_rows else cols)
        + [c for c in df.columns if c in idents]
    )
    if len(need) < len(df.columns):
        df = df.select(*need)

    if all_rows:

        def measures_fn(key: dict, running: MatchAccess, final: MatchAccess, row: dict, cls: str) -> dict:
            out = {c: row.get(c) for c in cols}
            for name, fn in compiled_meas.items():
                out[name] = fn(running, final, row, cls)
            return out

    else:

        def measures_fn(key: dict, m: MatchAccess) -> dict:
            out = dict(key)
            for name, fn in compiled_meas.items():
                out[name] = fn(m)
            return out

    return match_recognize(
        df,
        partition_by,
        order_by,
        pattern,
        compiled_def,
        measures_fn,
        output_schema,
        within=within,
        after_match_skip=after_match_skip,
        strict=strict,
        tiebreak=tiebreak,
        all_rows=all_rows,
    )


def match_recognize_stream_sql(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    pattern: str,
    define: dict[str, str],
    measures: dict[str, str],
    output_schema: str,
    within: float,
    tiebreak: str,
) -> DataFrame:
    """Streaming MATCH_RECOGNIZE with SQL-text DEFINE/MEASURES
    (StreamExecMatch's native home is streaming SQL). Runs on the
    incremental NFA (streaming/cep_stream.match_pattern_stream):
    watermark-driven emission, state bounded by ``within`` (required).
    Divergence (documented there): NO_SKIP match enumeration only, so
    overlapping matches all emit — the AFTER MATCH SKIP strategies need
    cross-batch match bookkeeping."""
    from incubator_flink_spark.cep.sql_expr import compile_define, compile_measure
    from incubator_flink_spark.streaming.cep_stream import match_pattern_stream

    compiled_def = {v: compile_define(v, sql) for v, sql in define.items()}
    compiled_meas = {name: compile_measure(sql) for name, sql in measures.items()}
    p = parse_pattern(pattern, compiled_def, strict=True).within(within)
    var_order = _pattern_vars(pattern)

    def select_fn(key: dict, m: dict) -> dict:
        out = dict(key)
        access = MatchAccess(m, var_order)
        for name, fn in compiled_meas.items():
            out[name] = fn(access)
        return out

    return match_pattern_stream(
        df, partition_by, order_by, p, select_fn, output_schema, tiebreak
    )

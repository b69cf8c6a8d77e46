"""MATCH_RECOGNIZE-style entry point over the CEP engine (reference:
SQL MATCH_RECOGNIZE via StreamExecMatch.java:90 + MatchCodeGenerator;
Calcite pattern grammar).

``match_recognize`` accepts the familiar clause pieces:

    match_recognize(
        df, partition_by=["user_id"], order_by="ts",
        pattern="A B+ C?",                  # quantifiers: + * ? {n} {n,m}
        define={"A": lambda e: ..., "B": ...},   # omitted name = always true
        measures=lambda key, match: {...},  # one output row per match
        output_schema="...", within=3600, after_match_skip=True)

Pattern grammar (linear, like the reference's supported core): variables
separated by spaces, each optionally quantified. All steps use relaxed
(followedBy) contiguity, matching MATCH_RECOGNIZE semantics where
non-matching rows between pattern rows are not allowed — NOTE: strict SQL
MATCH_RECOGNIZE is contiguous over the partition's rows; pass
``strict=True`` for that behavior (next() contiguity).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame

from incubator_flink_spark.cep.executor import match_pattern
from incubator_flink_spark.cep.pattern import Pattern

_TOKEN = re.compile(r"^(\w+)(\+|\*|\?|\{(\d+)(?:,(\d+))?\})?$")


def parse_pattern(pattern: str, define: dict[str, Callable], strict: bool = False) -> Pattern:
    tokens = pattern.split()
    if not tokens:
        raise ValueError("empty pattern")
    built: Pattern | None = None
    for tok in tokens:
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
            built = built.where(pred)
        if quant == "+":
            built = built.one_or_more()
        elif quant == "*":
            built = built.one_or_more().optional()
        elif quant == "?":
            built = built.optional()
        elif quant and quant.startswith("{"):
            n = int(m.group(3))
            mx = int(m.group(4)) if m.group(4) else n
            built = built.times(n, mx)
    return built


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    pattern: str,
    define: dict[str, Callable],
    measures: Callable[[dict, dict], dict],
    output_schema: str,
    within: float | None = None,
    after_match_skip: bool = True,
    strict: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """ONE ROW PER MATCH semantics (the reference's default)."""
    p = parse_pattern(pattern, define, strict=strict)
    if within is not None:
        p = p.within(within)
    if after_match_skip:
        p = p.after_match_skip_past_last_event()
    return match_pattern(df, partition_by, order_by, p, measures, output_schema, tiebreak=tiebreak)

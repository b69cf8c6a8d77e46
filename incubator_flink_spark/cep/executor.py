"""CEP execution operator: distribute the NFA over keys with
Arrow-batched applyInPandas (reference: CepOperator.java:81 keyed
execution; SQL MATCH_RECOGNIZE partitioning).

Scale: one shuffle on the key columns; each key's events are sorted and
matched locally (the same distribution the reference uses — CEP state is
per key). Skewed keys are the caveat, as in the reference.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame

from incubator_flink_spark.cep.nfa import find_matches, find_timed_out_matches
from incubator_flink_spark.cep.pattern import Pattern


def match_pattern(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    pattern: Pattern,
    select_fn: Callable[[dict, dict[str, list[dict]]], dict],
    output_schema: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Run `pattern` per key over `df` ordered by (ts, tiebreak).

    ``select_fn(key_dict, match)`` maps each match (stage name → list of
    event dicts) to one output row dict — the PatternSelectFunction
    equivalent.
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        events = pdf.to_dict("records")
        key_dict = {k: pdf[k].iloc[0] for k in keys}
        rows = [select_fn(key_dict, m) for m in find_matches(pattern, events, ts_key=ts_col)]
        if not rows:
            return pd.DataFrame(columns=[c.strip().split(" ")[0] for c in output_schema.split(",")])
        return pd.DataFrame(rows)

    return df.groupBy(*keys).applyInPandas(fn, output_schema)


def match_pattern_with_timeouts(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    pattern: Pattern,
    select_fn: Callable[[dict, dict[str, list[dict]]], dict],
    timeout_fn: Callable[[dict, dict[str, list[dict]]], dict],
    output_schema: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """match_pattern plus the timeout side output (reference:
    PatternStream.select(timeoutTag, PatternTimeoutFunction,
    PatternSelectFunction)).

    Bounded input ⇒ the watermark ends at +inf, so every partial match of
    a ``within`` pattern that never completed is timed out and mapped
    through ``timeout_fn(key_dict, partial_capture)``. Spark operators are
    single-output, so both row kinds share ``output_schema`` — encode a
    tag column and filter-split downstream (the side-output convention
    used by streaming/lookup.side_outputs).
    """
    if pattern.within_s is None:
        raise ValueError("timeout output requires pattern.within(...)")
    order = [ts_col] + ([tiebreak] if tiebreak else [])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        events = pdf.to_dict("records")
        key_dict = {k: pdf[k].iloc[0] for k in keys}
        rows = [select_fn(key_dict, m) for m in find_matches(pattern, events, ts_key=ts_col)]
        rows += [
            timeout_fn(key_dict, p)
            for p in find_timed_out_matches(pattern, events, ts_key=ts_col, now=None)
        ]
        if not rows:
            return pd.DataFrame(columns=[c.strip().split(" ")[0] for c in output_schema.split(",")])
        return pd.DataFrame(rows)

    return df.groupBy(*keys).applyInPandas(fn, output_schema)

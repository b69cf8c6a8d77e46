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

from incubator_flink_spark.cep.nfa import find_matches
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

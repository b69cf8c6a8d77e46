"""CEP execution operator: distribute the NFA over keys with
Arrow-batched applyInPandas (reference: CepOperator.java:81 keyed
execution; SQL MATCH_RECOGNIZE partitioning).

Scale: one shuffle on the key columns; each key's events are sorted and
matched locally (the same distribution the reference uses — CEP state is
per key). Skewed keys are the caveat, as in the reference.
"""

from __future__ import annotations

import math
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


def match_pattern_segmented(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    pattern: Pattern,
    select_fn: Callable[[dict, dict[str, list[dict]]], dict],
    output_schema: str,
    tiebreak: str | None = None,
    segment_s: float | None = None,
) -> DataFrame:
    """Skew-mitigated execution of a ``within``-bounded pattern: a hot
    key holding most of the stream turns the per-key NFA into one giant
    straggler task (per-key cost is superlinear in events for looping /
    ALL-ROWS patterns).  Because a match spans at most ``within``
    seconds, every match is contained in two consecutive W-second
    segments (W = within): each event is replicated to its own segment
    and the previous one, the NFA runs per (key, segment-pair) group,
    and a match is kept iff its FIRST event falls in the group's own
    segment — exact, no duplicates, no misses.

    Cost: 2x input replication and a (keys, segment) shuffle whose
    groups are bounded by the events of a 2W window — the hot key
    parallelizes across its timeline instead of serializing into one
    task.  ``segment_s`` (default: within) sets the segment length W;
    any W >= within is exact (a match still fits in two consecutive
    segments), and a LARGER W amortizes per-group Arrow/Python overhead
    when within is small relative to event density — pick W so a
    segment holds thousands of events, not single digits.  Restricted
    to NO_SKIP (after-match skip cursors cross segment boundaries) and
    within-bounded patterns; both are checked.

    Reference parallel: CepOperator is per-key too and has the same
    hot-key caveat; this is the Spark-side mitigation the 100 TB design
    calls for (ARCHITECTURE.md CEP skew probe).
    """
    from pyspark.sql import functions as F

    from incubator_flink_spark.cep.pattern import NO_SKIP

    if pattern.within_s is None:
        raise ValueError("segmented execution requires pattern.within(...)")
    if pattern.skip_strategy != NO_SKIP:
        raise ValueError("segmented execution supports NO_SKIP only")
    if pattern.stages[-1].negated:
        # a trailing notFollowedBy's forbidden region runs to END OF
        # STREAM (nfa._violates_negation), which the 2-segment horizon
        # truncates — segmented execution could emit matches the plain
        # executor suppresses.  Non-trailing negation regions are bounded
        # by the next captured event, which the within window keeps
        # inside the horizon, so they stay exact.
        raise ValueError(
            "segmented execution does not support a trailing negated stage "
            "(its forbidden region extends beyond the segment horizon)"
        )
    w = float(segment_s if segment_s is not None else pattern.within_s)
    if w < float(pattern.within_s):
        raise ValueError("segment_s must be >= pattern.within_s")
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    # __epoch is computed by Spark with the SAME cast that derives __seg,
    # so the Python-side first-event segment floor below agrees with the
    # Spark-side assignment regardless of spark.sql.session.timeZone
    # (pandas Timestamp.timestamp() would re-interpret the naive value).
    epoch = F.col(ts_col).cast("double")
    seg = F.floor(epoch / w).cast("long")
    rep = df.withColumn("__epoch", epoch).withColumn(
        "__seg", F.explode(F.array(seg, seg - F.lit(1).cast("long")))
    )
    # EXPLICIT partition count: CEP events are small in bytes but heavy in
    # Python compute, so AQE's byte-targeted partition coalescing would
    # collapse this shuffle to one task and serialize the NFA work —
    # exactly the straggler this operator exists to break.  A
    # user-specified numPartitions is exempt from coalescing, and
    # groupBy on the same columns reuses the partitioning (no second
    # exchange).
    n_part = df.sparkSession.sparkContext.defaultParallelism
    rep = rep.repartition(n_part, *keys, "__seg")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        seg_val = int(pdf["__seg"].iloc[0])
        # keep __epoch in the event dicts: predicates ignore unknown keys
        # and the ownership test below needs the Spark-computed epoch
        events = pdf.drop(columns=["__seg"]).to_dict("records")
        key_dict = {k: pdf[k].iloc[0] for k in keys}
        rows = []
        for m in find_matches(pattern, events, ts_key=ts_col):
            first_epoch = min(e["__epoch"] for evs in m.values() for e in evs if evs)
            # math.floor(a / b) matches Spark's FLOOR(a / b) bit-for-bit
            # (same IEEE divide); Python's a // b corrects the rounding
            # and can disagree exactly at segment boundaries
            if math.floor(first_epoch / w) == seg_val:
                rows.append(select_fn(key_dict, m))
        if not rows:
            return pd.DataFrame(columns=[c.strip().split(" ")[0] for c in output_schema.split(",")])
        return pd.DataFrame(rows)

    return rep.groupBy(*keys, "__seg").applyInPandas(fn, output_schema)

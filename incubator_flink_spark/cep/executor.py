"""CEP execution operator: distribute the NFA over keys with
Arrow-batched partition-level processing (reference: CepOperator.java:81
keyed execution; SQL MATCH_RECOGNIZE partitioning).

Scale: one shuffle on the key columns; each key's events are sorted and
matched locally (the same distribution the reference uses — CEP state is
per key). Skewed keys are the caveat, as in the reference.

Execution shape (r10 optimization, guide §2.4/§4): events are hash-
repartitioned by key to cluster parallelism (an EXPLICIT partition
count — CEP rows are tiny in bytes but heavy in Python compute, so
AQE's byte-targeted coalescing would collapse the exchange to one task
and serialize every key's NFA into a single straggler), sorted within
partitions by (keys, ts, tiebreak) in the JVM, and processed by ONE
``mapInPandas`` function per partition that walks key-group boundaries
itself.  The previous ``groupBy().applyInPandas`` shape paid a pandas
``sort_values`` + ``to_dict('records')`` + ``pd.DataFrame`` per key
group — with thousands of small key groups, per-group Python/Arrow
overhead dominated the NFA itself by ~4x.  One conversion per Arrow
batch amortizes that to noise; match semantics are identical (the NFA
still sees exactly one key's events, time-sorted).
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from incubator_flink_spark.cep.nfa import find_matches, find_timed_out_matches
from incubator_flink_spark.cep.pattern import Pattern

# Flush threshold for the output row buffer inside the partition walker:
# bounds peak memory for match-dense patterns (ALL-ROWS / NO_SKIP) while
# keeping output Arrow batches large enough to amortize the boundary.
_OUT_FLUSH_ROWS = 50_000


def _out_cols(output_schema: str) -> list[str]:
    return [c.strip().split(" ")[0] for c in output_schema.split(",")]


def run_grouped(
    df: DataFrame,
    group_cols: list[str],
    order: list[str],
    group_fn: Callable[[dict, list[dict]], list[dict]],
    output_schema: str,
) -> DataFrame:
    """Run ``group_fn(first_row, events)`` once per distinct ``group_cols``
    value over ``df``, with each group's events ordered by ``order``.

    The partitioning/sort happens in the JVM (Tungsten); Python sees one
    Arrow batch at a time, converts it to row dicts ONCE, and slices key
    groups by walking the sorted key columns — a key group spanning
    multiple Arrow batches (or whose rows straddle a batch boundary) is
    carried over and processed when its last row has been seen.  Returns
    ``group_fn``'s row dicts as a DataFrame of ``output_schema``.
    """
    n_part = df.sparkSession.sparkContext.defaultParallelism
    part = df.repartition(n_part, *group_cols).sortWithinPartitions(*group_cols, *order)
    out_cols = _out_cols(output_schema)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pend_key: tuple | None = None
        pend: list[dict] = []
        out: list[dict] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = list(pdf.columns)
            rows = [dict(zip(cols, t)) for t in zip(*(pdf[c].tolist() for c in cols))]
            for r in rows:
                k = tuple(r[c] for c in group_cols)
                if k != pend_key:
                    if pend:
                        out.extend(group_fn(pend[0], pend))
                    pend_key, pend = k, []
                pend.append(r)
            if len(out) >= _OUT_FLUSH_ROWS:
                yield pd.DataFrame(out, columns=out_cols)
                out = []
        if pend:
            out.extend(group_fn(pend[0], pend))
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return part.mapInPandas(fn, output_schema)


def _prune(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak: str | None, columns: list[str] | None
) -> DataFrame:
    """Optionally project to the columns the pattern actually touches
    (guide §2.3: shuffle fewer bytes; §4.1: pass only what the function
    needs — Spark cannot see inside the Python predicates, so without an
    explicit select every column crosses the exchange AND the Arrow
    boundary).  ``columns=None`` keeps all columns (safe default)."""
    if columns is None:
        return df
    need = list(dict.fromkeys([*keys, ts_col, *([tiebreak] if tiebreak else []), *columns]))
    return df.select(*need)


def match_pattern(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    pattern: Pattern,
    select_fn: Callable[[dict, dict[str, list[dict]]], dict],
    output_schema: str,
    tiebreak: str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Run `pattern` per key over `df` ordered by (ts, tiebreak).

    ``select_fn(key_dict, match)`` maps each match (stage name → list of
    event dicts) to one output row dict — the PatternSelectFunction
    equivalent.  ``columns`` optionally names the non-key payload columns
    the predicates/select_fn read; when given, everything else is pruned
    before the shuffle.
    """
    df = _prune(df, keys, ts_col, tiebreak, columns)
    order = [ts_col] + ([tiebreak] if tiebreak else [])

    def group_fn(first: dict, events: list[dict]) -> list[dict]:
        key_dict = {k: first[k] for k in keys}
        return [select_fn(key_dict, m) for m in find_matches(pattern, events, ts_key=ts_col)]

    return run_grouped(df, keys, order, group_fn, output_schema)


def match_pattern_with_timeouts(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    pattern: Pattern,
    select_fn: Callable[[dict, dict[str, list[dict]]], dict],
    timeout_fn: Callable[[dict, dict[str, list[dict]]], dict],
    output_schema: str,
    tiebreak: str | None = None,
    columns: list[str] | None = None,
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
    df = _prune(df, keys, ts_col, tiebreak, columns)
    order = [ts_col] + ([tiebreak] if tiebreak else [])

    def group_fn(first: dict, events: list[dict]) -> list[dict]:
        key_dict = {k: first[k] for k in keys}
        rows = [select_fn(key_dict, m) for m in find_matches(pattern, events, ts_key=ts_col)]
        rows += [
            timeout_fn(key_dict, p)
            for p in find_timed_out_matches(pattern, events, ts_key=ts_col, now=None)
        ]
        return rows

    return run_grouped(df, keys, order, group_fn, output_schema)


def match_pattern_segmented(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    pattern: Pattern,
    select_fn: Callable[[dict, dict[str, list[dict]]], dict],
    output_schema: str,
    tiebreak: str | None = None,
    segment_s: float | None = None,
    columns: list[str] | None = None,
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
    df = _prune(df, keys, ts_col, tiebreak, columns)
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

    def group_fn(first: dict, events: list[dict]) -> list[dict]:
        key_dict = {k: first[k] for k in keys}
        seg_val = int(first["__seg"])
        rows = []
        for m in find_matches(pattern, events, ts_key=ts_col):
            first_epoch = min(e["__epoch"] for evs in m.values() for e in evs if evs)
            # math.floor(a / b) matches Spark's FLOOR(a / b) bit-for-bit
            # (same IEEE divide); Python's a // b corrects the rounding
            # and can disagree exactly at segment boundaries
            if math.floor(first_epoch / w) == seg_val:
                rows.append(select_fn(key_dict, m))
        return rows

    # run_grouped's explicit repartition to defaultParallelism is exactly
    # the AQE-coalescing exemption this operator has always needed (see
    # module docstring); grouping on (keys, __seg) parallelizes the hot
    # key across its timeline.
    return run_grouped(rep, [*keys, "__seg"], order, group_fn, output_schema)

"""Flink SQL windowing TVF rewrite: ``TABLE(TUMBLE|HOP|CUMULATE|SESSION
(TABLE t …, DESCRIPTOR(ts), INTERVAL …))`` fragments become registered
temp views built from the engine's window-assignment operators, so the
reference's windowed SQL (reference: flink-table-planner/.../
StreamExecWindowTableFunction.java:49 and docs' window-TVF grammar) runs
through ``spark.sql`` unmodified.

Output parity: each view carries ``window_start``, ``window_end`` and
``window_time`` (= window_end - 1ms, Flink's TVF time attribute) plus
every input column.  TUMBLE/HOP/CUMULATE are row-level (map-side) window
assignments; SESSION is merged eagerly with the gaps-and-islands rewrite
(same as the batch session operator and WindowedStream.apply) because a
row-level session view must already know its merged window bounds.

Scale: the rewrite itself is driver-side string work; the views are lazy
DataFrames whose plans are the same map-side assignments the DataFrame
API produces — nothing is materialized at rewrite time.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubator_flink_spark.operators.windows import cumulate, hop, tumble

_COUNTER = itertools.count()

_UNIT_S = {
    "SECOND": 1,
    "SECONDS": 1,
    "MINUTE": 60,
    "MINUTES": 60,
    "HOUR": 3600,
    "HOURS": 3600,
    "DAY": 86400,
    "DAYS": 86400,
}

_INTERVAL_RE = re.compile(r"INTERVAL\s+'(\d+)'\s+(\w+)", re.IGNORECASE)

_TVF_RE = re.compile(
    r"TABLE\s*\(\s*(TUMBLE|HOP|CUMULATE|SESSION)\s*\(\s*"
    r"(?:DATA\s*=>\s*)?TABLE\s+(\w+)\s*"
    r"(?:PARTITION\s+BY\s+(\(?\s*\w+(?:\s*,\s*\w+)*\s*\)?)\s*)?,\s*"
    r"(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*"
    r"([^()]*?)\)\s*\)",
    re.IGNORECASE,
)


def _intervals_s(arg_text: str) -> list[int]:
    out = []
    for n, unit in _INTERVAL_RE.findall(arg_text):
        u = unit.upper()
        if u not in _UNIT_S:
            raise ValueError(f"unsupported interval unit {unit!r} in window TVF")
        out.append(int(n) * _UNIT_S[u])
    if not out:
        raise ValueError(f"no INTERVAL arguments in window TVF: {arg_text!r}")
    return out


def _session_merged(df: DataFrame, keys: list[str], ts_col: str, gap_s: int) -> DataFrame:
    """Row-level merged session windows via gaps-and-islands (batch).

    With no PARTITION BY keys the fallback is a keyless window — a
    single-partition sort, matching SQL semantics for an unkeyed
    SESSION TVF (one global session stream is inherently sequential).
    Keyed usage — the normal case — runs at full parallelism; callers
    with a big unkeyed stream should pre-bucket or supply keys
    (operators/rank.py shows the distributed construction)."""
    w = Window.partitionBy(*keys).orderBy(ts_col) if keys else Window.orderBy(ts_col)
    gap_us = gap_s * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    new_sess = F.when(prev.isNull() | (us - prev > gap_us), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = df.withColumn("__session_id", F.sum(new_sess).over(run))
    sess_keys = [*keys, "__session_id"]
    sw = Window.partitionBy(*sess_keys)
    return (
        merged.withColumn("window_start", F.min(ts_col).over(sw))
        .withColumn(
            "window_end",
            F.timestamp_micros(F.unix_micros(F.max(ts_col).over(sw)) + gap_us),
        )
        .drop("__session_id")
    )


def _build_view(spark: SparkSession, kind: str, tbl: str, part: str | None, ts_col: str, ivals: list[int]) -> DataFrame:
    df = spark.table(tbl)
    kind = kind.upper()
    if kind == "TUMBLE":
        (size,) = ivals
        out = tumble(df, ts_col, size)
    elif kind == "HOP":
        slide, size = ivals  # Flink arg order: slide, then size
        out = hop(df, ts_col, size_s=size, slide_s=slide)
    elif kind == "CUMULATE":
        step, max_size = ivals
        out = cumulate(df, ts_col, step_s=step, max_size_s=max_size)
    else:  # SESSION
        (gap,) = ivals
        keys = [k.strip() for k in part.strip("() ").split(",")] if part else []
        if df.isStreaming:
            # row-level session merge needs per-key state on a stream; the
            # batch gaps-and-islands rewrite uses lag/over windows Spark
            # forbids on streaming plans
            from incubator_flink_spark.streaming.windows import session_rows_streaming

            out = session_rows_streaming(df, keys, ts_col, gap)
        else:
            out = _session_merged(df, keys, ts_col, gap)
    return out.withColumn(
        "window_time", F.timestamp_micros(F.unix_micros(F.col("window_end")) - 1_000)
    )


def rewrite_window_tvf(spark: SparkSession, sql: str) -> str:
    """Replace every windowing-TVF fragment with a temp-view reference.
    Returns the rewritten SQL (unchanged if no TVF present)."""

    def repl(m: re.Match) -> str:
        kind, tbl, part, ts_col, args = m.groups()
        view = f"__tvf_{next(_COUNTER)}"
        _build_view(spark, kind, tbl, part, ts_col, _intervals_s(args)).createOrReplaceTempView(view)
        return view

    return _TVF_RE.sub(repl, sql)


# ---------------------------------------------------------------------------
# Legacy (pre-TVF) group-window SQL: ``GROUP BY TUMBLE(ts, INTERVAL …)``
# with TUMBLE_START/_END/_ROWTIME/_PROCTIME auxiliaries (reference docs'
# "group window aggregation" grammar; planner LogicalWindowAggregate /
# FlinkSqlOperatorTable TUMBLE_OLD/HOP_OLD/SESSION_OLD + the *_ROWTIME
# auxiliary operators).  Rewritten onto Spark's native window()/
# session_window() grouping expressions — Catalyst-only, no views.
# ---------------------------------------------------------------------------

_LEGACY_WIN_RE = re.compile(
    r"\b(TUMBLE|HOP|SESSION)\s*\(\s*(\w+)\s*,\s*"
    r"(INTERVAL\s+'\d+'\s+\w+(?:\s*,\s*INTERVAL\s+'\d+'\s+\w+)?)\s*\)",
    re.IGNORECASE,
)

_LEGACY_AUX_RE = re.compile(
    r"\b(TUMBLE|HOP|SESSION)_(START|END|ROWTIME|PROCTIME)\s*\(\s*[^()]*?\)",
    re.IGNORECASE,
)


def _dur(arg_text: str) -> list[str]:
    return [f"{n} {unit.lower()}" for n, unit in _INTERVAL_RE.findall(arg_text)]


def rewrite_legacy_group_windows(sql: str) -> str:
    """Rewrite legacy group-window SQL to Spark grouping expressions:

    - ``TUMBLE(ts, size)``        -> ``window(ts, 'size')``
    - ``HOP(ts, slide, size)``    -> ``window(ts, 'size', 'slide')``
      (Flink's legacy HOP argument order is slide, then size)
    - ``SESSION(ts, gap)``        -> ``session_window(ts, 'gap')``
    - ``*_START(...)`` / ``*_END(...)`` -> ``<win>.start`` / ``<win>.end``
    - ``*_ROWTIME(...)`` -> ``<win>.end - INTERVAL 1 MILLISECOND`` (the
      reference's rowtime attribute is window_end - 1ms); ``*_PROCTIME``
      maps to the same value — batch/bounded execution has no separate
      processing-time attribute (same query-constant policy as
      compat.proctime's documented divergence).

    The auxiliaries must be rewritten BEFORE the grouping calls (their
    names contain the window-call names as prefixes)."""

    def aux(m: re.Match) -> str:
        kind, part = m.group(1).upper(), m.group(2).upper()
        col = "session_window" if kind == "SESSION" else "window"
        if part == "START":
            return f"{col}.start"
        if part == "END":
            return f"{col}.end"
        return f"{col}.end - INTERVAL 1 MILLISECOND"

    def win(m: re.Match) -> str:
        kind, ts_col, args = m.group(1).upper(), m.group(2), m.group(3)
        d = _dur(args)
        if kind == "TUMBLE":
            (size,) = d
            return f"window({ts_col}, '{size}')"
        if kind == "HOP":
            slide, size = d
            return f"window({ts_col}, '{size}', '{slide}')"
        (gap,) = d
        return f"session_window({ts_col}, '{gap}')"

    return _LEGACY_WIN_RE.sub(win, _LEGACY_AUX_RE.sub(aux, sql))

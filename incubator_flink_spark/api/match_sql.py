"""SQL `... FROM t MATCH_RECOGNIZE (...)` rewriting for sql_query
(reference: the Calcite MATCH_RECOGNIZE grammar executed by
StreamExecMatch.java:90; the surrounding query still runs on Spark SQL —
the clause itself executes on the CEP engine and is substituted as a
temp view, the same pre-parse strategy as the FOR SYSTEM_TIME and window
TVF rewrites in api/temporal.py / api/tvf.py).

Clause support: PARTITION BY, ORDER BY (single ascending column), MEASURES
(expr AS name), ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST ROW / TO
NEXT ROW / TO FIRST var / TO LAST var (all four reference
AfterMatchSkipStrategy variants), PATTERN with the quantifier grammar of
cep/match_recognize.parse_pattern, WITHIN INTERVAL, DEFINE.  Unrecognized
AFTER MATCH / WITHIN / ORDER BY spellings raise rather than silently
running different semantics. Expressions use cep/sql_expr.py's grammar. SQL PATTERN
concatenation is strict contiguity (regex adjacency), matching the
reference.

Measure output types are inferred structurally (COUNT→BIGINT,
CLASSIFIER→STRING, comparisons→BOOLEAN, AVG or '/'→DOUBLE, otherwise the
referenced column's type) — sufficient for the reference's documented
examples; pass an explicit schema through the API form
(cep.match_recognize_sql) when inference falls short.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import types as T

_MR = re.compile(r"\bFROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\(", re.IGNORECASE)
_UNIT_S = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}
_counter = [0]


def _balanced(sql: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx."""
    depth = 0
    for i in range(open_idx, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parentheses in MATCH_RECOGNIZE")


def _split_top(text: str, sep: str = ",") -> list[str]:
    out, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def _clause(body: str, name: str, stops: list[str]) -> str | None:
    m = re.search(rf"\b{name}\b", body, re.IGNORECASE)
    if not m:
        return None
    start = m.end()
    end = len(body)
    for s in stops:
        sm = re.search(rf"\b{s}\b", body[start:], re.IGNORECASE)
        if sm:
            end = min(end, start + sm.start())
    return body[start:end].strip()


_STOPS = [
    "ORDER BY",
    "MEASURES",
    "ONE ROW PER MATCH",
    "ALL ROWS PER MATCH",
    "AFTER MATCH",
    "PATTERN",
    "WITHIN",
    "DEFINE",
]


def _infer_type(expr: str, schema: T.StructType) -> str:
    up = expr.upper()
    # two-char comparators first so >= / <= don't slip past the check
    if re.search(r"<=|>=|<>|!=|(^|[^<>!=])=|<[^=>]|>[^=]|\bAND\b|\bOR\b|\bNOT\b", up):
        return "BOOLEAN"
    if "CLASSIFIER" in up:
        return "STRING"
    if re.search(r"\bCOUNT\s*\(", up):
        return "BIGINT"
    if re.search(r"\bAVG\s*\(", up) or "/" in expr:
        return "DOUBLE"
    m = re.search(r"\b(?:\w+)\s*\.\s*(\w+)", expr) or re.search(r"\b(\w+)\b\s*(?:$|[-+*%)])", expr)
    if m:
        col = m.group(1)
        for f in schema.fields:
            if f.name == col:
                return f.dataType.simpleString().upper()
    return "DOUBLE"


def _parse_after_match(after: str) -> bool | tuple[str, str]:
    """AFTER MATCH text → match_recognize's skip argument, covering all
    four reference AfterMatchSkipStrategy spellings; anything else
    raises instead of silently defaulting (the NFA would happily run a
    different strategy and return a different match set)."""
    txt = after.strip()
    if not txt or re.fullmatch(r"SKIP\s+PAST\s+LAST\s+ROW", txt, re.IGNORECASE):
        return True  # SQL default
    if re.fullmatch(r"SKIP\s+TO\s+NEXT\s+ROW", txt, re.IGNORECASE):
        return False
    fm = re.fullmatch(r"SKIP\s+TO\s+(FIRST|LAST)\s+(\w+)", txt, re.IGNORECASE)
    if fm:
        return (f"skip_to_{fm.group(1).lower()}", fm.group(2))
    raise ValueError(
        f"unsupported AFTER MATCH clause {after!r}: expected SKIP PAST LAST ROW, "
        "SKIP TO NEXT ROW, or SKIP TO FIRST|LAST <variable>"
    )


def _parse_order_by(order_by: str) -> str:
    """ORDER BY text → the single ascending sort column the engine
    supports; a trailing ASC is stripped, DESC/multi-column orderings
    raise a clear error instead of an opaque pandas KeyError."""
    if not order_by:
        return order_by
    parts = _split_top(order_by)
    if len(parts) > 1:
        raise ValueError(
            f"multi-column MATCH_RECOGNIZE ORDER BY not supported: {order_by!r}"
        )
    om = re.fullmatch(r"(\w+)(?:\s+(ASC|DESC))?", parts[0].strip(), re.IGNORECASE)
    if not om:
        raise ValueError(f"unsupported MATCH_RECOGNIZE ORDER BY: {order_by!r}")
    if om.group(2) and om.group(2).upper() == "DESC":
        raise ValueError("MATCH_RECOGNIZE ORDER BY DESC is not supported (event time ascends)")
    return om.group(1)


def rewrite_match_recognize(spark: SparkSession, sql: str) -> str:
    """Replace each `FROM t MATCH_RECOGNIZE (...)` with a temp view
    holding the CEP engine's result; the rest of the query is untouched."""
    from incubator_flink_spark.cep.match_recognize import match_recognize_sql

    while True:
        m = _MR.search(sql)
        if not m:
            return sql
        tbl = m.group(1)
        open_idx = sql.index("(", m.end() - 1)
        close = _balanced(sql, open_idx)
        body = sql[open_idx + 1 : close - 1]

        part = _clause(body, "PARTITION BY", _STOPS) or ""
        partition_by = [c.strip() for c in part.split(",") if c.strip()]
        order_by = (_clause(body, "ORDER BY", [s for s in _STOPS if s != "ORDER BY"]) or "").strip()
        measures_txt = _clause(body, "MEASURES", [s for s in _STOPS if s != "MEASURES"]) or ""
        after = _clause(body, "AFTER MATCH", [s for s in _STOPS if s != "AFTER MATCH"]) or ""
        pattern_txt = _clause(body, "PATTERN", [s for s in _STOPS if s != "PATTERN"]) or ""
        within_txt = _clause(body, "WITHIN", [s for s in _STOPS if s != "WITHIN"]) or ""
        define_txt = _clause(body, "DEFINE", [s for s in _STOPS if s != "DEFINE"]) or ""

        pattern = pattern_txt.strip()
        if pattern.startswith("("):
            pattern = pattern[1 : pattern.rindex(")")]
        measures = {}
        for item in _split_top(measures_txt):
            am = re.match(r"(.+)\s+AS\s+(\w+)\s*$", item, re.IGNORECASE | re.DOTALL)
            if not am:
                raise ValueError(f"MEASURES entry needs 'expr AS name': {item!r}")
            measures[am.group(2)] = am.group(1).strip()
        # MATCH_ROWTIME() / MATCH_PROCTIME() (FlinkSqlOperatorTable
        # MATCH_ROWTIME/MATCH_PROCTIME): the time attribute of the match's
        # LAST event — exactly the bare order-column reference's measure
        # semantics here (ONE ROW: last matched row; ALL ROWS: current
        # row, which is also the reference's ALL-ROWS behavior).  PROCTIME
        # maps to the same value under this engine's bounded-execution
        # time policy (same divergence note as compat.proctime).
        _mt = re.compile(r"MATCH_(?:ROW|PROC)TIME\s*\(\s*\)", re.IGNORECASE)
        if any(_mt.search(e) for e in measures.values()):
            oc = order_by.split(",")[0].split()[0] if order_by else ""
            if not oc:
                raise ValueError("MATCH_ROWTIME() needs an ORDER BY time attribute")
            measures = {n: _mt.sub(oc, e) for n, e in measures.items()}
        define = {}
        for item in _split_top(define_txt):
            dm = re.match(r"(\w+)\s+AS\s+(.+)$", item, re.IGNORECASE | re.DOTALL)
            if not dm:
                raise ValueError(f"DEFINE entry needs 'VAR AS expr': {item!r}")
            define[dm.group(1)] = dm.group(2).strip()
        within = None
        if within_txt.strip():
            wm = re.fullmatch(r"INTERVAL\s+'(\d+)'\s+(\w+)", within_txt.strip(), re.IGNORECASE)
            if not wm or wm.group(2).upper() not in _UNIT_S:
                # silently treating an unparsed WITHIN as "no window" would
                # yield unbounded matches — refuse instead
                raise ValueError(
                    f"unsupported WITHIN clause {within_txt!r}: expected "
                    "INTERVAL '<n>' SECOND|MINUTE|HOUR|DAY"
                )
            within = int(wm.group(1)) * _UNIT_S[wm.group(2).upper()]
        skip = _parse_after_match(after)
        if isinstance(skip, tuple):
            # validate the SKIP TO FIRST/LAST variable against the pattern:
            # an unknown name would silently run no-skip semantics (the NFA
            # finds no captured rows for it and never advances the cursor)
            pattern_vars = set(re.findall(r"[A-Za-z_]\w*", pattern))
            if skip[1] not in pattern_vars:
                raise ValueError(
                    f"AFTER MATCH {after.strip()!r}: variable {skip[1]!r} is not "
                    f"in PATTERN (variables: {sorted(pattern_vars)})"
                )
        all_rows = bool(re.search(r"ALL\s+ROWS\s+PER\s+MATCH", body, re.IGNORECASE))
        order_by = _parse_order_by(order_by)

        df = spark.table(tbl)
        cols = []
        if all_rows:
            # SQL ALL ROWS PER MATCH: the input columns, then the measures
            for f in df.schema.fields:
                cols.append(f"{f.name} {f.dataType.simpleString().upper()}")
        else:
            for c in partition_by:
                cols.append(f"{c} {df.schema[c].dataType.simpleString().upper()}")
        for name, expr in measures.items():
            cols.append(f"{name} {_infer_type(expr, df.schema)}")
        out = match_recognize_sql(
            df,
            partition_by=partition_by,
            order_by=order_by,
            pattern=pattern,
            define=define,
            measures=measures,
            output_schema=", ".join(cols),
            within=within,
            after_match_skip=skip,
            strict=True,  # SQL pattern concatenation is regex adjacency
            all_rows=all_rows,
        )
        _counter[0] += 1
        view = f"__mr_{_counter[0]}"
        out.createOrReplaceTempView(view)
        # optional trailing alias after the clause: ... ) AS x  /  ) x
        tail = sql[close:]
        am = re.match(r"\s+(?:AS\s+)?(\w+)", tail, re.IGNORECASE)
        alias = ""
        if am and am.group(1).upper() not in ("WHERE", "GROUP", "ORDER", "LIMIT", "JOIN", "ON", "UNION", "HAVING"):
            alias = f" AS {am.group(1)}"
            tail = tail[am.end() :]
        sql = sql[: m.start()] + f"FROM {view}{alias}" + tail

"""SQL DDL layer (reference: flink-sql-parser SqlCreateTable.java:70 /
SqlWatermark.java:39 — CREATE TABLE with columns, computed columns, a
WATERMARK FOR clause, and WITH ('connector'= ..., ...) options).

Maps declaratively onto Spark readers:
- connector 'filesystem' + format  → read_table (batch or streaming per
  the 'mode' option), schema from the column list
- connector 'datagen'              → rate source / deterministic range
- WATERMARK FOR c AS c - INTERVAL 'n' SECOND → withWatermark(c, n)
  (streaming mode; recorded as metadata in batch mode)
- computed columns (`name AS expr`) → withColumn(F.expr)
- PRIMARY KEY (...) NOT ENFORCED   → recorded, not enforced (as in the
  reference — Flink PKs are metadata too)

The parsed table registers as a temp view so ``spark.sql`` sees it —
the GenericInMemoryCatalog equivalent.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.sources.filesystem import read_table
from incubator_flink_spark.sources.util import datagen


@dataclass
class TableDef:
    name: str
    columns: list[tuple[str, str]] = field(default_factory=list)  # (name, type)
    computed: list[tuple[str, str]] = field(default_factory=list)  # (name, expr)
    watermark: tuple[str, int] | None = None  # (column, delay_s)
    primary_key: list[str] = field(default_factory=list)
    partitioned_by: list[str] = field(default_factory=list)
    options: dict[str, str] = field(default_factory=dict)


_CREATE_RE = re.compile(
    r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.*)\)\s*WITH\s*\((.*?)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# the PARTITIONED BY clause sits between the column list and WITH; it is
# extracted (and removed) BEFORE the main regex because the greedy column
# body must be able to contain parens (PRIMARY KEY (...), types)
_PART_RE = re.compile(r"PARTITIONED\s+BY\s*\(([^)]*)\)\s*(?=WITH)", re.IGNORECASE)
_WM_RE = re.compile(
    r"WATERMARK\s+FOR\s+(\w+)\s+AS\s+\w+\s*-\s*INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR)",
    re.IGNORECASE,
)
_PK_RE = re.compile(r"PRIMARY\s+KEY\s*\(([^)]*)\)(\s+NOT\s+ENFORCED)?", re.IGNORECASE)


def _split_top_level(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def parse_create_table(sql: str) -> TableDef:
    sql = sql.strip()
    part_by: list[str] = []
    pm = _PART_RE.search(sql)
    if pm:
        part_by = [c.strip() for c in pm.group(1).split(",") if c.strip()]
        sql = sql[: pm.start()] + sql[pm.end() :]
    m = _CREATE_RE.search(sql)
    if not m:
        raise ValueError("unsupported DDL (expected CREATE TABLE name (...) WITH (...))")
    name, body, opts = m.group(1), m.group(2), m.group(3)
    t = TableDef(name=name)
    t.partitioned_by = part_by
    for part in _split_top_level(body):
        wm = _WM_RE.match(part)
        if wm:
            unit = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600}[wm.group(3).upper()]
            t.watermark = (wm.group(1), int(wm.group(2)) * unit)
            continue
        pk = _PK_RE.match(part)
        if pk:
            t.primary_key = [c.strip() for c in pk.group(1).split(",")]
            continue
        cm = re.match(r"(\w+)\s+AS\s+(.*)", part, re.IGNORECASE)
        if cm and not re.match(r"(\w+)\s+AS\s+\w+\s*-\s*INTERVAL", part, re.IGNORECASE):
            t.computed.append((cm.group(1), cm.group(2)))
            continue
        col = re.match(r"(\w+)\s+(.+)", part)
        if col:
            t.columns.append((col.group(1), col.group(2).strip()))
    for om in re.finditer(r"'([^']+)'\s*=\s*'([^']*)'", opts):
        t.options[om.group(1)] = om.group(2)
    return t


def execute_ddl(spark: SparkSession, sql: str | None, table_def: TableDef | None = None) -> DataFrame:
    """Create the table described by the DDL (or an already-parsed
    ``table_def`` — used to refresh a view after an INSERT writes through
    the connector), register it as a temp view, and return its DataFrame."""
    t = table_def if table_def is not None else parse_create_table(sql)
    connector = t.options.get("connector", "filesystem")
    streaming = t.options.get("mode", "batch") == "streaming"
    schema = ", ".join(f"{n} {typ}" for n, typ in t.columns)
    if connector == "filesystem":
        try:
            df = read_table(
                spark,
                t.options["path"],
                t.options.get("format", "parquet"),
                schema=schema or None,
                streaming=streaming,
            )
        except Exception as e:  # noqa: BLE001
            # CREATE TABLE is metadata-only in the reference: a sink table's
            # path need not exist until the first INSERT writes it.  Register
            # an empty view with the declared schema (requires one).
            if "PATH_NOT_FOUND" not in str(e) or streaming:
                raise
            if not schema:
                raise ValueError(
                    f"table {t.name!r}: path does not exist and no schema declared"
                ) from e
            df = spark.createDataFrame([], schema)
    elif connector == "datagen":
        df = datagen(
            spark,
            rows_per_second=int(t.options.get("rows-per-second", "100")),
            streaming=streaming,
            n_rows=int(t.options.get("number-of-rows", "1000")),
        )
    else:
        raise ValueError(f"unsupported connector: {connector}")
    for name, expr in t.computed:
        df = df.withColumn(name, F.expr(expr))
    if t.watermark and streaming:
        col, delay = t.watermark
        df = df.withWatermark(col, f"{delay} seconds")
    if not streaming:
        df.createOrReplaceTempView(t.name)
    return df

"""Flink scalar-function compatibility layer (reference:
BuiltInFunctionDefinitions.java, ~290 definitions; FlinkSqlOperatorTable).

Most Flink SQL functions exist in Spark under the same name (SURVEY.md
§2.7 maps the families). This module provides Column-level builders for
the names that differ or don't exist in Spark, so a reference user can
port expressions 1:1. Everything is a Catalyst expression — no UDFs.

| Flink name            | here                | Spark expression |
|-----------------------|---------------------|------------------|
| SPLIT_INDEX(s,sep,i)  | split_index         | split(s,sep)[i] (0-based like Flink) |
| IS_DECIMAL(s)         | is_decimal          | rlike numeric regex |
| IS_DIGIT(s)           | is_digit            | rlike ^[0-9]+$ |
| IS_ALPHA(s)           | is_alpha            | rlike ^[A-Za-z]+$ |
| HASH_CODE(s)          | hash_code           | portable md5-derived 60-bit hash |
| TO_BASE64/FROM_BASE64 | to_base64/from_base64 | base64/unbase64 |
| REGEXP(s,p)           | regexp              | rlike |
| RAND_INTEGER(n)       | rand_integer        | floor(rand()*n) |
| TRUNCATE(x,d)         | truncate            | sign-aware floor at scale d |
| LOG2(x)               | log2                | F.log2 |
| CHAR_LENGTH           | char_length         | F.length |
| LOCATE(sub, s)        | locate              | F.locate |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from incubator_flink_spark.functions.hashing import hash64


def split_index(s: Column, sep: str, i: int) -> Column:
    return F.split(s, sep).getItem(i)


def is_decimal(s: Column) -> Column:
    return s.rlike(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$")


def is_digit(s: Column) -> Column:
    return s.rlike(r"^[0-9]+$")


def is_alpha(s: Column) -> Column:
    return s.rlike(r"^[A-Za-z]+$")


def hash_code(s: Column) -> Column:
    return hash64(s)


def to_base64(s: Column) -> Column:
    return F.base64(s.cast("binary"))


def from_base64(s: Column) -> Column:
    return F.unbase64(s).cast("string")


def regexp(s: Column, pattern: str) -> Column:
    return s.rlike(pattern)


def rand_integer(n: int, seed: int | None = None) -> Column:
    r = F.rand(seed) if seed is not None else F.rand()
    return F.floor(r * n).cast("int")


def truncate(x: Column, d: int = 0) -> Column:
    scale = 10**d
    return (x * scale).cast("long") / scale


def log2(x: Column) -> Column:
    return F.log2(x)


def char_length(s: Column) -> Column:
    return F.length(s)


def locate(sub: str, s: Column) -> Column:
    return F.locate(sub, s)


# --- temporal names (BuiltInFunctionDefinitions TIMESTAMP_ADD/DIFF,
#     TO_TIMESTAMP_LTZ, CONVERT_TZ) ------------------------------------------


def timestamp_add(unit: str, n: Column | int, ts: Column) -> Column:
    """TIMESTAMPADD(unit, n, ts) — unit in SECOND/MINUTE/HOUR/DAY/WEEK/
    MONTH/QUARTER/YEAR (Spark's timestampadd accepts the same units)."""
    return F.timestamp_add(unit, F.lit(n) if isinstance(n, int) else n, ts)


def timestamp_diff(unit: str, start: Column, end: Column) -> Column:
    """TIMESTAMPDIFF(unit, start, end) — whole `unit`s from start to end."""
    return F.timestamp_diff(unit, start, end)


def to_timestamp_ltz(numeric: Column, precision: int = 3) -> Column:
    """TO_TIMESTAMP_LTZ(n, p): epoch seconds (p=0) or millis (p=3)."""
    if precision == 0:
        return F.timestamp_seconds(numeric)
    if precision == 3:
        return F.timestamp_millis(numeric)
    raise ValueError("precision must be 0 (seconds) or 3 (millis)")


def convert_tz(ts_str: Column, from_tz: str, to_tz: str) -> Column:
    """CONVERT_TZ(s, tz1, tz2): reinterpret a wall-clock string from tz1
    into tz2 (Flink returns a string; Spark composes the two utc hops)."""
    return F.date_format(
        F.from_utc_timestamp(F.to_utc_timestamp(F.to_timestamp(ts_str), from_tz), to_tz),
        "yyyy-MM-dd HH:mm:ss",
    )


def temporal_overlaps(
    l_start: Column, l_end: Column, r_start: Column, r_end: Column
) -> Column:
    """temporalOverlaps / SQL ``(s1, e1) OVERLAPS (s2, e2)``
    (BuiltInFunctionDefinitions TEMPORAL_OVERLAPS; Calcite
    SqlStdOperatorTable.OVERLAPS): inclusive period intersection after
    normalizing each period so start <= end."""
    s1, e1 = F.least(l_start, l_end), F.greatest(l_start, l_end)
    s2, e2 = F.least(r_start, r_end), F.greatest(r_start, r_end)
    return (s1 <= e2) & (s2 <= e1)


# ---------------------------------------------------------------------------
# SQL/JSON constructors and aggregates (FLIP-90; reference
# BuiltInFunctionDefinitions JSON_OBJECT / JSON_ARRAY / JSON_QUERY /
# JSON_STRING / JSON_OBJECT_AGG_* / JSON_ARRAY_AGG_* and the IS JSON
# predicate — flink-table/flink-table-common/.../functions/
# BuiltInFunctionDefinitions.java).  Flink's ``JSON_OBJECT(KEY k VALUE v)``
# grammar is Calcite-specific and unparseable by Spark SQL, so the SQL
# spellings live in functions/sqlfuncs.py where fixed-arity forms exist
# (JSON_QUERY/JSON_STRING/IS_JSON) and the Table-API builders live here —
# all pure Catalyst expressions, no UDFs.
# ---------------------------------------------------------------------------


def json_string(v: Column) -> Column:
    """JSON_STRING(v): serialize a scalar to JSON text (RETURN NULL ON
    NULL).  Spark's ``to_json`` only accepts containers, so the value is
    struct-wrapped and the ``{"v":`` envelope stripped — the JSON encoder
    (escaping included) is Spark's own."""
    wrapped = F.to_json(F.struct(v.alias("v")), {"ignoreNullFields": "false"})
    return F.when(v.isNotNull(), wrapped.substr(F.lit(6), F.length(wrapped) - F.lit(6)))


def json_object(*pairs: tuple[str, Column], on_null: str = "NULL") -> Column:
    """JSON_OBJECT('k1' VALUE v1, ...): build a JSON object with literal
    keys.  ``on_null='NULL'`` (Flink's default) keeps null members;
    ``'ABSENT'`` drops them — mapped onto to_json's ignoreNullFields."""
    opts = {"ignoreNullFields": "true" if on_null == "ABSENT" else "false"}
    return F.to_json(F.struct(*[v.alias(k) for k, v in pairs]), opts)


def json_array(*items: Column, on_null: str = "ABSENT") -> Column:
    """JSON_ARRAY(v1, v2, ...): build a JSON array.  Flink's default is
    ABSENT ON NULL (null elements dropped); pass ``on_null='NULL'`` to
    keep them.  Elements must share a Spark type (Flink casts to a common
    JSON type at plan time; here the array() type rules apply)."""
    arr = F.array(*items)
    if on_null == "ABSENT":
        arr = F.filter(arr, lambda x: x.isNotNull())
    return F.to_json(arr)


def json_query(j: Column, path: str) -> Column:
    """JSON_QUERY(j, path): extract a JSON OBJECT or ARRAY at ``path``
    (SQL/JSON: scalars return NULL under the default WITHOUT ARRAY
    WRAPPER + NULL ON ERROR; JSON_VALUE is the scalar accessor).
    Documented subset: Spark's ``$.a.b`` paths, lax mode only."""
    r = F.get_json_object(j, path)
    return F.when(F.substring(r, 1, 1).isin("{", "["), r)


def json_objectagg(k: Column, v: Column) -> Column:
    """JSON_OBJECTAGG(KEY k VALUE v) as an aggregate expression (NULL ON
    NULL).  Keys are sorted for a deterministic result — the reference
    leaves member order unspecified (JsonObjectAggFunction), so any fixed
    order is a valid refinement; duplicate keys are last-write-wins
    (matching the reference's internal map accumulator), deduplicated
    with a lookahead filter so the builder works under Spark's default
    EXCEPTION map-key policy."""
    entries = F.array_sort(F.collect_list(F.struct(k.alias("key"), v.alias("value"))))
    nxt = lambda i: F.try_element_at(entries, i + F.lit(2))["key"]  # noqa: E731
    deduped = F.filter(entries, lambda x, i: nxt(i).isNull() | (nxt(i) != x["key"]))
    return F.to_json(F.map_from_entries(deduped), {"ignoreNullFields": "false"})


def json_arrayagg(v: Column) -> Column:
    """JSON_ARRAYAGG(v) as an aggregate expression (ABSENT ON NULL, the
    Flink default: collect_list already drops nulls).  Elements are
    sorted for determinism — the reference leaves element order
    unspecified (JsonArrayAggFunction)."""
    return F.to_json(F.array_sort(F.collect_list(v)))


def is_json(s: Column, kind: str = "VALUE") -> Column:
    """``s IS JSON [VALUE|OBJECT|ARRAY|SCALAR]`` predicate (Calcite
    SqlJsonPredicate; grammar-level in Flink, function-spelled here).
    NULL input yields false, matching Flink's runtime behavior."""
    valid = F.try_parse_json(s).isNotNull()
    head = F.substring(F.ltrim(s), 1, 1)
    if kind == "VALUE":
        cond = valid
    elif kind == "OBJECT":
        cond = valid & (head == "{")
    elif kind == "ARRAY":
        cond = valid & (head == "[")
    elif kind == "SCALAR":
        cond = valid & ~head.isin("{", "[")
    else:
        raise ValueError(f"IS JSON kind must be VALUE/OBJECT/ARRAY/SCALAR, got {kind!r}")
    return F.when(cond, True).otherwise(False)

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

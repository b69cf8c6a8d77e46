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

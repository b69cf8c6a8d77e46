"""Query registry: every implemented operator from SURVEY.md §2 registers a
(name, spark_fn, oracle_sql) triple here.

``spark_fn(spark, sf_dir) -> DataFrame`` is the engine implementation;
``oracle_sql`` is the ANSI-SQL equivalent DuckDB runs on the same parquet
for the driver's hash-match correctness gate.  Column names/aliases MUST
match between the two (the driver sorts columns by name before hashing).

Determinism conventions (so Spark and DuckDB hash-match bit-for-bit):
- sums of double expressions go through CAST(expr AS DECIMAL(30,8)) so the
  result is exact and independent of partial-aggregation order;
- averages are computed as exact decimal sum divided by count, cast to
  double (deterministic IEEE division of two exact values);
- every query has a total deterministic ORDER BY with a unique tiebreak;
- floating similarity scores are ROUND()ed to a fixed scale in both
  engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records a weaker rows-only check


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query under ``name`` with its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}

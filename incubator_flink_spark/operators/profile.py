"""Column profiling for pipeline data quality monitoring (ANALYZE-style
stats a curation pipeline checks before/after each stage).

Scale shape: ONE aggregation pass computes every metric for every column
as parallel aggregate expressions (map-side partial aggregation, a
single 1-row result — no shuffle keyed on column name, which would have
cardinality = column count and perfect skew), then the single row is
unpivoted to the (column, metrics) long form with a stack expression.
Exact distinct counts use Spark's multi-distinct planning (one Expand);
pass ``approx=True`` to swap in HyperLogLog approx_count_distinct when
exactness isn't needed at extreme scale (not oracle-comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None, approx: bool = False) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value) per
    column, min/max rendered as strings (computed on the native type
    first, so numeric ordering is preserved)."""
    cols = columns if columns is not None else df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").cast("bigint").alias("n_nulls"),
            F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")

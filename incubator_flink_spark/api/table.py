"""Table API facade (reference: flink-table-api-java/.../api/Table.java:127-1341
and its Python mirror pyflink/table/table.py — select/filter/group_by/
join/union/minus/order_by/offset/fetch/add_columns/rename_columns/
drop_columns/map/flat_map/aggregate/flat_aggregate).

Each method builds the equivalent DataFrame plan immediately (the
DataFrame DSL is itself a deferred logical plan — QueryOperation's direct
analog), so Catalyst optimizes the whole composed pipeline as one query.
Expressions are accepted as SQL strings (parsed by ``F.expr``) or Columns.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import DEFAULT_SF_DIR, load


def _col(e: str | Column) -> Column:
    return F.expr(e) if isinstance(e, str) else e


class Table:
    """Relational table handle (wraps a DataFrame plan)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # --- projection / filter -------------------------------------------------
    def select(self, *exprs: str | Column) -> "Table":
        return Table(self._df.select(*[_col(e) for e in exprs]))

    def filter(self, predicate: str | Column) -> "Table":
        return Table(self._df.where(_col(predicate)))

    where = filter

    def distinct(self) -> "Table":
        return Table(self._df.distinct())

    def add_columns(self, *exprs: str | Column) -> "Table":
        return Table(self._df.select("*", *[_col(e) for e in exprs]))

    def add_or_replace_columns(self, **named: str | Column) -> "Table":
        df = self._df
        for name, e in named.items():
            df = df.withColumn(name, _col(e))
        return Table(df)

    def rename_columns(self, **renames: str) -> "Table":
        df = self._df
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        return Table(df)

    def drop_columns(self, *names: str) -> "Table":
        return Table(self._df.drop(*names))

    def alias(self, name: str) -> "Table":
        return Table(self._df.alias(name))

    # --- aggregation ---------------------------------------------------------
    def group_by(self, *keys: str | Column) -> "GroupedTable":
        return GroupedTable(self._df, [_col(k) for k in keys])

    def aggregate(self, *aggs: str | Column) -> "Table":
        return Table(self._df.agg(*[_col(a) for a in aggs]))

    # --- joins ---------------------------------------------------------------
    def join(self, other: "Table", on: str | Column | None = None) -> "Table":
        return self._join(other, on, "inner")

    def left_outer_join(self, other: "Table", on: str | Column | None = None) -> "Table":
        return self._join(other, on, "left")

    def right_outer_join(self, other: "Table", on: str | Column | None = None) -> "Table":
        return self._join(other, on, "right")

    def full_outer_join(self, other: "Table", on: str | Column | None = None) -> "Table":
        return self._join(other, on, "full")

    def cross_join(self, other: "Table") -> "Table":
        return Table(self._df.crossJoin(other._df))

    def _join(self, other: "Table", on, how: str) -> "Table":
        if on is None:
            return Table(self._df.crossJoin(other._df)) if how == "inner" else Table(
                self._df.join(other._df, how=how)
            )
        return Table(self._df.join(other._df, _col(on), how))

    # --- set ops (Table.union:803/minus:772/intersect:833) -------------------
    def union(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.unionAll(other._df))

    def minus(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df).distinct())

    def minus_all(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self._df.intersectAll(other._df))

    # --- sort / limit (order_by/offset/fetch) --------------------------------
    def order_by(self, *exprs: str | Column) -> "Table":
        return Table(self._df.orderBy(*[_col(e) for e in exprs]))

    def offset(self, n: int) -> "Table":
        return Table(self._df.offset(n))

    def fetch(self, n: int) -> "Table":
        return Table(self._df.limit(n))

    limit = fetch

    # --- row-level map/flat_map (Table.map / Table.flatMap) ------------------
    def map(self, fn: Callable, output_schema: str) -> "Table":
        """Arrow-batched row transform (pandas DataFrame -> pandas
        DataFrame), the Table.map equivalent over vectorized batches."""

        def gen(batches):
            for pdf in batches:
                yield fn(pdf)

        return Table(self._df.mapInPandas(gen, output_schema))

    flat_map = map  # identical engine mechanism; fn controls fan-out

    def flat_aggregate(self, keys: Sequence[str], fn: Callable, output_schema: str) -> "Table":
        """TableAggregateFunction equivalent (Table.flatAggregate:1292):
        per-group pandas transform that may emit multiple rows."""
        return Table(self._df.groupBy(*keys).applyInPandas(fn, output_schema))

    # --- execution -----------------------------------------------------------
    def to_df(self) -> DataFrame:
        return self._df

    def to_pandas(self):
        return self._df.toPandas()

    def execute(self):
        return self._df.collect()

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)

    @property
    def columns(self) -> list[str]:
        return self._df.columns


class GroupedTable:
    def __init__(self, df: DataFrame, keys: list[Column]):
        self._df = df
        self._keys = keys

    def select(self, *aggs: str | Column) -> Table:
        return Table(self._df.groupBy(*self._keys).agg(*[_col(a) for a in aggs]))

    agg = select


class TableEnvironment:
    """Catalog + SQL entry point (reference TableEnvironmentImpl)."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self._spark = spark
        self._sf_dir = sf_dir

    def from_path(self, table: str) -> Table:
        return Table(load(self._spark, self._sf_dir, table))

    def from_dataframe(self, df: DataFrame) -> Table:
        return Table(df)

    def from_elements(self, rows, schema: str) -> Table:
        return Table(self._spark.createDataFrame(rows, schema))

    def sql_query(self, sql: str) -> Table:
        return Table(self._spark.sql(sql))

    def execute_sql(self, sql: str):
        return self._spark.sql(sql).collect()

    def create_temporary_view(self, name: str, table: Table) -> None:
        table.to_df().createOrReplaceTempView(name)

"""DataStream API facade (reference: DataStream.java / KeyedStream.java and
the Python mirror pyflink/datastream/data_stream.py:232-686 — map,
flat_map, filter, key_by, reduce, union, window, process, sinks).

Element-wise transforms run as Arrow-batched pandas functions, never
per-row Python loops in Spark's hot path.  ``key_by`` returns a
KeyedStream whose ``reduce``/``process``/``count_window`` mirror the
reference's keyed operators; on a streaming DataFrame, ``process`` maps
to the stateful operators in streaming/stateful.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.operators.windows import count_window as _batch_count_window
from incubator_flink_spark.operators.windows import hop as _hop
from incubator_flink_spark.operators.windows import session_col as _session_col
from incubator_flink_spark.operators.windows import tumble as _tumble


def _col(e):
    return F.expr(e) if isinstance(e, str) else e


class DataStream:
    def __init__(self, df: DataFrame):
        self._df = df

    # --- stateless transforms ------------------------------------------------
    def map(self, fn: Callable, output_schema: str) -> "DataStream":
        """fn: pandas.DataFrame -> pandas.DataFrame (vectorized MapFunction)."""

        def gen(batches):
            for pdf in batches:
                yield fn(pdf)

        return DataStream(self._df.mapInPandas(gen, output_schema))

    flat_map = map  # fan-out controlled by fn's output length

    def filter(self, predicate: str | Column) -> "DataStream":
        return DataStream(self._df.where(_col(predicate)))

    def select(self, *exprs) -> "DataStream":
        return DataStream(self._df.select(*[_col(e) for e in exprs]))

    def union(self, *others: "DataStream") -> "DataStream":
        df = self._df
        for o in others:
            df = df.unionByName(o._df)
        return DataStream(df)

    # --- partitioning (DataStream.keyBy:291 / rebalance:469 / broadcast:420) --
    def key_by(self, *keys: str) -> "KeyedStream":
        return KeyedStream(self._df, list(keys))

    def flat_map(self, fn: Callable, output_schema: str) -> "DataStream":
        """DataStream.flatMap: fn maps one Arrow batch to any number of
        output rows (fan-out or fan-in) — same contract as map, which
        already passes whole batches."""
        return self.map(fn, output_schema)

    def shuffle(self) -> "DataStream":
        """DataStream.shuffle: random repartition to break skew/ordering
        (Spark's round-robin repartition without a partition count)."""
        return DataStream(self._df.repartition(self._df.sparkSession.sparkContext.defaultParallelism))

    def rescale(self, n: int) -> "DataStream":
        """DataStream.rescale: local-preferring scale-down — coalesce
        avoids a full shuffle where Flink rescale avoids full rebalance."""
        return DataStream(self._df.coalesce(n))

    def rebalance(self, n: int) -> "DataStream":
        return DataStream(self._df.repartition(n))

    def partition_custom(self, *exprs) -> "DataStream":
        return DataStream(self._df.repartition(*[_col(e) for e in exprs]))

    def broadcast(self) -> "DataStream":
        """DataStream.broadcast:420 — mark this (small) stream for
        replication to every task: joins against it become broadcast-hash
        joins instead of shuffles."""
        return DataStream(F.broadcast(self._df))

    # --- two-input (DataStream.connect:254 → ConnectedStreams) ----------------
    def connect(self, other: "DataStream") -> "ConnectedStreams":
        return ConnectedStreams(self, other)

    # --- watermarks / sinks ---------------------------------------------------
    def assign_timestamps_and_watermarks(self, ts_col: str, delay_s: int) -> "DataStream":
        return DataStream(self._df.withWatermark(ts_col, f"{delay_s} seconds"))

    def add_sink(self, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
        """Batch sink (DataStream.addSink / sinkTo for bounded streams)."""
        self._df.write.mode(mode).format(fmt).save(path)

    sink_to = add_sink

    def execute_and_collect(self):
        return self._df.collect()

    def to_df(self) -> DataFrame:
        return self._df

    def print(self, n: int = 20) -> None:
        self._df.show(n)


class KeyedStream:
    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def reduce(self, *aggs: Column) -> DataStream:
        """Keyed reduce → groupBy aggregation (partial/final combine is
        Catalyst's, matching the reference's combiner chain)."""
        return DataStream(self._df.groupBy(*self._keys).agg(*aggs))

    # --- convenience aggregations (KeyedStream.sum/min/max/minBy/maxBy) ----

    def sum(self, col: str) -> DataStream:
        """KeyedStream.sum: per-key running totals collapse to the final
        total in bounded execution (the reference's last update-mode value)."""
        return DataStream(self._df.groupBy(*self._keys).agg(F.sum(col).alias(col)))

    def min(self, col: str) -> DataStream:
        return DataStream(self._df.groupBy(*self._keys).agg(F.min(col).alias(col)))

    def max(self, col: str) -> DataStream:
        return DataStream(self._df.groupBy(*self._keys).agg(F.max(col).alias(col)))

    def min_by(self, col: str) -> DataStream:
        """KeyedStream.minBy: the whole ELEMENT holding the per-key
        minimum (min_by/max_by keep the element, min/max keep the field;
        ties resolve to one arbitrary-but-deterministic winner via
        struct ordering, the reference keeps the first encountered)."""
        return self._extreme_by(col, ascending=True)

    def max_by(self, col: str) -> DataStream:
        return self._extreme_by(col, ascending=False)

    def _extreme_by(self, col: str, ascending: bool) -> DataStream:
        others = [c for c in self._df.columns if c not in self._keys]
        packed = F.struct(F.col(col), *[F.col(c) for c in others if c != col])
        agg = (F.min(packed) if ascending else F.max(packed)).alias("__ext")
        out = self._df.groupBy(*self._keys).agg(agg)
        return DataStream(
            out.select(*self._keys, *[F.col(f"__ext.{c}").alias(c) for c in others])
        )

    def process(self, fn: Callable, output_schema: str) -> DataStream:
        """KeyedProcessFunction equivalent for batch: per-key pandas
        transform (multi-row output allowed). Streaming stateful
        processing lives in streaming/stateful.py."""
        return DataStream(self._df.groupBy(*self._keys).applyInPandas(fn, output_schema))

    def tumbling_window(self, ts_col: str, size_s: int) -> "WindowedStream":
        return WindowedStream(_tumble(self._df, ts_col, size_s), self._keys)

    def sliding_window(self, ts_col: str, size_s: int, slide_s: int) -> "WindowedStream":
        return WindowedStream(_hop(self._df, ts_col, size_s, slide_s), self._keys)

    def session_window(self, ts_col: str, gap_s: int) -> "WindowedStream":
        # session windows merge only as a grouping expression, so the
        # window column goes into the groupBy itself (extracted after agg)
        return WindowedStream(
            self._df,
            self._keys,
            group_exprs=[_session_col(ts_col, gap_s).alias("__sw")],
            session=(ts_col, gap_s),
        )

    def count_window(self, ts_col: str, tiebreak: str, size: int) -> "WindowedStream":
        win = _batch_count_window(self._df, *self._keys, order_by=[ts_col, tiebreak], size=size)
        return WindowedStream(win, self._keys, window_cols=["window_id"])


class WindowedStream:
    def __init__(
        self,
        df: DataFrame,
        keys: list[str],
        window_cols: list[str] | None = None,
        group_exprs: list[Column] | None = None,
        session: tuple[str, int] | None = None,
    ):
        self._df = df
        self._keys = keys
        self._window_cols = window_cols or ["window_start", "window_end"]
        self._group_exprs = group_exprs  # e.g. a session_window grouping col
        self._session = session  # (ts_col, gap_s) when session-windowed

    def _grouping(self):
        if self._group_exprs is not None:
            return [*self._group_exprs, *self._keys]
        return [*self._window_cols, *self._keys]

    def _flatten(self, df: DataFrame) -> DataFrame:
        if self._group_exprs is not None:
            df = (
                df.withColumn("window_start", F.col("__sw.start"))
                .withColumn("window_end", F.col("__sw.end"))
                .drop("__sw")
            )
        return df

    def aggregate(self, *aggs: Column) -> DataStream:
        return DataStream(self._flatten(self._df.groupBy(*self._grouping()).agg(*aggs)))

    def apply(self, fn: Callable, output_schema: str) -> DataStream:
        """WindowFunction with the whole window's rows (coGroup-style).

        Session windows need explicit pre-merge: Spark's session_window
        column only merges inside an Aggregate node, so grouping raw rows
        by it would put every row in its own [ts, ts+gap) window.  Merged
        session ids are assigned with the gaps-and-islands rewrite (same
        as the batch session operator) before applyInPandas."""
        if self._session is not None:
            ts_col, gap_s = self._session
            if self._df.isStreaming:
                raise NotImplementedError(
                    "session_window().apply() needs the gaps-and-islands "
                    "pre-merge, which requires a batch DataFrame; use "
                    "aggregate() (merged by Spark) or the stateful "
                    "operators in streaming/ for streaming sessions"
                )
            from pyspark.sql import Window as W

            w = W.partitionBy(*self._keys).orderBy(ts_col)
            gap_us = gap_s * 1_000_000
            prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
            new_sess = F.when(
                prev.isNull() | (F.unix_micros(F.col(ts_col)) - prev > gap_us), 1
            ).otherwise(0)
            run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
            merged = self._df.withColumn("__session_id", F.sum(new_sess).over(run))
            wrapped = lambda pdf: fn(pdf.drop(columns="__session_id"))  # noqa: E731
            return DataStream(
                merged.groupBy(*self._keys, "__session_id").applyInPandas(wrapped, output_schema)
            )
        return DataStream(
            self._df.groupBy(*self._grouping()).applyInPandas(fn, output_schema)
        )


class ConnectedStreams:
    """DataStream.connect:254 → CoMap/CoProcess. Spark transforms are
    single-input, so the two streams run as a tagged union (`__side` =
    'left'/'right') through one function — the same dispatch trick the
    streaming temporal join uses (SURVEY.md §2.9 CoProcess row)."""

    def __init__(self, left: DataStream, right: DataStream):
        self._left = left
        self._right = right

    def _tagged(self) -> DataFrame:
        l, r = self._left.to_df(), self._right.to_df()
        cols = set(l.columns) | set(r.columns)

        def pad(df):
            for c in sorted(cols):
                if c not in df.columns:
                    df = df.withColumn(c, F.lit(None))
            return df.select(*sorted(cols))

        return pad(l).withColumn("__side", F.lit("left")).unionByName(
            pad(r).withColumn("__side", F.lit("right"))
        )

    def map(self, fn1: Callable, fn2: Callable, output_schema: str) -> DataStream:
        """CoMapFunction: fn1 on left batches, fn2 on right batches."""

        def gen(batches):
            for pdf in batches:
                left = pdf[pdf["__side"] == "left"]
                right = pdf[pdf["__side"] == "right"]
                if len(left):
                    yield fn1(left.drop(columns="__side"))
                if len(right):
                    yield fn2(right.drop(columns="__side"))

        return DataStream(self._tagged().mapInPandas(gen, output_schema))

    def key_by(self, *keys: str) -> "KeyedStream":
        """Keyed co-process: fn sees each key's rows from BOTH sides with
        the `__side` tag column (KeyedCoProcessFunction equivalent)."""
        return KeyedStream(self._tagged(), list(keys))


class StreamExecutionEnvironment:
    """Execution entry point (reference StreamExecutionEnvironment)."""

    def __init__(self, spark: SparkSession):
        self._spark = spark

    def from_collection(self, rows, schema: str) -> DataStream:
        return DataStream(self._spark.createDataFrame(rows, schema))

    def from_sequence(self, start: int, end: int) -> DataStream:
        return DataStream(self._spark.range(start, end + 1).withColumnRenamed("id", "value"))

    def from_dataframe(self, df: DataFrame) -> DataStream:
        return DataStream(df)

    def read_text_file(self, path: str) -> DataStream:
        """StreamExecutionEnvironment.readTextFile: bounded line stream
        (one ``value: string`` column per line)."""
        return DataStream(self._spark.read.text(path))

    def socket_text_stream(self, host: str, port: int) -> DataStream:
        """Unbounded line stream from a TCP socket (reference
        StreamExecutionEnvironment.socketTextStream — the classic
        word-count source). Yields a streaming DataFrame with a single
        ``value: string`` column; at-most-once, dev/demo use only, same
        caveat as the reference's JavaDoc."""
        df = (
            self._spark.readStream.format("socket")
            .option("host", host)
            .option("port", port)
            .load()
        )
        return DataStream(df)

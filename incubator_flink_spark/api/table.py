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

import re
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
    def join(self, other: "Table", on: str | Column | None = None, hint: str | None = None) -> "Table":
        """INNER join; ``hint`` accepts the DataSet JoinHint names
        (BROADCAST_HASH_FIRST/SECOND, REPARTITION_HASH_FIRST/SECOND,
        REPARTITION_SORT_MERGE, OPTIMIZER_CHOOSES) mapped to Spark's
        broadcast/shuffle_hash/merge strategy hints."""
        return self._join(other, on, "inner", hint)

    def left_outer_join(self, other: "Table", on: str | Column | None = None, hint: str | None = None) -> "Table":
        return self._join(other, on, "left", hint)

    def right_outer_join(self, other: "Table", on: str | Column | None = None, hint: str | None = None) -> "Table":
        return self._join(other, on, "right", hint)

    def full_outer_join(self, other: "Table", on: str | Column | None = None, hint: str | None = None) -> "Table":
        return self._join(other, on, "full", hint)

    def cross_join(self, other: "Table") -> "Table":
        return Table(self._df.crossJoin(other._df))

    # DataSet JoinHint (flink-java JoinOperator BROADCAST_HASH_FIRST etc.)
    # → Spark join-strategy hints. FIRST = this table, SECOND = other.
    _JOIN_HINTS = {
        "BROADCAST_HASH_FIRST": ("broadcast", "self"),
        "BROADCAST_HASH_SECOND": ("broadcast", "other"),
        "REPARTITION_HASH_FIRST": ("shuffle_hash", "self"),
        "REPARTITION_HASH_SECOND": ("shuffle_hash", "other"),
        "REPARTITION_SORT_MERGE": ("merge", "self"),
        "OPTIMIZER_CHOOSES": (None, None),
    }

    def _join(self, other: "Table", on, how: str, hint: str | None = None) -> "Table":
        left_df, right_df = self._df, other._df
        if hint is not None:
            try:
                spark_hint, side = self._JOIN_HINTS[hint.upper()]
            except KeyError:
                raise ValueError(f"unknown join hint: {hint!r} (expected one of {sorted(self._JOIN_HINTS)})")
            if spark_hint is not None:
                if side == "self":
                    left_df = left_df.hint(spark_hint)
                else:
                    right_df = right_df.hint(spark_hint)
        if on is None:
            return Table(left_df.crossJoin(right_df)) if how == "inner" else Table(
                left_df.join(right_df, how=how)
            )
        return Table(left_df.join(right_df, _col(on), how))

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

    # --- group windows (Table.window(Tumble/Slide/Session...) — reference
    #     Table.java window(GroupWindow) / pyflink Tumble.over(...).on(...)) --
    def window(self, w: "GroupWindow") -> "WindowedTable":
        return WindowedTable(self._df, w)

    # --- over windows (Table.over_window — reference OverWindow spec;
    #     frames map to pyspark Window rows/rangeBetween) ---------------------
    def over_window(self, ow: "Over") -> "OverWindowedTable":
        return OverWindowedTable(self._df, ow)

    # --- lateral correlate (Table.joinLateral:544-756 — UDTF join) ------------
    def join_lateral(self, fn, output_schema: str | None = None) -> "Table":
        """Correlate with a table function. Two forms:

        - ``join_lateral(fn, output_schema)``: arbitrary UDTF — ``fn``
          receives each Arrow batch (pandas DataFrame) and returns the
          laterally-joined rows (any fan-out). Array-typed columns are
          cheaper via ``select('*', F.explode(...))``.
        - ``join_lateral(rates(probe_ts), 'probe_ccy = build_ccy')``:
          temporal table function call (Table.createTemporalTableFunction
          + LATERAL TABLE(rates(o_time)) — inner temporal join); the
          second argument is the equi-join condition.
        """
        from incubator_flink_spark.api.temporal import TemporalTableCall, temporal_join

        if isinstance(fn, TemporalTableCall):
            return Table(temporal_join(self._df, fn, output_schema, how="inner"))

        def gen(batches):
            for pdf in batches:
                yield fn(pdf)

        return Table(self._df.mapInPandas(gen, output_schema))

    def left_outer_join_lateral(self, fn, output_schema: str | None = None) -> "Table":
        from incubator_flink_spark.api.temporal import TemporalTableCall, temporal_join

        if isinstance(fn, TemporalTableCall):
            return Table(temporal_join(self._df, fn, output_schema, how="left"))
        return self.join_lateral(fn, output_schema)  # fn controls empty-match rows

    def create_temporal_table_function(self, time_attr: str, primary_key: str):
        """Table.createTemporalTableFunction (Table.java:166): treat this
        table as a versioned table — versions of each ``primary_key``
        keyed row ordered by ``time_attr``; call the result with a
        probe-side time attribute and join via ``join_lateral``."""
        from incubator_flink_spark.api.temporal import TemporalTableFunction

        return TemporalTableFunction(self._df, time_attr, primary_key)

    def execute_insert(self, path: str, mode: str = "overwrite", fmt: str = "parquet") -> None:
        """Table.executeInsert equivalent: write the plan to a filesystem
        table (the reference's INSERT INTO filesystem connector)."""
        self._df.write.mode(mode).format(fmt).save(path)

    # --- execution -----------------------------------------------------------
    def to_df(self) -> DataFrame:
        return self._df

    def to_pandas(self):
        return self._df.toPandas()

    def execute(self):
        return self._df.collect()

    def explain(self, *details: str, mode: str = "formatted") -> str:
        """Reference Table.explain(ExplainDetail...) (ExplainDetail.java:
        ESTIMATED_COST, CHANGELOG_MODE, JSON_EXECUTION_PLAN).  Returns the
        plan text (and prints it, matching the pyflink convenience):

        - default            -> Catalyst formatted physical plan
        - ESTIMATED_COST     -> Catalyst 'cost' mode (logical plan with
                                sizeInBytes/rowCount statistics — the
                                cumulative-cost analog)
        - JSON_EXECUTION_PLAN-> the optimized logical plan as JSON
        - CHANGELOG_MODE     -> batch DataFrames are insert-only by
                                construction; the line is emitted for
                                parity (streaming changelog modes live in
                                streaming/modes.py, which validates real
                                retract pipelines)
        """
        import contextlib
        import io

        out = io.StringIO()
        wants = {d.upper() for d in details}
        unknown = wants - {"ESTIMATED_COST", "CHANGELOG_MODE", "JSON_EXECUTION_PLAN"}
        if unknown:
            raise ValueError(f"unknown ExplainDetail(s): {sorted(unknown)}")
        with contextlib.redirect_stdout(out):
            self._df.explain("cost" if "ESTIMATED_COST" in wants else mode)
        if "CHANGELOG_MODE" in wants:
            out.write(
                "changelogMode=[I]  -- bounded (batch) plan: insert-only\n"
                if not self._df.isStreaming
                else "changelogMode: see streaming/modes.py pipeline validation\n"
            )
        if "JSON_EXECUTION_PLAN" in wants:
            out.write(self._df._jdf.queryExecution().optimizedPlan().toJSON() + "\n")
        text = out.getvalue()
        print(text, end="")
        return text

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


# --- group-window descriptors (reference Tumble/Slide/Session classes in
#     flink-table-api-java/.../api/: Tumble.over(...).on(...).as(...)) -------


class GroupWindow:
    """Base descriptor; ``column()`` yields the Spark window expression."""

    def __init__(self):
        self._on: str | None = None
        self._alias = "w"

    def on(self, ts_col: str) -> "GroupWindow":
        self._on = ts_col
        return self

    def alias(self, name: str) -> "GroupWindow":
        self._alias = name
        return self

    def column(self) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError


class Tumble(GroupWindow):
    @staticmethod
    def over(size_s: int) -> "Tumble":
        w = Tumble()
        w._size = size_s
        return w

    def column(self) -> Column:
        return F.window(F.col(self._on), f"{self._size} seconds")


class Slide(GroupWindow):
    @staticmethod
    def over(size_s: int) -> "Slide":
        w = Slide()
        w._size = size_s
        return w

    def every(self, slide_s: int) -> "Slide":
        self._slide = slide_s
        return self

    def column(self) -> Column:
        return F.window(F.col(self._on), f"{self._size} seconds", f"{self._slide} seconds")


class Session(GroupWindow):
    @staticmethod
    def with_gap(gap_s: int) -> "Session":
        w = Session()
        w._gap = gap_s
        return w

    def column(self) -> Column:
        return F.session_window(F.col(self._on), f"{self._gap} seconds")


class WindowedTable:
    """``table.window(Tumble.over(600).on('ts').alias('w')).group_by('w',
    'k').select(...)`` — the window alias resolves to the Spark window
    struct; its bounds surface as ``<alias>_start`` / ``<alias>_end``
    (the TUMBLE_START/TUMBLE_END auxiliaries)."""

    def __init__(self, df: DataFrame, w: GroupWindow):
        self._df = df
        self._w = w

    def group_by(self, *keys: str | Column) -> GroupedTable:
        a = self._w._alias
        plain = [_col(k) for k in keys if not (isinstance(k, str) and k == a)]
        # the window expression must be a grouping expression directly —
        # session windows only merge inside the grouped aggregation
        win_key = self._w.column().alias(a)

        class _WindowedGrouped(GroupedTable):
            def select(self, *aggs):
                t = GroupedTable.select(self, *aggs)
                return Table(
                    t.to_df()
                    .withColumn(f"{a}_start", F.col(f"{a}.start"))
                    .withColumn(f"{a}_end", F.col(f"{a}.end"))
                    .drop(a)
                )

            agg = select

        return _WindowedGrouped(self._df, [win_key, *plain])


# --- over-window descriptor (reference Over.partitionBy(...).orderBy(...)
#     .preceding(...).as(...) — frames are pyspark Window frames) ------------


class Over:
    UNBOUNDED = object()

    def __init__(self):
        self._partition: list[str | Column] = []
        self._order: list[str | Column] = []
        self._rows: tuple | None = None
        self._range: tuple | None = None

    @staticmethod
    def partition_by(*cols: str | Column) -> "Over":
        ow = Over()
        ow._partition = list(cols)
        return ow

    def order_by(self, *cols: str | Column) -> "Over":
        self._order = list(cols)
        return self

    def rows_preceding(self, n) -> "Over":
        from pyspark.sql import Window as W

        lo = W.unboundedPreceding if n is Over.UNBOUNDED else -int(n)
        self._rows = (lo, W.currentRow)
        return self

    def range_preceding(self, n) -> "Over":
        from pyspark.sql import Window as W

        lo = W.unboundedPreceding if n is Over.UNBOUNDED else -int(n)
        self._range = (lo, W.currentRow)
        return self

    @property
    def spec(self):
        from pyspark.sql import Window as W

        s = W.partitionBy(*[_col(c) for c in self._partition]).orderBy(
            *[_col(c) for c in self._order]
        )
        if self._rows is not None:
            s = s.rowsBetween(*self._rows)
        elif self._range is not None:
            s = s.rangeBetween(*self._range)
        return s

    def apply(self, agg: str | Column) -> Column:
        """Evaluate an aggregate over this window (pyflink's
        ``col.sum.over(w)``)."""
        return _col(agg).over(self.spec)


class OverWindowedTable:
    def __init__(self, df: DataFrame, ow: Over):
        self._df = df
        self._ow = ow

    def select(self, *exprs: str | Column) -> Table:
        """Plain columns pass through; use ``ow.apply(F.sum('v')).alias(...)``
        for the windowed aggregates."""
        return Table(self._df.select(*[_col(e) for e in exprs]))


class TableEnvironment:
    """Catalog + SQL entry point (reference TableEnvironmentImpl)."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self._spark = spark
        self._sf_dir = sf_dir
        self._versioned: dict[str, tuple[str, str]] = {}
        self._tables: dict[str, object] = {}  # name -> sources.ddl.TableDef
        self._views: dict[str, str] = {}  # name -> defining query text
        # catalog.database namespace emulation (Flink: default_catalog.
        # default_database, GenericInMemoryCatalog); Spark temp views are
        # flat, so the namespace scopes SHOW/DROP
        self._catalogs: dict[str, set[str]] = {"default_catalog": {"default_database"}}
        self._current_cat: str = "default_catalog"
        self._current_db: str = "default_database"
        # per-scope namespacing (reference CatalogManager/ObjectIdentifier:
        # the same bare table name may coexist in two (catalog, database)
        # scopes).  Spark temp views are flat, so each scoped table gets a
        # PHYSICAL view name: the bare name when free, else a mangled
        # `__{cat}__{db}__{name}`.  _scoped_tables maps the logical
        # identity to the physical view; _logical maps back for display
        # (SHOW TABLES / SHOW CREATE TABLE).
        self._scoped_tables: dict[tuple[str, str, str], str] = {}
        self._logical: dict[str, str] = {}  # physical -> logical name
        self._table_db: dict[str, str] = {}  # table name -> owning database
        self._view_db: dict[str, str] = {}  # view name -> owning database
        self._table_cat: dict[str, str] = {}  # table name -> owning catalog
        self._view_cat: dict[str, str] = {}  # view name -> owning catalog
        # module registry (Flink LOAD/UNLOAD MODULE, USE MODULES —
        # SqlUseModules.java; ModuleManager resolution order).  'core' is
        # Spark's built-in surface; 'flink' is the Flink-named SQL-UDF
        # module registered below — both loaded and used initially.
        self._modules: dict[str, bool] = {"core": True, "flink": True}
        # session config set via SET 'key' = 'value' (SqlSet.java; FLIP-163
        # spelling).  Gates the OPTIONS hint exactly like the reference:
        # table.dynamic-table-options.enabled defaults to FALSE
        # (TableConfigOptions.java:61-67)
        self._config: dict[str, str] = {}
        # database properties/comment (SqlCreateDatabase WITH (...) /
        # SqlAlterDatabase SET (...)) keyed by (catalog, database)
        self._db_props: dict[tuple[str, str], dict[str, str]] = {}
        self._hint_views = 0
        self._jars: list[str] = []  # ADD JAR registrations (SqlAddJar)
        self._functions: dict[str, str] = {}  # CREATE FUNCTION name -> identifier
        # Flink-named scalar functions (SPLIT_INDEX, HASH_CODE, …) become
        # session SQL UDFs so reference SQL text runs unmodified.
        from incubator_flink_spark.functions.sqlfuncs import register_flink_sql_functions

        register_flink_sql_functions(spark)

    @property
    def _databases(self) -> set[str]:
        """Database set of the CURRENT catalog (live reference)."""
        return self._catalogs[self._current_cat]

    def _phys(self, name: str) -> str:
        """Physical temp-view name for a logical table reference resolved
        in the CURRENT (catalog, database) scope.  Unscoped/legacy names
        (plain temp views, already-physical mangled names) pass through —
        bare names not found in the current scope fall back to the flat
        Spark namespace (documented leniency vs the reference's strictly
        scoped resolution)."""
        return self._scoped_tables.get(
            (self._current_cat, self._current_db, name), name
        )

    def _lookup_table(self, name: str):
        """TableDef for a logical (current-scope) or physical name."""
        return self._tables.get(self._phys(name))

    def _fs_partition_specs(self, t) -> list[str]:
        """Hive-style partition directories of a filesystem table as
        sorted 'k1=v1/k2=v2' specs (the metastore-listing analog — empty
        directories count, matching SHOW PARTITIONS after ADD PARTITION)."""
        import os

        specs: list[str] = []

        def walk(d: str, depth: int, acc: list[str]) -> None:
            if depth == len(t.partitioned_by):
                specs.append("/".join(acc))
                return
            key = t.partitioned_by[depth]
            for e in sorted(os.listdir(d)):
                full = os.path.join(d, e)
                if e.startswith(f"{key}=") and os.path.isdir(full):
                    walk(full, depth + 1, [*acc, e])

        walk(t.options["path"], 0, [])
        return specs

    def _register_table_def(self, t, cat: str, db: str, logical: str) -> None:
        """Book-keep one scoped table registration: t.name must already be
        the PHYSICAL view name."""
        self._tables[t.name] = t
        self._table_cat[t.name] = cat
        self._table_db[t.name] = db
        self._scoped_tables[(cat, db, logical)] = t.name
        self._logical[t.name] = logical

    def _unregister_physical(self, phys: str) -> None:
        """Drop every piece of book-keeping for one physical table name."""
        self._tables.pop(phys, None)
        cat = self._table_cat.pop(phys, None)
        db = self._table_db.pop(phys, None)
        logical = self._logical.pop(phys, phys)
        self._scoped_tables.pop((cat, db, logical), None)

    def _set_flink_module(self, used: bool) -> None:
        """Enable/disable the 'flink' function module: the Flink-named SQL
        UDFs are (de)registered so name resolution honors the module state
        (the ModuleManager function-resolution analog)."""
        from incubator_flink_spark.functions.sqlfuncs import (
            _SQL_FUNCS,
            register_flink_sql_functions,
        )

        if used:
            register_flink_sql_functions(self._spark)
        else:
            for name in _SQL_FUNCS:
                self._spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")

    def from_path(self, table: str) -> Table:
        return Table(load(self._spark, self._sf_dir, table))

    def from_dataframe(self, df: DataFrame) -> Table:
        return Table(df)

    def from_elements(self, rows, schema: str) -> Table:
        return Table(self._spark.createDataFrame(rows, schema))

    _HINT_RE = re.compile(r"(\w+)\s*/\*\+\s*OPTIONS\s*\(([^)]*)\)\s*\*/", re.IGNORECASE)

    def _apply_options_hints(self, sql: str) -> str:
        """FLIP-113 dynamic table options: ``t /*+ OPTIONS('k'='v') */``
        merges the hinted options over the table's declared WITH options
        at read time (reference CatalogSourceTable.java:96-117 —
        computeContextResolvedTable merges catalogTable options with hints;
        gated by table.dynamic-table-options.enabled, default false)."""

        def repl(m):
            name, body = m.group(1), m.group(2)
            # Gate BEFORE target resolution: the reference rejects a disabled
            # hint regardless of what it is attached to (HintOptionChecker),
            # so a hint on a view/alias must not leak a 'not a DDL table'
            # error while the feature is off.
            if self._config.get("table.dynamic-table-options.enabled", "false") != "true":
                raise ValueError(
                    "OPTIONS hint is allowed only when table.dynamic-table-options"
                    ".enabled is set to true"
                )
            t = self._lookup_table(name)
            if t is None:
                # Hint attached to an alias / view / CTE (e.g. the \w+ the
                # regex grabbed is 'a' in `FROM t AS a /*+ OPTIONS(...) */`):
                # tolerate by stripping the hint and leaving the relation —
                # but ONLY when the name resolves to something known in the
                # statement or session.  A typo'd table name must error
                # like the reference's HintOptionChecker, not silently
                # ignore the user's options (ADVICE r9).
                # - a VIEW target would silently ignore the options (the
                #   query still runs) — raise, like the reference rejecting
                #   hints on non-table relations;
                # - an alias or plain temp view: strip, documented tolerance;
                # - an unknown RELATION: strip — the query itself then fails
                #   with the ordinary table-not-found, so nothing is silent.
                if name in self._views:
                    raise ValueError(
                        f"OPTIONS hint: {name!r} is a view — dynamic table "
                        "options apply only to connector (DDL) tables"
                    )
                return name
            import copy

            hinted = copy.deepcopy(t)
            for om in re.finditer(r"'([^']+)'\s*=\s*'([^']*)'", body):
                hinted.options[om.group(1)] = om.group(2)
            self._hint_views += 1
            hinted.name = f"__{name}_hints_{self._hint_views}"
            from incubator_flink_spark.sources.ddl import execute_ddl

            execute_ddl(self._spark, None, table_def=hinted)
            return hinted.name

        return self._HINT_RE.sub(repl, sql)

    # a relation reference follows one of these keywords (FROM/JOIN for
    # queries, INTO/OVERWRITE for INSERT, TABLE for DESCRIBE/DROP/ALTER/
    # SHOW CREATE/TVF `TABLE src`, EXISTS for `DROP ... IF EXISTS`,
    # DESC/DESCRIBE bare forms).  Restricting the rewrite to relation
    # positions is what keeps `alias.column` projections (`SELECT b.total
    # FROM big AS b`) untouched even when `b` is a database name; quoted
    # identifiers (backtick/double-quote) are left to Spark verbatim.
    _REL_RE = re.compile(
        r"\b(FROM|JOIN|INTO|OVERWRITE|TABLE|EXISTS|DESCRIBE|DESC)\s+"
        r"(?![`\"])([A-Za-z_]\w*(?:\.[A-Za-z_]\w*){0,2})\b(?![`\"])",
        re.IGNORECASE,
    )

    def _resolve_qualified(self, sql: str, tolerant: bool = False) -> str:
        """Resolve catalog-qualified identifiers (the reference's
        ObjectIdentifier: ``catalog.db.table`` and ``db.table`` — SQL docs
        "identifier expansion") in RELATION positions to the physical
        session view names.  A 3-part name whose catalog exists must
        resolve or it is an error (``tolerant`` — used by DROP so IF
        EXISTS can no-op — leaves it for the statement handler); a 2-part
        prefix that is not a database of the current catalog is left
        alone; bare names resolve through the current scope (mangled
        physical names for coexisting bare names).  Quoted string
        literals and quoted identifiers are never rewritten; dotted
        tokens OUTSIDE relation positions (``alias.column``) are never
        touched."""

        def known(tbl: str, cat: str, db: str) -> str | None:
            phys = self._scoped_tables.get((cat, db, tbl))
            if phys is not None:
                return phys
            if self._view_cat.get(tbl) == cat and self._view_db.get(tbl) == db:
                return tbl
            # legacy registrations that predate _scoped_tables
            if self._table_cat.get(tbl) == cat and self._table_db.get(tbl) == db:
                return tbl
            return None

        def resolve(token: str) -> str:
            parts = token.split(".")
            if len(parts) == 3:
                cat, db, tbl = parts
                if cat not in self._catalogs:
                    return token
                if db not in self._catalogs[cat]:
                    if tolerant:
                        return token
                    raise ValueError(f"database {db!r} does not exist in catalog {cat!r}")
                phys = known(tbl, cat, db)
                if phys is not None:
                    return phys
                if tolerant:
                    return token
                raise ValueError(f"Table (or view) {cat}.{db}.{tbl} does not exist")
            if len(parts) == 2:
                db, tbl = parts
                if db in self._catalogs.get(self._current_cat, set()):
                    phys = known(tbl, self._current_cat, db)
                    if phys is not None:
                        return phys
                return token  # alias.column or unresolvable db.table
            phys = self._scoped_tables.get(
                (self._current_cat, self._current_db, token)
            )
            return phys if phys is not None else token

        def repl(m: re.Match) -> str:
            return m.group(1) + m.group(0)[len(m.group(1)) : -len(m.group(2))] + resolve(
                m.group(2)
            )

        if "." not in sql and not self._scoped_tables:
            return sql
        # rewrite only OUTSIDE single-quoted literals ('path'='/a/b.c', ...)
        parts = sql.split("'")
        for i in range(0, len(parts), 2):
            parts[i] = self._REL_RE.sub(repl, parts[i])
        return "'".join(parts)

    def sql_query(self, sql: str, _resolved: bool = False) -> Table:
        # _resolved: execute_sql (and view re-planning) already ran
        # _resolve_qualified — resolving twice would re-interpret a
        # PHYSICAL view name as a logical name in the current scope
        if not _resolved:
            sql = self._resolve_qualified(sql)
        if "/*+" in sql and "OPTIONS" in sql.upper():
            sql = self._apply_options_hints(sql)
        if "SYSTEM_TIME" in sql.upper():
            from incubator_flink_spark.api.temporal import rewrite_system_time_join

            sql = rewrite_system_time_join(self._spark, sql, self._versioned)
        up = sql.upper()
        if any(k in up for k in ("TUMBLE", "HOP", "CUMULATE", "SESSION")):
            from incubator_flink_spark.api.tvf import (
                rewrite_legacy_group_windows,
                rewrite_window_tvf,
            )

            sql = rewrite_window_tvf(self._spark, sql)
            # legacy (pre-TVF) GROUP BY TUMBLE/HOP/SESSION(...) grammar —
            # after the TVF pass, so TABLE(TUMBLE(TABLE t, ...)) fragments
            # are already gone and only bare group-window calls remain
            sql = rewrite_legacy_group_windows(sql)
        if "MATCH_RECOGNIZE" in sql.upper():
            from incubator_flink_spark.api.match_sql import rewrite_match_recognize

            sql = rewrite_match_recognize(self._spark, sql)
        return Table(self._spark.sql(sql))

    def execute_sql(self, sql: str):
        """Flink's primary SQL entry point (TableEnvironmentImpl.executeSql,
        flink-table-api-java/.../internal/TableEnvironmentImpl.java:779):
        CREATE TABLE ... WITH registers a connector table, INSERT
        INTO/OVERWRITE <table> <query> runs the query and writes it through
        the table's connector (then refreshes the registered view so
        subsequent queries see the data), anything else executes as a
        query and returns its rows."""
        import re as _re

        s = sql.strip().rstrip(";")
        up = s.upper()
        if not up.startswith("CREATE"):
            # qualified references (cat.db.t / db.t) resolve against the
            # session catalog; CREATE is exempt — its target does not exist
            # yet.  DROP resolves tolerantly: an unresolvable qualified name
            # stays in place so the handler can honor IF EXISTS (ADVICE r9).
            s = self._resolve_qualified(s, tolerant=up.startswith("DROP"))
            up = s.upper()
        # SET / RESET session options (SqlSet.java / SqlReset.java; the
        # FLIP-163 quoted spelling).  SET with no argument lists the
        # session config; RESET with no argument clears it.
        sm = _re.fullmatch(r"SET(?:\s+'([^']+)'\s*=\s*'([^']*)')?", s, _re.I)
        if sm:
            if sm.group(1) is None:
                return sorted(self._config.items())
            self._config[sm.group(1)] = sm.group(2)
            if sm.group(1).startswith("spark."):
                self._spark.conf.set(sm.group(1), sm.group(2))
            return []
        rm = _re.fullmatch(r"RESET(?:\s+'([^']+)')?", s, _re.I)
        if rm:
            if rm.group(1) is None:
                for k in list(self._config):
                    if k.startswith("spark."):
                        self._spark.conf.unset(k)
                self._config.clear()
            else:
                self._config.pop(rm.group(1), None)
                if rm.group(1).startswith("spark."):
                    self._spark.conf.unset(rm.group(1))
            return []
        if up.startswith("CREATE TABLE") or up.startswith("CREATE TEMPORARY TABLE"):
            from incubator_flink_spark.sources.ddl import (
                execute_ddl,
                merge_table_like,
                parse_create_table,
            )

            # qualified CREATE target: CREATE TABLE [cat.][db.]name — the
            # object registers under the explicit scope instead of the
            # current one (ObjectIdentifier expansion on the DDL side)
            tgt_cat, tgt_db = self._current_cat, self._current_db
            qm = _re.match(
                r"(CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?)"
                r"(?:(\w+)\.)?(\w+)\.(\w+)\b",
                s,
                _re.I,
            )
            if qm:
                cat = qm.group(2) or self._current_cat
                db, name = qm.group(3), qm.group(4)
                if cat not in self._catalogs:
                    raise ValueError(f"catalog {cat!r} does not exist")
                if db not in self._catalogs[cat]:
                    raise ValueError(f"database {db!r} does not exist in catalog {cat!r}")
                tgt_cat, tgt_db = cat, db
                s = qm.group(1) + name + s[qm.end():]

            # CTAS — CREATE TABLE t [WITH (...)] AS <query> (FLIP-218;
            # reference CreateTableASOperation: derive the sink schema
            # from the query, create the connector table, then insert the
            # query result through the sink).  Flink's CTAS form carries
            # no explicit column list, so a name followed by AS is
            # unambiguous against plain CREATE (whose name is followed by
            # the parenthesized schema).
            ctas_df = None
            cm = _re.match(
                r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*"
                r"(WITH\s*\(.*?\))?\s*AS\s+(.+)$",
                s,
                _re.I | _re.S,
            )
            if cm and _re.match(r"(SELECT|VALUES|WITH\b|\()", cm.group(3).strip(), _re.I):
                query = self._resolve_qualified(cm.group(3).strip())
                ctas_df = self.sql_query(query, _resolved=True).to_df()
                with_clause = cm.group(2) or ""
                if "connector" not in with_clause:
                    # the reference rejects CTAS without a connector
                    # (CreateTableASOperation sinks through the table's
                    # DynamicTableSink)
                    raise ValueError(
                        "CREATE TABLE AS: table options do not contain an "
                        "option key 'connector'"
                    )
                cols_txt = ", ".join(
                    f"{f.name} {f.dataType.simpleString().upper()}"
                    for f in ctas_df.schema.fields
                )
                s = f"CREATE TABLE {cm.group(1)} ({cols_txt}) {with_clause}"

            t = parse_create_table(s)
            if t.like is not None:
                # CREATE TABLE ... LIKE (SqlTableLike.java:91): resolve the
                # source definition from this catalog and merge per
                # MergeTableLikeUtil before the connector table is created
                src = self._lookup_table(t.like[0])
                if src is None:
                    raise ValueError(
                        f"LIKE source table {t.like[0]!r} was not created via execute_sql DDL"
                    )
                t = merge_table_like(t, src)
            # per-scope namespacing (reference CatalogManager/
            # ObjectIdentifier): the same bare name may coexist in two
            # (catalog, database) scopes.  Spark temp views are flat, so a
            # second scope's table gets a mangled PHYSICAL view name;
            # resolution maps logical -> physical per scope.
            logical = t.name
            existing = self._scoped_tables.get((tgt_cat, tgt_db, logical))
            if existing is not None:
                # same-scope re-CREATE replaces (pre-existing behavior)
                t.name = existing
            elif logical in self._tables or logical in self._views or (
                self._spark.catalog.tableExists(logical)
            ):
                t.name = f"__{tgt_cat}__{tgt_db}__{logical}"
            # register only after the DDL succeeds: a failed CREATE must not
            # leave a phantom entry for SHOW TABLES / INSERT INTO to find
            if ctas_df is not None and t.options.get("connector", "filesystem") == "filesystem":
                # filesystem CTAS materializes BEFORE the DDL registers the
                # table (the filesystem connector reads its path eagerly at
                # CREATE; sink-first emptiness is a kafka-connector notion)
                from incubator_flink_spark.sources.ddl import format_options
                from incubator_flink_spark.sources.filesystem import write_table

                write_table(
                    ctas_df,
                    t.options["path"],
                    t.options.get("format", "parquet"),
                    mode="overwrite",
                    partition_by=t.partitioned_by or None,
                    **format_options(t, for_write=True),
                )
                ctas_df = None
            execute_ddl(self._spark, None, table_def=t)
            self._register_table_def(t, tgt_cat, tgt_db, logical)
            if ctas_df is not None:
                # CTAS second half for sink-first connectors (kafka/
                # upsert-kafka/print/blackhole): SinkModifyOperation
                self._insert_into(t.name, ctas_df, "append")
                self._refresh_after_inserts([t.name])
            return []
        vm = _re.fullmatch(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?VIEW\s+(\w+)\s+AS\s+(.+)",
            s,
            _re.I | _re.S,
        )
        if vm:
            # Flink: CreateViewOperation (TEMPORARY and catalog views both
            # land in the session catalog here).  The defining query TEXT
            # is stored and re-planned after any INSERT that refreshes a
            # base table (see the INSERT branch) — a Spark temp view alone
            # captures the file-scan snapshot at creation and would go
            # stale, silently returning pre-INSERT contents.
            name, query = vm.group(1), vm.group(2)
            if name in self._tables:
                raise ValueError(f"{name!r} is a table; CREATE VIEW cannot replace a table")
            if "OR REPLACE" not in up and name in self._views:
                raise ValueError(f"view {name!r} already exists (use CREATE OR REPLACE VIEW)")
            self.sql_query(query, _resolved=True).to_df().createOrReplaceTempView(name)
            self._views[name] = query
            self._view_db[name] = self._current_db
            self._view_cat[name] = self._current_cat
            return []
        dv = _re.fullmatch(r"DROP\s+(?:TEMPORARY\s+)?VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)", s, _re.I)
        if dv:
            name = dv.group(2)
            if "." in name or name not in self._views:
                # dotted: unresolvable qualified name left by the tolerant
                # resolver — IF EXISTS no-ops (ADVICE r9)
                if dv.group(1):
                    return []
                raise ValueError(f"view {name!r} does not exist (use DROP VIEW IF EXISTS)")
            self._spark.catalog.dropTempView(name)
            del self._views[name]
            self._view_db.pop(name, None)
            self._view_cat.pop(name, None)
            return []
        if _re.fullmatch(r"SHOW\s+VIEWS", s, _re.I):
            return sorted(self._views)
        # --- catalog namespace (SqlCreateCatalog/SqlDropCatalog/
        # SqlUseCatalog; GenericInMemoryCatalog ships one 'default' db) ---
        cc = _re.fullmatch(
            r"CREATE\s+CATALOG\s+(\w+)(?:\s+WITH\s*\((.*?)\))?", s, _re.I | _re.S
        )
        if cc:
            name, opts = cc.group(1), cc.group(2) or ""
            kind = dict(_re.findall(r"'([^']+)'\s*=\s*'([^']*)'", opts)).get(
                "type", "generic_in_memory"
            )
            if kind != "generic_in_memory":
                raise ValueError(f"unsupported catalog type {kind!r} (generic_in_memory only)")
            if name in self._catalogs:
                raise ValueError(f"catalog {name!r} already exists")
            self._catalogs[name] = {"default"}
            return []
        dc = _re.fullmatch(r"DROP\s+CATALOG\s+(IF\s+EXISTS\s+)?(\w+)", s, _re.I)
        if dc:
            name = dc.group(2)
            if name not in self._catalogs:
                if dc.group(1):
                    return []
                raise ValueError(f"catalog {name!r} does not exist")
            if name == self._current_cat:
                raise ValueError(f"cannot drop the current catalog {name!r}")
            if name == "default_catalog":
                raise ValueError("cannot drop the default catalog")
            owned = [t for t, c in self._table_cat.items() if c == name]
            owned_v = [v for v, c in self._view_cat.items() if c == name]
            for t in owned:
                self._spark.catalog.dropTempView(t)
                self._unregister_physical(t)
            for v in owned_v:
                self._spark.catalog.dropTempView(v)
                self._views.pop(v, None)
                self._view_db.pop(v, None)
                self._view_cat.pop(v, None)
            del self._catalogs[name]
            return []
        ucat = _re.fullmatch(r"USE\s+CATALOG\s+(\w+)", s, _re.I)
        if ucat:
            name = ucat.group(1)
            if name not in self._catalogs:
                raise ValueError(f"catalog {name!r} does not exist")
            self._current_cat = name
            self._current_db = (
                "default_database" if name == "default_catalog" else "default"
            )
            return []
        if _re.fullmatch(r"SHOW\s+CATALOGS", s, _re.I):
            return sorted(self._catalogs)
        if _re.fullmatch(r"SHOW\s+CURRENT\s+CATALOG", s, _re.I):
            return [self._current_cat]
        # --- module statements (SqlUseModules.java; ModuleManager order:
        # SHOW MODULES lists USED modules in resolution order, SHOW FULL
        # MODULES adds the used flag; functions resolve only from used
        # modules) ---
        lmm = _re.fullmatch(r"LOAD\s+MODULE\s+(\w+)(?:\s+WITH\s*\(.*?\))?", s, _re.I | _re.S)
        if lmm:
            name = lmm.group(1).lower()
            if name in self._modules:
                raise ValueError(f"module {name!r} is already loaded")
            if name != "flink":
                raise ValueError(
                    f"could not find a module named {name!r} (loadable here: 'flink')"
                )
            self._set_flink_module(True)
            self._modules[name] = True
            return []
        umm = _re.fullmatch(r"UNLOAD\s+MODULE\s+(\w+)", s, _re.I)
        if umm:
            name = umm.group(1).lower()
            if name not in self._modules:
                raise ValueError(f"module {name!r} is not loaded")
            if name == "core":
                raise ValueError(
                    "unloading the core module is not supported here — Spark's "
                    "built-in functions cannot be removed from the session "
                    "(documented divergence)"
                )
            self._set_flink_module(False)
            del self._modules[name]
            return []
        usm = _re.fullmatch(r"USE\s+MODULES\s+(.+)", s, _re.I)
        if usm:
            names = [n.strip().lower() for n in usm.group(1).split(",")]
            if len(set(names)) != len(names):
                raise ValueError("module names in USE MODULES must be unique")
            for n in names:
                if n not in self._modules:
                    raise ValueError(f"module {n!r} is not loaded (LOAD MODULE first)")
            if "core" not in names:
                raise ValueError(
                    "disabling the core module is not supported here (documented "
                    "divergence — Spark built-ins cannot be removed)"
                )
            # re-order: used modules in the given order, unused keep loaded
            new: dict[str, bool] = {n: True for n in names}
            for n in self._modules:
                if n not in new:
                    new[n] = False
            if self._modules.get("flink", False) != new.get("flink", False):
                self._set_flink_module(new.get("flink", False))
            self._modules = new
            return []
        if _re.fullmatch(r"SHOW\s+MODULES", s, _re.I):
            return [n for n, used in self._modules.items() if used]
        if _re.fullmatch(r"SHOW\s+FULL\s+MODULES", s, _re.I):
            return list(self._modules.items())
        cdb = _re.fullmatch(
            r"CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)"
            r"(?:\s+COMMENT\s+'([^']*)')?(?:\s+WITH\s*\((.*)\))?",
            s,
            _re.I | _re.S,
        )
        if cdb:
            name = cdb.group(2)
            if name in self._databases and not cdb.group(1):
                raise ValueError(f"database {name!r} already exists")
            self._databases.add(name)
            # COMMENT / WITH properties (SqlCreateDatabase.java — stored in
            # the catalog's CatalogDatabase properties)
            props = dict(_re.findall(r"'([^']+)'\s*=\s*'([^']*)'", cdb.group(4) or ""))
            if cdb.group(3) is not None:
                props["comment"] = cdb.group(3)
            if props:
                self._db_props[(self._current_cat, name)] = props
            return []
        adb = _re.fullmatch(r"ALTER\s+DATABASE\s+(\w+)\s+SET\s*\((.*)\)", s, _re.I | _re.S)
        if adb:
            # SqlAlterDatabase: merge new properties into the database's
            # CatalogDatabase (AlterDatabaseOperation semantics)
            name = adb.group(1)
            if name not in self._databases:
                raise ValueError(f"database {name!r} does not exist")
            props = self._db_props.setdefault((self._current_cat, name), {})
            props.update(_re.findall(r"'([^']+)'\s*=\s*'([^']*)'", adb.group(2)))
            return []
        ddb = _re.fullmatch(
            r"DROP\s+DATABASE\s+(IF\s+EXISTS\s+)?(\w+)(\s+CASCADE|\s+RESTRICT)?", s, _re.I
        )
        if ddb:
            name, cascade = ddb.group(2), (ddb.group(3) or "").strip().upper() == "CASCADE"
            if name not in self._databases:
                if ddb.group(1):
                    return []
                raise ValueError(f"database {name!r} does not exist")
            # Each catalog's default database is protected: 'default_database'
            # in default_catalog, 'default' in user catalogs (mirrors
            # GenericInMemoryCatalog's builtin db) — keyed on the CURRENT
            # catalog, not a hardcoded name.
            cat_default = (
                "default_database" if self._current_cat == "default_catalog" else "default"
            )
            if name == cat_default:
                raise ValueError("cannot drop the default database")
            owned = [
                t
                for t, db in self._table_db.items()
                if db == name and self._table_cat.get(t, "default_catalog") == self._current_cat
            ]
            if owned and not cascade:
                raise ValueError(f"database {name!r} is not empty (use DROP DATABASE ... CASCADE)")
            owned_views = [
                v
                for v, db in self._view_db.items()
                if db == name and self._view_cat.get(v, "default_catalog") == self._current_cat
            ]
            if owned_views and not cascade:
                raise ValueError(f"database {name!r} is not empty (use DROP DATABASE ... CASCADE)")
            for t in owned:
                self._spark.catalog.dropTempView(t)
                self._unregister_physical(t)
            for v in owned_views:
                self._spark.catalog.dropTempView(v)
                del self._views[v]
                del self._view_db[v]
                self._view_cat.pop(v, None)
            self._databases.discard(name)
            self._db_props.pop((self._current_cat, name), None)
            if self._current_db == name:
                self._current_db = cat_default
            return []
        um = _re.fullmatch(r"USE\s+(\w+)", s, _re.I)
        if um:
            name = um.group(1)
            if name not in self._databases:
                raise ValueError(f"database {name!r} does not exist")
            self._current_db = name
            return []
        if _re.fullmatch(r"SHOW\s+DATABASES", s, _re.I):
            return sorted(self._databases)
        if _re.fullmatch(r"SHOW\s+CURRENT\s+DATABASE", s, _re.I):
            return [self._current_db]
        if _re.fullmatch(r"SHOW\s+(?:USER\s+)?FUNCTIONS", s, _re.I):
            # Flink's ShowFunctionsOperation (USER scope = session-registered):
            # the 'flink' module's SQL UDFs (only while that module is USED —
            # the ModuleManager resolution contract) plus CREATE FUNCTION
            # registrations
            from incubator_flink_spark.functions.sqlfuncs import _SQL_FUNCS

            mod = set(_SQL_FUNCS) if self._modules.get("flink", False) else set()
            return sorted(mod | set(self._functions))
        cfm = _re.fullmatch(
            r"(CREATE|ALTER)\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+"
            r"(IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+'([^']+)'(?:\s+LANGUAGE\s+(\w+))?",
            s,
            _re.I,
        )
        if cfm:
            # CREATE [TEMPORARY] FUNCTION name AS 'dotted.path' LANGUAGE
            # PYTHON (SqlCreateFunction.java:39; ALTER FUNCTION re-points the
            # identifier, SqlAlterFunction.java).  The dotted path resolves to
            # a module attribute — a pandas_udf/udf object or plain callable —
            # registered in the session function catalog.
            verb, if_not_exists, name, ident, lang = (
                cfm.group(1).upper(),
                cfm.group(2),
                cfm.group(3),
                cfm.group(4),
                (cfm.group(5) or "PYTHON").upper(),
            )
            if lang != "PYTHON":
                raise ValueError(
                    f"LANGUAGE {lang} is not supported here — this engine loads "
                    "Python functions (use LANGUAGE PYTHON)"
                )
            if verb == "CREATE" and name in self._functions:
                if if_not_exists:
                    return []
                raise ValueError(f"function {name!r} already exists (use IF NOT EXISTS)")
            if verb == "ALTER" and name not in self._functions:
                raise ValueError(f"ALTER FUNCTION: {name!r} does not exist")
            import importlib

            mod_path, _, attr = ident.rpartition(".")
            if not mod_path:
                raise ValueError(f"function identifier {ident!r} is not a dotted path")
            try:
                fn = getattr(importlib.import_module(mod_path), attr)
            except (ImportError, AttributeError) as e:
                raise ValueError(f"cannot resolve function identifier {ident!r}: {e}") from e
            self._spark.udf.register(name, fn)
            self._functions[name] = ident
            return []
        dfm = _re.fullmatch(
            r"DROP\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+(IF\s+EXISTS\s+)?(\w+)",
            s,
            _re.I,
        )
        if dfm:
            name = dfm.group(2)
            if name not in self._functions:
                if dfm.group(1):
                    return []
                raise ValueError(f"function {name!r} does not exist (use DROP FUNCTION IF EXISTS)")
            self._spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
            del self._functions[name]
            return []
        dm = _re.fullmatch(r"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)", s, _re.I)
        if dm:
            name = dm.group(2)
            if "." in name:
                # a qualified name the tolerant resolver could not resolve:
                # IF EXISTS makes it a no-op, otherwise it is the resolver's
                # error (ADVICE r9 — DROP TABLE IF EXISTS cat.db.t must not
                # raise on a nonexistent table)
                if dm.group(1):
                    return []
                raise ValueError(f"Table (or view) {name} does not exist")
            if name in self._views:
                raise ValueError(f"{name!r} is a view — use DROP VIEW")
            pname = self._phys(name)
            known = self._spark.catalog.dropTempView(pname)
            if pname in self._tables:
                self._unregister_physical(pname)
            elif not known and not dm.group(1):
                raise ValueError(f"table {name!r} does not exist (use DROP TABLE IF EXISTS)")
            return []
        dsc = _re.fullmatch(r"DESC(?:RIBE)?\s+(\w+)", s, _re.I)
        if dsc:
            # Flink: DescribeTableOperation -> (name, type, null, key,
            # extras, watermark) rows.  DDL tables answer from their
            # declared schema (incl. computed cols + watermark); plain
            # temp views answer from the Spark catalog schema.
            name = self._phys(dsc.group(1))
            t = self._tables.get(name)
            if t is not None:
                pk = set(t.primary_key)
                rows = [
                    (
                        c,
                        ty,
                        c not in pk,
                        "PRI" if c in pk else None,
                        None,
                        (
                            "WATERMARK SOURCE_WATERMARK()"
                            if t.watermark[1] is None
                            else f"WATERMARK {t.watermark[1]}s"
                        )
                        if t.watermark and t.watermark[0] == c
                        else None,
                    )
                    for c, ty in t.columns
                ]
                rows += [
                    (c, "AS " + expr, True, None, "computed", None)
                    for c, expr in t.computed
                ]
                rows += [
                    (
                        c,
                        ty,
                        True,
                        None,
                        "METADATA"
                        + (f" FROM '{key}'" if key else "")
                        + (" VIRTUAL" if virtual else ""),
                        None,
                    )
                    for c, ty, key, virtual in t.metadata_cols
                ]
                return rows
            if self._spark.catalog.tableExists(name):
                return [
                    (f.name, f.dataType.simpleString(), f.nullable, None, None, None)
                    for f in self._spark.table(name).schema.fields
                ]
            raise ValueError(f"table {name!r} does not exist")
        sc = _re.fullmatch(r"SHOW\s+CREATE\s+TABLE\s+(\w+)", s, _re.I)
        if sc:
            # Flink 1.14's ShowCreateTableOperation: reconstruct the DDL
            # from the registered definition
            name = sc.group(1)
            t = self._lookup_table(name)
            if t is None:
                raise ValueError(f"SHOW CREATE TABLE: {name!r} was not created via execute_sql DDL")
            body = [f"  {c} {ty}" for c, ty in t.columns]
            body += [f"  {c} AS {expr}" for c, expr in t.computed]
            body += [
                f"  {c} {ty} METADATA"
                + (f" FROM '{key}'" if key else "")
                + (" VIRTUAL" if virtual else "")
                for c, ty, key, virtual in t.metadata_cols
            ]
            if t.watermark:
                body.append(
                    f"  WATERMARK FOR {t.watermark[0]} AS SOURCE_WATERMARK()"
                    if t.watermark[1] is None
                    else f"  WATERMARK FOR {t.watermark[0]} AS {t.watermark[0]}"
                    f" - INTERVAL '{t.watermark[1]}' SECOND"
                )
            if t.primary_key:
                body.append(f"  PRIMARY KEY ({', '.join(t.primary_key)}) NOT ENFORCED")
            part = (
                f"\nPARTITIONED BY ({', '.join(t.partitioned_by)})"
                if t.partitioned_by
                else ""
            )
            opts = ",\n".join(f"  '{k}' = '{v}'" for k, v in sorted(t.options.items()))
            shown = self._logical.get(t.name, t.name)
            return [
                f"CREATE TABLE {shown} (\n" + ",\n".join(body) + f"\n){part}\nWITH (\n{opts}\n)"
            ]
        ex = _re.fullmatch(
            # EXPLAIN [detail[, detail]*] [PLAN FOR] <query> — the detail
            # list is the reference's ExplainDetail enum (ExplainDetail.
            # java: ESTIMATED_COST, CHANGELOG_MODE, JSON_EXECUTION_PLAN)
            r"EXPLAIN\s+"
            r"((?:(?:ESTIMATED_COST|CHANGELOG_MODE|JSON_EXECUTION_PLAN)"
            r"(?:\s*,\s*)?)*)\s*(?:PLAN\s+FOR\s+)?(.+)",
            s,
            _re.I | _re.S,
        )
        if ex and not up.startswith("EXPLAIN ANALYZE"):
            # Flink: EXPLAIN [PLAN FOR] <query> returns the plan text;
            # ours is the Catalyst formatted physical plan (post-rewrite,
            # so TVF/MATCH_RECOGNIZE/temporal sugar is already lowered)
            import contextlib
            import io

            details = [d for d in _re.split(r"[\s,]+", ex.group(1).upper()) if d]
            t = self.sql_query(ex.group(2), _resolved=True)
            with contextlib.redirect_stdout(io.StringIO()):  # no double print
                text = t.explain(*details)
            return [text]
        acols = _re.fullmatch(
            r"ALTER\s+TABLE\s+(\w+)\s+(ADD|REPLACE)\s+COLUMNS\s*\((.*)\)", s, _re.I | _re.S
        )
        if acols:
            # SqlAddReplaceColumns (SqlToOperationConverter
            # convertAlterTableAddReplaceColumn): ADD appends declared
            # columns, REPLACE swaps the whole non-partition schema.  The
            # refreshed view reads the files under the new declared schema
            # — columns absent from existing files scan as typed NULLs
            # (the reference's catalog-schema-over-data behavior).
            name, verb = acols.group(1), acols.group(2).upper()
            t = self._lookup_table(name)
            if t is None:
                raise ValueError(f"ALTER TABLE: {name!r} was not created via execute_sql DDL")
            if not t.columns:
                raise ValueError(f"table {name!r} has no declared schema to alter")
            new_cols = []
            for item in acols.group(3).split(","):
                parts = item.strip().split(None, 1)
                if len(parts) != 2:
                    raise ValueError(f"ADD/REPLACE COLUMNS entry needs 'name TYPE': {item!r}")
                new_cols.append((parts[0], parts[1].strip().upper()))
            if verb == "ADD":
                have = {c for c, _ in t.columns}
                for c, _ty in new_cols:
                    if c in have:
                        raise ValueError(f"column {c!r} already exists in table {name!r}")
                t.columns.extend(new_cols)
            else:
                missing_parts = [p for p in t.partitioned_by if p not in {c for c, _ in new_cols}]
                if missing_parts:
                    raise ValueError(
                        f"REPLACE COLUMNS must keep the partition columns {missing_parts}"
                    )
                t.columns[:] = new_cols
            self._refresh_after_inserts([name])
            return []
        achg = _re.fullmatch(
            r"ALTER\s+TABLE\s+(\w+)\s+CHANGE\s+(?:COLUMN\s+)?(\w+)\s+(\w+)\s+(\w+(?:\([^)]*\))?)"
            r"(?:\s+(FIRST|AFTER\s+\w+))?",
            s,
            _re.I,
        )
        if achg:
            # SqlChangeColumn (convertChangeColumn): retype and reposition
            # a declared column.  Renaming is a physical-layout mapping the
            # filesystem connector cannot express (files keep the old
            # name) — rejected with the precise reason, like the
            # reference's unsupported-conversion errors.
            name, old, new, ty = achg.group(1), achg.group(2), achg.group(3), achg.group(4).upper()
            t = self._lookup_table(name)
            if t is None:
                raise ValueError(f"ALTER TABLE: {name!r} was not created via execute_sql DDL")
            if old.lower() != new.lower():
                raise ValueError(
                    f"CHANGE COLUMN cannot rename {old!r} to {new!r}: the filesystem "
                    "connector reads by physical column name; retype/reposition only"
                )
            idx = next((i for i, (c, _) in enumerate(t.columns) if c == old), None)
            if idx is None:
                raise ValueError(f"column {old!r} does not exist in table {name!r}")
            entry = (t.columns[idx][0], ty)
            t.columns.pop(idx)
            pos = achg.group(5)
            if pos is None:
                t.columns.insert(idx, entry)
            elif pos.upper() == "FIRST":
                t.columns.insert(0, entry)
            else:
                anchor = pos.split()[1]
                j = next((i for i, (c, _) in enumerate(t.columns) if c == anchor), None)
                if j is None:
                    raise ValueError(f"AFTER column {anchor!r} does not exist")
                t.columns.insert(j + 1, entry)
            self._refresh_after_inserts([name])
            return []
        aset = _re.fullmatch(r"ALTER\s+TABLE\s+(\w+)\s+SET\s*\((.*)\)", s, _re.I | _re.S)
        if aset:
            # SqlAlterTableOptions: merge the given options into the table's
            # WITH clause and re-resolve the connector view
            from incubator_flink_spark.sources.ddl import execute_ddl

            name = aset.group(1)
            t = self._lookup_table(name)
            if t is None:
                raise ValueError(f"ALTER TABLE: {name!r} was not created via execute_sql DDL")
            for om in _re.finditer(r"'([^']+)'\s*=\s*'([^']*)'", aset.group(2)):
                t.options[om.group(1)] = om.group(2)
            execute_ddl(self._spark, None, table_def=t)
            return []
        areset = _re.fullmatch(r"ALTER\s+TABLE\s+(\w+)\s+RESET\s*\((.*)\)", s, _re.I | _re.S)
        if areset:
            # SqlAlterTableReset.java:37 — an empty key list is rejected
            # ("ALTER TABLE RESET does not support empty key")
            from incubator_flink_spark.sources.ddl import execute_ddl

            name = areset.group(1)
            t = self._lookup_table(name)
            if t is None:
                raise ValueError(f"ALTER TABLE: {name!r} was not created via execute_sql DDL")
            keys = _re.findall(r"'([^']+)'", areset.group(2))
            if not keys:
                raise ValueError("ALTER TABLE RESET does not support empty key")
            if "connector" in keys:
                raise ValueError("ALTER TABLE RESET does not support changing 'connector'")
            for k in keys:
                t.options.pop(k, None)
            execute_ddl(self._spark, None, table_def=t)
            return []
        avr = _re.fullmatch(r"ALTER\s+VIEW\s+(\w+)\s+RENAME\s+TO\s+(\w+)", s, _re.I)
        if avr:
            # SqlAlterViewRename.java:32
            old, new = avr.group(1), avr.group(2)
            if old not in self._views:
                raise ValueError(f"ALTER VIEW: {old!r} is not a view")
            if new in self._views or new in self._tables or self._spark.catalog.tableExists(new):
                raise ValueError(f"ALTER VIEW: target name {new!r} already exists")
            query = self._views.pop(old)
            self._spark.catalog.dropTempView(old)
            self.sql_query(query, _resolved=True).to_df().createOrReplaceTempView(new)
            self._views[new] = query
            self._view_db[new] = self._view_db.pop(old, self._current_db)
            self._view_cat[new] = self._view_cat.pop(old, self._current_cat)
            return []
        ava = _re.fullmatch(r"ALTER\s+VIEW\s+(\w+)\s+AS\s+(.+)", s, _re.I | _re.S)
        if ava:
            # SqlAlterViewAs.java:32 — replace the defining query
            name, query = ava.group(1), ava.group(2)
            if name not in self._views:
                raise ValueError(f"ALTER VIEW: {name!r} is not a view")
            self.sql_query(query, _resolved=True).to_df().createOrReplaceTempView(name)
            self._views[name] = query
            return []
        alt = _re.fullmatch(
            r"ALTER\s+TABLE\s+(\w+)\s+RENAME\s+TO\s+(\w+)", s, _re.I
        )
        if alt:
            # Flink: AlterTableRenameOperation — re-register the view and
            # the definition under the new name
            old, new = alt.group(1), alt.group(2)
            old_p = self._phys(old)
            t = self._tables.get(old_p)
            if t is None:
                raise ValueError(f"ALTER TABLE: {old!r} was not created via execute_sql DDL")
            cat = self._table_cat.get(old_p, self._current_cat)
            db = self._table_db.get(old_p, self._current_db)
            if (cat, db, new) in self._scoped_tables or new in self._tables or (
                self._spark.catalog.tableExists(new)
            ):
                raise ValueError(f"ALTER TABLE: target name {new!r} already exists")
            self._spark.table(old_p).createOrReplaceTempView(new)
            self._spark.catalog.dropTempView(old_p)
            self._unregister_physical(old_p)
            t.name = new
            self._register_table_def(t, cat, db, new)
            return []
        sp = _re.fullmatch(
            r"SHOW\s+PARTITIONS\s+(\w+)(?:\s+PARTITION\s*\(([^)]*)\))?", s, _re.I
        )
        if sp:
            # SqlShowPartitions / ShowPartitionsOperation: list the
            # partition specs of a PARTITIONED BY table, optionally
            # filtered by a partial spec; output rows are the reference's
            # 'k1=v1/k2=v2' partition-name strings in sorted order.
            # Filesystem tables list the hive-style DIRECTORIES (so empty
            # partitions created by ADD PARTITION show up, mirroring a
            # metastore listing); other connectors fall back to a distinct
            # scan of the partition columns.
            name = sp.group(1)
            t = self._lookup_table(name)
            if t is None:
                raise ValueError(f"SHOW PARTITIONS: {name!r} was not created via execute_sql DDL")
            if not t.partitioned_by:
                raise ValueError(f"table {name!r} is not partitioned")
            import os as _os

            path = t.options.get("path")
            if t.options.get("connector", "filesystem") == "filesystem" and path and _os.path.isdir(path):
                specs = self._fs_partition_specs(t)
            else:
                rows = self._spark.table(t.name).select(*t.partitioned_by).distinct().collect()
                specs = sorted(
                    "/".join(f"{c}={r[c]}" for c in t.partitioned_by) for r in rows
                )
            if sp.group(2):
                want = set()
                for kv in sp.group(2).split(","):
                    k, v = kv.split("=", 1)
                    v = v.strip()
                    if v.startswith("'") and v.endswith("'"):
                        v = v[1:-1]
                    want.add(f"{k.strip()}={v}")
                specs = [p for p in specs if want <= set(p.split("/"))]
            return specs
        apm = _re.fullmatch(
            r"ALTER\s+TABLE\s+(\w+)\s+(ADD|DROP)\s+(IF\s+(?:NOT\s+)?EXISTS\s+)?"
            r"PARTITION\s*\(([^)]*)\)",
            s,
            _re.I,
        )
        if apm:
            # SqlAddPartitions / SqlDropPartitions (AddPartitionsOperation /
            # DropPartitionsOperation): on the filesystem connector a
            # partition IS a hive-style directory — ADD creates it (empty),
            # DROP removes it and its data, then the registered view
            # refreshes so subsequent scans drop the pruned files.
            import os as _os
            import shutil as _shutil

            name, verb = apm.group(1), apm.group(2).upper()
            t = self._lookup_table(name)
            if t is None:
                raise ValueError(f"ALTER TABLE: {name!r} was not created via execute_sql DDL")
            if not t.partitioned_by:
                raise ValueError(f"table {name!r} is not partitioned")
            if t.options.get("connector", "filesystem") != "filesystem":
                raise ValueError("ADD/DROP PARTITION supports the filesystem connector")
            spec = {}
            for kv in apm.group(4).split(","):
                k, v = kv.split("=", 1)
                spec[k.strip()] = _re.sub(r"^'(.*)'$", r"\1", v.strip())
            if set(spec) != set(t.partitioned_by):
                raise ValueError(
                    f"partition spec {sorted(spec)} must name exactly the "
                    f"partition columns {t.partitioned_by}"
                )
            d = _os.path.join(
                t.options["path"], *[f"{k}={spec[k]}" for k in t.partitioned_by]
            )
            if verb == "ADD":
                if _os.path.isdir(d):
                    if apm.group(3):
                        return []
                    raise ValueError(f"partition {d!r} already exists")
                _os.makedirs(d)
                return []
            if not _os.path.isdir(d):
                if apm.group(3):
                    return []
                raise ValueError(f"partition {d!r} does not exist")
            _shutil.rmtree(d)
            self._refresh_after_inserts([name])
            return []
        aj = _re.fullmatch(r"ADD\s+JAR\s+'([^']+)'", s, _re.I)
        if aj:
            # SqlAddJar: session-level jar registration (the reference's
            # ResourceManager tracks the path; classes load lazily).  A
            # Python-only session cannot load JVM classes, so the statement
            # validates and records the path — CREATE FUNCTION ... USING
            # JAR still raises, and SHOW JARS lists what was added.
            import os as _os

            if not _os.path.isfile(aj.group(1)):
                raise ValueError(f"jar file {aj.group(1)!r} does not exist")
            self._jars.append(aj.group(1))
            return []
        rj = _re.fullmatch(r"REMOVE\s+JAR\s+'([^']+)'", s, _re.I)
        if rj:
            if rj.group(1) not in self._jars:
                raise ValueError(f"jar {rj.group(1)!r} was not added")
            self._jars.remove(rj.group(1))
            return []
        if _re.fullmatch(r"SHOW\s+JARS", s, _re.I):
            # SqlShowJars: the session's ADD JAR registrations in order
            return list(self._jars)
        dc = _re.fullmatch(r"DESCRIBE\s+CATALOG\s+(\w+)", s, _re.I)
        if dc:
            # SqlDescribeCatalog: name + type rows (GenericInMemoryCatalog
            # is the reference's default in-memory implementation)
            if dc.group(1) not in self._catalogs:
                raise ValueError(f"catalog {dc.group(1)!r} does not exist")
            return [("name", dc.group(1)), ("type", "generic_in_memory")]
        dd = _re.fullmatch(r"DESCRIBE\s+DATABASE\s+(?:(\w+)\.)?(\w+)", s, _re.I)
        if dd:
            cat = dd.group(1) or self._current_cat
            db = dd.group(2)
            if cat not in self._catalogs or db not in self._catalogs[cat]:
                raise ValueError(f"database {db!r} does not exist in catalog {cat!r}")
            return [("name", db), ("catalog", cat)] + sorted(
                self._db_props.get((cat, db), {}).items()
            )
        if _re.fullmatch(r"SHOW\s+TABLES", s, _re.I):
            # DDL tables plus temporary views (Flink's SHOW TABLES lists
            # both) — keeps SHOW and DROP over the same catalog: anything
            # DROP TABLE can drop, SHOW TABLES lists
            temp = {
                t.name
                for t in self._spark.catalog.listTables()
                if (t.tableType or "").upper() == "TEMPORARY"
            }
            mine = {
                self._logical.get(t, t)
                for t in self._tables
                if self._table_db.get(t, "default_database") == self._current_db
                and self._table_cat.get(t, "default_catalog") == self._current_cat
            }
            mine |= {
                v for v in self._views
                if self._view_db.get(v, "default_database") == self._current_db
                and self._view_cat.get(v, "default_catalog") == self._current_cat
            }
            if self._current_db == "default_database" and self._current_cat == "default_catalog":
                # plain temp views (created outside DDL) live in the default db
                return sorted(mine | (temp - set(self._tables) - set(self._views)))
            return sorted(mine)
        m = _re.match(
            # [PARTITION part_spec] [column_list] select_statement
            # (reference grammar: docs/dev/table/sql/insert.md:191); the
            # column-list alternative only matches a bare identifier list,
            # so a parenthesized query `(SELECT ...)` falls through to the
            # query group
            r"INSERT\s+(INTO|OVERWRITE)\s+([\w.]+)\s+(?:PARTITION\s*\(([^)]*)\)\s+)?"
            r"(?:\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)\s+)?(.+)",
            s,
            _re.I | _re.S,
        )
        if m:
            mode = "overwrite" if m.group(1).upper() == "OVERWRITE" else "append"
            name, part_spec, col_list, query = m.group(2), m.group(3), m.group(4), m.group(5)
            t = self._validate_insert_target(name)
            df = self.sql_query(query, _resolved=True).to_df()
            if col_list:
                # INSERT INTO T(c, b) SELECT x, y: x -> c, y -> b, every
                # unspecified sink column -> NULL (insert.md "COLUMN LIST";
                # static partition keys must not repeat in the list)
                cols = [c.strip() for c in col_list.split(",")]
                # the declarable sink schema includes PERSISTED metadata
                # columns (they are part of sink_cols in _insert_into —
                # e.g. kafka's writable `timestamp`); VIRTUAL ones are
                # excluded by construction
                sink_schema = list(t.columns) + [
                    (c, ty) for c, ty, _, virtual in t.metadata_cols if not virtual
                ]
                decl = dict(sink_schema)
                unknown = [c for c in cols if c not in decl]
                if unknown:
                    raise ValueError(f"INSERT column list names unknown column(s) {unknown}")
                if len(set(cols)) != len(cols):
                    raise ValueError("INSERT column list has duplicate columns")
                static_keys = set(_re.findall(r"(\w+)\s*=", part_spec or ""))
                clash = [c for c in cols if c in static_keys]
                if clash:
                    raise ValueError(
                        f"column(s) {clash} appear in both the static PARTITION "
                        "spec and the INSERT column list"
                    )
                if len(df.columns) != len(cols):
                    raise ValueError(
                        f"INSERT column count {len(df.columns)} != column list {len(cols)}"
                    )
                df = df.toDF(*cols)
                df = df.select(
                    *[
                        F.col(c) if c in cols else F.lit(None).cast(ty).alias(c)
                        for c, ty in sink_schema
                        if c not in static_keys
                    ]
                )
            if part_spec:
                # static partition spec (RichSqlInsert.java:38
                # staticPartitions): PARTITION (k='v', ...) — the SELECT
                # list omits these columns; each is appended as a constant
                # cast to its declared type.  Keys must be partition keys.
                decl = dict(t.columns)
                static = {
                    pm.group(1): pm.group(2)
                    for pm in _re.finditer(r"(\w+)\s*=\s*'([^']*)'", part_spec)
                }
                for k in static:
                    if k not in t.partitioned_by:
                        raise ValueError(
                            f"static partition column {k!r} is not a partition key of {name!r}"
                        )
                if t.columns:
                    # alignment is positional (Flink inserts by position):
                    # the query must supply exactly the non-static columns
                    dynamic = [c for c, _ in t.columns if c not in static]
                    if len(df.columns) != len(dynamic):
                        raise ValueError(
                            f"INSERT column count {len(df.columns)} != "
                            f"sink schema minus static partitions {len(dynamic)}"
                        )
                    df = df.toDF(*dynamic)
                for k, v in static.items():
                    df = df.withColumn(k, F.expr(f"CAST('{v}' AS {decl.get(k, 'STRING')})"))
                if t.columns:
                    df = df.select(*[c for c, _ in t.columns])
            self._insert_into(name, df, mode)
            self._refresh_after_inserts([name])
            return []
        return self.sql_query(s, _resolved=True).to_df().collect()

    def _validate_insert_target(self, name: str):
        t = self._lookup_table(name)
        if t is None:
            raise ValueError(f"INSERT target {name!r} was not created via execute_sql DDL")
        if t.options.get("connector", "filesystem") not in (
            "filesystem",
            "print",
            "blackhole",
            "kafka",
            "upsert-kafka",
        ):
            raise ValueError(
                f"INSERT INTO supports the filesystem/print/blackhole/kafka/"
                f"upsert-kafka connectors, not {t.options.get('connector')!r}"
            )
        if t.options.get("mode") == "streaming":
            raise ValueError("streaming INSERT goes through writeStream (streaming/sinks.py)")
        # VIRTUAL metadata columns are excluded from INSERT schemas by
        # construction (they are not in t.columns); a PERSISTED metadata
        # column requires writable connector metadata (reference:
        # DynamicSinkUtils validateMetadataColumns) — kafka exposes
        # 'timestamp' as writable, everything else is read-only here.
        conn = t.options.get("connector", "filesystem")
        writable = {"timestamp"} if conn in ("kafka", "upsert-kafka") else set()
        bad_md = [
            c
            for c, _, key, virtual in t.metadata_cols
            if not virtual and (key if key is not None else c) not in writable
        ]
        if bad_md:
            raise ValueError(
                f"INSERT into {name!r}: metadata column(s) {bad_md} are not "
                f"writable on the {conn} connector; declare them VIRTUAL"
            )
        return t

    def _insert_into(self, name: str, df: DataFrame, mode: str):
        """Write a result through the named sink table's connector (the
        body of Flink's SinkModifyOperation translation)."""
        from incubator_flink_spark.sources.filesystem import write_table
        from incubator_flink_spark.sources.ddl import format_options as _fmt_opts

        t = self._validate_insert_target(name)
        connector = t.options.get("connector", "filesystem")
        # align by the DDL's declared column order/names (Flink inserts
        # by position against the sink schema); PERSISTED metadata columns
        # are part of the sink schema (after the physical ones, matching
        # the registered view's order)
        sink_cols = list(t.columns) + [
            (c, ty) for c, ty, _, virtual in t.metadata_cols if not virtual
        ]
        if sink_cols:
            cols = [c for c, _ in sink_cols]
            if len(df.columns) != len(cols):
                raise ValueError(
                    f"INSERT column count {len(df.columns)} != sink schema {len(cols)}"
                )
            df = df.toDF(*cols)
            # insert-cast to the declared sink types (Flink applies the
            # sink schema positionally — a DECIMAL literal inserted into a
            # DOUBLE column must be widened BEFORE the write, or the
            # parquet file's physical type diverges from the declared
            # schema the readers use)
            casted = []
            for c, ty in sink_cols:
                try:
                    casted.append(F.col(c).cast(ty))
                except Exception:  # noqa: BLE001 — Flink-only type spelling
                    casted.append(F.col(c))
            df = df.select(*casted)
        if connector == "print":
            # PrintTableSinkFactory: one "+I[a, b, ...]" line per row, with
            # the optional 'print-identifier' prefix (PrintSinkFunction)
            ident = t.options.get("print-identifier", "")
            prefix = f"{ident}> " if ident else ""
            for row in df.collect():
                print(prefix + "+I[" + ", ".join(str(v) for v in row) + "]")
            return
        if connector == "blackhole":
            # BlackHoleTableSinkFactory: execute the plan, discard rows
            df.write.format("noop").mode("overwrite").save()
            return
        if connector in ("kafka", "upsert-kafka"):
            from incubator_flink_spark.sources.ddl import write_kafka_frames

            write_kafka_frames(self._spark, t, df, upsert=connector == "upsert-kafka")
            return
        if t.partitioned_by and mode == "overwrite":
            # Flink's filesystem INSERT OVERWRITE replaces only the
            # partitions receiving data; Spark's static mode would wipe
            # the whole table directory
            prev = self._spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            self._spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                write_table(
                    df,
                    t.options["path"],
                    t.options.get("format", "parquet"),
                    mode=mode,
                    partition_by=t.partitioned_by,
                    **_fmt_opts(t, for_write=True),
                )
            finally:
                self._spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            write_table(
                df,
                t.options["path"],
                t.options.get("format", "parquet"),
                mode=mode,
                partition_by=t.partitioned_by or None,
                **_fmt_opts(t, for_write=True),
            )

    def _refresh_after_inserts(self, names: list[str]):
        """Refresh the written tables' registered views, then re-plan all
        logical views (their temp views captured pre-INSERT scan
        snapshots)."""
        from incubator_flink_spark.sources.ddl import execute_ddl

        for name in names:
            execute_ddl(self._spark, None, table_def=self._tables[self._phys(name)])
        for vname, vquery in self._views.items():
            self.sql_query(vquery, _resolved=True).to_df().createOrReplaceTempView(vname)

    def explain_sql(self, sql: str, *details: str) -> str:
        """Reference TableEnvironment.explainSql(String, ExplainDetail...)
        (TableEnvironment.java:401): the plan text for a query, optionally
        with ESTIMATED_COST / CHANGELOG_MODE / JSON_EXECUTION_PLAN detail
        sections (see Table.explain for the Catalyst mappings)."""
        import contextlib
        import io

        with contextlib.redirect_stdout(io.StringIO()):
            return self.sql_query(sql).explain(*details)

    def create_statement_set(self) -> "StatementSet":
        """Reference StatementSet.java:32 (TableEnvironment.createStatementSet):
        buffer several INSERTs and execute them as one unit."""
        return StatementSet(self)

    def create_temporary_table(self, path: str, descriptor: "TableDescriptor") -> None:
        """Register a connector table from a TableDescriptor (reference
        TableEnvironment.createTemporaryTable:616, FLIP-129) — the
        programmatic equivalent of CREATE TEMPORARY TABLE DDL."""
        from incubator_flink_spark.sources.ddl import execute_ddl

        t = descriptor.to_table_def(path)
        execute_ddl(self._spark, None, table_def=t)
        self._register_table_def(t, self._current_cat, self._current_db, path)
        return None

    def from_descriptor(self, descriptor: "TableDescriptor") -> Table:
        """TableEnvironment.from(TableDescriptor) — register under a unique
        anonymous name and return the Table (reference
        TableEnvironment.java:749).  Works for streaming descriptors too
        (the returned Table wraps the readStream DataFrame directly)."""
        from incubator_flink_spark.sources.ddl import execute_ddl

        self._hint_views += 1
        name = f"__anon_tbl_{self._hint_views}"
        t = descriptor.to_table_def(name)
        df = execute_ddl(self._spark, None, table_def=t)
        self._register_table_def(t, self._current_cat, self._current_db, name)
        return Table(df)

    def create_temporary_view(self, name: str, table: Table) -> None:
        table.to_df().createOrReplaceTempView(name)

    def create_versioned_view(
        self, name: str, table: Table, time_attr: str, primary_key: str
    ) -> None:
        """Register a versioned table (Flink DDL: a PRIMARY KEY + event-time
        WATERMARK table) usable as the build side of SQL
        ``JOIN <name> FOR SYSTEM_TIME AS OF <probe>.<ts>`` joins."""
        table.to_df().createOrReplaceTempView(name)
        self._versioned[name] = (time_attr, primary_key)


class Schema:
    """Declarative schema (reference flink-table-common api/Schema.java —
    Schema.newBuilder().column(...).columnByExpression(...).watermark(...)
    .primaryKey(...).build(); PyFlink spells it new_builder)."""

    def __init__(self, columns, computed, watermark, primary_key, metadata_cols=None):
        self.columns = columns
        self.computed = computed
        self.watermark = watermark
        self.primary_key = primary_key
        self.metadata_cols = metadata_cols or []

    class Builder:
        def __init__(self):
            self._columns: list[tuple[str, str]] = []
            self._computed: list[tuple[str, str]] = []
            self._watermark: tuple[str, int] | None = None
            self._primary_key: list[str] = []
            self._metadata_cols: list[tuple[str, str, str | None, bool]] = []

        def column(self, name: str, data_type: str) -> "Schema.Builder":
            self._columns.append((name, data_type))
            return self

        def column_by_expression(self, name: str, sql_expression: str) -> "Schema.Builder":
            self._computed.append((name, sql_expression))
            return self

        def column_by_metadata(
            self,
            name: str,
            data_type: str,
            metadata_key: str | None = None,
            is_virtual: bool = False,
        ) -> "Schema.Builder":
            """Reference Schema.Builder.columnByMetadata (Schema.java) —
            the programmatic `name TYPE METADATA [FROM 'key'] [VIRTUAL]`."""
            self._metadata_cols.append((name, data_type, metadata_key, is_virtual))
            return self

        def watermark(self, column: str, sql_expression: str) -> "Schema.Builder":
            m = re.search(
                r"INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR)", sql_expression, re.IGNORECASE
            )
            if not m:
                raise ValueError(
                    "watermark expression must be <col> - INTERVAL 'n' SECOND|MINUTE|HOUR"
                )
            unit = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600}[m.group(2).upper()]
            self._watermark = (column, int(m.group(1)) * unit)
            return self

        def primary_key(self, *columns: str) -> "Schema.Builder":
            self._primary_key = list(columns)
            return self

        def build(self) -> "Schema":
            return Schema(
                self._columns,
                self._computed,
                self._watermark,
                self._primary_key,
                self._metadata_cols,
            )

    @staticmethod
    def new_builder() -> "Schema.Builder":
        return Schema.Builder()


class TableDescriptor:
    """Programmatic CREATE TABLE (reference TableDescriptor.java:54,
    FLIP-129): TableDescriptor.for_connector('filesystem').schema(...)
    .option('path', ...).format('parquet').partitioned_by(...).build()."""

    def __init__(self, schema, options, partition_keys):
        self.schema = schema
        self.options = options
        self.partition_keys = partition_keys

    class Builder:
        def __init__(self, connector: str):
            self._options: dict[str, str] = {"connector": connector}
            self._schema: Schema | None = None
            self._partition_keys: list[str] = []

        def schema(self, schema: Schema) -> "TableDescriptor.Builder":
            self._schema = schema
            return self

        def option(self, key: str, value: str) -> "TableDescriptor.Builder":
            self._options[key] = value
            return self

        def format(self, fmt: str) -> "TableDescriptor.Builder":
            self._options["format"] = fmt
            return self

        def partitioned_by(self, *columns: str) -> "TableDescriptor.Builder":
            self._partition_keys = list(columns)
            return self

        def build(self) -> "TableDescriptor":
            if self._schema is None:
                raise ValueError("Table descriptors require a schema.")
            return TableDescriptor(self._schema, dict(self._options), self._partition_keys)

    @staticmethod
    def for_connector(connector: str) -> "TableDescriptor.Builder":
        return TableDescriptor.Builder(connector)

    def to_table_def(self, name: str):
        from incubator_flink_spark.sources.ddl import TableDef

        s = self.schema
        return TableDef(
            name=name,
            columns=list(s.columns),
            computed=list(s.computed),
            watermark=s.watermark,
            primary_key=list(s.primary_key),
            partitioned_by=list(self.partition_keys),
            options=dict(self.options),
            metadata_cols=list(getattr(s, "metadata_cols", [])),
        )


class StatementSet:
    """Multi-sink statement buffer (reference StatementSet.java:32;
    StatementSetImpl collects ModifyOperations and translates them in ONE
    job, so every source is snapshotted at plan time and a sink written by
    one branch is NOT seen by another branch's source scan).

    The Spark mapping keeps that atomic-snapshot semantics: each
    ``add_insert*`` builds its DataFrame immediately — parquet scans pin
    their file listing when the plan is created — and ``execute()`` only
    runs the buffered writes, refreshing catalog views once at the end.
    """

    def __init__(self, env: TableEnvironment):
        self._env = env
        self._inserts: list[tuple[str, DataFrame, str]] = []

    def add_insert_sql(self, stmt: str) -> "StatementSet":
        import re as _re

        m = _re.match(
            r"INSERT\s+(INTO|OVERWRITE)\s+(\w+)\s+(.+)", stmt.strip().rstrip(";"), _re.I | _re.S
        )
        if not m:
            raise ValueError("add_insert_sql expects INSERT INTO/OVERWRITE <table> <query>")
        mode = "overwrite" if m.group(1).upper() == "OVERWRITE" else "append"
        name = m.group(2)
        self._env._validate_insert_target(name)
        df = self._env.sql_query(m.group(3)).to_df()
        self._inserts.append((name, df, mode))
        return self

    def add_insert(self, target: str, table: Table, overwrite: bool = False) -> "StatementSet":
        self._env._validate_insert_target(target)
        self._inserts.append((target, table.to_df(), "overwrite" if overwrite else "append"))
        return self

    def explain(self) -> str:
        """Reference StatementSet.explain — the combined plan of every
        buffered insert."""
        import contextlib
        import io

        buf = io.StringIO()
        for i, (name, df, mode) in enumerate(self._inserts):
            buf.write(f"== Statement {i}: INSERT {mode.upper()} {name} ==\n")
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        return buf.getvalue()

    def execute(self) -> None:
        if not self._inserts:
            raise ValueError("No statement is added to the statement set.")
        # One-job snapshot semantics: if a buffered query READS a path that
        # any buffered insert WRITES, pin its pre-job contents before the
        # first write (Flink's single job scans every source exactly once,
        # before any sink commits).  Disjoint read/write sets — the normal
        # case — skip this entirely.
        import os

        # Normalize both sides to absolute paths and compare PATH COMPONENTS
        # (commonpath), not raw startswith: a relative sink path must still
        # match absolute inputFiles(), and '/data/x' must not claim files
        # under the sibling '/data/x2'.
        sink_paths = [
            os.path.abspath(p)
            for p in (
                self._env._tables[self._env._phys(n)].options.get("path", "")
                for n, _, _ in self._inserts
            )
            if p
        ]

        def _under(f: str, p: str) -> bool:
            try:
                return os.path.commonpath([f, p]) == p
            except ValueError:
                return False

        staged = []
        for name, df, mode in self._inserts:
            reads = [
                os.path.abspath(f.replace("file://", "", 1).replace("file:", "", 1))
                for f in df.inputFiles()
            ]
            if any(_under(f, p) for f in reads for p in sink_paths):
                df = df.localCheckpoint(eager=True)
            staged.append((name, df, mode))
        for name, df, mode in staged:
            self._env._insert_into(name, df, mode)
        self._env._refresh_after_inserts([n for n, _, _ in staged])
        self._inserts.clear()
